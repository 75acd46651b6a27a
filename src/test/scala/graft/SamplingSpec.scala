package graft

import graft.operators.Sampling
import graft.queries.Training
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with WallBudget {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.Sf).cache()
  private val rates = Map("en" -> 192, "zh" -> 256)

  test("sample is deterministic and stratum rates land near k/256") {
    val s1 = Sampling.stratifiedSample(docs, rates, 64, "s1")
    val s2 = Sampling.stratifiedSample(docs, rates, 64, "s1")
    assert(s1.collect().toSet === s2.collect().toSet)
    val kept = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((lang, n) <- total if n >= 50) {
      val k = rates.getOrElse(lang, 64)
      val got = kept.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(got - k / 256.0) < 0.2, s"$lang keep-rate $got vs ${k / 256.0}")
    }
    // zh stratum (rate 256) keeps everything
    assert(kept.getOrElse("zh", 0L) === total.getOrElse("zh", 0L))
  }

  test("weights are the exact inverse keep-probability per stratum") {
    val w = Sampling.stratifiedSample(docs, rates, 64, "s1")
      .select("lang", "weight").distinct().as[(String, Double)].collect().toMap
    assert(w.get("en").forall(_ === 256.0 / 192))
    assert(w.get("zh").forall(_ === 1.0))
    assert((w.keySet -- rates.keySet).forall(l => w(l) === 4.0))
  }

  test("a different salt draws a different sample") {
    val a = Sampling.stratifiedSample(docs, rates, 64, "s1").select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(docs, rates, 64, "s2").select("doc_id").as[Long].collect().toSet
    assert(a !== b)
  }

  test("sequence packing: full budget per sequence, no token lost or duplicated") {
    val packed = graft.operators.SeqPack.packSequences(docs, 512, buckets = 8).cache()
    // every sequence except each bucket's last carries exactly 512 tokens
    val seqTotals = packed.groupBy("bucket", "seq_id")
      .agg(sum("tok_len").as("n"), max("seq_id").as("sid"))
    val lastSeq = packed.groupBy("bucket").agg(max("seq_id").as("last"))
    val nonLast = seqTotals.join(lastSeq, "bucket").filter(col("seq_id") =!= col("last"))
    assert(nonLast.filter(col("n") =!= 512).count() === 0)
    assert(nonLast.count() > 0)
    // token conservation: per-doc contributions reassemble the doc exactly
    val docTotals = packed.groupBy("doc_id").agg(
      sum("tok_len").as("got"), min("tok_start").as("first"))
    val expected = docs.select(col("doc_id"),
      graft.operators.TextOps.nTokens(col("text")).cast("long").as("want"))
      .filter(col("want") > 0)
    val j = docTotals.join(expected, "doc_id")
    assert(j.filter(col("got") =!= col("want")).count() === 0)
    assert(j.filter(col("first") =!= 0).count() === 0)
    assert(docTotals.count() === expected.count())
    // a doc's slices are contiguous across sequence boundaries
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("seq_id")
    val gaps = packed
      .withColumn("prev_end", lag(col("tok_start") + col("tok_len"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("prev_end") =!= col("tok_start"))
    assert(gaps.count() === 0)
    packed.unpersist()
  }

  test("splits partition the corpus and are stable under corpus growth") {
    val full = Sampling.assignSplits(docs, 230, 243, "split1")
    val counts = full.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // a doc's split is a pure function of its id: recomputing on a subset
    // never reassigns anyone (eval sets stay honest as the corpus grows)
    val sub = Sampling.assignSplits(docs.filter(col("doc_id") % 2 === 0), 230, 243, "split1")
    val joined = sub.withColumnRenamed("split", "sub_split").join(full, "doc_id")
    assert(joined.filter(col("sub_split") =!= col("split")).count() === 0)
  }

  test("epoch shuffle: dense 1..n positions per shard; salt-stable; salts independent") {
    val a = Sampling.epochShuffle(docs, 4, "e1")
      .as[(Long, Long, Long)].collect()
    assert(a.map(_._1).distinct.length === a.length) // every doc exactly once
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length), s"shard $shard not dense")
    }
    val b = Sampling.epochShuffle(docs, 4, "e1").as[(Long, Long, Long)].collect()
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq) // same salt = same order
    val c = Sampling.epochShuffle(docs, 4, "e2").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(a.exists(r => c(r._1) !== ((r._2, r._3)))) // next epoch reshuffles
  }

  test("lang balance: budgets bounded by the scarcest language; keep rule recomputed independently") {
    val targets = Seq(("en", 400L), ("de", 150L), ("fr", 150L), ("es", 150L), ("zh", 150L))
    val out = Sampling.langBalance(docs, targets).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang"), r.getAs[Long]("n_lang"),
          r.getAs[Long]("target_permille"), r.getAs[Long]("budget"),
          r.getAs[Boolean]("kept")))).toMap
    // independent budget math from driver-side counts
    val langOf = docs.select("doc_id", "lang").as[(Long, String)].collect().toMap
    val counts = langOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tmap = targets.toMap
    val nTotal = counts.collect { case (l, n) if tmap.contains(l) =>
      n * 1000L / tmap(l) }.min
    for ((id, (lang, nLang, tp, budget, kept)) <- out) {
      assert(nLang === counts(lang), s"doc $id count")
      assert(tp === tmap.getOrElse(lang, 0L), s"doc $id target")
      assert(budget === nTotal * tmap.getOrElse(lang, 0L) / 1000L, s"doc $id budget")
      // the keep rule, recomputed from scratch
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"langbal:$id".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex, 16)
      assert(kept === (h * nLang < budget * (1L << 32)), s"doc $id keep rule")
    }
    // achieved counts: within binomial noise of the budget, never wildly off
    val keptBy = out.values.groupBy(_._1).view
      .mapValues(v => (v.count(_._5), v.head._4)).toMap
    keptBy.foreach { case (lang, (k, budget)) =>
      assert(math.abs(k - budget) <= math.max(10L, budget / 4),
        s"$lang kept $k vs budget $budget — sampler badly biased")
    }
    // the kept mix is closer to the target distribution than the raw
    // corpus was (L1 distance over the targeted languages)
    val rawTot = counts.values.sum.toDouble
    val keptTot = keptBy.values.map(_._1).sum.toDouble
    def l1(share: String => Double): Double =
      tmap.map { case (l, t) => math.abs(share(l) - t / 1000.0) }.sum
    val rawL1 = l1(l => counts.getOrElse(l, 0L) / rawTot)
    val keptL1 = l1(l => keptBy.get(l).map(_._1.toDouble).getOrElse(0.0) / keptTot)
    assert(keptL1 <= rawL1 + 1e-9,
      s"rebalance must move the mix toward the target (raw L1 $rawL1, kept L1 $keptL1)")
  }

  test("reservoir: exactly min(k, group size) rows per group; two-stage ranking " +
    "elects the IDENTICAL rows to the naive one-window semantics") {
    val k = 5
    val got = Sampling.reservoirByGroup(docs, "lang", k, "res-spec")
    val sizes = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((lang, n) <- totals)
      assert(sizes.getOrElse(lang, 0L) === math.min(k.toLong, n), s"group $lang")
    // the semantics as ONE naive window (the oracle's statement) — the
    // skew-proof two-stage plan must elect the same (doc, pos) rows
    val ord = md5(concat(lit("res-spec:"), col("doc_id")))
    val naive = docs.select(col("doc_id"), col("lang"), ord.as("ord"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("ord"), col("doc_id"))).cast("long"))
      .filter(col("pos") <= k).select("doc_id", "lang", "pos")
    assert(got.collect().toSet === naive.collect().toSet)
    // sub-bucket survivors stay bounded: the first stage admits at most
    // k per (group, sub) — the property that caps the final window input
    val s1max = Sampling.reservoirByGroup(docs, "lang", k, "res-spec", subBuckets = 2)
    assert(s1max.collect().toSet === naive.collect().toSet,
      "bucket count must not change the elected sample")
  }

  test("cluster-keyed split: near-dup clusters travel whole; the naive doc-keyed " +
    "rule measurably leaks pairs across splits") {
    val cs = Training.dClusterSplit(spark, TestSpark.Sf)
    // every cluster lands in exactly one split
    val fractured = cs.groupBy("cluster")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(fractured === 0L)
    // the split rule applied to the cluster key matches splitLabelOf
    val one = cs.limit(50).collect()
    one.foreach { r =>
      val cl = r.getAs[Long]("cluster")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"clsplit1:$cl".getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
      val want = if (hex < f"${230}%02x") "train" else if (hex < f"${243}%02x") "val" else "test"
      assert(r.getAs[String]("split") === want, s"cluster $cl")
    }
    // the audit: candidate pairs never straddle under the cluster rule;
    // the naive rule's leak count is the measured motivation
    val leak = Training.dSplitLeakage(spark, TestSpark.Sf).collect().head
    assert(leak.getAs[Long]("cluster_leaks") === 0L)
    assert(leak.getAs[Long]("n_pairs") > 0L)
    assert(leak.getAs[Long]("naive_leaks") >= 0L)
  }

  test("token budget: two-stage prefix sums equal a sequential greedy replay; " +
    "boundary doc is the last kept; budget is exact") {
    val out = Sampling.tokenBudget(docs, 2, 5, "tb1").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("q"),
          r.getAs[Long]("cum"), r.getAs[Boolean]("kept")))).toMap
    // sequential first-principles replay on the driver
    val en = graft.operators.TextOps.Stop("en").toSet
    def md5hex1(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString.take(1)
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
          .split(" +").filter(_.nonEmpty)
        if (toks.isEmpty) None
        else Some((id, toks.length.toLong,
          toks.count(en) * 1000L / toks.length,
          md5hex1(s"tb1:$id")))
      }
    val total = rows.map(_._2).sum
    val budget = total * 2 / 5
    var cum = 0L
    val expect = rows.sortBy { case (id, _, q, sb) => (-q, sb, id) }.map {
      case (id, n, q, _) => cum += n; (id, (n, q, cum, cum <= budget))
    }.toMap
    assert(out === expect)
    // the greedy boundary is real: some doc is kept and its successor
    // in selection order is not (the budget binds strictly inside)
    val kept = out.values.count(_._4)
    assert(kept > 0 && kept < out.size, s"budget must bind: kept $kept of ${out.size}")
    val keptTok = out.values.filter(_._4).map(_._1).sum
    val minUnkeptCum = out.values.filter(!_._4).map(_._3).min
    assert(keptTok <= budget, "kept tokens never exceed the budget")
    assert(minUnkeptCum > budget,
      "the first dropped doc in selection order is exactly the one that would overflow")
  }

  test("anneal mix: endpoints are the natural and quality mixes; the schedule " +
    "moves monotonically; admission tracks the rate") {
    val out = Sampling.annealMix(docs, 4, "anneal1").collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("nat_permille"), r.getAs[Long]("qual_permille"),
          r.getAs[Long]("mix_permille"), r.getAs[Long]("rate_permille"),
          r.getAs[Long]("n_kept")))).toMap
    val sources = out.keys.map(_._2).toSet
    assert(out.size === 4 * sources.size)
    for (src <- sources) {
      val byEp = (0L to 3L).map(e => out((e, src)))
      val (nat, qual) = (byEp.head._1, byEp.head._2)
      // linear interpolation endpoints land exactly on the two mixes
      assert(byEp.head._3 === nat, s"$src epoch 0 must be the natural mix")
      assert(byEp.last._3 === qual, s"$src epoch 3 must be the quality mix")
      // monotone in between, in the direction of the quality mix
      val mixes = byEp.map(_._3)
      if (qual >= nat) assert(mixes === mixes.sorted, s"$src anneal not monotone")
      else assert(mixes === mixes.sorted.reverse, s"$src anneal not monotone")
    }
    // admission realizes the schedule within binomial noise (per group)
    val counts = docs.where(length(col("text")) > 0).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    for (((_, src), (_, _, _, rate, kept)) <- out; n = counts(src)) {
      val want = n * rate / 1000
      assert(math.abs(kept - want) <= math.max(10L, want / 3),
        s"$src rate $rate: kept $kept vs ~$want of $n")
    }
  }

  test("curriculum: ranks are the exact (bits, doc_id) permutation; phases cut evenly (r16)") {
    val out = Sampling.curriculum(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = out.length
    assert(n > 0)
    // ranks are exactly 1..N
    assert(out.map(_._3).sorted.toSeq === (1L to n.toLong))
    // rank order IS the (bits_x1000, doc_id) lexicographic order — the
    // decomposed two-level rank must equal the naive global one
    val byRank = out.sortBy(_._3)
    assert(byRank.map(t => (t._2, t._1)).toSeq ===
      out.map(t => (t._2, t._1)).sortBy(identity).toSeq)
    // phase = (rank-1)*4 // N: monotone in rank, 4 phases, sizes within 1
    assert(byRank.map(_._4).toSeq === byRank.map(t => (t._3 - 1) * 4 / n).toSeq)
    val sizes = out.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes.keySet === Set(0L, 1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1)
  }
}
