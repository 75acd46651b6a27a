package graft

import graft.operators.{DocSim, QualityRules}
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the df-capped inverted-index cosine pairs
  * (DocSim.cosinePairs) and the unigram-entropy signal
  * (QualityRules.unigramEntropy) — both exact-integer operators, so the
  * expectations are literal longs, no tolerance. */
class DocSimSpec extends AnyFunSuite with WallBudget {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosinePairs: identical docs score cos2_micro = 1000000") {
    // docs 1, 2 identical: shingles {"a b c", "b c d"} tf=1 each, both
    // with df=2 (kept); dot = 2, n_sq = 2 each -> 10^6*4 // 4 = 10^6.
    // doc 3 shares nothing.
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w")).toDF("doc_id", "text")
    val out = DocSim.cosinePairs(docs)
      .select("doc1", "doc2", "n_shared", "dot", "n1_sq", "n2_sq", "cos2_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 2L, 2L, 2L, 2L, 1000000L)))
  }

  test("cosinePairs: partial overlap floors exactly; df=1 shingles can't pair") {
    // doc 1: "a b c d e" -> shingles {abc, bcd, cde}; doc 2: "a b c x y"
    // -> {abc, bcx, cxy}. Shared kept shingle: only "a b c" (df=2; the
    // rest are df=1, dropped even from norms). Pruned-space vectors are
    // then {abc:1} for both -> dot=1, n1_sq=n2_sq=1, cos2=10^6.
    val docs = Seq((1L, "a b c d e"), (2L, "a b c x y")).toDF("doc_id", "text")
    val out = DocSim.cosinePairs(docs, minCos2Micro = 0L)
      .select("doc1", "doc2", "dot", "n1_sq", "n2_sq", "cos2_micro")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 1L, 1L, 1L, 1000000L)))
  }

  test("cosinePairs: repeated-shingle tf weighting stays exact (tf > 1)") {
    // doc 1 repeats "a b c" twice via "a b c a b c" -> shingles
    // [abc, bca, cab, abc]: tf(abc)=2. doc 2 = "a b c z z" -> [abc, bcz, czz].
    // Kept: abc (df=2). dot = 2*1 = 2, n1_sq = 4, n2_sq = 1,
    // cos2 = 10^6*4 // 4 = 10^6 (cosine over pruned space is 1: vectors
    // are parallel). threshold 0 keeps it.
    val docs = Seq((1L, "a b c a b c"), (2L, "a b c z z")).toDF("doc_id", "text")
    val out = DocSim.cosinePairs(docs, minCos2Micro = 0L)
      .select("dot", "n1_sq", "n2_sq", "cos2_micro")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 4L, 1L, 1000000L)))
  }

  test("cosinePairs: decimal path survives int64-overflowing products") {
    // Force dot large enough that 10^6*dot^2 overflows int64
    // (dot > ~3e6): one shared shingle repeated 2000 times in each of
    // two docs -> tf1 = tf2 = 2000 (approx; exact value derived below),
    // dot ~ 4e6, 10^6*dot^2 ~ 1.6e19 > 2^63. The old long arithmetic
    // wrapped negative here; the DECIMAL(38,0) path must yield exactly
    // 10^6 (identical docs).
    val phrase = Array.fill(2002)("a b c").mkString(" ") // ~2000 token stream of a b c a b c ...
    val docs = Seq((1L, phrase), (2L, phrase)).toDF("doc_id", "text")
    val out = DocSim.cosinePairs(docs)
      .select("doc1", "doc2", "cos2_micro")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall(_._3 == 1000000L),
      s"identical docs must score exactly 10^6, got $out")
    // and the dot really was in the would-have-wrapped regime
    val dot = DocSim.cosinePairs(docs).select("dot").as[Long].head()
    assert(dot > 3000000L, s"fixture too small to exercise overflow: dot=$dot")
  }

  test("unigramEntropy: hand-computed bits, ent_milli, ttr_milli") {
    // doc 1 "a a b b": n=4; tf(a)=2 -> fl2(4//2)=1 contributes 2;
    // tf(b)=2 -> 2. sum_bits=4, ent_milli = 4000//4 = 1000,
    // ttr_milli = 2000//4 = 500.
    // doc 2 "a a a a": n=4, tf=4, fl2(1)=0, sum_bits=0, ent=0, ttr=250.
    // doc 3 "a b c d": n=4, each tf=1, fl2(4)=2 -> sum_bits=8,
    // ent_milli=2000, ttr_milli=1000.
    val docs = Seq((1L, "a a b b"), (2L, "a a a a"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val out = QualityRules.unigramEntropy(docs)
      .select("doc_id", "n_tokens", "n_distinct", "sum_bits", "ent_milli", "ttr_milli")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 4L, 2L, 4L, 1000L, 500L),
      (2L, 4L, 1L, 0L, 0L, 250L),
      (3L, 4L, 4L, 8L, 2000L, 1000L)))
  }

  test("unigramEntropy: empty/whitespace docs are dropped, not divide-by-zero") {
    val docs = Seq((1L, "only one real doc"), (2L, "   "), (3L, "!!!"))
      .toDF("doc_id", "text")
    val out = QualityRules.unigramEntropy(docs).select("doc_id").as[Long].collect()
    assert(out.toSeq === Seq(1L))
  }
}
