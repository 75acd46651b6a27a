package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * Selection is a pure function of the row key: a doc is kept iff the
  * first two hex chars of `md5(salt || ':' || doc_id)` fall below the
  * stratum's threshold (k/256 sampling rate). No RNG state, so the sample
  * is reproducible across runs, engines, and cluster layouts — rerunning
  * a 100 TB job samples the SAME rows — and rows are filtered in a narrow
  * codegen'd scan with no shuffle. Changing `salt` draws an independent
  * sample; downstream weights (256/k) make the sample unbiased for
  * weighted aggregation.
  */
object Sampling {

  private def keyHash(salt: String): Column =
    substring(md5(concat(lit(salt), lit(":"), col("doc_id"))), 1, 2)

  private def thr(k: Int): String = if (k >= 256) "zz" else f"$k%02x"

  /** Stratified sample: per-`lang` keep-rates in 1/256 units (256 = keep
    * all), with inverse-probability `weight` for unbiased downstream
    * aggregation. The rate table is config, so the stratum lookup unrolls
    * to a codegen'd CASE chain — no join against a rate table needed
    * (broadcast-join a real table instead when strata are dynamic). */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int], defaultRate: Int,
      salt: String): DataFrame = {
    val h = keyHash(salt)
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(thr(defaultRate))) {
      case (acc, (lang, k)) => when(col("lang") === lang, lit(thr(k))).otherwise(acc)
    }
    val weight = rates.toSeq.sortBy(_._1).foldLeft(lit(256.0 / defaultRate)) {
      case (acc, (lang, k)) => when(col("lang") === lang, lit(256.0 / k)).otherwise(acc)
    }
    docs
      .filter(h < threshold)
      .select(col("doc_id"), col("lang"), weight.as("weight"))
  }

  /** Train/val/test split by hash range over an independent salt: fraction
    * boundaries in 1/256 units (e.g. 230|243 ≈ 90/5/5). Same key hash ⇒
    * a doc's split never changes as the corpus grows — the property that
    * keeps eval sets honest across dataset versions. */
  def assignSplits(docs: DataFrame, trainUpto: Int, valUpto: Int, salt: String): DataFrame =
    docs.select(col("doc_id"), splitLabel(trainUpto, valUpto, salt).as("split"))

  /** The split label as a bare column (consumed by [[Decontaminate]]). */
  def splitLabel(trainUpto: Int, valUpto: Int, salt: String): Column =
    splitLabelOf(col("doc_id"), trainUpto, valUpto, salt)

  /** The same split rule over an arbitrary key column — the hook that
    * lets a split be keyed on something other than the doc's own id
    * (e.g. its near-dup CLUSTER representative, so no near-duplicate
    * pair ever straddles train/val — see `d_cluster_split`). */
  def splitLabelOf(key: Column, trainUpto: Int, valUpto: Int, salt: String): Column = {
    val h = substring(md5(concat(lit(salt), lit(":"), key)), 1, 2)
    when(h < lit(thr(trainUpto)), lit("train"))
      .when(h < lit(thr(valUpto)), lit("val"))
      .otherwise(lit("test"))
  }

  /** Exact-k uniform sample PER GROUP (the "give me exactly 1000 docs
    * per language for the eval set" op — rate-based [[stratifiedSample]]
    * can only hit k in expectation). Selection order is the md5 of the
    * salted doc key, so the sample is the deterministic top-k of a
    * uniform permutation: reproducible across runs, engines, and
    * cluster layouts, and growing the corpus only ever displaces the
    * highest-ranked rows.
    *
    * Scale shape: a naive `row_number() OVER (PARTITION BY grp)` puts
    * one group's ENTIRE corpus slice through one task — at 100 TB the
    * "en" partition is a single-executor sort. Instead rank twice:
    * first within (grp, sub) — `subBuckets` hash-split sub-partitions,
    * each bounded — keeping k per sub-bucket (a global top-k row is by
    * definition its own sub-bucket's top-k, so no answer row is lost);
    * then the real rank over the ≤ k·subBuckets survivors per group.
    * The wide corpus shuffle is the (grp, sub)-keyed one; the final
    * per-group window sees k·subBuckets rows, driver- and skew-proof. */
  def reservoirByGroup(docs: DataFrame, grp: String, k: Int, salt: String,
      subBuckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = md5(concat(lit(salt), lit(":"), col("doc_id")))
    val sub = pmod(
      conv(substring(md5(concat(lit(s"$salt-sub:"), col("doc_id"))), 1, 8), 16, 10)
        .cast("long"), lit(subBuckets.toLong))
    val survivors = docs
      .select(col("doc_id"), col(grp), ord.as("ord"), sub.as("sub"))
      .withColumn("r1", row_number().over(
        Window.partitionBy(col(grp), col("sub")).orderBy(col("ord"), col("doc_id"))))
      .filter(col("r1") <= k)
    survivors
      .withColumn("pos", row_number().over(
        Window.partitionBy(col(grp)).orderBy(col("ord"), col("doc_id"))).cast("long"))
      .filter(col("pos") <= k)
      .select(col("doc_id"), col(grp), col("pos"))
  }

  /** Sample + split in ONE narrow projection: both are pure functions of
    * doc_id, so joining the two operators' outputs (as a naive pipeline
    * would) pays a join and a second scan for columns one pass computes —
    * at test scale that join even broadcasts a 75%-of-corpus side, a plan
    * that falls over at 100 TB. This is the production front door. */
  def sampleWithSplits(docs: DataFrame, rates: Map[String, Int], defaultRate: Int,
      salt: String, trainUpto: Int, valUpto: Int, splitSalt: String): DataFrame = {
    val h = keyHash(salt)
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(thr(defaultRate))) {
      case (acc, (lang, k)) => when(col("lang") === lang, lit(thr(k))).otherwise(acc)
    }
    val weight = rates.toSeq.sortBy(_._1).foldLeft(lit(256.0 / defaultRate)) {
      case (acc, (lang, k)) => when(col("lang") === lang, lit(256.0 / k)).otherwise(acc)
    }
    docs
      .filter(h < threshold)
      .select(col("doc_id"), col("lang"), weight.as("weight"),
        splitLabel(trainUpto, valUpto, splitSalt).as("split"))
  }

  /** Deterministic epoch shuffle: the global training order for one epoch
    * as (shard, position) — shard = hash-mod over one salt, position =
    * rank of an INDEPENDENT order hash within the shard (doc_id breaks
    * the measure-zero hash ties). Changing the salt pair reshuffles the
    * next epoch; same salts ⇒ byte-identical order on any cluster layout,
    * which is what makes a 100 TB training run resumable and replayable.
    * One shuffle on the shard key; each shard sorts independently (no
    * global sort, no driver involvement), and shard count scales with the
    * corpus so per-task sort stays bounded. */
  def epochShuffle(docs: DataFrame, nShards: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(
      conv(substring(md5(concat(lit(s"$salt-shard:"), col("doc_id"))), 1, 13), 16, 10)
        .cast("long"), lit(nShards.toLong))
    val ord = md5(concat(lit(s"$salt-ord:"), col("doc_id")))
    Spread(docs)
      .select(col("doc_id"), shard.as("shard"), ord.as("ord"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy(col("ord"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pos").cast("long").as("pos"))
  }

  /** R14: language REBALANCING to a target mix — the data-mixture step a
    * multilingual corpus build runs after language ID (the CC-pipeline
    * "rebalance to target distribution" stage). Given per-language
    * target shares in permille, the largest achievable corpus preserving
    * the mix is bounded by the scarcest language:
    * `N = min_l floor(count_l·1000/target_l)`; each language's budget is
    * `floor(N·target_l/1000)` and docs are kept by the deterministic
    * hash-threshold rule `h·count_l < budget_l·2^32` (h = the first 8
    * md5 hex digits of the salted doc key — cross-multiplied exact
    * integers, so the boundary can never flip between engines; safe
    * while per-language counts stay under ~2^31). Languages outside the
    * target map get budget 0 and are dropped.
    *
    * Scale shape: ONE count aggregate over the corpus, a language-count-
    * sized budget table broadcast back (the 1-row N total rides the same
    * broadcast — PlanLint-allowlisted), and the keep verdict is a narrow
    * codegen'd projection. No window over the corpus, no per-language
    * single-task partitions. */
  def langBalance(docs: DataFrame,
                  targetsPermille: Seq[(String, Long)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tdf = targetsPermille.toDF("lang", "target_permille")
    val counts = Spread(docs).groupBy("lang").agg(count(lit(1)).as("n_lang"))
      .join(broadcast(tdf), Seq("lang"), "left")
      .withColumn("target_permille", coalesce(col("target_permille"), lit(0L)))
    val nTotal = counts.filter(col("target_permille") > 0)
      .select(min(expr("n_lang * 1000 div target_permille")).as("n_total"))
    val budgets = counts.crossJoin(broadcast(nTotal))
      .select(col("lang"), col("n_lang"), col("target_permille"),
        expr("n_total * target_permille div 1000").as("budget"))
    docs.select(col("doc_id"), col("lang"),
        conv(substring(md5(concat(lit("langbal:"), col("doc_id"))), 1, 8), 16, 10)
          .cast("long").as("h"))
      .join(broadcast(budgets), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_lang"),
        col("target_permille"), col("budget"),
        (col("h") * col("n_lang") < col("budget") * (1L << 32)).as("kept"))
  }
}
