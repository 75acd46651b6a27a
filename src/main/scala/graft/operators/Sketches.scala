package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sketch operators whose ESTIMATES are oracle-exact —
  * like the KMV cardinality sketch, every intermediate is integer
  * arithmetic over md5-derived hashes, so Spark and DuckDB produce
  * bit-identical sketch contents and estimates (unlike HLL /
  * approx_percentile, whose engine-internal hashes force
  * claim-boolean oracles).
  *
  * Scale stance: both sketches are one partial-aggregated shuffle over
  * a fixed, tiny cell/bit space (d·w cells, m bits) — the sketch build
  * carries O(cells) rows per map partition regardless of input size,
  * and the probe side joins against a broadcast-sized table.
  */
object Sketches {

  /** `h_i(x) mod w` from a salted md5 prefix — 52-bit integer, exact in
    * both engines. */
  private def bucket(c: Column, salt: Int, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$salt:"), c)), 1, 13), 16, 10).cast("long"), lit(w))

  /** CMS cell counts `(row_i, bucket, cell_n)` — the sketch's state.
    * Cells are ADDITIVE: the sketch of a union is the cell-wise sum of
    * the parts' sketches, which is what makes CMS mergeable across
    * partitions, micro-batches and days of data (StreamingSpec proves
    * per-batch cells sum to the batch sketch). */
  def cmsCells(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 64): DataFrame =
    df.select(posexplode(array((0 until d).map(i =>
        bucket(col(keyCol), i, w)): _*)).as(Seq("row_i", "bucket")))
      .groupBy("row_i", "bucket")
      .agg(count(lit(1)).as("cell_n"))

  /** Count-Min sketch (d rows × w buckets) over `keyCol`: cell counts
    * via one explode + groupBy, estimates for every distinct key via a
    * broadcast join + min over the d rows. Overestimate bounded by
    * εN with ε = e/w — the classic heavy-hitter frequency sketch. */
  def cmsFrequencies(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 64): DataFrame = {
    val key = col(keyCol)
    val cells = cmsCells(df, keyCol, d, w)
    val probes = df.select(key.as("key")).distinct()
      .select(col("key") +: (0 until d).map(i =>
        bucket(col("key"), i, w).as(s"b$i")): _*)
      .select(col("key"), posexplode(array((0 until d).map(i =>
        struct(lit(i).as("row_i"), col(s"b$i").as("bucket"))): _*)).as(Seq("_", "p")))
      .select(col("key"), col("p.row_i").as("row_i"), col("p.bucket").as("bucket"))
    val exact = df.groupBy(key.as("key")).agg(count(lit(1)).as("exact_n"))
    probes
      .join(cells, Seq("row_i", "bucket"))
      .groupBy("key")
      .agg(min("cell_n").as("cms_est"))
      .join(exact, Seq("key"))
      .select(col("key"), col("cms_est"), col("exact_n"),
        (col("cms_est") >= col("exact_n")).as("never_underestimates"))
  }

  /** Bloom-filter bit set (k hashes into m bits) of `keyCol`'s distinct
    * values, as one row holding the SET of set bit positions (the
    * broadcast-able filter representation). */
  def bloomBits(df: DataFrame, keyCol: String, k: Int = 3, m: Int = 1024): DataFrame =
    df.select(explode(array((0 until k).map(i =>
        bucket(col(keyCol), 100 + i, m)): _*)).as("bit"))
      .distinct()

  /** Bloom semi-join pre-filter — the shuffle-reduction pattern: probe
    * rows whose key has all k bits set in the build side's filter are
    * candidates; only candidates reach the (expensive) exact semi join.
    * Returns per-key candidate/actual flags so the false-positive
    * behavior is visible (false negatives are impossible — the oracle
    * checks `candidate OR NOT member` ≡ true per key). */
  def bloomPrefilter(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String, k: Int = 3, m: Int = 1024): DataFrame = {
    val bits = bloomBits(build, buildKey, k, m)
      .agg(collect_list("bit").as("bits"))
    val members = build.select(col(buildKey).as("key")).distinct()
      .withColumn("member", lit(true))
    probe.select(col(probeKey).as("key")).distinct()
      .crossJoin(broadcast(bits))
      .select(col("key"),
        (0 until k).map(i =>
          array_contains(col("bits"), bucket(col("key"), 100 + i, m)))
          .reduce(_ && _).as("candidate"))
      .join(members, Seq("key"), "left")
      .select(col("key"), col("candidate"),
        coalesce(col("member"), lit(false)).as("member"))
  }
}
