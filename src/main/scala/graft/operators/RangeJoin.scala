package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Non-equi range (interval) join, expressed as a shuffled equi-join.
  *
  * Spark plans a join whose condition has no equality conjunct as a
  * BroadcastNestedLoopJoin (or a cartesian product) — O(|L|·|R|) work and
  * a broadcast of a whole side, both non-starters at 100 TB. The classic
  * fix is temporal binning: quantize time into fixed-width bins, replicate
  * each interval into every bin it overlaps, tag each point with its one
  * bin, equi-join on the bin id, and re-check the exact range predicate.
  * The join then shuffles both sides on the bin key like any other
  * equi-join — partial work is proportional to genuinely co-binned pairs,
  * never all pairs.
  *
  * Bin width tuning: replication factor per interval is
  * `width/binSeconds + 1`, while candidate pairs per bin grow with bin
  * width. Setting `binSeconds` ≈ the typical interval width keeps
  * replication ≤ 2× and candidates near-minimal — callers pass it
  * explicitly because only they know the interval distribution.
  *
  * A matching (interval, point) pair meets exactly once: the point lives
  * in exactly one bin, and the interval's replicas cover distinct bins —
  * so no post-join dedup is needed.
  */
object RangeJoin {

  /** Join `points` rows to every `intervals` row whose `[low, high)`
    * window (epoch seconds) contains the point's `point` (epoch seconds).
    * Returns all columns of both inputs; rows with empty windows
    * (`low >= high`) match nothing. Inner-join semantics.
    */
  def pointInInterval(intervals: DataFrame, low: Column, high: Column,
      points: DataFrame, point: Column, binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val iv = intervals
      .withColumn("__rj_low", low.cast("long"))
      .withColumn("__rj_high", high.cast("long"))
      .filter(col("__rj_low") < col("__rj_high"))
      // every bin the half-open window overlaps: floor(low/b) .. floor((high-1)/b)
      .withColumn("__rj_bin", explode(sequence(
        floor(col("__rj_low") / binSeconds).cast("long"),
        floor((col("__rj_high") - 1) / binSeconds).cast("long"))))
    val pt = points
      .withColumn("__rj_pt", point.cast("long"))
      .withColumn("__rj_bin", floor(col("__rj_pt") / binSeconds).cast("long"))
    iv.join(pt,
        iv("__rj_bin") === pt("__rj_bin") &&
          pt("__rj_pt") >= iv("__rj_low") && pt("__rj_pt") < iv("__rj_high"))
      .drop(iv("__rj_bin")).drop(pt("__rj_bin"))
      .drop("__rj_low", "__rj_high", "__rj_pt")
  }

  /** Interval × interval overlap join: left `[lowL, highL)` meets right
    * `[lowR, highR)` (half-open overlap: `lowL < highR && lowR < highL`),
    * optionally also requiring equality on `keys` (columns present on
    * both sides under the same name).
    *
    * Unlike the point case, a pair can co-occur in SEVERAL bins, so the
    * join keeps a pair only in its canonical meet bin — the one holding
    * `max(lowL, lowR)` (the start of the overlap, guaranteed covered by
    * both replica sets) — which makes output rows unique without a
    * `distinct()` shuffle. Empty windows match nothing. Inner join;
    * right-side key columns are dropped from the output (they equal the
    * left's).
    */
  def intervalOverlap(left: DataFrame, lowL: Column, highL: Column,
      right: DataFrame, lowR: Column, highR: Column,
      binSeconds: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    def binned(df: DataFrame, low: Column, high: Column): DataFrame = df
      .withColumn("__rj_low", low.cast("long"))
      .withColumn("__rj_high", high.cast("long"))
      .filter(col("__rj_low") < col("__rj_high"))
      .withColumn("__rj_bin", explode(sequence(
        floor(col("__rj_low") / binSeconds).cast("long"),
        floor((col("__rj_high") - 1) / binSeconds).cast("long"))))
    val l = binned(left, lowL, highL)
    val r0 = binned(right, lowR, highR)
    // rename right internals + keys so the joined output is unambiguous
    val r = (Seq("__rj_low", "__rj_high", "__rj_bin") ++ keys)
      .foldLeft(r0)((df, c) => df.withColumnRenamed(c, s"${c}_r"))
    val overlap = col("__rj_low") < col("__rj_high_r") &&
      col("__rj_low_r") < col("__rj_high")
    val meetBin = col("__rj_bin") ===
      floor(greatest(col("__rj_low"), col("__rj_low_r")) / binSeconds).cast("long")
    val cond = keys.map(k => col(k) === col(s"${k}_r"))
      .foldLeft(col("__rj_bin") === col("__rj_bin_r") && overlap && meetBin)(_ && _)
    l.join(r, cond)
      .drop("__rj_low", "__rj_high", "__rj_bin",
        "__rj_low_r", "__rj_high_r", "__rj_bin_r")
      .drop(keys.map(k => s"${k}_r"): _*)
  }
}
