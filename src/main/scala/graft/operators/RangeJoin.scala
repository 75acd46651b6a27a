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
}
