package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (Structured Streaming's native two-sided
  * join): left rows match right rows with the same key whose event time
  * falls in `[left.ts - beforeSec, left.ts + afterSec]`.
  *
  * State stays bounded because BOTH sides are watermarked and the join
  * condition bounds event-time distance in both directions: Spark can
  * prove a buffered left row is unmatchable once the right watermark
  * passes `left.ts + afterSec` (and vice versa) and evict it. Without the
  * time bound, a stream-stream join must buffer both streams forever —
  * the difference between a 100 TB/day pipeline running in fixed memory
  * and one that OOMs on day two.
  *
  * The `watermark` delay is the out-of-orderness budget: events arriving
  * later than it are dropped, so production sets it to the source's real
  * tail lateness (the spec uses a span-sized value to make parity with
  * the batch join exact).
  */
object StreamJoin {

  /** Both inputs need an event-time column `ts` and the join key `key`;
    * right-side columns are suffixed `_r` in the output. Inner join. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      beforeSec: Long, afterSec: Long, watermark: String): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.toDF(right.columns.map(c => s"${c}_r"): _*)
      .withWatermark("ts_r", watermark)
    l.join(r,
      col(key) === col(s"${key}_r") &&
        col("ts_r") >= col("ts") - expr(s"INTERVAL $beforeSec SECONDS") &&
        col("ts_r") <= col("ts") + expr(s"INTERVAL $afterSec SECONDS"))
  }
}
