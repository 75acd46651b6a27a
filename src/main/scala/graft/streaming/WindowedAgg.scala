package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations under watermark — the streaming analog
  * of the batch `q_hourly_window`/`q_distinct` queries. Late rows beyond
  * the watermark are dropped (declared semantics); state per open window
  * is bounded by watermark advancement.
  */
object WindowedAgg {

  /** Tumbling hourly counts/sums per event_type. Append-mode capable
    * (watermark closes windows). */
  def hourly(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding 1h window every 15 min — overlapping-window shape. */
  def sliding(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"), col("n"))

  /** Built-in session_window variant (gap-based grouping without custom
    * state) — complements [[Sessionize]] which adds per-user session
    * numbering that session_window cannot express. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"), col("session_value"))
}
