package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup: drop re-deliveries of the same event id while
  * the watermark allows them to reappear (at-least-once sources replay).
  * `dropDuplicatesWithinWatermark` keeps state only for the watermark
  * horizon — bounded, unlike global dropDuplicates which grows forever.
  * The batch analog is Dedup.exactGroups; this is the ingest-side leg.
  */
object StreamingDedup {
  def dedup(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")
}
