package graft.streaming

import graft.operators.{CollectorConfig, CollectorPipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The collector pipeline under Structured Streaming.
  *
  * The batch transforms ([[CollectorPipeline]]) are pure projections and
  * filters, so the *same* functions run unchanged on a streaming
  * DataFrame — one definition, two execution modes. Micro-batching with
  * `Trigger.ProcessingTime` is the engine analog of the reference's
  * byte/record/time buffer flush (`KinesisSink.scala:87-142`): the time
  * limit maps to the trigger interval, and checkpointing upgrades the
  * reference's lossy at-least-once (unflushed buffers die with the
  * process) to replayable exactly-once-per-sink-write (SURVEY §7.4.4).
  *
  * Good/bad dual routing (reference `CollectorSinks`, `model.scala:37`)
  * happens in one `foreachBatch`: the batch is cached once, both legs
  * write from it, so the source is read once per micro-batch.
  */
object StreamingCollector {

  /** Default trigger = the reference's buffer.timeLimit (5000 ms). */
  val DefaultTrigger: Trigger = Trigger.ProcessingTime("5 seconds")

  def start(
      envelopes: DataFrame,
      cfg: CollectorConfig,
      goodDir: String,
      badDir: String,
      checkpointDir: String,
      trigger: Trigger = DefaultTrigger,
      badRowsSelfDescribing: Boolean = false): StreamingQuery =
    envelopes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          CollectorPipeline.payloads(batch, cfg)
            .write.mode("append").parquet(goodDir)
          // self-describing mode writes what the reference's bad stream
          // actually carries — `badRow.compact` iglu envelopes — instead
          // of the flat diagnostic summary
          (if (badRowsSelfDescribing) CollectorPipeline.badRowsJson(batch, cfg)
           else CollectorPipeline.badRows(batch, cfg))
            .write.mode("append").parquet(badDir)
        } finally batch.unpersist()
        ()
      }
      .start()
}
