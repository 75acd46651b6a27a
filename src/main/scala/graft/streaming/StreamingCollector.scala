package graft.streaming

import graft.operators.{CollectorConfig, CollectorPipeline, ThriftPayload}
import graft.sinks.EventSink
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
  *
  * State store at scale: the stateful operators (Sessionize, StreamJoin,
  * StreamingDedup) default to Spark's heap-backed store — fine locally,
  * but a 100 TB deployment should set
  * `spark.sql.streaming.stateStore.providerClass` to
  * `RocksDBStateStoreProvider` so state lives off-heap with incremental
  * checkpointing (measured at parity locally — BASELINE.md r7 A/B).
  */
object StreamingCollector {

  /** Default trigger = the reference's buffer.timeLimit (5000 ms). */
  val DefaultTrigger: Trigger = Trigger.ProcessingTime("5 seconds")

  /** r18b (guide §2.6 "overlap independent jobs"): the good and bad legs
    * of one micro-batch are independent jobs over the same persisted
    * batch — writing them sequentially left the cluster idle through
    * each leg's tail. Both legs are AWAITED before the batch returns to
    * the engine, so the checkpoint commit still happens-after both sink
    * writes (the exactly-once-per-sink-write replay contract is
    * untouched; a failure in either leg fails the batch exactly as
    * before). Cache-block locking makes the concurrent first
    * materialization of the persisted batch compute each partition
    * once. */
  private def overlap(legs: (() => Unit)*): Unit =
    // A/B lever (same-JVM measurement protocol): -Dgraft.seq=1 runs the
    // legs sequentially — the pre-r18b shape — so the overlap's effect
    // can be isolated inside one warm JVM.
    if (sys.props.get("graft.seq").contains("1")) legs.foreach(_())
    else {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val fs = legs.map(l => Future(l()))
      fs.foreach(f => Await.ready(f, Duration.Inf))
      fs.foreach(f => Await.result(f, Duration.Inf))
    }

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
        try overlap(
          () => CollectorPipeline.payloads(batch, cfg)
            .write.mode("append").parquet(goodDir),
          // self-describing mode writes what the reference's bad stream
          // actually carries — `badRow.compact` iglu envelopes — instead
          // of the flat diagnostic summary
          () => (if (badRowsSelfDescribing) CollectorPipeline.badRowsJson(batch, cfg)
                 else CollectorPipeline.badRows(batch, cfg))
            .write.mode("append").parquet(badDir))
        finally batch.unpersist()
        ()
      }
      .start()

  /** Streaming ingest straight into the date-partitioned lake: good
    * payloads land under `event_date=YYYY-MM-DD/` directories (UTC day of
    * the event's own timestamp), so downstream readers get listing-time
    * partition pruning and runtime DPP (LakeSpec) over data that is
    * seconds old — the stream→lake→pruned-read path a 100 TB deployment
    * actually runs. Dynamic per-batch partitions append disjoint files;
    * replayed micro-batches re-append idempotently at the sink level via
    * checkpoint replay semantics (same guarantees as [[start]]). */
  def startToLake(
      envelopes: DataFrame,
      cfg: CollectorConfig,
      lakeDir: String,
      badDir: String,
      checkpointDir: String,
      trigger: Trigger = DefaultTrigger,
      badRowsSelfDescribing: Boolean = false): StreamingQuery =
    envelopes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try overlap(
          () => {
            import org.apache.spark.sql.functions.{col, date_format, timestamp_millis}
            CollectorPipeline.payloads(batch, cfg)
              .withColumn("event_date",
                date_format(timestamp_millis(col("timestamp_ms")), "yyyy-MM-dd"))
              // R10: ONE exchange on the partition key before the
              // partitioned write — without it every task writes a file
              // per day it happens to see (tasks × days × micro-batches
              // small files, the classic lake-ingest file explosion); with
              // it each day's rows land in few tasks and the listing stays
              // proportional to days, not task fan-out. The standard
              // dynamic-partition-write discipline at 100 TB.
              .repartition(col("event_date"))
              .write.mode("append").partitionBy("event_date").parquet(lakeDir)
          },
          () => (if (badRowsSelfDescribing) CollectorPipeline.badRowsJson(batch, cfg)
                 else CollectorPipeline.badRows(batch, cfg))
            .write.mode("append").parquet(badDir))
        finally batch.unpersist()
        ()
      }
      .start()

  /** The PRODUCTION wiring: config-selected [[EventSink]]s instead of raw
    * parquet paths — the engine analog of the reference's
    * `CollectorSinks(good, bad)` pair (`model.scala:37`). The good leg
    * carries thrift wire records (`thrift` + `partition_key`, what every
    * reference sink ships — `Sink.scala:34`); the bad leg carries the
    * self-describing iglu envelopes. A sink throw fails the micro-batch,
    * which replays from the checkpoint — retry/backoff/failover live
    * INSIDE the sinks ([[graft.sinks.ClientSinks]]). Pair with
    * [[graft.sinks.ClientSinks.sinkFromSettings]] to go from a parsed
    * HOCON/JSON config straight to a running collector. */
  def startWithSinks(
      envelopes: DataFrame,
      cfg: CollectorConfig,
      goodSink: EventSink,
      badSink: EventSink,
      checkpointDir: String,
      trigger: Trigger = DefaultTrigger): StreamingQuery =
    envelopes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.persist()
        try overlap(
          () => goodSink.write(
            ThriftPayload.encode(CollectorPipeline.payloads(batch, cfg)).toDF(), id),
          () => badSink.write(CollectorPipeline.badRowsJson(batch, cfg), id))
        finally batch.unpersist()
        ()
      }
      .start()
}
