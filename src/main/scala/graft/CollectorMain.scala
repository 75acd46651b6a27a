package graft

import graft.operators.CollectorConfig
import graft.sinks.ParquetDirSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Runnable collector — the library's answer to the reference's
  * per-sink mains (e.g. `kinesis/.../KinesisCollector.scala:29-65`,
  * which wires config → sinks → shared run loop): one process that
  * tails an envelope directory and runs the assembled dataflow until
  * terminated.
  *
  * Usage: `runMain graft.CollectorMain <envelopeDir> <goodDir> <badDir>
  * <checkpointDir> [triggerMs]`. Envelopes arrive as parquet files
  * dropped into `envelopeDir` — the file-source analog of the HTTP
  * listener (Kafka in prod via [[graft.sources.KafkaEnvelopeSource]];
  * the ingress tier itself is out of engine scope, SURVEY §7.1). Good
  * records land as thrift wire bytes + partition key, bad rows as
  * structured bad-row rows; swap the sinks for
  * [[graft.sinks.ClientSinks.goodSinkFor]] with SDK-backed client
  * factories in a real deployment.
  */
object CollectorMain {

  /** Wire the dataflow (separated from `main` so tests drive it with a
    * bounded trigger). The envelope schema comes from the files already
    * in the directory. */
  def wire(spark: SparkSession, envelopeDir: String, goodDir: String,
      badDir: String, checkpointDir: String, trigger: Trigger,
      cfg: CollectorConfig = CollectorConfig.testScale): CollectorApp.Running = {
    val schema = spark.read.parquet(envelopeDir).schema
    CollectorApp.start(
      spark,
      spark.readStream.schema(schema).parquet(envelopeDir),
      cfg,
      goodSink = CollectorApp.defaultGoodSink(goodDir, goodDir + "-fallback"),
      badSink = new ParquetDirSink(badDir, "bad"),
      checkpointDir = checkpointDir,
      trigger = trigger)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: CollectorMain <envelopeDir> <goodDir> <badDir> <checkpointDir> [triggerMs]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-collector")
    spark.sparkContext.setLogLevel("WARN")
    val trigger =
      if (args.length >= 5) Trigger.ProcessingTime(args(4).toLong)
      else Trigger.ProcessingTime(5000L) // the reference's buffer.timeLimit
    val running = wire(spark, args(0), args(1), args(2), args(3), trigger)
    running.query.awaitTermination()
  }
}
