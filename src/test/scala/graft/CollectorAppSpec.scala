package graft

import graft.operators.{CollectorConfig, CollectorPipeline, ThriftPayload}
import graft.sinks.ParquetDirSink
import graft.sources.EventEnvelopeAdapter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end: envelope stream → assembled dataflow → wire-format good
  * output + bad rows, with health green afterwards. */
class CollectorAppSpec extends AnyFunSuite with WallBudget {
  private lazy val spark = TestSpark.spark

  test("assembled collector app processes the full envelope stream") {
    val cfg = CollectorConfig.testScale
    val envBatch = EventEnvelopeAdapter.envelopes(spark, TestSpark.Sf)
    val srcDir = Files.createTempDirectory("app-src").toString
    envBatch.write.mode("overwrite").parquet(srcDir)

    val goodDir = Files.createTempDirectory("app-good").toString
    val fbDir = Files.createTempDirectory("app-fb").toString
    val badDir = Files.createTempDirectory("app-bad").toString
    val ckpt = Files.createTempDirectory("app-ckpt").toString

    val running = CollectorApp.start(
      spark,
      spark.readStream.schema(envBatch.schema).parquet(srcDir),
      cfg,
      goodSink = CollectorApp.defaultGoodSink(goodDir, fbDir),
      badSink = new ParquetDirSink(badDir, "bad"),
      checkpointDir = ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    running.query.awaitTermination(120000)
    Thread.sleep(500) // listener delivery

    val good = spark.read.parquet(goodDir)
    // good wire = payloads minus the size-gated (reference `SplitBatch
    // .scala:87`: only events whose serialized size fits are sunk whole)
    val payloadCount = CollectorPipeline.payloads(envBatch, cfg).count()
    val oversized = graft.operators.ThriftPayload
      .sizeViolations(CollectorPipeline.payloads(envBatch, cfg), cfg.maxBytes).count()
    assert(good.count() === payloadCount - oversized)
    assert(oversized > 0) // the gate is exercised at testScale
    // no record on the good wire exceeds the cap — the sink contract
    assert(good.filter(org.apache.spark.sql.functions.octet_length(
      org.apache.spark.sql.functions.col("thrift")) >= cfg.maxBytes).count() === 0)
    // wire rows decode back to the expected thrift record
    val sample = good.limit(1).collect().head
    val decoded = ThriftPayload.deserialize(sample.getAs[Array[Byte]]("thrift"))
    assert(decoded.collector === cfg.collectorName)
    assert(decoded.encoding === "UTF-8")

    val bad = spark.read.parquet(badDir)
    assert(bad.count() === CollectorPipeline.badRows(envBatch, cfg).count())
    assert(bad.select("bad_row_type").distinct().count() === 2)

    assert(running.monitor.healthy)
    assert(running.monitor.snapshot.contains("graft-collector"))
  }

  test("CollectorMain wiring runs the dataflow from a directory of envelope files") {
    val envBatch = EventEnvelopeAdapter.envelopes(spark, TestSpark.Sf)
    val srcDir = Files.createTempDirectory("main-src").toString
    envBatch.write.mode("overwrite").parquet(srcDir)
    val goodDir = Files.createTempDirectory("main-good").toString
    val badDir = Files.createTempDirectory("main-bad").toString
    val ckpt = Files.createTempDirectory("main-ckpt").toString
    val running = CollectorMain.wire(spark, srcDir, goodDir, badDir, ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    running.query.awaitTermination(120000)
    val cfg = CollectorConfig.testScale
    val payloads = CollectorPipeline.payloads(envBatch, cfg)
    val expectedGood = payloads.count() -
      graft.operators.ThriftPayload.sizeViolations(payloads, cfg.maxBytes).count()
    assert(spark.read.parquet(goodDir).count() === expectedGood)
    assert(spark.read.parquet(badDir).count() ===
      CollectorPipeline.badRows(envBatch, cfg).count())
  }

  test("app wired to the kinesis client sink delivers every good wire record") {
    // the production wiring: goodSinkFor flag selects the client-backed
    // sink; the mock wire client receives exactly the size-gated good
    // records with their partition keys
    import graft.sinks.ClientSinks
    MockClients.reset()
    val cfg = CollectorConfig.testScale
    val envBatch = EventEnvelopeAdapter.envelopes(spark, TestSpark.Sf)
    val srcDir = Files.createTempDirectory("appk-src").toString
    envBatch.write.mode("overwrite").parquet(srcDir)
    val badDir = Files.createTempDirectory("appk-bad").toString
    val ckpt = Files.createTempDirectory("appk-ckpt").toString
    val running = CollectorApp.start(
      spark,
      spark.readStream.schema(envBatch.schema).parquet(srcDir),
      cfg,
      goodSink = ClientSinks.goodSinkFor("kinesis", badDir,
        kinesis = Some(("events", () => MockClients.kinesis(0)))),
      badSink = new ParquetDirSink(badDir, "bad"),
      checkpointDir = ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    running.query.awaitTermination(120000)
    val payloads = CollectorPipeline.payloads(envBatch, cfg)
    val expected = payloads.count() -
      graft.operators.ThriftPayload.sizeViolations(payloads, cfg.maxBytes).count()
    val stored = MockClients.kinesisStored
    assert(stored.size.toLong === expected)
    // every stored record decodes and carries its row's partition key
    val decoded = ThriftPayload.deserialize(stored.head.payload)
    assert(decoded.collector === cfg.collectorName)
    assert(stored.forall(_.key.nonEmpty))
  }
}
