package graft

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions.col

/** r18b same-JVM A/B probe (guide §1): stream_collector and stream_lake
  * bodies run warm, alternating the overlapped vs sequential good/bad
  * sink writes via the `graft.seq` system property — the only protocol
  * that survives this sandbox's machine-window swings. Replicates the
  * bench legs exactly (same source layout, same maxFilesPerTrigger,
  * fresh checkpoint/output dirs per pass). */
object ProbeCollectorAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-probe-collector")
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = graft.operators.CollectorConfig.testScale
    val base = java.nio.file.Files.createTempDirectory("probe-coll").toString
    graft.sources.EventEnvelopeAdapter.envelopes(spark, sfDir)
      .write.mode("overwrite").parquet(s"$base/env-src")
    def fileStream(src: String) = {
      val schema = spark.read.parquet(src).schema
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8").parquet(src)
    }
    var n = 0
    def pass(tag: String, lake: Boolean): Double = {
      n += 1
      val d = s"$base/p$n"
      val t0 = System.nanoTime()
      val q =
        if (lake) graft.streaming.StreamingCollector.startToLake(
          fileStream(s"$base/env-src"), cfg, s"$d/good", s"$d/bad", s"$d/ckpt",
          trigger = Trigger.AvailableNow())
        else graft.streaming.StreamingCollector.start(
          fileStream(s"$base/env-src"), cfg, s"$d/good", s"$d/bad", s"$d/ckpt",
          trigger = Trigger.AvailableNow())
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      require(spark.read.parquet(s"$d/good").count() > 0)
      println(f"$tag: $dt%.2fs")
      dt
    }
    def setSeq(on: Boolean): Unit =
      if (on) sys.props("graft.seq") = "1" else sys.props.remove("graft.seq")
    for (lake <- Seq(false, true)) {
      val name = if (lake) "lake" else "flat"
      setSeq(true); pass(s"$name warmup (seq)", lake)
      val reps = 3
      val seq = Seq.fill(reps) { setSeq(true); pass(s"$name seq", lake) }
      val ovl = Seq.fill(reps) { setSeq(false); pass(s"$name ovl", lake) }
      val seq2 = Seq.fill(reps) { setSeq(true); pass(s"$name seq2", lake) }
      println(f"== $name: seq best ${(seq ++ seq2).min}%.2f  ovl best ${ovl.min}%.2f " +
        f"(seq med ${(seq ++ seq2).sorted.apply(reps)}%.2f ovl med ${ovl.sorted.apply(reps / 2)}%.2f)")
    }
    spark.stop()
  }
}
