package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** r18 measurement probe (guide §1): attribute stream_crawl's wall to
  * its per-micro-batch Spark jobs. Replicates the bench leg exactly
  * (same shard layout, same maxFilesPerTrigger, same serveBatch) and
  * prints one line per Spark job — start offset, duration, description
  * — so the serial fixed-cost structure is visible without the UI. */
object ProbeCrawlJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-probe-crawl")
    spark.sparkContext.setLogLevel("ERROR")
    // A/B lever: SPARK_GRAFT_PROBE_AQE=0 disables adaptive execution for
    // the serve loop, isolating AQE's per-stage re-planning overhead
    sys.env.get("SPARK_GRAFT_PROBE_AQE").foreach { v =>
      spark.conf.set("spark.sql.adaptive.enabled", v != "0")
    }
    import graft.streaming.CrawlPipeline

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobStart.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobStart.get(j.jobId)).foreach { case (s, desc) =>
          lines.add(f"job ${j.jobId}%4d  +${(s - t0) / 1e9}%7.3fs  ${(System.nanoTime() - s) / 1e9}%7.3fs  $desc")
        }
      }
    })

    // two passes, fresh state dirs each — pass 1 is the untimed JIT/codegen
    // warmup (the bench solo protocol), pass 2 is the reported one
    def onePass(tag: String): Double = {
      val dirRoot = java.nio.file.Files.createTempDirectory(s"probe-crawl-$tag").toString
      def dir(n: String) = s"$dirRoot/$n"
      val cpCfg = CrawlPipeline.CrawlConfig(dir("cp-idx"))
      val docs = Tables.documents(spark, sfDir)
      CrawlPipeline.init(spark, docs.limit(0), cpCfg)
      CrawlPipeline.writeWarcShards(docs.repartition(8), dir("cp-src"))
      val cpRules = CrawlPipeline.pinnedRules(spark)

      t0 = System.nanoTime()
      lines.clear()
      val q = spark.readStream.format("binaryFile")
        .schema(CrawlPipeline.BinaryFileSchema)
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", "2")
        .load(dir("cp-src"))
        .writeStream
        .option("checkpointLocation", dir("ckpt-cp"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val bs = System.nanoTime()
          CrawlPipeline.serveBatch(spark, batch, id, cpCfg, cpRules)
            .write.mode("append").parquet(dir("cp-verdicts"))
          lines.add(f"== batch $id done: ${(System.nanoTime() - bs) / 1e9}%.3fs (wall +${(System.nanoTime() - t0) / 1e9}%.3fs)")
          ()
        }
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    onePass("warm")
    val total = onePass("timed")
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    lines.asScala.toSeq.foreach(println)
    println(f"TOTAL timed body: $total%.3fs")
    spark.stop()
  }
}
