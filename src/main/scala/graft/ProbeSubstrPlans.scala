package graft.streaming

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** r18 plan snapshot helper for the SubstrIndex serve path (no entry in
  * `SparkEntry.queries`, so `Explain` can't reach it): initializes a
  * SubstrIndex over sf0.001 and prints the formatted plans of the
  * store-probe surface — the join(s) between one batch's sliding
  * windows and the bucketed fingerprint store, exactly as the serve
  * builds them pre-pin. Used to produce
  * `plans/r18/stream_substr_probe_{before,after}.txt`. */
object ProbeSubstrPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.build("local[4]", 4, "graft-probe-substr-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.SubstrIndex
    val dir = java.nio.file.Files.createTempDirectory("probe-substr").toString
    val cfg = SubstrIndex.SubstrConfig(s"$dir/substr-idx")
    val docs = Tables.documents(spark, sfDir)
    SubstrIndex.init(spark, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0), cfg)
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select("doc_id", "text")
    SubstrIndex.printProbePlans(spark, batch, 1L, cfg)
    spark.stop()
  }
}
