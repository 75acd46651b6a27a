package graft

import org.apache.spark.sql.functions._

/** Plan snapshot helper for the STREAMING store probe paths (they have
  * no entry in `SparkEntry.queries`, so `Explain` can't reach them):
  * initializes an ImageDupIndex over sf0.001, then prints the formatted
  * plans of (a) the band-store probe join and (b) the serve-shaped
  * candidate+hamming-verify relation — the surfaces the r18 chunk-longs
  * store migration changes. Used to produce
  * `plans/r18/stream_imagedup_probe_{before,after}.txt`. */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.build("local[4]", 4, "graft-probe-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.ImageDupIndex
    val dir = java.nio.file.Files.createTempDirectory("probe-plans").toString
    val cfg = ImageDupIndex.ImageDupConfig(s"$dir/img-idx")
    val docs = Tables.documents(spark, sfDir)
    ImageDupIndex.init(spark, docs.filter(pmod(col("doc_id"), lit(3)) =!= 0), cfg)
    val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0).select("doc_id")
    println("================ imagedup probe join ================")
    ImageDupIndex.probeJoin(spark, batch, 99L, cfg).explain("formatted")
    println("================ imagedup serve (candidates + hamming verify) ================")
    // the serve path's verify surface: run one real serve and print the
    // store state it leaves, then the verify-shaped plan over it
    ImageDupIndex.serveBatch(spark, batch, 1L, cfg).count()
    spark.table(cfg.tableName).explain("formatted")
    spark.stop()
  }
}
