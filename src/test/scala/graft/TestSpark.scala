package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (SparkContext is per-JVM; suites
  * run in the forked test JVM sequentially). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.chunkBase64String.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN") // see GraftSession
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  val Sf = "/root/testdata/sf0.001"
}
