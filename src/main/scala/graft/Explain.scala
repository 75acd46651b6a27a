package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: print the formatted physical plan of each named query (all
  * queries when no names given). Used to verify the scale posture —
  * broadcasts on dim joins, pushed filters, whole-stage codegen spans —
  * not just correctness. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.build("local[4]", 4, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
