package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for the headline queries to a snapshot
  * file (docs/PLANS_r{N}.txt) so the committed plan audit always matches
  * the shipped code — regenerate each round:
  *
  *   sbt "runMain graft.PlanAudit docs/PLANS_r3.txt /root/testdata/sf0.01"
  *
  * Headline = every query with a bench baseline ([[Bench.baselineSec]]):
  * exactly the set whose physical shape the 2x rule guards.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("docs/PLANS.txt")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-plans")
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.filter(Bench.baselineSec.contains).toSeq.sorted
    val sb = new StringBuilder
    names.foreach { name =>
      sb.append(s"================ $name ================\n")
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      sb.append(plan).append('\n')
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote ${names.size} plans to $out")
    spark.stop()
  }
}
