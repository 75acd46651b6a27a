package graft

import org.apache.spark.sql.SparkSession

/** Headline bench: one JSON line with per-query wall seconds over
  * SPARK_GRAFT_SF_DIR. A full untimed warm-up pass precedes the timed
  * pass so JIT/classloading cost doesn't land on whichever query happens
  * to run first — the timed numbers measure the plans, not the JVM. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm-up: JIT, codegen cache, parquet footer cache
    queries.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    // a query that throws is recorded as -1, never as a (fast) timing —
    // otherwise a broken query reads as a performance win
    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
