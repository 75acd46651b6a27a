package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan lint over the whole query surface: catches accidental plan
  * regressions (a cartesian product sneaking into a join rewrite, a
  * broadcast dropped by a refactor) the value-level oracle can't see. */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Queries whose *intended* plan is a broadcast nested-loop / cross
    * join: brute-force top-k (query side broadcast against the corpus),
    * IVF cell assignment (10-row centroid table), and the tf-idf corpus
    * size (1-row broadcast scalar crossJoin). */
  private val AllowedNonEqui = Set("s_brute_topk", "s_ivf_topk", "t_top_terms")

  test("no query plans a CartesianProduct; non-equi broadcasts only where intended") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, TestSpark.Sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      if (!AllowedNonEqui(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name unexpectedly plans a BroadcastNestedLoopJoin:\n$plan")
      }
    }
  }

  test("every dim join in the headline relational queries broadcasts") {
    for (q <- Seq("q3_join", "q5_join", "q_rollup")) {
      val plan = SparkEntry.queries(q)(spark, TestSpark.Sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$plan")
    }
  }

  test("driver contract: entry returns rows; every query name has unique columns") {
    assert(SparkEntry.entry(spark).count() > 0)
    // every oracle key corresponds to a registered query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("registerAll exposes the full catalog to spark.sql") {
    Tables.registerAll(spark, TestSpark.Sf)
    val n = spark.sql(
      "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT count(*) FROM documents").head().getLong(0) === 500)
  }
}
