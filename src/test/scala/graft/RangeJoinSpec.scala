package graft

import graft.operators.RangeJoin
import graft.queries.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with WallBudget {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def intervals = Seq(
    // (id, low, high) — epoch seconds
    (1L, 100L, 200L),   // one bin at width 100
    (2L, 150L, 450L),   // spans 4 bins at width 100
    (3L, 300L, 300L),   // empty window: matches nothing
    (4L, 0L, 1L),       // single-second window
    (5L, 95L, 105L)     // straddles a bin boundary
  ).toDF("iv_id", "lo", "hi")

  private def points = Seq(
    (10L, 0L), (11L, 99L), (12L, 100L), (13L, 150L), (14L, 199L),
    (15L, 200L), (16L, 300L), (17L, 449L), (18L, 450L), (19L, 104L)
  ).toDF("pt_id", "t")

  test("binned point-in-interval join equals the naive theta join") {
    val binned = RangeJoin
      .pointInInterval(intervals, col("lo"), col("hi"), points, col("t"), binSeconds = 100)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    val naive = intervals.crossJoin(points)
      .filter(col("t") >= col("lo") && col("t") < col("hi"))
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(binned === naive)
    // each matching pair meets exactly once (no bin-replication dupes)
    val withDupes = RangeJoin
      .pointInInterval(intervals, col("lo"), col("hi"), points, col("t"), binSeconds = 100)
      .groupBy("iv_id", "pt_id").count().filter(col("count") > 1).count()
    assert(withDupes === 0)
    // spot semantics: half-open [lo, hi), empty window excluded
    assert(naive.contains((1L, 12L)) && !naive.contains((1L, 15L))) // hi exclusive
    assert(!naive.exists(_._1 == 3L))                               // empty window
    assert(naive.contains((2L, 17L)) && !naive.contains((2L, 18L))) // 4-bin span
    assert(naive.contains((5L, 11L)) && naive.contains((5L, 19L)))  // boundary straddle
  }

  test("plan is a shuffled equi-join on the bin key, not a nested loop") {
    val plan = RangeJoin
      .pointInInterval(intervals, col("lo"), col("hi"), points, col("t"), binSeconds = 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("interval-overlap join equals the naive theta join, no duplicate pairs") {
    // reuse the interval fixtures on both sides, keyed and unkeyed
    val l = intervals.toDF("l_id", "l_lo", "l_hi")
    val r = intervals.toDF("r_id", "r_lo", "r_hi")
    for (bin <- Seq(50L, 100L, 1000L)) {
      val got = RangeJoin.intervalOverlap(
          l, col("l_lo"), col("l_hi"), r, col("r_lo"), col("r_hi"), binSeconds = bin)
        .select("l_id", "r_id").as[(Long, Long)].collect().toList
      // lowL < highR && lowR < highL alone would pass EMPTY intervals
      // (e.g. [300,300) "overlaps" anything containing 300); the operator
      // excludes them, so the reference predicate must too
      val naive = l.crossJoin(r)
        .filter(col("l_lo") < col("l_hi") && col("r_lo") < col("r_hi") &&
          col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(got.toSet === naive, s"bin=$bin")
      assert(got.size === naive.size, s"bin=$bin emitted duplicates") // meet-bin dedup
      assert(!naive.exists(p => p._1 == 3L || p._2 == 3L)) // empty window
      assert(naive.contains((1L, 2L)) && naive.contains((2L, 1L)))
      assert(!naive.contains((1L, 4L))) // disjoint windows
    }
  }

  test("q_range_join runs on real tables and matches the in-Spark theta join") {
    val d = TestSpark.Sf
    val got = Relational.qRangeJoin(spark, d)
      .as[(Long, Long, Long)].collect().map { case (k, n, q) => k -> (n, q) }.toMap
    assert(got.nonEmpty)
    val ord = Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT")
    val li = Tables.lineitem(spark, d).filter(col("l_returnflag") === "R")
    val naive = ord.join(li,
        li("l_shipdate").cast("timestamp").cast("long")
          >= ord("o_orderdate").cast("timestamp").cast("long") &&
          li("l_shipdate").cast("timestamp").cast("long")
            < ord("o_orderdate").cast("timestamp").cast("long") + 2L * 86400)
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").cast("long").as("q"))
      .as[(Long, Long, Long)].collect().map { case (k, n, q) => k -> (n, q) }.toMap
    assert(got === naive)
  }
}
