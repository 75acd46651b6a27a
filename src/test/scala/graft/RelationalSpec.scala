package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite with WallBudget {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct stays within 5% of exact per event_type") {
    // the query's own claim column must hold on every group...
    val rows = Relational.qApproxDistinct(spark, TestSpark.Sf)
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, n, ok) => assert(ok, s"$k: HLL drifted past 5% (exact=$n)") }
    // ...and the raw estimate (not exposed in the oracle-checked output)
    // independently lands inside the bound
    val approx = Tables.events(spark, TestSpark.Sf)
      .groupBy("event_type").agg(approx_count_distinct(col("user_id"), 0.02).as("a"))
      .as[(String, Long)].collect().toMap
    val exact = rows.map(r => r._1 -> r._2).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("bloom pre-filter: no false negatives; CMS never underestimates") {
    val bloom = Relational.qBloomFilter(spark, TestSpark.Sf)
      .as[(Long, Boolean, Boolean)].collect()
    assert(bloom.nonEmpty)
    // the bloom guarantee: every member is a candidate
    bloom.foreach { case (k, cand, member) =>
      assert(!member || cand, s"false negative for member $k")
    }
    assert(bloom.exists(r => r._2 && r._3)) // true positives exist
    val cms = Relational.qCmsFreq(spark, TestSpark.Sf)
      .as[(String, Long, Long, Boolean)].collect()
    assert(cms.nonEmpty)
    cms.foreach { case (k, est, exact, ok) =>
      assert(ok && est >= exact, s"CMS underestimated $k: $est < $exact")
    }
  }

  test("KMV sketch estimate lands within MinCount error bounds of exact") {
    // k=8 => relative std error ~ 1/sqrt(8) ~ 35%; assert a loose 60%
    // band (the point of the query is deterministic cross-engine parity,
    // not tight accuracy — the exact count rides alongside)
    val rows = Relational.qKmvDistinct(spark, TestSpark.Sf)
      .select("event_type", "n_exact", "est_distinct")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, exact, est) =>
      assert(est > 0, s"$t estimate non-positive")
      assert(math.abs(est - exact) <= 0.6 * exact,
        s"$t estimate $est vs exact $exact — outside the MinCount band")
    }
  }

  test("rank analytics: dense deciles, pct_rank/cume in [0,1], monotone with price") {
    val rows = Relational.qAnalytics(spark, TestSpark.Sf)
      .select("o_orderpriority", "decile", "pct_rank", "cume")
      .as[(String, Int, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, d, p, c) => d >= 1 && d <= 10 && p >= 0 && p <= 1 && c > 0 && c <= 1 })
    // every priority partition uses the full decile range
    val byPrio = rows.groupBy(_._1)
    assert(byPrio.values.forall(_.map(_._2).toSet === (1 to 10).toSet))
  }

  test("as-of join picks the latest order at or before each event") {
    // verify a sampled user against a direct computation
    val asof = Relational.qAsofJoin(spark, TestSpark.Sf)
    val events = Tables.events(spark, TestSpark.Sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables.orders(spark, TestSpark.Sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("timestamp").as("ots"))
    val naive = events.join(orders, events("user_id") === orders("o_custkey") &&
        orders("ots") <= events("ts"), "left")
      .groupBy("event_id")
      .agg(max(struct(col("ots"), col("o_orderkey"))).as("best"))
      .select(col("event_id"), col("best.o_orderkey").as("expected"))
    val joined = asof.join(naive, Seq("event_id"), "left")
    assert(joined.filter(
      coalesce(col("asof_orderkey"), lit(-1L)) =!= coalesce(col("expected"), lit(-1L)))
      .count() === 0)
  }
}
