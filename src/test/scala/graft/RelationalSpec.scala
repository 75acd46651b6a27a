package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct stays within 5% of exact per event_type") {
    val approx = Relational.qApproxDistinct(spark, TestSpark.Sf)
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, TestSpark.Sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx=${approx(k)} exact=$n")
    }
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
