package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with WallBudget {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join returns exactly the unsalted result under heavy skew") {
    // 90% of fact rows share one hot key
    val big = (1L to 2000L).map(i => (if (i % 10 == 0) i % 7 else 0L, i)).toDF("k", "row_id")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val expected = big.join(small, "k")
    val salted = SkewJoin.saltedJoin(big, small, "k", "row_id", buckets = 8)
    assert(salted.count() === expected.count())
    assert(salted.select("k", "row_id", "v").except(expected.select("k", "row_id", "v")).count() === 0)
    assert(expected.select("k", "row_id", "v").except(salted.select("k", "row_id", "v")).count() === 0)
  }

  test("salted join spreads a hot key across buckets") {
    val big = (1L to 1000L).map(i => (0L, i)).toDF("k", "row_id")
    val spreadCount = big
      .withColumn("s", pmod(hash(col("k"), col("row_id")), lit(8)))
      .select("s").distinct().count()
    assert(spreadCount === 8) // every bucket used
  }

  test("two-phase count equals plain count per key") {
    val df = Tables.events(spark, TestSpark.Sf)
    val expected = df.groupBy("user_id").agg(count(lit(1)).as("n"))
    val salted = SkewJoin.saltedCount(df, "user_id", "event_id", 16)
    assert(salted.as[(Long, Long)].collect().toMap ===
      expected.as[(Long, Long)].collect().toMap)
  }
}
