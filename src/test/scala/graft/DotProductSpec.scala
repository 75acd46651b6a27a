package graft

import graft.functions.DotProduct
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DotProductSpec extends AnyFunSuite with WallBudget {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.0, 0.0), Seq(1.0, 1.0)),
    (Seq(-1.5, 2.0), Seq(2.0, -1.0)),
  ).toDF("a", "b")

  test("native expression matches the HOF formulation exactly") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(DotProduct.dot(col("a"), col("b")).as("native"), hof.as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n === h) }
    assert(rows.map(_._1).toSeq === Seq(32.0, 0.0, -5.0))
  }

  test("null array yields null; mismatched lengths use min length") {
    val d2 = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq(1.0, 2.0, 9.0)), Some(Seq(3.0, 4.0))),
    ).toDF("a", "b")
    val out = d2.select(DotProduct.dot(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === 11.0)
  }

  test("registered as SQL function via SparkSessionExtensions") {
    df.createOrReplaceTempView("dp")
    val out = spark.sql("SELECT graft_dot(a, b) AS d FROM dp ORDER BY d").as[Double].collect()
    assert(out === Array(-5.0, 0.0, 32.0))
  }

  test("graft_hyperplane_codes registered as SQL function; matches Column API") {
    Seq((1L, Seq(1.0, -2.0, 3.0, 4.0))).toDF("id", "v").createOrReplaceTempView("hp")
    val viaSql = spark.sql("SELECT graft_hyperplane_codes(v, 2, 8) AS c FROM hp")
      .as[Seq[Long]].head()
    val viaCol = spark.table("hp")
      .select(graft.functions.HyperplaneCodes.codes(col("v"), 2, 8).as("c"))
      .as[Seq[Long]].head()
    assert(viaSql === viaCol)
    assert(viaSql.length === 2)
  }

  test("type check rejects non-double arrays") {
    val bad = Seq((Seq("x"), Seq("y"))).toDF("a", "b")
    assertThrows[org.apache.spark.sql.AnalysisException](
      bad.select(DotProduct.dot(col("a"), col("b"))).collect())
  }
}
