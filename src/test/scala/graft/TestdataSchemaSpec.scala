package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift smoke test: pins the ENGINE-FACING schema of every
  * driver-provided table (TESTDATA.md), as loaded through `Tables`.
  *
  * The testdata is an external contract the driver regenerates between
  * rounds — r7 shipped `events.ts` re-encoded from int64-nanos to
  * timestamp[us] and 49 tests failed with the same analysis cascade.
  * This spec exists so the NEXT drift fails in exactly one obvious
  * place. (Reference analog: `ConfigSpec`'s defaults matrix pins the
  * reference's other external contract, the config file format —
  * core/src/test/scala/.../ConfigSpec.scala.)
  *
  * Deliberately pins logical Spark types post-loader, not parquet
  * physical encodings: `events.ts` must arrive as TimestampType no
  * matter which generation of testdata is on disk.
  */
class TestdataSchemaSpec extends AnyFunSuite with WallBudget {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def fields(name: String): Map[String, DataType] = {
    val loader = Tables.names.zip(Seq[
      (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      Tables.region, Tables.nation, Tables.customer, Tables.supplier,
      Tables.part, Tables.orders, Tables.lineitem, Tables.events,
      Tables.documents, Tables.embeddings)).toMap.apply(name)
    loader(spark, sf).schema.fields.map(f => f.name -> f.dataType).toMap
  }

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for (t <- Tables.names) {
    test(s"$t loads with the engine-facing schema") {
      val got = fields(t)
      val want = expected(t)
      // exact column set — a driver-added column is drift worth seeing too
      assert(got.keySet === want.keySet,
        s"column drift in $t: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
      for ((name, dt) <- want) {
        // orders/lineitem are read raw, so their timestamps may arrive NTZ
        // depending on the parquet writer's isAdjustedToUTC flag — the
        // engine's date arithmetic tolerates either. `events` is loaded
        // through its normalizing loader, which MUST deliver TimestampType.
        val gotDt = got(name) match {
          case TimestampNTZType if dt == TimestampType && t != "events" => TimestampType
          case other => other
        }
        assert(gotDt === dt, s"type drift in $t.$name: got ${got(name)}, engine expects $dt")
      }
    }
  }

  test("events rows are non-empty and ts is a sane epoch range") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val row = ev.agg(count("*").as("n"), min("ts"), max("ts")).head()
    assert(row.getLong(0) > 0)
    val lo: java.time.Instant = row.getTimestamp(1).toInstant
    val hi: java.time.Instant = row.getTimestamp(2).toInstant
    // a nanos-as-micros misread lands ~1970 or ~year 50k — pin a wide sane window
    assert(lo.isAfter(java.time.Instant.parse("2000-01-01T00:00:00Z")), s"min ts $lo")
    assert(hi.isBefore(java.time.Instant.parse("2100-01-01T00:00:00Z")), s"max ts $hi")
  }
}
