package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time, so plans
  * are built against whichever SF the driver (or bench) points at. Reads
  * are plain parquet scans: Catalyst pushes filters/column pruning into
  * the scan, which is the behavior we rely on at 100 TB — never cache or
  * materialize here.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) (no native Spark 4 type — read
    * nanos as long via the legacy conf and truncate with *integer*
    * division, since double division loses precision above 2^53 ns) and
    * plain timestamp[us] (arrives as TIMESTAMP or TIMESTAMP_NTZ). Branch
    * on the arriving type so either generation loads; the engine-facing
    * contract is always a TimestampType `ts` in the UTC session zone
    * (an NTZ→timestamp cast is value-identical under UTC).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(s, d, "events")
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so the whole catalog is usable
    * from `spark.sql` (the SQL front door of the engine). */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq(region _, nation _, customer _, supplier _, part _, orders _,
      lineitem _, events _, documents _, embeddings _)
      .zip(names)
      .foreach { case (loader, name) => loader(s, d).createOrReplaceTempView(name) }
  }
}
