package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators — where 100 TB performance is actually won:
  *
  *  - **Date partitioning**: facts land under `event_date=.../` so
  *    time-ranged queries prune whole directories at planning time (the
  *    scan never lists them; verified via `df.inputFiles` in the spec).
  *  - **Bucketing**: pre-hash the join key into fixed buckets at write
  *    time; bucket-aware joins then co-locate matching keys with NO
  *    exchange on either side — the shuffle is paid once at write, not
  *    per query. This is the batch analog of the reference keying its
  *    output stream by partition key (`CollectorService.scala:525-532`).
  */
object PartitionedLake {

  /** Write events partitioned by derived event_date. */
  def writePartitionedByDay(events: DataFrame, dir: String): Unit =
    events
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(dir)

  /** Read one day — the filter prunes partitions at file-listing time. */
  def readDay(spark: SparkSession, dir: String, day: String): DataFrame =
    spark.read.parquet(dir).filter(col("event_date") === day)

  /** Persist a DataFrame bucketed (and sorted) by join keys. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: String*): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Compact a partitioned lake directory's small files.
    *
    * Streaming ingest (one file per micro-batch per partition) and
    * fine-grained writers leave thousands of KB-sized files per
    * partition; every later scan then pays a task + a footer read per
    * file, and at 100 TB the file LISTING alone dominates planning. This
    * rewrites the table in ONE job: a single shuffle keyed on
    * `(partition, bucket)` — `buckets` spreads a hot partition over that
    * many writers, so compaction itself can't be skewed onto one task —
    * and `maxRecordsPerFile` bounds file size from above. Output file
    * count per partition ≈ max(buckets, rows/maxRecordsPerFile), files
    * sized by data, not by ingest batching.
    *
    * Writes to `destDir` (never in-place: overwriting the directory
    * being read is a read-your-own-delete failure; a deployment swaps
    * the directory or updates the catalog pointer atomically). */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
      partCol: String, maxRecordsPerFile: Long, buckets: Int = 1): Unit = {
    val df = spark.read.parquet(srcDir)
    val spreadKey = pmod(hash(df.columns.map(col): _*), lit(buckets))
    df.repartition(col(partCol), spreadKey)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy(partCol)
      .parquet(destDir)
  }
}
