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
}
