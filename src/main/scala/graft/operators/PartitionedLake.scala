package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Surgical deletion propagation (takedown / right-to-be-forgotten):
    * remove `ids` from a partitioned table by rewriting ONLY the
    * partitions that contain them — at 100 TB a deletion list touches a
    * handful of partitions, and a full-table rewrite for 50 rows is the
    * difference between minutes and a day.
    *
    * Mechanics: one metadata-scale pass finds the affected partition
    * VALUES (the scan prunes to the id filter); the cleaned rows of just
    * those partitions are pinned (`localCheckpoint` — truncates lineage,
    * both because Spark refuses to overwrite a path it is reading from
    * and so the write can't observe its own deletes), then written back
    * under DYNAMIC partition overwrite, which replaces exactly the
    * partitions present in the output and leaves every other file
    * untouched (byte-for-byte — proven in LakeSpec). A cluster
    * deployment swaps `localCheckpoint` for a reliable checkpoint dir or
    * a temp-dir + atomic-rename commit. Returns the affected partition
    * values.
    *
    * EMPTIED partitions get explicit directory drops: dynamic overwrite
    * only replaces partitions PRESENT in the written output, so a
    * partition whose every row is deleted would otherwise survive
    * untouched — the deleted ids still on disk while the call reports
    * success. For a takedown primitive that silent no-op is a safety
    * failure, so after the rewrite any affected partition absent from
    * the cleaned output is deleted at the filesystem level (partition
    * values here are dates/identifiers; values needing Hive path
    * escaping would go through the catalog instead). */
  def deleteIds(spark: SparkSession, dir: String, partCol: String,
      idCol: String, ids: Seq[Long]): Seq[String] = {
    val df = spark.read.parquet(dir)
    val affected = df.filter(col(idCol).isin(ids: _*))
      .select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq // partition VALUES — metadata-scale
    if (affected.nonEmpty) {
      val cleaned = df
        .filter(col(partCol).isin(affected: _*) && !col(idCol).isin(ids: _*))
        .localCheckpoint()
      // also metadata-scale: distinct partition values of the cleaned rows
      val surviving = cleaned.select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet
      if (surviving.nonEmpty) {
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try
          cleaned.write.mode("overwrite").partitionBy(partCol).parquet(dir)
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
      val emptied = affected.filterNot(surviving)
      if (emptied.nonEmpty) {
        val base = new org.apache.hadoop.fs.Path(dir)
        val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
        emptied.foreach { v =>
          fs.delete(new org.apache.hadoop.fs.Path(base, s"$partCol=$v"), true)
        }
      }
    }
    affected
  }

  /** Pure MERGE/upsert semantics: `updates` rows override `base` rows
    * sharing the key; update keys absent from base are inserts. One
    * left-anti join on the key — shuffle on the key at worst, and a
    * realistic update batch (tiny vs the table) is AQE-broadcast, making
    * the merge a single map-side pass over base. */
  def merged(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.unionByName(base.join(updates, keys, "left_anti"))

  /** Partition-scoped copy-on-write MERGE into a partitioned lake — the
    * Hudi/Delta-style upsert primitive on plain parquet. A day's update
    * batch touches a handful of partitions; rewriting only those is what
    * makes continuous upserts affordable at 100 TB (same mechanics as
    * [[deleteIds]]: metadata-scale affected-partition discovery, pinned
    * merged rows, dynamic partition overwrite that leaves every other
    * file byte-identical — LakeSpec proves both properties).
    *
    * Declared invariant (standard for partition-pathed copy-on-write): a
    * key lives in exactly one partition and an update row carries its
    * key's partition value — updates change attributes, not the
    * partition residence. Brand-new partition values in `updates` are
    * created by the same write. Returns the affected partition values. */
  def mergeUpsert(spark: SparkSession, dir: String, updates: DataFrame,
      keyCol: String, partCol: String): Seq[String] = {
    val affected = updates.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq // partition VALUES — metadata-scale
    if (affected.nonEmpty) {
      val base = spark.read.parquet(dir)
        .filter(col(partCol).cast("string").isin(affected: _*))
      val out = merged(base, updates.select(base.columns.map(col): _*), Seq(keyCol))
        .localCheckpoint() // never read the files being overwritten
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try out.write.mode("overwrite").partitionBy(partCol).parquet(dir)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    affected
  }

  /** Morton (z-order) interleave of two non-negative integer dimensions,
    * `bits` bits each: bit i of x lands at output bit 2i, bit i of y at
    * 2i+1, so sorting by the z-value orders rows along a space-filling
    * curve where runs of consecutive rows are compact BOXES in (x, y).
    *
    * Why a lake cares: parquet keeps per-row-group min/max stats for
    * every column. A table sorted by x alone answers x-ranges from few
    * row groups but y-ranges from ALL of them (each group spans the full
    * y domain); z-clustering bounds both coordinates per run, so a
    * predicate on either dimension — or a 2-D box — skips most groups.
    * That skipping is exactly what scales: at 100 TB the scan cost is
    * row-groups-that-might-match, not table size.
    *
    * Pure bit arithmetic (16 codegen'd shift/mask terms per dimension),
    * mirrored literally by [[zValueSql]] for the DuckDB oracle. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    val xm = pmod(x.cast("long"), lit(1L << bits))
    val ym = pmod(y.cast("long"), lit(1L << bits))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** DuckDB mirror of [[zValue]] over SQL expressions `x`, `y` — generated
    * from the same bit positions so the curve is bit-identical. */
  def zValueSql(x: String, y: String, bits: Int = 16): String = {
    // every term is fully parenthesized: SQL gives `+` higher precedence
    // than `<<`, so a bare `a << 2 + b << 3` would parse as `a << (2+b) << 3`
    val xs = (0 until bits).map(i => s"(((($x) % ${1L << bits} >> $i) & 1) << ${2 * i})")
    val ys = (0 until bits).map(i => s"(((($y) % ${1L << bits} >> $i) & 1) << ${2 * i + 1})")
    (xs ++ ys).mkString("(", " + ", ")")
  }

  /** Rewrite a table z-clustered on (x, y) into `files` range-partitioned,
    * internally sorted files. `repartitionByRange` samples the z-value
    * distribution so files hold equal row counts (not equal key ranges —
    * skew-proof), and the within-file sort gives every parquet row group
    * a tight z-interval, i.e. a tight (x, y) box for stats skipping. */
  def zorderWrite(df: DataFrame, x: String, y: String, dir: String,
      files: Int, bits: Int = 16): Unit =
    df.withColumn("zval", zValue(col(x), col(y), bits))
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(dir)

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
