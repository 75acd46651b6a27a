package graft

import graft.operators.PartitionedLake
import graft.streaming.StreamingDedup
import graft.streaming.SessEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

class LakeSpec extends AnyFunSuite with WallBudget {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("date partitioning prunes unread partitions at the file level") {
    val dir = Files.createTempDirectory("lake").toString
    val events = Tables.events(spark, TestSpark.Sf)
    PartitionedLake.writePartitionedByDay(events, dir)
    val days = spark.read.parquet(dir).select("event_date").distinct().as[String].collect()
    assert(days.length > 1)
    val day = days.sorted.head
    val one = PartitionedLake.readDay(spark, dir, day)
    // the partition predicate must prune at listing time, not post-scan
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(s"event_date"), plan)
    val expected = events.filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
    assert(one.count() === expected)
    // and the filter must NOT appear as a post-scan data filter on event_date
    assert(!plan.contains("DataFilters: [isnotnull(event_date"), plan)
  }

  test("dynamic partition pruning: a filtered dim prunes fact partitions at runtime") {
    // the 100 TB shape: fact partitioned on date, dim filter only known
    // at run time — the scan must receive a dynamicpruning expression so
    // only the dim-selected partitions are listed, not the whole lake
    val dir = Files.createTempDirectory("lake-dpp").toString
    PartitionedLake.writePartitionedByDay(Tables.events(spark, TestSpark.Sf), dir)
    val fact = spark.read.parquet(dir)
    val days = fact.select(col("event_date").cast("string")).distinct()
      .as[String].collect().sorted
    assert(days.length > 1)
    // the dim must be a REAL table (a local relation constant-folds the
    // filter away and the pruning rule sees no selective predicate)
    val dimDir = Files.createTempDirectory("lake-dpp-dim").toString
    days.zipWithIndex.toSeq.toDF("day", "idx")
      .select(col("day").cast("date"), col("idx"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter(col("idx") === 0), col("event_date") === col("day"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"fact scan lost its DPP filter:\n$plan")
    assert(joined.count() === fact.filter(col("event_date").cast("string") === days.head).count())
  }

  test("z-order clustering concentrates 2-D box matches into fewer files than 1-D sort") {
    val events = Tables.events(spark, TestSpark.Sf)
      .select(col("event_id"),
        pmod(col("user_id"), lit(65536L)).as("zx"),
        pmod(datediff(col("ts"), lit("1970-01-01")).cast("long"), lit(65536L)).as("zy"))
    val files = 16
    val linDir = Files.createTempDirectory("lake-linear").toString
    val zDir = Files.createTempDirectory("lake-zorder").toString
    // 1-D layout: range-partitioned + sorted on zx only (the common
    // "sort by primary key" lake layout)
    events.repartitionByRange(files, col("zx")).sortWithinPartitions("zx")
      .write.mode("overwrite").parquet(linDir)
    PartitionedLake.zorderWrite(events, "zx", "zy", zDir, files)

    // same rows, same file counts — only the ORDER differs
    val lin = spark.read.parquet(linDir)
    val z = spark.read.parquet(zDir)
    // same rows; file counts may fall slightly under `files` when the
    // range sampler sees few distinct keys (empty partitions write no file)
    assert(lin.count() === z.count())
    val linFiles = lin.inputFiles.length.toDouble
    val zFiles = z.inputFiles.length.toDouble
    assert(linFiles >= files / 2 && zFiles >= files / 2)

    // proxy for row-group/file stats skipping: how many files hold at
    // least one row matching the predicate (matches concentrated in few
    // files = most files are skippable by their min/max stats)
    def filesTouched(df: org.apache.spark.sql.DataFrame, pred: org.apache.spark.sql.Column) =
      df.filter(pred).select(input_file_name()).distinct().count()

    val days = events.select("zy").distinct().as[Long].collect().sorted
    val dayBand = col("zy") === days(days.length / 2)
    // a y-only predicate: the zx-sorted layout spreads every day across
    // ~all files; the z-layout bounds zy per curve run
    val linTouched = filesTouched(lin, dayBand) / linFiles
    val zTouched = filesTouched(z, dayBand) / zFiles
    assert(zTouched < linTouched,
      s"z-order touched $zTouched of files vs linear $linTouched for a day-band predicate")
    // and both layouts answer the predicate identically
    assert(lin.filter(dayBand).count() === z.filter(dayBand).count())
  }

  test("bucketed tables join without any exchange") {
    val orders = Tables.orders(spark, TestSpark.Sf)
    PartitionedLake.writeBucketed(
      orders.select("o_orderkey", "o_custkey", "o_totalprice"), "orders_b1", 8, "o_custkey")
    PartitionedLake.writeBucketed(
      orders.select(col("o_custkey"), col("o_orderdate")), "orders_b2", 8, "o_custkey")
    // broadcast would win at this tiny size; force the bucket-aware path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b1").join(spark.table("orders_b2"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("compaction shrinks file count, preserves partitions and content") {
    import graft.operators.PartitionedLake
    val src = java.nio.file.Files.createTempDirectory("lake-small").toString
    val dest = java.nio.file.Files.createTempDirectory("lake-compact").toString
    val ev = Tables.events(spark, TestSpark.Sf)
    // simulate micro-batch ingest: many tiny files per date partition
    ev.withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(16)
      .write.mode("overwrite").option("maxRecordsPerFile", "20")
      .partitionBy("event_date").parquet(src)
    def dataFiles(dir: String) = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val before = dataFiles(src)
    PartitionedLake.compact(spark, src, dest, "event_date",
      maxRecordsPerFile = 100000, buckets = 2)
    val after = dataFiles(dest)
    assert(before > 4 * after, s"compaction barely helped: $before -> $after")
    // partition directories survive (pruning still works on the compacted table)
    def parts(dir: String) = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date=")).map(_.getName).toSet
    assert(parts(dest) === parts(src))
    // content equality, column-for-column
    val a = spark.read.parquet(src)
    val b = spark.read.parquet(dest)
    assert(a.count() === b.count())
    assert(a.select(a.columns.map(col): _*).except(b.select(a.columns.map(col): _*)).count() === 0)
  }

  test("merge upsert rewrites only affected partitions; updates, survivors, inserts exact") {
    val dir = Files.createTempDirectory("lake-merge").toString
    val events = Tables.events(spark, TestSpark.Sf)
    PartitionedLake.writePartitionedByDay(events, dir)
    val before = spark.read.parquet(dir)
    val days = before.select(col("event_date").cast("string")).distinct()
      .as[String].collect().sorted
    assert(days.length > 2)
    val (updDay, newDay) = (days.head, "2031-01-01")

    // update batch: bump value on half of updDay's rows + insert a brand-new day
    val updates = before.filter(col("event_date").cast("string") === updDay
        && pmod(col("event_id"), lit(2L)) === 0)
      .withColumn("value", col("value") + lit(10000.0))
      .unionByName(before.limit(3)
        .withColumn("event_id", col("event_id") + lit(10000000L))
        .withColumn("event_date", lit(newDay)))
      .localCheckpoint()
    val expected = PartitionedLake
      .merged(before, updates, Seq("event_id")).collect().map(_.toString).sorted

    def fileSig(): Set[(String, Long)] = {
      val base = new java.io.File(dir)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(base).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getAbsolutePath, f.length)).toSet
    }
    val sigBefore = fileSig()
    val affected = PartitionedLake.mergeUpsert(spark, dir, updates, "event_id", "event_date")
    assert(affected.toSet === Set(updDay, newDay))

    // untouched partitions keep their exact files (path AND size)
    val untouched = sigBefore.filterNot(_._1.contains(s"event_date=$updDay"))
    assert(fileSig().filterNot(f =>
      f._1.contains(s"event_date=$updDay") || f._1.contains(s"event_date=$newDay"))
      === untouched)
    // merged content is exactly the row algebra (same as the q_merge_upsert oracle)
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after === expected)
  }

  test("deletion propagation rewrites only affected partitions, byte-identical elsewhere") {
    import graft.operators.PartitionedLake
    val dir = java.nio.file.Files.createTempDirectory("lake-del").toString
    val ev = Tables.events(spark, TestSpark.Sf)
    PartitionedLake.writePartitionedByDay(ev, dir)
    val before = spark.read.parquet(dir)
    val total = before.count()
    // pick ids spanning two partitions, plus note an untouched partition
    val victims = before.select(col("event_id"), col("event_date"))
      .as[(Long, String)].collect().groupBy(_._2).toSeq.sortBy(_._1)
      .take(2).map(_._2.head._1)
    def listing(dir: String): Map[String, Long] = {
      val base = java.nio.file.Paths.get(dir)
      val s = java.nio.file.Files.walk(base)
      try s.filter(p => p.toString.endsWith(".parquet")).toArray.map(_.toString)
        .map(p => p -> java.nio.file.Files.size(java.nio.file.Paths.get(p))).toMap
      finally s.close()
    }
    val filesBefore = listing(dir)
    val affected = PartitionedLake.deleteIds(spark, dir, "event_date", "event_id", victims)
    assert(affected.size === 2)
    val after = spark.read.parquet(dir)
    // the victims are gone and nothing else is
    assert(after.count() === total - victims.length)
    assert(after.filter(col("event_id").isin(victims: _*)).count() === 0)
    // untouched partitions kept their exact files (path AND size)
    val filesAfter = listing(dir)
    val untouched = filesBefore.keys.filter(p => !affected.exists(a => p.contains(s"event_date=$a")))
    assert(untouched.nonEmpty)
    untouched.foreach { p =>
      assert(filesAfter.get(p).contains(filesBefore(p)), s"untouched file changed: $p")
    }
    // affected partitions were rewritten (old files replaced)
    assert(affected.forall(a => filesAfter.keys.exists(_.contains(s"event_date=$a"))))
  }

  test("deletion that empties a whole partition drops its directory") {
    import graft.operators.PartitionedLake
    val dir = java.nio.file.Files.createTempDirectory("lake-del-all").toString
    val ev = Tables.events(spark, TestSpark.Sf)
    PartitionedLake.writePartitionedByDay(ev, dir)
    val before = spark.read.parquet(dir)
    val total = before.count()
    val byDay = before.select(col("event_id"), col("event_date"))
      .as[(Long, String)].collect().groupBy(_._2).toSeq.sortBy(_._1)
    // every id of the first partition, plus one id of the second
    val (day0, day0Rows) = byDay.head
    val victims = day0Rows.map(_._1) :+ byDay(1)._2.head._1
    val affected =
      PartitionedLake.deleteIds(spark, dir, "event_date", "event_id", victims.toSeq)
    assert(affected.toSet === Set(day0, byDay(1)._1))
    // dynamic overwrite alone would leave day0's files (and its "deleted"
    // ids) on disk — the directory must actually be gone
    assert(!new java.io.File(dir, s"event_date=$day0").exists(),
      s"emptied partition event_date=$day0 survived on disk")
    val after = spark.read.parquet(dir)
    assert(after.count() === total - victims.length)
    assert(after.filter(col("event_id").isin(victims: _*)).count() === 0)
    assert(after.filter(col("event_date") === day0).count() === 0)
  }

  test("streaming dedup drops replayed event ids within the watermark") {
    val input = MemoryStream[SessEvent](spark)
    val q = StreamingDedup.dedup(input.toDF()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    val t0 = 1700000000000L
    def ev(id: Long, off: Long) = SessEvent(1, id, new Timestamp(t0 + off * 60000), 1.0)
    input.addData(ev(1, 0), ev(2, 1), ev(1, 2)) // duplicate id 1 in-batch
    q.processAllAvailable()
    input.addData(ev(2, 3), ev(3, 4)) // duplicate id 2 across batches
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(ids === Array(1L, 2L, 3L))
  }
}
