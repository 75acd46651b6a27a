package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE bucketed band-store scaffolding both streaming dedup indexes
  * ([[NearDupIndex]] text MinHash, [[ImageDupIndex]] perceptual pHash)
  * stand on: an external parquet table CLUSTERED BY the single band_val
  * probe key, registered in the session catalog so a restarted session
  * re-binds to the same files and bucket spec, with append/reset
  * helpers. The append pays the bucket shuffle once; every probe join
  * then co-locates with zero index-side exchange (spec-asserted in
  * StreamingSpec for both indexes). */
private[graft] object BandStore {

  /** Catalog name derived from the directory so concurrent indexes in
    * one session don't collide. */
  def tableName(prefix: String, dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    s"${prefix}_$h"
  }

  /** Register (or re-bind after a restart) the external bucketed band
    * table over `dir`. Idempotent. Also the recovery point for a crash
    * between [[compact]]'s two swap renames — the complete `.old` copy
    * is restored before anything reads the table. */
  def ensure(spark: SparkSession, name: String, colsDdl: String,
             dir: String, buckets: Int): Unit = {
    recoverSwap(dir)
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $name ($colsDdl)
         |USING PARQUET
         |CLUSTERED BY (band_val) SORTED BY (band_val) INTO $buckets BUCKETS
         |LOCATION '$dir'""".stripMargin)
  }

  /** If a [[compact]] crashed between moving the live dir aside and
    * moving the staged copy in, the `.old` copy IS the store — restore
    * it. No-op otherwise. */
  private def recoverSwap(dir: String): Unit = {
    val old = dir.stripSuffix("/") + ".old"
    if (!DurableFs.isDirectory(dir) && DurableFs.isDirectory(old))
      DurableFs.move(old, dir)
  }

  def append(bands: DataFrame, name: String, dir: String, buckets: Int): Unit =
    bands.write.mode("append")
      .bucketBy(buckets, "band_val").sortBy("band_val")
      .option("path", dir)
      .saveAsTable(name)

  /** Compact the append-accumulated band files. Every streaming append
    * writes up to `buckets` new parquet files, so a long-running index
    * accretes O(batches × buckets) small files and the probe's bucketed
    * scan pays per-file open cost. Compaction rewrites the table —
    * same rows, same bucket spec, so replay semantics (the batch_id
    * filter) and the zero-exchange probe plan are untouched — and
    * deliberately KEEPS the commit markers: they record which batchIds
    * already served, and clearing them would double-append on a
    * post-compaction stream replay. Safe between micro-batches (the
    * serve loop is synchronous).
    *
    * Crash safety (r13, advisor): the compacted copy is STAGED to a
    * sibling directory while the live files stay untouched, then
    * swapped in by rename; the old copy is deleted only after the new
    * one is fully in place. At no point is the sole durable copy of
    * the index gone — a crash before the swap leaves the original
    * serving, a crash between the two renames leaves a complete
    * `.old` copy that the next call restores first. */
  def compact(spark: SparkSession, name: String, dir: String,
              commitsDir: String, buckets: Int): Unit = {
    val staging = dir.stripSuffix("/") + ".compacting"
    val old = dir.stripSuffix("/") + ".old"
    recoverSwap(dir)
    // r15 (review): roll back any crashed half-append BEFORE the
    // rewrite reads the directory — folding an orphan in would make
    // that batch's later replay recovery delete the compacted files
    // themselves (CommitProtocol.recoverPending). Living HERE, both
    // compact() and the maybeCompact policy hook are guarded.
    // r16 (advisor): if the rollback deleted orphans, drop the table's
    // cached file index BEFORE the compaction scan — a warm index from
    // the prior probe join would still list the deleted files (serveSigs
    // already refreshes on its rollback path; compact must too).
    if (CommitProtocol.recoverPending(dir, commitsDir))
      spark.catalog.refreshTable(name)
    DurableFs.deleteTree(staging); DurableFs.deleteTree(old)
    // write the compacted copy to the staging dir while the live table
    // files still back `name` — the read happens during this write, so
    // the durable copy is never gone. bucketBy requires saveAsTable, so
    // stage under a throwaway catalog name (external → DROP keeps files)
    val tmp = name + "_compacting"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    // keep the SCAN bucketed for the rewrite: its HashPartitioning
    // already satisfies the repartition, so AQE elides the exchange and
    // the rewrite is `buckets` parallel tasks with ZERO shuffle — but
    // only if DisableUnnecessaryBucketedScan doesn't un-bucket the scan
    // first (it would drop the alignment and scatter each bucket's rows
    // across split-sized tasks, multiplying output files)
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevAuto = spark.conf.getOption(autoKey)
    spark.conf.set(autoKey, "false")
    try
      compactionPlan(spark, name, buckets)
        .write.bucketBy(buckets, "band_val").sortBy("band_val")
        .option("path", staging)
        .saveAsTable(tmp)
    finally prevAuto match {
      case Some(v) => spark.conf.set(autoKey, v)
      case None => spark.conf.unset(autoKey)
    }
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    // swap: live → .old, staging → live; the external table `name`
    // keeps its location and bucket spec, only the files change
    DurableFs.move(dir, old)
    DurableFs.move(staging, dir)
    spark.catalog.refreshTable(name)
    DurableFs.deleteTree(old)
  }

  /** The relation [[compact]] rewrites, factored so the spec can pin its
    * shape. `repartition(buckets, band_val)` uses the SAME Murmur3-pmod
    * hash as the bucket spec, so each of the `buckets` parallel tasks
    * holds exactly one bucket's rows and writes exactly one file —
    * same file count as the old single-task `coalesce(1)` rewrite, but
    * the full-index rewrite (corpus-token-scale rows at 100 TB) now
    * runs `buckets` wide instead of through one executor core. Better
    * still: the source scan is bucketed on the same key and count, so
    * its output partitioning already satisfies the repartition and the
    * executed rewrite plans NO exchange at all — `buckets` tasks, each
    * reading one bucket's accreted files and writing its one compacted
    * file ([[compact]] pins `autoBucketedScan=false` for the write so
    * the planner can't un-bucket the scan and lose the alignment). */
  private[graft] def compactionPlan(spark: SparkSession, name: String,
                                    buckets: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(name).repartition(buckets, col("band_val"))
  }

  /** R14: the compaction POLICY hook serve loops call between
    * micro-batches — compacts only when the append-accreted file count
    * exceeds `maxFiles` (each append writes up to `buckets` files, so
    * `maxFiles = buckets * k` means "compact every ~k batches"). Returns
    * whether a compaction ran, so callers can log/meter it. Cheap when
    * idle: one directory listing. */
  def maybeCompact(spark: SparkSession, name: String, dir: String,
                   commitsDir: String, buckets: Int, maxFiles: Int): Boolean = {
    val n = CommitProtocol.listParquet(dir).size
    if (n > maxFiles) { compact(spark, name, dir, commitsDir, buckets); true }
    else false
  }

  /** Drop + delete + rewrite the store from an initial band relation,
    * clearing the commit markers too (stale markers would make a
    * re-initialized index skip the first re-served batchIds' appends —
    * [[CommitProtocol.resetMarkers]]). */
  def reset(spark: SparkSession, name: String, dir: String,
            commitsDir: String, initial: DataFrame, buckets: Int): Unit = {
    CommitProtocol.resetMarkers(commitsDir)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    DurableFs.deleteTree(dir)
    initial.write.bucketBy(buckets, "band_val").sortBy("band_val")
      .option("path", dir)
      .saveAsTable(name)
  }
}
