package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.operators.Dedup

/** R11: the streaming serve leg of NEAR-duplicate dedup — banded MinHash
  * over micro-batches, the continuous-crawl-ingest shape
  * ([[IncrementalIndex]] covers the exact-duplicate half; this covers
  * the LSH half that catches reworded boilerplate and template pages).
  *
  * Durable state is the BAND relation of every accepted doc under one
  * directory (`bands/` parquet: `band_idx, band_val, doc_id` — 4 rows
  * per doc, the 4 salted minhashes [[Dedup.minhashSignatures]]
  * computes), appended per micro-batch with the same commit-marker
  * replay protocol as the exact index.
  *
  * Per micro-batch ([[serveBatch]]): the batch's bands join the
  * persisted band relation keyed on `(band_idx, band_val)` plus a
  * self-join for in-batch pairs (earlier doc_id plays "already seen" —
  * the arrival-order analog of the batch window's first-copy election).
  * A pair with ≥ `minMatches` of the 4 bands agreeing is a near-dup hit
  * (matching bands = matching minhashes here, so `minMatches = 3`
  * estimates Jaccard ≳ 0.75 — the signature-based verification
  * production LSH serves with; full-text Jaccard would need a doc
  * store). Within-batch matches count regardless of whether the matched
  * doc is itself accepted — the standard parallel-LSH conservatism: if
  * C matches rejected A and A matched B, C is (transitively) a dup of
  * the accepted B with high probability.
  *
  * At 100 TB: the per-batch work is O(batch bands) join O(probed index
  * partitions) — bucket `bands/` by `band_val` and the join co-locates
  * with zero index shuffle; the exact index ([[IncrementalIndex]]) runs
  * FIRST in the ingest pipeline, so identical documents never reach
  * this join and band-bucket occupancy stays Jaccard-signal sized (the
  * batch-side analog is [[Dedup.MaxBucket]]).
  *
  * Docs with < 3 tokens have no shingles, hence no signature: they are
  * absent from the verdicts (declared domain, same as `d_minhash`) and
  * pass to the exact-dedup leg only.
  */
object NearDupIndex {

  final case class NearDupConfig(dir: String, minMatches: Int = 3) {
    def bandsDir: String = s"$dir/bands"
    def commitsDir: String = s"$dir/commits"
  }

  // band_val is the 32-hex md5 minhash (TextOps.minhash); at 100 TB a
  // deployment would re-key to the first 8 bytes to shrink the shuffle
  private val BandSchema = StructType(Seq(
    StructField("band_idx", IntegerType),
    StructField("band_val", StringType),
    StructField("doc_id", LongType)))

  /** The 4-band relation of a doc batch. */
  private def bandsOf(docs: DataFrame): DataFrame =
    Dedup.minhashSignatures(docs)
      .select(col("doc_id"), posexplode(array(
        col("sig0"), col("sig1"), col("sig2"), col("sig3"))).as(Seq("band_idx", "band_val")))
      .select(col("band_idx"), col("band_val"), col("doc_id"))

  /** Freeze an initial index: every index doc is accepted as-is. */
  def init(spark: SparkSession, indexDocs: DataFrame, cfg: NearDupConfig): Unit =
    bandsOf(indexDocs).write.mode("overwrite").parquet(cfg.bandsDir)

  private def listIndexFiles(cfg: NearDupConfig): Set[String] = {
    val d = java.nio.file.Paths.get(cfg.bandsDir)
    if (!java.nio.file.Files.isDirectory(d)) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(d).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        .toSet
    }
  }

  /** Serve one micro-batch: returns `(doc_id, is_new, n_matches,
    * best_match)` — `best_match` the strongest (most bands, then lowest
    * id) prior doc, `-1` when none — and commits the accepted docs'
    * bands unless this batchId already committed (replay: verdicts are
    * recomputed against the index MINUS this batch's own appends, so
    * they replay exactly). */
  def serveBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 cfg: NearDupConfig): DataFrame = {
    val commitPath = java.nio.file.Paths.get(cfg.commitsDir, batchId.toString)
    val replay = java.nio.file.Files.exists(commitPath)
    val excluded: Set[String] =
      if (!replay) Set.empty
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(commitPath).asScala.filter(_.nonEmpty).toSet
      }
    val idxFiles = (listIndexFiles(cfg) -- excluded).toSeq.sorted
      .map(n => s"${cfg.bandsDir}/$n")
    val idx =
      if (idxFiles.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[Row](), BandSchema)
      else spark.read.schema(BandSchema).parquet(idxFiles: _*)

    val bands = bandsOf(batch).localCheckpoint() // consumed by 3 arms below
    val idxPairs = bands.join(
      idx.withColumnRenamed("doc_id", "old_id"), Seq("band_idx", "band_val"))
      .select(col("doc_id"), col("old_id"))
    val inBatchPairs = bands.as("a").join(
      bands.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") > col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("old_id"))
    val hits = idxPairs.unionByName(inBatchPairs)
      .groupBy("doc_id", "old_id").agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= cfg.minMatches)
      // strongest match: most agreeing bands, lowest prior id on ties
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_matches"),
        max(struct(col("nb").as("nb"), (-col("old_id")).as("neg_old"))).as("best"))
      .select(col("doc_id"), col("n_matches"), (-col("best.neg_old")).as("best_match"))
    val verdicts = bands.select("doc_id").distinct()
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_matches").isNull.as("is_new"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("best_match"), lit(-1L)).as("best_match"))
      .localCheckpoint() // pin BEFORE the index these plans read mutates

    if (!replay) {
      val before = listIndexFiles(cfg)
      bands.join(verdicts.filter(col("is_new")).select("doc_id"), Seq("doc_id"))
        .select("band_idx", "band_val", "doc_id")
        .write.mode("append").parquet(cfg.bandsDir)
      val appended = listIndexFiles(cfg) -- before
      java.nio.file.Files.createDirectories(commitPath.getParent)
      java.nio.file.Files.write(commitPath,
        appended.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    }
    verdicts
  }
}
