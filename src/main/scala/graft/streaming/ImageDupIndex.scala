package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** R12: the streaming serve leg of PERCEPTUAL image dedup — the
  * multimodal sibling of [[NearDupIndex]] (text MinHash) and
  * [[IncrementalIndex]] (exact), the shape a LAION-style image+caption
  * ingest runs continuously: every arriving image is WHT-pHashed
  * ([[Multimodal.phashOf]]) and probed against the durable code index;
  * only perceptually-novel images are accepted and appended.
  *
  * Durable state is the BAND relation of every accepted image — a
  * bucketed external parquet table (`bands/`: `band_idx, band_val,
  * doc_id, phash, batch_id`, 4 rows per image: the 4 salt-prefixed
  * 16-bit chunks of the 64-bit code, [[Multimodal.hexBands]]) bucketed
  * by `band_val` so the per-batch probe join co-locates with ZERO
  * index-side exchange — the shuffle is paid once at append, never per
  * probe (the NearDupIndex r12 discipline). The full code rides on
  * every band row, so candidate verification (hamming ≤ maxDist,
  * [[Multimodal.hammingHex]]) happens inside the probe join without a
  * second lookup; by pigeonhole the 4-chunk banding is COMPLETE at
  * hamming ≤ 3 (SimilaritySpec proves the batch equivalent equals brute
  * force).
  *
  * Per micro-batch ([[serveBatch]]): index probe on `band_val` plus an
  * in-batch self-join (earlier doc_id plays "already seen" — the same
  * arrival-order election as NearDupIndex), hamming-verified, then one
  * verdict row per image: `(doc_id, is_new, n_matches, best_match,
  * best_hamming)` — best = lowest hamming, lowest prior id on ties,
  * (-1, -1) when novel.
  *
  * Replay/crash protocol: identical [[CommitProtocol]] intent/commit
  * fencing as the other two indexes — verdicts replay exactly
  * (recomputed against the index minus this batch's own appends), a
  * half-committed crash rolls back before anything is read.
  *
  * At 100 TB: per-batch work is O(batch bands) shuffled once into the
  * bucket layout; band-bucket occupancy stays hamming-signal sized
  * because the EXACT index (byte-identical images,
  * [[IncrementalIndex]]) runs first in the ingest pipeline, so bitwise
  * copies never reach this join.
  */
object ImageDupIndex {

  final case class ImageDupConfig(dir: String, maxDist: Int = 3, buckets: Int = 8) {
    def bandsDir: String = s"$dir/bands"
    def commitsDir: String = s"$dir/commits"
    def tableName: String = BandStore.tableName("graft_imagedup_bands", dir)
  }

  private val TableCols =
    "band_idx INT, band_val STRING, doc_id BIGINT, phash STRING, batch_id BIGINT"

  /** The 4-band relation of an image batch (codes from the per-doc
    * synthesized BMPs — a real deployment feeds
    * [[Multimodal.readMediaFiles]] output through [[Multimodal.phashOf]]
    * instead; the band/probe machinery is unchanged). */
  private def bandsOf(docs: DataFrame): DataFrame =
    Multimodal.phashes(docs).toDF()
      .select(col("doc_id"), col("phash"),
        posexplode(Multimodal.hexBands("phash")).as(Seq("band_idx", "band_val")))
      .select(col("band_idx"), col("band_val"), col("doc_id"), col("phash"))

  private def ensureTable(spark: SparkSession, cfg: ImageDupConfig): Unit =
    BandStore.ensure(spark, cfg.tableName, TableCols, cfg.bandsDir, cfg.buckets)

  private def appendBands(bands: DataFrame, cfg: ImageDupConfig): Unit =
    BandStore.append(bands, cfg.tableName, cfg.bandsDir, cfg.buckets)

  /** Freeze an initial index: every index image accepted as-is
    * (batch_id −1 = pre-stream). Markers reset too — stale ones would
    * make re-served batchIds skip their appends. */
  def init(spark: SparkSession, indexDocs: DataFrame, cfg: ImageDupConfig): Unit =
    BandStore.reset(spark, cfg.tableName, cfg.bandsDir, cfg.commitsDir,
      bandsOf(indexDocs).withColumn("batch_id", lit(-1L)), cfg.buckets)

  /** Serve one micro-batch; see object doc for semantics. */
  def serveBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 cfg: ImageDupConfig): DataFrame = {
    ensureTable(spark, cfg)
    val proto = CommitProtocol(cfg.bandsDir, cfg.commitsDir, batchId)
    val replay = proto.beginOrRecover()
    if (proto.rolledBack) spark.catalog.refreshTable(cfg.tableName)

    val idx = spark.table(cfg.tableName)
      .filter(col("batch_id") =!= lit(batchId))
      .select(col("band_val"), col("doc_id").as("old_id"), col("phash").as("old_phash"))

    val bands = bandsOf(batch).localCheckpoint() // consumed by 3 arms below
    val idxCand = bands.join(idx, Seq("band_val"))
      .select(col("doc_id"), col("phash"), col("old_id"), col("old_phash"))
    val inBatchCand = bands.as("a").join(
      bands.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") > col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("a.phash").as("phash"),
        col("b.doc_id").as("old_id"), col("b.phash").as("old_phash"))
    val hits = idxCand.unionByName(inBatchCand)
      .select(col("doc_id"), col("old_id"),
        Multimodal.hammingHex(col("phash"), col("old_phash")).as("hamming"))
      .filter(col("hamming") <= cfg.maxDist)
      .distinct() // several agreeing bands report the same pair once
      // best match: lowest hamming, lowest prior id on ties
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_matches"),
        min(struct(col("hamming").as("h"), col("old_id").as("o"))).as("best"))
      .select(col("doc_id"), col("n_matches"),
        col("best.o").as("best_match"), col("best.h").as("best_hamming"))
    val verdicts = bands.select("doc_id").distinct()
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_matches").isNull.as("is_new"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("best_match"), lit(-1L)).as("best_match"),
        coalesce(col("best_hamming"), lit(-1)).as("best_hamming"))
      .localCheckpoint() // pin BEFORE the index these plans read mutates

    if (!replay) {
      proto.commit {
        appendBands(
          bands.join(verdicts.filter(col("is_new")).select("doc_id"), Seq("doc_id"))
            .select(col("band_idx"), col("band_val"), col("doc_id"), col("phash"),
              lit(batchId).as("batch_id")),
          cfg)
      }
    }
    verdicts
  }

  /** Rewrite the accreted append files into one file per bucket — rows,
    * bucket spec, replay semantics and commit markers all preserved
    * ([[BandStore.compact]]). Run between micro-batches. */
  def compact(spark: SparkSession, cfg: ImageDupConfig): Unit =
    BandStore.compact(spark, cfg.tableName, cfg.bandsDir, cfg.buckets)

  /** Policy form: compact only past `maxFiles` accreted files
    * ([[BandStore.maybeCompact]]). */
  def maybeCompact(spark: SparkSession, cfg: ImageDupConfig,
                   maxFiles: Int): Boolean =
    BandStore.maybeCompact(spark, cfg.tableName, cfg.bandsDir, cfg.buckets, maxFiles)

  /** The probe join over the CURRENT index, exactly as [[serveBatch]]
    * builds it — the assertion surface for the zero-index-exchange
    * claim. */
  def probeJoin(spark: SparkSession, batch: DataFrame, batchId: Long,
                cfg: ImageDupConfig): DataFrame = {
    ensureTable(spark, cfg)
    val idx = spark.table(cfg.tableName)
      .filter(col("batch_id") =!= lit(batchId))
      .select(col("band_val"), col("doc_id").as("old_id"), col("phash").as("old_phash"))
    bandsOf(batch).join(idx, Seq("band_val"))
      .select(col("doc_id"), col("old_id"))
  }
}
