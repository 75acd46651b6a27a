package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}
import org.apache.spark.util.sketch.BloomFilter

import graft.operators.TextOps

/** The PRODUCTION serve leg of incremental exact dedup — the code that
  * [[graft.operators.Dedup.incrementalNew]]'s scaladoc promises ("in
  * production the sketch is maintained incrementally alongside the
  * index, not recomputed"). Durable state is two artifacts under one
  * directory:
  *
  *   - `fingerprints/` — the deduplicated index relation (parquet, one
  *     row per fingerprint ever accepted), appended per micro-batch;
  *   - `bloom.bin` — ONE serialized `org.apache.spark.util.sketch`
  *     Bloom filter over every index fingerprint, probed as a plan
  *     literal by the codegen'd `BloomFilterMightContain`.
  *
  * Per micro-batch ([[serveBatch]]): probe the batch against the
  * persisted sketch — the miss leg proves novelty with ZERO index
  * contact (Bloom filters have no false negatives); only the fpp-sized
  * maybe leg pays the verification join against the index parquet. The
  * batch's accepted fingerprints are then appended to the index, and
  * their own one-pass `BloomFilterAggregate` sketch is MERGED into
  * `bloom.bin` (`BloomFilter.mergeInPlace` — the aggregate serializes
  * the same `util.sketch` wire format `readFrom` parses, and merge is a
  * bitwise OR, so the sketch is maintained in O(batch) work, never
  * rebuilt from the index). Sketch geometry (capacity → numBits →
  * numHashFunctions) is pinned in [[IndexConfig]] at init time so every
  * per-batch sketch is merge-compatible with the persisted one.
  *
  * Replay correctness (checkpoint recovery re-delivers the last
  * uncommitted micro-batch): each commit writes a marker under
  * `commits/<batchId>` listing exactly the parquet files that batch
  * appended. A replayed batch sees its marker, SKIPS the index/sketch
  * mutation (bloom OR is idempotent anyway, but the file append is
  * not), and verifies against the index MINUS its own files — so the
  * recomputed verdicts are identical to the original run's even though
  * the index already contains the batch's fingerprints. The sketch
  * needs no rollback: its extra bits only route the replayed rows to
  * the verification join, which the excluded-file index answers
  * exactly. r12: the append itself is fenced by [[CommitProtocol]]'s
  * intent marker — a crash BETWEEN the parquet append and the commit
  * marker (the r11 protocol's unguarded window) is detected on restart
  * and the half-committed files are deleted before anything is read.
  *
  * At 100 TB: the index relation shuffles nothing at serve time (the
  * verification join is keyed on fingerprint and the maybe leg is
  * fpp-sized), the sketch stays broadcast-sized (4M capacity ≈ 4.8 MB
  * at 1% fpp; size capacity to the expected corpus at init), and the
  * only driver-side work per batch is sketch-merge + a file-listing
  * diff — both sketch-scale, never row-scale.
  */
object IncrementalIndex {

  /** Pinned sketch geometry + index location. `capacity`/`fpp` fix
    * numBits and numHashFunctions for the life of the index — the
    * merge-compatibility contract. */
  final case class IndexConfig(dir: String, capacity: Long = 4000000L, fpp: Double = 0.01) {
    def fingerprintsDir: String = s"$dir/fingerprints"
    def bloomPath: String = s"$dir/bloom.bin"
    def commitsDir: String = s"$dir/commits"
    def numBits: Long = BloomFilter.optimalNumOfBits(capacity, fpp)
  }

  private val FpSchema = StructType(Seq(StructField("fingerprint", StringType)))

  /** Freeze an initial index: distinct fingerprints of `indexDocs` →
    * parquet, plus the one-pass sketch over the persisted relation. */
  def init(spark: SparkSession, indexDocs: DataFrame, cfg: IndexConfig): Unit = {
    CommitProtocol.resetMarkers(cfg.commitsDir) // stale markers = skipped appends
    indexDocs.select(TextOps.fingerprint(col("text")).as("fingerprint")).distinct()
      .write.mode("overwrite").parquet(cfg.fingerprintsDir)
    val sketch = sketchBytes(spark.read.parquet(cfg.fingerprintsDir), cfg)
      .getOrElse(emptySketch(cfg))
    writeFile(cfg.bloomPath, sketch)
  }

  /** One merge-compatible sketch over a fingerprint relation; None for
    * an empty relation (BloomFilterAggregate yields null). */
  private def sketchBytes(fps: DataFrame, cfg: IndexConfig): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(col("fingerprint"))),
      Literal(cfg.capacity), Literal(cfg.numBits)).toAggregateExpression()
    Option(fps.select(GraftBridge.column(agg).as("bf")).head().getAs[Array[Byte]](0))
  }

  private def emptySketch(cfg: IndexConfig): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    BloomFilter.create(cfg.capacity, cfg.numBits).writeTo(out)
    out.toByteArray
  }

  /** r12: atomic (same-dir temp + ATOMIC_MOVE) — a crash mid-write must
    * never leave a torn `bloom.bin` that `readFrom` chokes on. */
  private def writeFile(path: String, bytes: Array[Byte]): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s"${p.getFileName}.tmp")
    java.nio.file.Files.write(tmp, bytes)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def listIndexFiles(cfg: IndexConfig): Set[String] =
    CommitProtocol.listParquet(cfg.fingerprintsDir)

  /** Serve one micro-batch of `(doc_id, text, ...)` documents: returns
    * `(doc_id, fingerprint, is_new)` verdicts — identical semantics to
    * the batch [[graft.operators.Dedup.incrementalNew]] verdict — and
    * COMMITS the accepted fingerprints (index append + sketch merge)
    * unless this batchId already committed (replay). Call from
    * `foreachBatch`; verdicts are pinned (`localCheckpoint`) before the
    * index mutates so the returned frame never re-reads its own
    * appends. */
  def serveBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 cfg: IndexConfig): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r12: intent/commit fencing — a crash between the parquet append
    // and the commit marker is rolled back HERE (orphan files deleted)
    // before anything is read, so the batch re-runs against the exact
    // pre-append index and never double-appends (ADVICE r11)
    val proto = CommitProtocol(cfg.fingerprintsDir, cfg.commitsDir, batchId)
    val replay = proto.beginOrRecover()
    val excluded: Set[String] = if (replay) proto.committedFiles else Set.empty
    val idxFiles = (listIndexFiles(cfg) -- excluded).toSeq.sorted
      .map(n => s"${cfg.fingerprintsDir}/$n")
    val idx =
      if (idxFiles.isEmpty) spark.createDataFrame(
        new java.util.ArrayList[Row](), FpSchema)
      else spark.read.schema(FpSchema).parquet(idxFiles: _*)

    val bloomBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cfg.bloomPath))
    def maybeSeen: Column = coalesce(
      GraftBridge.column(new BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        GraftBridge.expression(xxhash64(col("fingerprint"))))),
      lit(false))

    val fp = batch.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fingerprint"))
      .withColumn("first_in_shard",
        col("doc_id") === min("doc_id").over(Window.partitionBy("fingerprint")))
    val definitelyNew = fp.filter(!maybeSeen)
      .select(col("doc_id"), col("fingerprint"), col("first_in_shard").as("is_new"))
    val verified = fp.filter(maybeSeen)
      .join(idx.withColumn("_in_idx", lit(true)), Seq("fingerprint"), "left")
      .select(col("doc_id"), col("fingerprint"),
        (col("first_in_shard") && col("_in_idx").isNull).as("is_new"))
    // pin BEFORE mutating the index these plans read
    val verdicts = definitelyNew.unionByName(verified).localCheckpoint()

    if (!replay) {
      proto.commit {
        val newFps = verdicts.filter(col("is_new")).select("fingerprint")
        newFps.write.mode("append").parquet(cfg.fingerprintsDir)
        // sketch merge INSIDE the fence: a crash after the merge but
        // before the commit marker re-runs the batch against the
        // rolled-back index — the stale extra bits only route rows to
        // the verification join, which answers exactly
        sketchBytes(newFps, cfg).foreach { batchSketch =>
          val merged = BloomFilter.readFrom(bloomBytes)
          merged.mergeInPlace(BloomFilter.readFrom(batchSketch))
          val out = new java.io.ByteArrayOutputStream()
          merged.writeTo(out)
          writeFile(cfg.bloomPath, out.toByteArray)
        }
      }
    }
    verdicts
  }
}
