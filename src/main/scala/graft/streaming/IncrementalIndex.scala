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
  * exactly.
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

  private def writeFile(path: String, bytes: Array[Byte]): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
  }

  private def listIndexFiles(cfg: IndexConfig): Set[String] = {
    val d = java.nio.file.Paths.get(cfg.fingerprintsDir)
    if (!java.nio.file.Files.isDirectory(d)) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(d).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        .toSet
    }
  }

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
    val commitPath = java.nio.file.Paths.get(cfg.commitsDir, batchId.toString)
    val replay = java.nio.file.Files.exists(commitPath)
    val excluded: Set[String] =
      if (!replay) Set.empty
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(commitPath).asScala.filter(_.nonEmpty).toSet
      }
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
      val before = listIndexFiles(cfg)
      val newFps = verdicts.filter(col("is_new")).select("fingerprint")
      newFps.write.mode("append").parquet(cfg.fingerprintsDir)
      val appended = listIndexFiles(cfg) -- before
      sketchBytes(newFps, cfg).foreach { batchSketch =>
        val merged = BloomFilter.readFrom(bloomBytes)
        merged.mergeInPlace(BloomFilter.readFrom(batchSketch))
        val out = new java.io.ByteArrayOutputStream()
        merged.writeTo(out)
        writeFile(cfg.bloomPath, out.toByteArray)
      }
      java.nio.file.Files.createDirectories(commitPath.getParent)
      java.nio.file.Files.write(commitPath,
        appended.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    }
    verdicts
  }
}
