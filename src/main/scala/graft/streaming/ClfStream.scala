package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.QualityRules

/** CONTINUOUS classifier training at the ingest edge — the streaming
  * form of [[graft.operators.QualityRules.perceptronTrain]]: each
  * micro-batch is one synchronous mini-batch update, so a model trains
  * WHILE the corpus ingests instead of in a nightly batch job.
  *
  * Durable state is a GRADIENT LOG, not a collapsed weight vector:
  * `grads/` holds one (bucket, g, batch_id) relation appended per
  * served batch, and the current model is its per-bucket sum
  * ([[model]]). The log form is what makes replay exact — a re-served
  * batch reconstructs its pre-update model by summing the log MINUS its
  * own rows (`batch_id =!= batchId`, the IncrementalIndex row-exclusion
  * discipline), which a collapsed vector cannot do. Appends are fenced
  * by [[CommitProtocol]] (crash between append and marker rolls back);
  * [[compact]] rewrites accreted FILES with rows and batch_ids intact,
  * so exclusion survives maintenance.
  *
  * Verdicts are PREQUENTIAL (test-then-train, the online-learning
  * evaluation standard): each batch is scored against the model as of
  * BEFORE its own update, so the returned keep/pos pairs are honest
  * held-out predictions even though every doc also trains the model.
  *
  * LAW (spec-pinned): serving the corpus as N micro-batches split by
  * `doc_id % N` in order IS `perceptronTrain(feats, epochs = 1,
  * miniBatches = N)` — the streaming log sum and the batch operator's
  * weight vector agree bucket-for-bucket, bit-for-bit.
  *
  * At 100 TB: the per-batch update is two keyed aggregates over the
  * batch's features plus a broadcast of the ≤[[QualityRules.ClfDim]]-row
  * model; the log grows one model-sized relation per batch (bounded by
  * buckets, never by rows) and the serve-time sum is log-length × model
  * width — a production deployment folds rows older than the checkpoint
  * horizon into one base row per bucket the same way it ages any
  * append-only changelog. */
object ClfStream {

  final case class ClfConfig(dir: String) {
    def gradsDir: String = s"$dir/grads"
    def commitsDir: String = s"$dir/commits"
  }

  private val GradSchema = StructType(Seq(
    StructField("bucket", LongType),
    StructField("g", LongType),
    StructField("batch_id", LongType)))

  /** Fresh model: empty gradient log + cleared markers (stale markers
    * would make the first re-served batchIds skip their updates). */
  def init(spark: SparkSession, cfg: ClfConfig): Unit = {
    CommitProtocol.resetMarkers(cfg.commitsDir)
    DurableFs.deleteTree(cfg.gradsDir)
    spark.createDataFrame(new java.util.ArrayList[Row](), GradSchema)
      .write.mode("overwrite").parquet(cfg.gradsDir)
  }

  private def gradLog(spark: SparkSession, cfg: ClfConfig): DataFrame = {
    val files = CommitProtocol.listParquet(cfg.gradsDir).toSeq.sorted
      .map(n => s"${cfg.gradsDir}/$n")
    if (files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), GradSchema)
    else spark.read.schema(GradSchema).parquet(files: _*)
  }

  /** The CURRENT model — the gradient log folded per bucket. */
  def model(spark: SparkSession, cfg: ClfConfig): DataFrame =
    gradLog(spark, cfg).groupBy("bucket").agg(sum("g").as("w"))

  /** Serve one micro-batch of labeled docs `(doc_id, text, pos)`:
    * returns prequential verdicts `(doc_id, pos, keep, margin, update)`
    * scored against the pre-update model, then commits this batch's
    * perceptron gradient to the log unless the batchId already
    * committed (replay). Call from `foreachBatch`. */
  def serveBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 cfg: ClfConfig): DataFrame = {
    recoverSwap(cfg) // a crash mid-compaction must restore before any read
    val proto = CommitProtocol(cfg.gradsDir, cfg.commitsDir, batchId)
    val replay = proto.beginOrRecover()
    // pre-update model: the log minus this batch's own rows, so a
    // replayed batch scores against exactly the model the original saw
    val w = gradLog(spark, cfg).filter(col("batch_id") =!= lit(batchId))
      .groupBy("bucket").agg(sum("g").as("w"))
    // feats feed the margin pass AND the gradient pass — pin once (the
    // perceptronTrain discipline)
    val feats = QualityRules.perceptronFeatures(batch).localCheckpoint()
    val margins = feats.join(broadcast(w), Seq("bucket"), "left")
      .groupBy("doc_id", "y")
      .agg(sum(col("cnt") * coalesce(col("w"), lit(0L))).as("margin"))
    // pin BEFORE the log this plan read mutates
    val verdicts = margins.select(
      col("doc_id"), (col("y") === 1L).as("pos"),
      (col("margin") > 0).as("keep"), col("margin"),
      (col("y") * col("margin") <= 0).as("update")).localCheckpoint()
    if (!replay) {
      proto.commit {
        feats.join(verdicts.filter(col("update")).select("doc_id"), "doc_id")
          .groupBy("bucket").agg(sum(col("y") * col("cnt")).as("g"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(cfg.gradsDir)
      }
    }
    verdicts
  }

  /** Rewrite the append-accreted log files into `width` files — rows
    * and batch_ids preserved (replay exclusion survives), the
    * IncrementalIndex staged-swap protocol. Safe between batches. */
  def compact(spark: SparkSession, cfg: ClfConfig, width: Int = 4): Unit = {
    val dir = cfg.gradsDir
    val staging = dir.stripSuffix("/") + ".compacting"
    val old = dir.stripSuffix("/") + ".old"
    recoverSwap(cfg)
    // r15: roll back any crashed half-append BEFORE the rewrite reads
    // the directory (see CommitProtocol.recoverPending).
    CommitProtocol.recoverPending(dir, cfg.commitsDir)
    DurableFs.deleteTree(staging); DurableFs.deleteTree(old)
    spark.read.schema(GradSchema).parquet(dir)
      .repartition(width)
      .write.mode("overwrite").parquet(staging)
    DurableFs.move(dir, old)
    DurableFs.move(staging, dir)
    DurableFs.deleteTree(old)
  }

  private def recoverSwap(cfg: ClfConfig): Unit = {
    val dir = cfg.gradsDir
    val old = dir.stripSuffix("/") + ".old"
    if (!DurableFs.isDirectory(dir) && DurableFs.isDirectory(old))
      DurableFs.move(old, dir)
  }

  /** Policy hook: compact only past `maxFiles` accreted files. */
  def maybeCompact(spark: SparkSession, cfg: ClfConfig,
                   maxFiles: Int, width: Int = 4): Boolean = {
    val n = CommitProtocol.listParquet(cfg.gradsDir).size
    if (n > maxFiles) { compact(spark, cfg, width); true }
    else false
  }
}
