package graft.streaming

import graft.operators.{Dedup, Spread, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R13: the streaming serve leg of EXACT-SUBSTRING dedup — the
  * continuous form of [[Dedup.substrDedup]] (Lee et al. 2022
  * ExactSubstr): any ≥w-token run already seen — in the frozen index,
  * a prior micro-batch, or earlier (by packed doc_id/pos order) in the
  * SAME batch — is removed from the arriving document; the first
  * occurrence ever seen keeps its text. Completes the streaming dedup
  * family: [[IncrementalIndex]] exact whole-doc, [[NearDupIndex]]
  * banded near-dup, this one arbitrary-boundary repeated spans.
  *
  * Durable state is the distinct window-fingerprint relation of all
  * text ever served — one `(band_val, batch_id)` row per fingerprint
  * (the [[BandStore]] scaffolding; `band_val` carries the 8-token
  * window md5 here), bucketed on the probe key so the per-batch join
  * plans ZERO index-side exchange, exactly like the band indexes. The
  * store is corpus-token sized in ROWS but holds no text — 16-byte
  * hashes only (the paper's suffix array is 8× the corpus; this is the
  * store a distributed ESD actually keeps).
  *
  * Per micro-batch ([[serveBatch]]): the batch's sliding windows probe
  * the store (any hit ⇒ every occurrence of that fingerprint in the
  * batch is a loser) and elect in-batch first occurrences for
  * fingerprints the store has never seen (packed doc_id/pos BIGINT
  * min — the batch operator's election, so a single batch over an
  * empty index reproduces [[Dedup.substrDedup]] bit-for-bit, spec-
  * pinned). Loser window starts flow back per doc (corpus-sublinear:
  * duplicated windows only) and each doc re-derives its tokens locally
  * to excise covered spans — text crosses exactly one keyed exchange,
  * the batch operator's contract.
  *
  * Replay/crash protocol: the [[CommitProtocol]] intent/commit fencing
  * and the `batch_id =!= current` probe filter, verbatim from the band
  * indexes — re-served batchIds recompute identical verdicts against
  * the index minus their own appends and append nothing.
  */
object SubstrIndex {

  final case class SubstrConfig(dir: String, w: Int = 8, buckets: Int = 8) {
    def fpsDir: String = s"$dir/fps"
    def commitsDir: String = s"$dir/commits"
    def tableName: String = BandStore.tableName("graft_substr_fps", dir)
  }

  private val TableCols = "band_val STRING, batch_id BIGINT"

  /** The (band_val, doc_id, pos) sliding-window relation of a doc
    * batch — [[Dedup.substrDedup]]'s narrow arm. */
  private def windowsOf(docs: DataFrame, w: Int): DataFrame =
    Spread(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("toks")) - w),
          p => md5(array_join(slice(col("toks"), p + 1, lit(w)), " "))))
        .as(Seq("pos", "band_val")))

  private def ensureTable(spark: SparkSession, cfg: SubstrConfig): Unit =
    BandStore.ensure(spark, cfg.tableName, TableCols, cfg.fpsDir, cfg.buckets)

  /** Freeze an initial index from a corpus snapshot (batch_id −1). */
  def init(spark: SparkSession, indexDocs: DataFrame, cfg: SubstrConfig): Unit =
    BandStore.reset(spark, cfg.tableName, cfg.fpsDir, cfg.commitsDir,
      windowsOf(indexDocs, cfg.w).select("band_val").distinct()
        .withColumn("batch_id", lit(-1L)),
      cfg.buckets)

  /** Serve one micro-batch of `(doc_id, text, ...)` docs: returns the
    * batch operator's relation — (doc_id, n_tokens, n_removed,
    * kept_md5) — and commits the batch's NEW window fingerprints
    * unless this batchId already committed.
    * r18c (guide §2.6): the verdict reassembly reads only the pinned
    * probe + the batch text (never this store — the single-probe fusion
    * made that structural), so it is materialized concurrently with the
    * commit instead of serially by the caller's sink write afterward. */
  def serveBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 cfg: SubstrConfig): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val (verdicts, commit) = serveBatchStaged(spark, batch, batchId, cfg)
    val fPin = Future(JobLabel(spark, s"substr b$batchId: verdicts pin") {
      verdicts.localCheckpoint() })
    commit()
    Await.result(fPin, scala.concurrent.duration.Duration.Inf)
  }

  /** r18: the compute/commit split of [[serveBatch]] — see
    * [[IncrementalIndex.serveBatchStaged]] for the contract. The
    * appended relation (the probe's miss arm) is pinned before the
    * thunk exists, so the commit can run concurrently with anything
    * that never reads this store. Composed as
    * [[probeStaged]] → [[verdictsFromProbe]]. */
  private[streaming] def serveBatchStaged(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      cfg: SubstrConfig): (DataFrame, () => Unit) =
    verdictsFromProbe(spark, batch, None,
      probeStaged(spark, batch, batchId, cfg), batchId, cfg)

  /** The PROBE half of a serve, pinned (r18b, guide §2.4/§2.6): the
    * batch's sliding windows LEFT-join the store once, carrying a
    * `_hit` flag — fusing the serve's former hit arm (inner join) and
    * miss arm (anti join + its own pin) into ONE bucketed store probe
    * and ONE pin (store band_vals are unique — init writes distinct,
    * each append is anti-joined against the index — so the left join
    * never duplicates a window). Split from the verdict half so a
    * composed pipeline ([[graft.streaming.CrawlPipeline]]) can run this
    * store-independent derivation CONCURRENTLY with the upstream dedup
    * stages over a SUPERSET of the docs that will reach this index
    * (windows are row-local, so restricting to the admitted members
    * afterward — [[verdictsFromProbe]]'s `members` — is bit-identical
    * to probing the admitted docs only). Owns the replay fence: the
    * protocol's beginOrRecover (rollback of half-appends) runs before
    * the store is read, exactly as the fused serve did. */
  private[streaming] final case class ProbeStage(
      probe: DataFrame, proto: CommitProtocol, replay: Boolean)

  private[streaming] def probeStaged(
      spark: SparkSession, docs: DataFrame, batchId: Long,
      cfg: SubstrConfig): ProbeStage = {
    ensureTable(spark, cfg)
    val proto = CommitProtocol(cfg.fpsDir, cfg.commitsDir, batchId)
    val replay = proto.beginOrRecover()
    if (proto.rolledBack) spark.catalog.refreshTable(cfg.tableName)
    val idx = spark.table(cfg.tableName)
      .filter(col("batch_id") =!= lit(batchId))
      .select(col("band_val"), lit(true).as("_hit"))
    val probe = JobLabel(spark, s"substr b$batchId: probe pin") {
      windowsOf(docs, cfg.w)
        .join(idx, Seq("band_val"), "left")
        .localCheckpoint() } // consumed by election, both loser arms, the append
    ProbeStage(probe, proto, replay)
  }

  /** The VERDICT half: election + span removal + commit thunk over a
    * pinned [[probeStaged]] result. `docs` are the documents the
    * verdicts cover; `members` (when the probe ran over a superset)
    * restricts every probe consumer — hit losers, the fresh election,
    * the append — to those doc_ids, which is exactly the relation a
    * members-only probe would have produced. */
  private[streaming] def verdictsFromProbe(
      spark: SparkSession, docs: DataFrame, members: Option[DataFrame],
      st: ProbeStage, batchId: Long, cfg: SubstrConfig): (DataFrame, () => Unit) = {
    val probe = members match {
      case Some(m) => st.probe.join(m.select("doc_id"), Seq("doc_id"), "left_semi")
      case None => st.probe
    }
    // store hit ⇒ EVERY batch occurrence of that fingerprint is a loser
    // (the keeper lives in the corpus already)
    val knownLosers = probe.filter(col("_hit"))
      .select(col("doc_id"), col("pos"))
    // store-unseen fingerprints elect their in-batch first occurrence —
    // the batch operator's packed-BIGINT election (pos is per-TOKEN here,
    // so the declared bound is ~2^20 ≈ 1M tokens/doc). `fresh` is a
    // cheap filter of the pinned probe (no store contact), so its three
    // consumers (election, loser join, the append) share the one pin.
    // r18b (guide §2.4): the election rides ONE window pass over fresh
    // (count + min(packed) per band partition — no ordering needed)
    // instead of a groupBy aggregate joined back onto fresh: one
    // exchange on band_val where the agg+shuffle_hash-join shape paid
    // the aggregate's exchange plus the join's probe-side exchange.
    val packed = col("doc_id") * (1L << 20) + col("pos")
    val fresh = probe.filter(col("_hit").isNull).drop("_hit")
    val wband = org.apache.spark.sql.expressions.Window.partitionBy("band_val")
    val freshLosers = fresh
      .withColumn("c", count(lit(1)).over(wband))
      .withColumn("win", min(packed).over(wband))
      .filter(col("c") >= 2 && packed =!= col("win"))
      .select(col("doc_id"), col("pos"))
    // r18b: the union's distinct() was a no-op exchange — the arms are
    // DISJOINT (a window is a store hit or a store miss, never both) and
    // each is internally unique: probe rows are unique per (doc_id, pos)
    // because store band_vals are unique (init writes distinct, every
    // append is store-missed only, replay is fenced — the same invariant
    // the single left-join probe already relies on), and the window
    // election emits each fresh row at most once.
    val dropStarts = knownLosers.unionByName(freshLosers)
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("drop_starts"))

    // reassembly: the batch text crosses one doc_id exchange, each doc
    // filters its locally re-derived tokens against its loser starts
    // (span-merged linear kernel — see Dedup.keptAfterDrops)
    val w = cfg.w
    val verdicts0 = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .join(dropStarts, Seq("doc_id"), "left")
      .withColumn("drop_starts",
        coalesce(col("drop_starts"), array().cast("array<int>")))
      .withColumn("kept_arr",
        graft.operators.Dedup.keptAfterDrops(col("toks"), col("drop_starts"), w))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept_arr"))).cast("long").as("n_removed"),
        md5(array_join(col("kept_arr"), " ")).as("kept_md5"))
    // r18b: the verdict relation is deliberately NOT pinned — since the
    // single-probe fusion, its plan reads only the pinned probe and the
    // batch text, never this store, so the commit's concurrent append
    // cannot be observed through it and its (single) consumer inlines
    // the reassembly into its own execution: one fewer serial query
    // execution per micro-batch in both the standalone serve and the
    // composed crawl pipeline.
    val verdicts = verdicts0

    val commit: () => Unit =
      if (st.replay) () => ()
      else () => st.proto.commit { JobLabel(spark, s"substr b$batchId: commit") {
        BandStore.append(
          fresh.select("band_val").distinct().withColumn("batch_id", lit(batchId)),
          cfg.tableName, cfg.fpsDir, cfg.buckets)
      } }
    (verdicts, commit)
  }

  /** Plan snapshot surface (r18, [[graft.streaming.ProbeSubstrPlans]]):
    * the store-probe relation(s) of one serve, exactly as
    * [[serveBatchStaged]] builds them pre-pin — the assertion surface
    * for the store-probed-once / zero-index-exchange claims. */
  private[streaming] def printProbePlans(spark: SparkSession, batch: DataFrame,
                                         batchId: Long, cfg: SubstrConfig): Unit = {
    ensureTable(spark, cfg)
    val idx = spark.table(cfg.tableName)
      .filter(col("batch_id") =!= lit(batchId))
      .select(col("band_val"), lit(true).as("_hit"))
    val occ = windowsOf(batch, cfg.w)
    println("================ substr store probe: ONE left-join probe (hit flag carries both arms) ================")
    occ.join(idx, Seq("band_val"), "left").explain("formatted")
  }

  /** Rewrite the accreted append files into one file per bucket —
    * rows, bucket spec, replay semantics and commit markers preserved
    * ([[BandStore.compact]]). Run between micro-batches. */
  def compact(spark: SparkSession, cfg: SubstrConfig): Unit =
    BandStore.compact(spark, cfg.tableName, cfg.fpsDir, cfg.commitsDir, cfg.buckets)

  /** Policy form: compact only past `maxFiles` accreted files
    * ([[BandStore.maybeCompact]]). */
  def maybeCompact(spark: SparkSession, cfg: SubstrConfig,
                   maxFiles: Int): Boolean =
    BandStore.maybeCompact(spark, cfg.tableName, cfg.fpsDir, cfg.commitsDir, cfg.buckets, maxFiles)
}
