package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents (in
  * deterministic bucket/doc_id order) into a token stream and cut it into
  * fixed `budget`-token training sequences, splitting documents across
  * sequence boundaries — the classic concat-and-chunk packing that wastes
  * zero tokens to padding (vs greedy first-fit, which pads each sequence's
  * tail; the reference's size-capped batch packing is the A1 analog on the
  * collector side, `SplitBatch.scala`).
  *
  * Dataflow: one narrow token count per doc, one windowed running sum per
  * bucket, one `sequence()` explode over each doc's covered chunk range —
  * all exact integer arithmetic (no floats anywhere), so output is
  * bit-stable across engines and cluster layouts. The bucket key caps
  * window-partition size: packing is embarrassingly parallel across
  * `buckets` independent streams (at 100 TB, one bucket ≈ corpus/buckets
  * tokens; size `buckets` so a bucket's doc list fits one task's window
  * spill budget).
  */
object SeqPack {

  /** (bucket, seq_id, doc_id, tok_start, tok_len): document `doc_id`
    * contributes tokens [tok_start, tok_start+tok_len) to training
    * sequence (bucket, seq_id). Every sequence except each bucket's last
    * holds exactly `budget` tokens. */
  def packSequences(docs: DataFrame, budget: Int, buckets: Int = 32): DataFrame = {
    val before = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val b = lit(budget).cast("long")
    docs
      .select(col("doc_id"), TextOps.nTokens(col("text")).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets)))
      .withColumn("start", coalesce(sum("n_toks").over(before), lit(0L)))
      .withColumn("seq_id",
        explode(sequence(floor(col("start") / b).cast("long"),
          floor((col("start") + col("n_toks") - 1) / b).cast("long"))))
      .select(
        col("bucket"), col("seq_id"), col("doc_id"),
        greatest(col("seq_id") * b - col("start"), lit(0L)).as("tok_start"),
        (least((col("seq_id") + 1) * b, col("start") + col("n_toks")) -
          greatest(col("seq_id") * b, col("start"))).as("tok_len"))
  }

  /** Overlapping token-window chunking — the RAG/embedding-pipeline
    * pre-step (each chunk is an embedding/retrieval unit; the overlap
    * keeps boundary context in two chunks). Per doc with ≥ 1 token:
    * windows of `window` tokens starting every `stride` tokens while the
    * start is inside the doc; the tail chunk is the natural partial.
    * Chunk CONTENT is gated by md5 fingerprint so the relational output
    * stays narrow while pinning every token of every chunk.
    *
    * Purely per-row (one `sequence` explode + clamped `slice`s — no
    * join, no shuffle, no window): embarrassingly parallel at any
    * scale, output ≈ corpus_tokens / stride rows. */
  def chunkWindows(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame =
    Spread(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))).as("start_tok"))
      .select(col("doc_id"),
        (col("start_tok") / stride).cast("long").as("chunk_idx"),
        col("start_tok").cast("long"),
        slice(col("toks"), col("start_tok") + 1, lit(window)).as("ct"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("ct")).cast("long").as("n_chunk_toks"),
        md5(concat_ws(" ", col("ct"))).as("fp"))

  /** R14 (4th closing): LENGTH-BUCKETED BATCHING — the pad-minimizing
    * batcher every padded-training (SFT/reranker) pipeline runs:
    * sort docs by token length, cut the sorted order into fixed-size
    * batches, and each batch pads only to ITS OWN max length instead of
    * the global one. Returns per-batch padding accounting for BOTH arms
    * — `length`-ordered and `random` (hash-ordered) batching — so the
    * saving is measured in the result, not asserted in prose.
    *
    * Ranks never run through one task: each arm's total order is
    * (bounded key, doc_id) — token length (≤ distinct lengths) for the
    * length arm, a 2-hex-char hash prefix (256 values) for the random
    * arm — so the [[graft.operators.Sampling.tokenBudget]] two-stage
    * discipline applies: per-key counts, a prefix over the bounded key
    * relation (the only unpartitioned window), and a per-doc
    * row_number partitioned by the key. `rank = prefix + within`,
    * `batch = (rank-1) div b`, padding = `n·max(len) − Σlen` per batch
    * — all exact BIGINTs. The oracle states each arm as the single
    * global row_number window. */
  def lengthBatches(docs: DataFrame, b: Int = 64,
      salt: String = "lenb1"): DataFrame = {
    // pin the narrow (doc_id, len, h) relation ONCE: four plan arms read
    // it (per-key counts + the rank join, × two batching arms), and
    // unpinned each re-tokenizes the full corpus — the s_rproj_topk
    // CollapseProject lesson (measured here: 11.9 s → ~1 s at sf0.1)
    val base = Spread(docs)
      .select(col("doc_id"),
        TextOps.nTokens(col("text")).cast("long").as("len"))
      .where(col("len") >= 1)
      .withColumn("h", substring(md5(concat(lit(s"$salt:"), col("doc_id"))), 1, 2))
      .localCheckpoint()
    def arm(name: String, key: String): DataFrame = {
      val grp = base.groupBy(key).agg(count(lit(1)).as("c"))
      val wPrefix = Window.orderBy(col(key).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pref = grp.withColumn("pfx", sum("c").over(wPrefix) - col("c"))
        .select(key, "pfx")
      val wIn = Window.partitionBy(key).orderBy(col("doc_id").asc)
      base.join(pref, Seq(key))
        .withColumn("rk", col("pfx") + row_number().over(wIn))
        .groupBy(expr(s"(rk - 1) div $b").as("batch_idx"))
        .agg(count(lit(1)).as("n_docs"), max("len").as("max_len"),
          sum("len").as("sum_len"))
        .select(lit(name).as("arm"), col("batch_idx"), col("n_docs"),
          col("max_len"), col("sum_len"),
          (col("n_docs") * col("max_len") - col("sum_len")).as("padding"))
    }
    arm("length", "len").unionByName(arm("random", "h"))
  }

  /** R14 (4th closing): fill-in-the-middle transformation (Bavarian et
    * al. 2022, arXiv:2207.14255 — the FIM data prep every code model
    * runs): for a deterministic ~50% of docs, two uniform token cuts
    * split the doc into prefix/middle/suffix and the training text is
    * re-serialized in PSM order `<PRE> prefix <SUF> suffix <MID>
    * middle`, teaching the model to infill; the rest stay autoregressive.
    * All decisions are pure functions of doc_id (the sampling-salt
    * discipline): apply iff the first md5 hex nibble < '8', cuts are two
    * independent 32-bit hash draws mod (n+1) with lo/hi = min/max — so
    * the transform is reproducible across runs, engines, and cluster
    * layouts, and the oracle replays it bit-for-bit. Output carries the
    * exact split accounting plus the md5 fingerprint of the re-serialized
    * token stream (sentinel-delimited for PSM; the raw stream for AR
    * docs). One narrow scan, zero shuffles, zero UDFs — slices and
    * hashes are all codegen'd expressions. */
  def fimTransform(docs: DataFrame, salt: String = "fim1"): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    def h(tag: String) =
      conv(substring(md5(concat(lit(s"$salt$tag:"), col("doc_id"))), 1, 8), 16, 10)
        .cast("long")
    Spread(docs)
      .select(col("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= 1)
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("n_tokens"),
        (substring(md5(concat(lit(s"$salt:"), col("doc_id"))), 1, 1) < "8").as("applied"),
        least(pmod(h("c1"), size(col("toks")) + 1),
          pmod(h("c2"), size(col("toks")) + 1)).cast("long").as("cut_lo"),
        greatest(pmod(h("c1"), size(col("toks")) + 1),
          pmod(h("c2"), size(col("toks")) + 1)).cast("long").as("cut_hi"))
      .select(col("doc_id"), col("n_tokens"), col("applied"),
        when(col("applied"), col("cut_lo")).as("cut_lo"),
        when(col("applied"), col("cut_hi")).as("cut_hi"),
        when(col("applied"), col("cut_lo")).as("n_prefix"),
        when(col("applied"), col("cut_hi") - col("cut_lo")).as("n_middle"),
        when(col("applied"), col("n_tokens") - col("cut_hi")).as("n_suffix"),
        when(col("applied"), md5(concat_ws(" ",
          concat(array(lit("<PRE>")),
            slice(col("toks"), lit(1), col("cut_lo").cast("int")),
            array(lit("<SUF>")),
            slice(col("toks"), (col("cut_hi") + 1).cast("int"),
              (col("n_tokens") - col("cut_hi")).cast("int")),
            array(lit("<MID>")),
            slice(col("toks"), (col("cut_lo") + 1).cast("int"),
              (col("cut_hi") - col("cut_lo")).cast("int"))))))
          .otherwise(md5(concat_ws(" ", col("toks")))).as("fp"))
  }
}
