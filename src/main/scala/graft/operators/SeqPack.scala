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
}
