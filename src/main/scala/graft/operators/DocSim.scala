package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** All-pairs sparse document similarity via a df-capped inverted index —
  * the classic MapReduce pairwise-similarity shape (Elsayed, Lin &
  * Oard 2008): pairs are generated ONLY through shared postings, and a
  * document-frequency cap on the feature vocabulary bounds every
  * posting list, so total join work is Σ_f df(f)² over capped features —
  * capped-linear in the corpus, never all-pairs.
  *
  * Features are 3-token shingles (the same unit the minhash/LSH family
  * uses): near-duplicate prose shares rare shingles, while a df cap
  * drops boilerplate shingles the way similarity pruning drops
  * stopwords. Cosine is computed over the PRUNED feature space (a
  * documented semantic: dropped features contribute to neither dot
  * product nor norms, both engines agree bit-exactly).
  *
  * Exact-integer discipline: tf counts are integers, so `dot`,
  * `n1_sq`, `n2_sq` are exact int64, and the squared cosine surfaces as
  * `cos2_micro = (10^6·dot²) // (n1_sq·n2_sq)` — one floor division,
  * no float, no sqrt. Bounds (dfCap bounds docs-per-shingle, NOT shared
  * shingles per pair — near-dup docs share ~L shingles): for per-doc
  * token count L, dot ≤ Σ tf1·tf2 ≤ L² and n_sq ≤ L·max(tf)² ≤ L³, so
  * dot and n_sq stay exact int64 for L ≤ 2·10⁶ tokens/doc (2^63^⅓ ≈
  * 2.1·10⁶). The PRODUCTS 10⁶·dot² (≤ 10⁶·L⁴) and n1_sq·n2_sq (≤ L⁶)
  * exceed int64 already at L ≈ 10³, so both are carried in
  * DECIMAL(38,0) ([[TextOps.idiv38]]) — exact up to 10³⁸, i.e.
  * L ≤ ~2·10⁵ for the L⁶ term; far beyond any shipped document. The
  * floor division itself is exact at any magnitude (remainder
  * subtracted first), matching DuckDB's int128 `//` bit-for-bit.
  *
  * Plan shape (what must hold at 100 TB):
  *  - one explode scan → (doc, shingle, tf) exchange with map-side
  *    combine; the df reduction reuses that tf exchange at runtime
  *    (AQE) inside the ONE job that builds the postings table;
  *  - the kept-postings relation is PINNED (`localCheckpoint`) before
  *    fan-out — its three consumers (norms, both self-join legs) and
  *    the final norm joins would otherwise each re-derive the full
  *    explode→tf→df pipeline (the unpinned plan held 16 corpus scans;
  *    pinning is the ivfTopK precedent, and r9 measured it 12.4 → 3.3 s
  *    at sf0.1 with identical output). At cluster scale the pin is the
  *    persisted inverted index a production pipeline would keep anyway;
  *    swap `localCheckpoint` for a reliable checkpoint/table if
  *    executor loss must not replan the index build;
  *  - the postings self-join exchanges on the shingle key — both sides
  *    read the SAME pinned table, so the scan cost is paid once;
  *  - pair partials aggregate on (doc1, doc2) with map-side combine;
  *    norms are a doc-keyed narrow relation joined at the end.
  */
object DocSim {

  /** Pairs with squared-cosine ≥ `minCos2Micro`/10⁶ over df-capped
    * 3-shingle tf vectors. Output: (doc1, doc2, n_shared, dot,
    * n1_sq, n2_sq, cos2_micro), doc1 < doc2. */
  def cosinePairs(docs: DataFrame, dfCap: Int = 16,
                  minCos2Micro: Long = 100000L): DataFrame = {
    val toks = Spread(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val shingles = toks.select(col("doc_id"),
      explode(TextOps.shinglesOfTokens(col("toks"), 3)).as("sh"))

    val tf = shingles.groupBy("doc_id", "sh").agg(count(lit(1)).as("tf"))
    // kept features: shared by ≥2 docs (a df-1 feature can't generate a
    // pair) and ≤ dfCap docs (bounds the posting-list self-join)
    val kept = tf.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= dfCap)
      .select("sh")
    val postings = tf.join(kept, "sh").localCheckpoint()

    // norms over the pruned feature space (doc-keyed, corpus-sublinear)
    val norms = postings.groupBy("doc_id")
      .agg(sum(col("tf") * col("tf")).as("n_sq"))

    val a = postings.select(col("sh"), col("doc_id").as("doc1"), col("tf").as("tf1"))
    val b = postings.select(col("sh"), col("doc_id").as("doc2"), col("tf").as("tf2"))
    val pairs = a.join(b, Seq("sh"))
      .filter(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("n_shared"), sum(col("tf1") * col("tf2")).as("dot"))

    // both products can exceed int64 (see the bounds note above) — cast
    // each multiplicand to DECIMAL(38,0) BEFORE multiplying
    val num = lit(1000000L).cast(TextOps.D38) *
      col("dot").cast(TextOps.D38) * col("dot").cast(TextOps.D38)
    val den = col("n1_sq").cast(TextOps.D38) * col("n2_sq").cast(TextOps.D38)
    pairs
      .join(norms.select(col("doc_id").as("doc1"), col("n_sq").as("n1_sq")), "doc1")
      .join(norms.select(col("doc_id").as("doc2"), col("n_sq").as("n2_sq")), "doc2")
      .withColumn("cos2_micro", TextOps.idiv38(num, den))
      .filter(col("cos2_micro") >= minCos2Micro)
      .select("doc1", "doc2", "n_shared", "dot", "n1_sq", "n2_sq", "cos2_micro")
  }

  /** TRAIN half of the ingest-time near-dup detector: the df-capped
    * inverted index over the frozen corpus — postings (sh, doc_id, tf)
    * plus per-doc pruned norms, both pinned. This is [[cosinePairs]]'
    * index-build prefix factored out so serving never re-derives it
    * (the BM25 `bm25Stats`/`scoreWith` split, applied to similarity).
    * In production these two relations persist as tables partitioned on
    * the shingle key.
    *
    * `pin` trades materialization for reuse: true (the default)
    * checkpoints the index once so every consumer — micro-batch serve
    * loops AND one-shot compositions — reads it for free; the unpinned
    * d_docsim_serve plan re-derived the explode→tf→df pipeline per
    * consumer arm (10 parquet scans in PLANS_r11; pinned re-measures
    * FASTER at sf0.1, 2.6 vs 3.3 s, r12). The index is near-corpus-
    * sized (singletons are kept: an incoming doc matching a corpus
    * singleton is exactly the hit ingest dedup wants), so at cluster
    * scale this is a persisted TABLE, not an executor-memory pin.
    * false leaves the relations lazy for callers that consume the
    * postings exactly once. */
  def postingsIndex(docs: DataFrame, dfCap: Int = 16,
                    pin: Boolean = true): (DataFrame, DataFrame) = {
    val toks = Spread(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val tf = toks
      .select(col("doc_id"), explode(TextOps.shinglesOfTokens(col("toks"), 3)).as("sh"))
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("tf"))
    // serve-side keep rule: any feature ≤ dfCap docs (df = 1 still
    // matters here — an incoming doc can match a corpus singleton)
    val kept = tf.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("sh")
    val postings0 = tf.join(kept, "sh")
    val postings = if (pin) postings0.localCheckpoint() else postings0
    val norms0 = postings.groupBy("doc_id")
      .agg(sum(col("tf") * col("tf")).as("n_sq"))
    (postings, if (pin) norms0.localCheckpoint() else norms0)
  }

  /** SERVE half: score an INCOMING batch of docs against the frozen
    * index — near-dup verdicts for ingest (is this new doc ≥ cos²
    * threshold of anything already in the corpus?). Each incoming doc's
    * pruned features (kept = present in the index postings, the frozen
    * vocabulary) join the posting lists; work is Σ_f df(f)·tf_in(f),
    * capped-linear in the batch, zero corpus rescans. Norms on the
    * incoming side use the same pruned feature space, so a doc
    * re-ingested verbatim scores cos²=1 against its stored copy.
    * Output: (in_doc_id, doc_id, n_shared, dot, cos2_micro). */
  def scoreAgainstIndex(batch: DataFrame, postings: DataFrame, norms: DataFrame,
                        minCos2Micro: Long = 100000L): DataFrame = {
    val toks = batch
      .select(col("doc_id").as("in_doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val tfIn = toks
      .select(col("in_doc_id"), explode(TextOps.shinglesOfTokens(col("toks"), 3)).as("sh"))
      .groupBy("in_doc_id", "sh").agg(count(lit(1)).as("tf_in"))
      // frozen vocabulary: only features the index kept participate
      .join(postings.select("sh").distinct(), "sh")
    val normsIn = tfIn.groupBy("in_doc_id")
      .agg(sum(col("tf_in") * col("tf_in")).as("n_in_sq"))
    val pairs = tfIn
      .join(postings.select(col("sh"), col("doc_id"), col("tf")), Seq("sh"))
      .groupBy("in_doc_id", "doc_id")
      .agg(count(lit(1)).as("n_shared"), sum(col("tf_in") * col("tf")).as("dot"))
    val num = lit(1000000L).cast(TextOps.D38) *
      col("dot").cast(TextOps.D38) * col("dot").cast(TextOps.D38)
    val den = col("n_in_sq").cast(TextOps.D38) * col("n_sq").cast(TextOps.D38)
    pairs
      .join(normsIn, "in_doc_id")
      .join(norms.select(col("doc_id"), col("n_sq")), "doc_id")
      .withColumn("cos2_micro", TextOps.idiv38(num, den))
      .filter(col("cos2_micro") >= minCos2Micro)
      .select("in_doc_id", "doc_id", "n_shared", "dot", "cos2_micro")
  }
}
