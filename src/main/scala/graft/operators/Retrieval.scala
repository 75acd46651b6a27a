package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the document corpus: Okapi BM25 scoring
  * (Robertson et al., TREC-3) recast in the engine-wide exact-integer
  * discipline so both engines rank bit-identically regardless of
  * aggregation order.
  *
  * Two deviations from the textbook formula, both forced by the
  * cross-engine float ban and both documented here:
  *
  *  - The idf factor `log((N - df + 0.5) / (df + 0.5))` keeps its
  *    Robertson–Sparck-Jones odds argument but drops the log:
  *    `odds_milli = (1000·(2N − 2df + 1)) // (2df + 1)`. Exact integer,
  *    same rarity ordering; multi-term sums weigh rare terms more
  *    sharply than the log form (a documented surrogate, not an
  *    approximation error — every ranking is still a pure function of
  *    the corpus).
  *  - The tf saturation `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`
  *    with the standard k1 = 1.2, b = 0.75 is folded into one integer
  *    division: den_milli = 1000·tf + 300 + (900·dlr_milli) // 1000
  *    where dlr_milli = (10^6·dl) // avgdl_milli and
  *    avgdl_milli = (1000·total_tokens) // N. Working in milli-units of
  *    the RATIO dl/avgdl (instead of cross-multiplying by the corpus
  *    token total) keeps every intermediate ≤ ~10^9·tf — int64-safe at
  *    100 TB corpus sizes where a raw `44·total·tf` cross-mult would
  *    overflow.
  *
  * Plan shape (two corpus scans, no corpus-scale shuffle):
  *  - Scan 1 explodes tokens WITH the doc's token count (`dl`) carried
  *    on every row, so document length never needs a corpus self-join,
  *    and semi-joins the broadcast query-term set BEFORE the tf
  *    exchange — the only wide shuffle carries matched tokens only.
  *  - `df` re-reads the same tf exchange (identical subtree → AQE
  *    runtime exchange reuse; the final adaptive plan shows one
  *    ReusedExchange, so the explode scan runs once) and reduces it to
  *    a |query terms|-row broadcast.
  *  - Scan 2 is a narrow no-explode pass for the (n_docs, total_tok)
  *    1-row broadcast — cheaper than deriving corpus scalars from the
  *    exploded relation, and prunes to nothing but the text column.
  *  - Top-k per query is a WindowGroupLimit over query_id — k rows per
  *    query survive the per-partition pre-limit, never a global sort.
  */
object Retrieval {

  private def idiv(a: Column, b: Column): Column = TextOps.idiv(a, b)

  private def qtermsDF(docs: DataFrame, queries: Seq[(Int, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    queries
      .flatMap { case (qid, text) =>
        text.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.map(qid -> _)
      }
      .toDF("query_id", "tok")
  }

  /** The matched-token tf relation: dl rides the explode (each token row
    * carries its doc's length); the broadcast semi filter runs map-side,
    * BEFORE any exchange — the only wide shuffle carries matched tokens. */
  private def tfRelation(docs: DataFrame, qterms: DataFrame): DataFrame = {
    val qtoks = qterms.select("tok").distinct()
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("tok"))
      .join(broadcast(qtoks), Seq("tok"), "left_semi")
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
  }

  /** TRAIN half of the serve split: the frozen per-term index stats —
    * (tok, df, n_docs, total_tok), one row per query term present in the
    * corpus, the corpus scalars replicated onto each (broadcast-sized by
    * construction: ≤ |query terms| rows). The df aggregation re-reads
    * the same tf exchange the scorer builds (identical subtree → AQE
    * runtime exchange reuse); the scalars come from a second NARROW scan
    * (no explode, no shuffle), with dl > 0 matching the tf-derived
    * domain: token-less docs score nowhere. */
  def bm25Stats(docs: DataFrame, queries: Seq[(Int, String)]): DataFrame = {
    val df = tfRelation(docs, qtermsDF(docs, queries))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = docs
      .select(size(TextOps.tokens(col("text"))).as("dl")).filter(col("dl") > 0)
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_tok"))
    df.crossJoin(broadcast(stats))
  }

  /** SERVE half: score any documents-shaped relation against FROZEN
    * index stats — the production retrieval shape (index built once over
    * the corpus; fresh documents scored per micro-batch via
    * `foreachBatch`, like NgramLm.scoreWith / Dsir.scoreWith). Output:
    * one row per (query, doc) with ≥ 1 matched term — bm25TopK's scored
    * relation before ranking. Stream-safe: the only wide operation is
    * the per-micro-batch tf groupBy; everything else is broadcast. */
  /** The exact-integer BM25 term contribution (milli-units), over
    * columns (tf, df, dl, n_docs, total_tok) — k1=1.2, b=0.75 folded
    * into the 2200/1000/300/900 constants. Public so composite
    * retrievers ([[Hybrid]]) score with bit-identical algebra. */
  def termScoreMilli: Column = {
    val avgdlMilli = idiv(lit(1000L) * col("total_tok"), col("n_docs"))
    val dlrMilli = idiv(lit(1000000L) * col("dl"), avgdlMilli)
    val oddsMilli = idiv(
      lit(1000L) * (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L)),
      lit(2L) * col("df") + lit(1L))
    val denMilli = lit(1000L) * col("tf") + lit(300L) + idiv(lit(900L) * dlrMilli, lit(1000L))
    val satMilli = idiv(lit(2200000L) * col("tf"), denMilli)
    idiv(oddsMilli * satMilli, lit(1000L))
  }

  def scoreWith(docs: DataFrame, queries: Seq[(Int, String)], stats: DataFrame): DataFrame = {
    val qterms = qtermsDF(docs, queries)
    val matched = tfRelation(docs, qterms)
      .join(broadcast(qterms), "tok")
      .join(broadcast(stats), "tok")

    matched
      .withColumn("term_milli", termScoreMilli)
      .groupBy("query_id", "doc_id")
      .agg(sum("term_milli").as("score_milli"), count(lit(1)).as("n_hit"))
  }

  /** BM25 top-k: one output row per (query, rank) with the matched doc,
    * its exact-integer milli-score, and how many query terms hit.
    * `queries` is (query_id, whitespace query text) — tiny by
    * definition (a query workload, not data). Composes the train/serve
    * halves over the same corpus; top-k per query is a WindowGroupLimit
    * over query_id — k rows per query survive the per-partition
    * pre-limit, never a global sort. */
  def bm25TopK(docs: DataFrame, queries: Seq[(Int, String)], k: Int): DataFrame = {
    val scored = scoreWith(docs, queries, bm25Stats(docs, queries))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_milli").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score_milli", "n_hit")
  }
}
