package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition-based quality signals (the Gopher/MassiveText family of
  * heuristics, Rae et al. 2021 §A1.1): heavily repetitive documents are
  * boilerplate/spam and get filtered before training. Signals:
  *
  *  - `dup_2gram_frac` / `dup_3gram_frac` — fraction of word n-grams that
  *    are repeats of an earlier n-gram in the same doc;
  *  - `top_token_frac` — share of the document taken by its single most
  *    frequent token.
  *
  * All ratios are integer-derived and floor-truncated to 4 decimals, so
  * the DuckDB oracle reproduces them bit-for-bit.
  *
  * Scale stance: the n-gram fractions are per-row array expressions
  * (size + array_distinct — O(L log L) in doc length, narrow codegen'd
  * scan). The top-token share deliberately does NOT use a per-row
  * O(L²) count-each-distinct-token HOF: it explodes to (doc, token)
  * rows and aggregates — two partial-agg shuffles on doc_id that hold at
  * any document length.
  */
object QualityRules {

  def repetitionStats(docs: DataFrame): DataFrame = {
    val tok = Spread(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    def dupFrac(sh: org.apache.spark.sql.Column) =
      TextOps.trunc(
        (size(sh) - size(array_distinct(sh))).cast("double") / size(sh), 4)
    val narrow = tok
      .withColumn("s2", TextOps.shinglesOfTokens(col("toks"), 2))
      .withColumn("s3", TextOps.shinglesOfTokens(col("toks"), 3))
      .select(col("doc_id"), size(col("toks")).as("n_tokens"),
        dupFrac(col("s2")).as("dup_2gram_frac"),
        dupFrac(col("s3")).as("dup_3gram_frac"))
    val top = tok
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id").agg(max("tf").as("max_tf"))
    narrow.join(top, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        col("dup_2gram_frac"), col("dup_3gram_frac"),
        TextOps.trunc(col("max_tf").cast("double") / col("n_tokens"), 4)
          .as("top_token_frac"))
  }
}
