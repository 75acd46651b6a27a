package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** C4-style heuristic gates (Raffel et al. 2020 §2.2 family): terminal
    * punctuation, no code braces, no lorem-ipsum boilerplate, no
    * enable-javascript policy lines, a minimum word count. The synthetic
    * corpus is punctuation-free word salad, so — same pattern as
    * t_redact's PII augmentation — both engines first append a
    * deterministic doc_id-keyed suffix mix, making every gate
    * non-vacuous in both polarities. Pure codegen'd projection. */
  def c4Rules(docs: DataFrame): DataFrame = {
    val aug = concat(col("text"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit(". Done.")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(7)) === 0, lit(" {code}")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(11)) === 0, lit(" lorem ipsum")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(13)) === 0, lit(" javascript required")).otherwise(lit("")))
    docs.select(col("doc_id"), aug.as("aug"))
      .select(
        col("doc_id"),
        col("aug").rlike("[.!?]$").as("ends_punct"),
        col("aug").contains("{").as("has_brace"),
        col("aug").contains("lorem ipsum").as("has_lorem"),
        col("aug").contains("javascript").as("has_policy"),
        regexp_count(col("aug"), lit("\\.")).as("n_dots"),
        TextOps.nTokens(col("aug")).as("n_words"))
      .withColumn("keep",
        col("ends_punct") && !col("has_brace") && !col("has_lorem")
          && !col("has_policy") && col("n_words") >= 5)
  }

  /** Gopher-family document filter verdict: every gate is a published
    * MassiveText-style threshold over the already-oracle-checked signals
    * (word count, mean word length, stopword occurrences, duplicate
    * n-gram fractions, top-token share), plus the conjunction the
    * pipeline actually acts on. Thresholds compare floor-truncated
    * 4-decimal ratios to exact decimal literals, so the booleans are
    * bit-identical cross-engine. Domain = docs with ≥ 3 tokens (the
    * repetition-signal domain). */
  def gopherKeep(docs: DataFrame): DataFrame = {
    val rep = repetitionStats(docs)
    val base = docs.select(col("doc_id"),
      TextOps.avgWordLen(col("text")).as("avg_word_len"),
      TextOps.stopHits(col("text"), TextOps.Stop("en")).as("stop_hits"))
    rep.join(base, "doc_id")
      .select(
        col("doc_id"),
        col("n_tokens").between(30, 100000).as("g_words"),
        col("avg_word_len").between(3.0, 10.0).as("g_len"),
        (col("stop_hits") >= 2).as("g_stop"),
        (col("dup_2gram_frac") <= 0.20).as("g_rep2"),
        (col("dup_3gram_frac") <= 0.18).as("g_rep3"),
        (col("top_token_frac") <= 0.30).as("g_top"))
      .withColumn("keep",
        col("g_words") && col("g_len") && col("g_stop")
          && col("g_rep2") && col("g_rep3") && col("g_top"))
  }

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

  private def idiv(a: Column, b: Column): Column = TextOps.idiv(a, b)

  /** Unigram-distribution entropy proxy (the "gibberish vs natural text"
    * signal of the CCNet/C4 heuristic family): per document, the
    * Shannon entropy Σ p·log2(1/p) of its token distribution — recast
    * in the engine-wide exact-integer discipline as
    * `sum_bits = Σ_tok tf · floor(log2(n // tf))` (floor-log2 of the
    * floored inverse probability, `len(bin(x)) - 1` in both engines)
    * with `ent_milli = (1000·sum_bits) // n`. Near-zero for one-token
    * spam, maximal for uniform token salad; a pure function of the
    * token multiset, so aggregation order never matters. Also emits the
    * type-token ratio `ttr_milli = (1000·n_distinct) // n`.
    *
    * Plan shape: n rides the explode (no self-join for document
    * length), one (doc, n, tok) exchange with map-side combine, then a
    * doc-keyed final agg over the corpus-sublinear tf relation — the
    * t_lm_score shape without the model join. */
  def unigramEntropy(docs: DataFrame): DataFrame =
    Spread(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"),
        explode(col("toks")).as("tok"))
      .groupBy("doc_id", "n", "tok").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id", "n")
      .agg(
        count(lit(1)).as("n_distinct"),
        sum(col("tf") * NgramLm.fl2(idiv(col("n"), col("tf")))).as("sum_bits"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("n_distinct"),
        col("sum_bits"),
        idiv(lit(1000L) * col("sum_bits"), col("n")).as("ent_milli"),
        idiv(lit(1000L) * col("n_distinct"), col("n")).as("ttr_milli"))

  /** Feature-hash dimensionality of the linear quality classifier. */
  val ClfDim = 1024L

  /** Deterministic per-bucket weight in [-1001, 1001] — a multiply-mod
    * surrogate for trained coefficients (the PIPELINE — hash features,
    * look up a fixed weight vector, sum — is the deliverable; production
    * swaps this expression for a broadcast weight array without touching
    * the plan shape). */
  /** R13: exact AUC of the hashed classifier against the independent
    * language label (en vs rest) — the classifier-EVALUATION primitive
    * of an ablation loop (the FineWeb-Edu discipline: never ship a
    * quality scorer without a ranking metric). Scores quantize to
    * 64-wide bins FIRST, so the rank arithmetic runs on a BOUNDED
    * histogram (the weight range is ±1001 per gram and doc length is
    * capped, so the bin count is range/64 — the q_histogram
    * boundedness discipline; the one unpartitioned window is over
    * bins, never docs). AUC is then the exact Mann-Whitney U with
    * half-credit ties, all integer until the final 6-dp truncated
    * division: 2U = Σ_bins pos(b) · (2·neg_below(b) + neg_eq(b)). */
  def classifierAuc(docs: DataFrame): DataFrame = {
    val scored = hashedClassifier(docs).select(col("doc_id"), col("score"))
      .join(docs.select(col("doc_id"), (col("lang") === "en").as("pos")), "doc_id")
    aucOf(scored)
  }

  /** The exact rank arithmetic behind [[classifierAuc]], over any
    * `(score: long, pos: boolean)` relation — factored so the spec can
    * pin the Mann-Whitney math on hand-computed cases. */
  private[graft] def aucOf(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = scored
      .groupBy(floor(col("score") / 64).cast("long").as("bin"))
      .agg(count(when(col("pos"), 1)).as("np"),
        count(when(!col("pos"), 1)).as("nn"))
    val w = Window.orderBy("bin")
    val cum = hist.withColumn("neg_below",
      coalesce(sum("nn").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    cum.agg(
      sum("np").as("n_pos"), sum("nn").as("n_neg"),
      sum(col("np") * (lit(2L) * col("neg_below") + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        // degenerate corpus (one class absent) → AUC undefined, NULL —
        // guarded explicitly so Spark/DuckDB agree instead of relying on
        // non-ANSI NULL-on-zero vs IEEE inf behavior
        when(col("n_pos") > 0 && col("n_neg") > 0,
          TextOps.trunc(col("u2").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** R13: the confusion matrix of the classifier's own keep threshold
    * (score ≥ 0) against the en label — AUC's operating-point
    * companion. Exact BIGINT counts; precision/recall/F1 are 6-dp
    * truncated divisions of exact integers (F1 via the 2tp/(2tp+fp+fn)
    * form — one division, no float intermediates). One map-side-
    * combined aggregate, no shuffle beyond it. */
  def classifierPr(docs: DataFrame): DataFrame = {
    val scored = hashedClassifier(docs).select(col("doc_id"), col("keep"))
      .join(docs.select(col("doc_id"), (col("lang") === "en").as("pos")), "doc_id")
    scored.agg(
      count(when(col("keep") && col("pos"), 1)).as("tp"),
      count(when(col("keep") && !col("pos"), 1)).as("fp"),
      count(when(!col("keep") && col("pos"), 1)).as("fn"),
      count(when(!col("keep") && !col("pos"), 1)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        // empty-denominator operating points (no predicted positives /
        // no actual positives) → NULL, mirrored as CASE WHEN in the oracle
        when(col("tp") + col("fp") > 0,
          TextOps.trunc(col("tp").cast("double") / (col("tp") + col("fp")), 6)).as("precision"),
        when(col("tp") + col("fn") > 0,
          TextOps.trunc(col("tp").cast("double") / (col("tp") + col("fn")), 6)).as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          TextOps.trunc((lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")), 6)).as("f1"))
  }

  private def weight(gram: Column): Column = {
    val bucket = pmod(
      conv(substring(md5(gram), 1, 13), 16, 10).cast("long"), lit(ClfDim))
    bucket * 2654435761L % 2003L - 1001L
  }

  /** fastText-style hashed linear quality classifier (the
    * quality-lookalike scorer of the GPT-3/CCNet lineage, Brown et al.
    * 2020 appendix A): token unigrams + bigrams feature-hash into
    * [[ClfDim]] buckets; the doc's score is the exact-integer sum of its
    * features' weights; `keep` = non-negative score. Pure per-row HOF
    * arithmetic over a single scan — zero shuffle, whole-stage codegen,
    * O(doc length) per row at any corpus size. */
  def hashedClassifier(docs: DataFrame): DataFrame =
    Spread(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        concat(col("toks"), TextOps.shinglesOfTokens(col("toks"), 2)).as("grams"))
      .select(
        col("doc_id"),
        size(col("grams")).cast("long").as("n_feats"),
        aggregate(col("grams"), lit(0L), (acc, g) => acc + weight(g)).as("score"))
      .withColumn("keep", col("score") >= 0)
}
