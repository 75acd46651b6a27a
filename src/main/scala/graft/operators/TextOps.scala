package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline: language
  * ID (stopword-hit heuristic), quality scoring, token counting, document
  * fingerprinting. All pure column expressions (codegen'd, zero shuffle) —
  * at 100 TB these run as a narrow map fused into the document scan.
  */
object TextOps {

  /** Lowercase, strip non-alphanumerics, keep single spaces. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", " ")

  /** Whitespace tokens of the normalized text (empties dropped). */
  def tokens(text: Column): Column =
    filter(split(normalized(text), " +"), t => t =!= "")

  def nTokens(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, digit runs, and isolated symbols
    * each count as one token (the usual pre-tokenizer regex shape). */
  def bpeishCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Characters that are not [a-z0-9 ] after lowercasing. */
  def punctCount(text: Column): Column =
    length(lower(text)) - length(regexp_replace(lower(text), "[^a-z0-9 ]", ""))

  /** Tiny per-language stopword lists for the n-gram-free language-ID
    * heuristic. Deliberately small — the point is the operator shape
    * (list-membership scoring over tokens), not lexical coverage. */
  val Stop: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "es" -> Seq("el", "los", "de", "y", "en", "se", "que", "por"),
  )

  /** Occurrences of `words` among the text's tokens. */
  def stopHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words: _*)))

  /** CJK codepoint count (zh detection). */
  def cjkCount(text: Column): Column =
    regexp_count(text, lit("[一-鿿]"))

  /** Predicted language: zh on any CJK, else argmax of stopword hits with
    * a fixed en>de>fr>es tie order (deterministic, oracle-mirrorable). */
  def langId(text: Column): Column = {
    val s = Stop.map { case (l, w) => l -> stopHits(text, w) }
    when(cjkCount(text) > 0, "zh")
      .when(s("en") >= s("de") && s("en") >= s("fr") && s("en") >= s("es"), "en")
      .when(s("de") >= s("fr") && s("de") >= s("es"), "de")
      .when(s("fr") >= s("es"), "fr")
      .otherwise("es")
  }

  /** Character-bigram profiles for the n-gram flavor of language ID —
    * the classic Cavnar–Trenkle shape reduced to a handful of
    * characteristic bigrams per language (like [[Stop]], deliberately
    * tiny: the operator shape — profile-hit scoring over raw characters,
    * no tokenization — is the point, not lexical coverage). */
  val Bigrams: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "he", "ing", "er", "an"),
    "de" -> Seq("ei", "sch", "und", "der", "ich"),
    "fr" -> Seq("ou", "les", "que", "ai", "eau"),
    "es" -> Seq("os", "la", "el", "ci", "ado"),
  )

  /** Non-overlapping occurrences of the profile n-grams in the lowercased
    * raw text (regexp_count is non-overlapping in Spark AND DuckDB, so
    * the scores are engine-identical). */
  def bigramHits(text: Column, grams: Seq[String]): Column =
    grams.map(g => regexp_count(lower(text), lit(g))).reduce(_ + _)

  /** n-gram language ID: CJK wins outright, else argmax of character
    * n-gram profile hits with the same fixed en>de>fr>es tie order as
    * [[langId]]. Character-level, so it works on text where stopword
    * tokens are glued or absent. */
  def langIdNgram(text: Column): Column = {
    val s = Bigrams.map { case (l, g) => l -> bigramHits(text, g) }
    when(cjkCount(text) > 0, "zh")
      .when(s("en") >= s("de") && s("en") >= s("fr") && s("en") >= s("es"), "en")
      .when(s("de") >= s("fr") && s("de") >= s("es"), "de")
      .when(s("fr") >= s("es"), "fr")
      .otherwise("es")
  }

  /** Cross-engine fixed-point truncation: floor(x*10^n)/10^n. Unlike
    * round(), which Spark applies to the shortest decimal repr and DuckDB
    * to the binary value (they disagree on x.xxxx5 knife edges), floor of
    * the same binary double is bit-identical in both engines. */
  def trunc(c: Column, n: Int): Column = {
    val scale = math.pow(10, n)
    floor(c * scale) / scale
  }

  /** Exact integer floor division `a // b` (DuckDB's `//`) for
    * non-negative operands: subtracting the remainder first makes the
    * double division exact, since the dividend is an exact multiple of b.
    * Exactness requires |a| < 2^53 — for products that can exceed that,
    * use [[idiv38]]. Shared home for the engine-wide exact-integer
    * discipline (QualityRules, DocSim, Dedup's PageRank, t_mix). */
  def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** [[idiv]] carried in DECIMAL(38,0) — the "d38 pattern" for dividends
    * built from int64 products (e.g. 10^6·dot² or n1_sq·n2_sq), exact up
    * to 38 digits. The quotient is an exact integer (remainder subtracted
    * before dividing), so the decimal division introduces no rounding;
    * callers must keep the quotient itself < 2^63 for the final long
    * cast. Cast MULTIPLICANDS to D38 before multiplying — a long multiply
    * wraps silently before any cast applied to its result. */
  val D38: org.apache.spark.sql.types.DecimalType =
    org.apache.spark.sql.types.DecimalType(38, 0)
  def idiv38(a: Column, b: Column): Column = {
    val (ad, bd) = (a.cast(D38), b.cast(D38))
    ((ad - pmod(ad, bd)) / bd).cast("long")
  }

  /** Mean token length, 4 decimals (truncated). */
  def avgWordLen(text: Column): Column = {
    val total = aggregate(tokens(text), lit(0), (a, t) => a + length(t))
    trunc(total.cast("double") / nTokens(text), 4)
  }

  /** English-stopword density, 4 decimals. */
  def stopwordRatio(text: Column): Column =
    trunc(stopHits(text, Stop("en")).cast("double") / nTokens(text), 4)

  /** Punctuation density over raw chars, 4 decimals. */
  def punctRatio(text: Column): Column =
    trunc(punctCount(text).cast("double") / length(text), 4)

  /** Composite quality score in [0,1]: stopword density + length credit +
    * punctuation penalty (weights are the declared semantic). */
  def qualityScore(text: Column): Column =
    trunc(
      lit(0.4) * (stopHits(text, Stop("en")).cast("double") / nTokens(text))
        + lit(0.3) * least(lit(1.0), nTokens(text).cast("double") / 100.0)
        + lit(0.3) * (lit(1.0) - punctCount(text).cast("double") / length(text)),
      4)

  /** Content fingerprint: md5 over the normalized token stream — the
    * whitespace/punctuation-insensitive identity used for exact dedup. */
  def fingerprint(text: Column): Column =
    md5(array_join(tokens(text), " "))

  /** R14 (4th closing): the VOCABULARY GROWTH CURVE (the Heaps-law
    * diagnostic next to [[corpusStats]]): how many NEW distinct words
    * each doc_id-order slice of the corpus contributes, plus the
    * running total. A healthy crawl keeps discovering vocabulary; a
    * curve that flattens early is the signature of heavy duplication
    * or a collapsed source mix. Exact: a word's first occurrence is
    * `min(doc_id)`, its slice is an integer bucket of the doc_id range
    * (the 1-row max rides as a broadcast), and the running total is a
    * window over the ≤`buckets`-row aggregate (documented-bounded). */
  def vocabGrowth(docs: DataFrame, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Spread(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
    val mx = base.agg(max("doc_id").as("mx"))
    val perBucket = base.groupBy("word").agg(min("doc_id").as("first_doc"))
      .crossJoin(broadcast(mx))
      .select(expr(s"first_doc * $buckets div (mx + 1)").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.select(col("bucket"), col("new_types"),
      sum("new_types").over(w).as("cum_types"))
  }

  /** R14 (4th closing): the per-source CORPUS HEALTH REPORT — the
    * first dashboard a corpus build publishes and the first thing a
    * data audit reads: volume (docs, tokens), lexical richness
    * (distinct words, hapax legomena, type-token ratio), and shape
    * (mean doc length). Exact integers throughout — ratios in permille
    * by floor-div, richness from one (source, word) aggregate — so the
    * report is bit-stable across engines and cluster layouts. Two
    * corpus passes (doc-level stats + the word aggregate), both
    * map-side combined; the word relation is corpus-sublinear. */
  def corpusStats(docs: DataFrame): DataFrame = {
    // r15 (advisor): Spread widens a narrow source's partitions before
    // the two full-corpus tokenize passes — the same discipline every
    // sibling corpus-pass operator (dedupSavings, annealMix, tokenBudget)
    // applies, and these two passes benefit most.
    val base = Spread(docs)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 1)
    val docStats = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("n_tokens"))
    val wordStats = base
      .select(col("source"), explode(col("toks")).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("n"))
      .groupBy("source").agg(
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1L, 1L).otherwise(0L)).as("n_hapax"))
    docStats.join(wordStats, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_types"), col("n_hapax"),
        expr("n_types * 1000 div n_tokens").as("ttr_permille"),
        expr("n_tokens div n_docs").as("mean_doc_len"))
  }

  /** Word k-shingles of the normalized text (k consecutive tokens joined
    * by single spaces). Callers must ensure nTokens >= k. */
  def shingles(text: Column, k: Int): Column =
    shinglesOfTokens(tokens(text), k)

  /** Shingles over an already-materialized token array column.
    *
    * PERF (load-bearing shape): built by zipping k offset slices, so the
    * token expression appears only as a DIRECT argument of slice/zip_with
    * — evaluated O(k) times per ROW. The earlier
    * `transform(sequence(...), i -> element_at(t, i+j))` form referenced
    * `t` inside the lambda, which re-evaluates it per ELEMENT: harmless
    * for a named column, but when an optimizer substitution inlines the
    * full tokenization here (CollapseProject's duplication guard does not
    * protect filter-pushdown substitution — a pushed `dup_frac <= x`
    * gate did exactly that), each row paid O(L²) tokenizations: measured
    * 50× wall-time on the gopher-gated pipeline at sf0.1. Callers ensure
    * size(t) >= k; the greatest() clamp makes smaller inputs yield [] of
    * shingles instead of an error. */
  def shinglesOfTokens(t: Column, k: Int): Column = {
    val n = greatest(size(t) - (k - 1), lit(0))
    (2 to k).foldLeft(slice(t, lit(1), n)) { (acc, j) =>
      zip_with(acc, slice(t, lit(j), n), (a, b) => concat(a, lit(" "), b))
    }
  }

  /** One minhash: lexicographic min of salted md5 over the shingle set.
    * Fixed-width hex strings compare like the underlying 128-bit ints, so
    * string-min IS minhash — and it's identical SQL in DuckDB. */
  def minhash(shingleCol: Column, salt: Int): Column =
    array_min(transform(shingleCol, s => md5(concat(lit(s"$salt:"), s))))

  /** PII scrub patterns — deliberately simple regexes that mean the same
    * thing under Java regex (Spark) and RE2 (DuckDB): no backrefs, no
    * lookaround. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII redaction for training corpora: emails → `<EMAIL>`, IPv4s →
    * `<IP>` (email pass first — an address' host part must not be eaten
    * as a dotted quad). Pure codegen'd regexp_replace chain, narrow. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")

  /** Redaction counts (for scrub-rate monitoring dashboards). */
  def emailCount(text: Column): Column = size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def ipv4Count(text: Column): Column = size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))

  /** R13: payment-card candidates — 13-19 digits with optional single
    * space/dash separators. Same meaning under Java regex and RE2. A
    * bare regex over-redacts (order ids, timestamps); candidates are
    * GATED on the Luhn checksum below, the false-positive discipline
    * production PII scrubs use. */
  val CardRe = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  /** Luhn mod-10 sum of a digit string; `offset` shifts the
    * double-every-second-from-right parity (offset 1 = the payload of a
    * number whose check digit is yet to be appended). Pure exact-integer
    * HOF fold — identical arithmetic in the DuckDB oracle. */
  private[graft] def luhnSum(digits: Column, offset: Int): Column =
    aggregate(sequence(lit(1), length(digits)), lit(0), (acc, i) => {
      val v = digits.substr(i.cast("int"), lit(1)).cast("int")
      val doubled = v * 2 - when(v > 4, 9).otherwise(0)
      acc + when((length(digits) - i + offset) % 2 === 1, doubled).otherwise(v)
    })

  /** Luhn validity of one candidate (separators stripped first). */
  def luhnValid(cand: Column): Column =
    luhnSum(regexp_replace(cand, "[^0-9]", ""), 0) % 10 === 0

  /** The check digit completing `payload` to a Luhn-valid number. */
  private[graft] def luhnCheckDigit(payload: Column): Column =
    (lit(10) - luhnSum(payload, 1) % 10) % 10

  /** Card-number redaction: candidates that pass Luhn are literally
    * replaced with `<CARD>`; failing candidates stay (a random 16-digit
    * id is data, not PII). One codegen'd extract + filter + fold,
    * narrow. */
  def redactCards(text: Column): Column = {
    val valid = filter(regexp_extract_all(text, lit(CardRe), lit(0)), luhnValid _)
    aggregate(valid, text, (acc, c) => replace(acc, c, lit("<CARD>")))
  }

  def cardCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(CardRe), lit(0)), luhnValid _))

  /** R17: E.164 phone candidates — '+' then 8-15 digits, first digit
    * 1-9 (ITU-T E.164: max 15 digits incl. country code, no leading
    * zero). Same meaning under Java regex and RE2; the boundary gate is
    * the format itself — a 16+-digit run or a leading zero can never
    * match (every backtrack position inside a longer digit run fails
    * the trailing `\b`), so an over-long "number" survives as data. */
  val PhoneRe = "\\+[1-9]\\d{7,14}\\b"

  def redactPhones(text: Column): Column =
    regexp_replace(text, PhoneRe, "<PHONE>")

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))

  /** R17: IBAN candidates — ISO 13616 shape: 2 country letters, 2 check
    * digits, 11-30 alphanumeric BBAN chars. Candidates are GATED on the
    * mod-97 checksum below (the Luhn discipline: shape alone
    * over-redacts order ids). */
  val IbanRe = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{11,30}\\b"

  /** ISO 7064 mod-97 of an IBAN candidate: move the first 4 chars to
    * the end, then fold characters left-to-right keeping the running
    * remainder — digits append one decimal digit (acc·10 + d), letters
    * two (acc·100 + 10 + ord), so the giant decimal number never
    * materializes. Exact integer arithmetic; identical fold in the
    * DuckDB oracle. */
  private[graft] def mod97Chars(r: Column): Column =
    aggregate(sequence(lit(1), length(r)), lit(0L), (acc, i) => {
      val ch = r.substr(i, lit(1))
      when(ch >= "0" && ch <= "9", (acc * 10 + (ascii(ch) - 48)) % 97)
        .otherwise((acc * 100 + (ascii(ch) - 55)) % 97)
    })

  private[graft] def ibanMod97(cand: Column): Column =
    mod97Chars(concat(substring(cand, 5, 64), substring(cand, 1, 4)))

  def ibanValid(cand: Column): Column = ibanMod97(cand) === 1L

  /** IBAN redaction: candidates that pass mod-97 are replaced with
    * `<IBAN>`; failing candidates stay. Same extract+filter+fold shape
    * as [[redactCards]]. */
  def redactIbans(text: Column): Column = {
    val valid = filter(regexp_extract_all(text, lit(IbanRe), lit(0)), ibanValid _)
    aggregate(valid, text, (acc, c) => replace(acc, c, lit("<IBAN>")))
  }

  def ibanCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(IbanRe), lit(0)), ibanValid _))

  /** 16-bit simhash over tokens: bit i is set when the majority of token
    * md5s have their i-th hex digit's top bit set (+1/-1 vote sum >= 0).
    *
    * r18b (the t_bitext_recall lesson, guide §4): the old form was 16
    * independent folds, EACH re-tokenizing the text and re-hashing every
    * token (lambda-bearing expressions sit outside codegen subexpression
    * elimination, so the 16 copies all evaluated) — ~16 tokenizations
    * and 16 md5s per token per row. This form evaluates every subtree
    * exactly once per row by construction (each expensive expression
    * occurs once in the tree): one md5-transform over one tokenization,
    * one fold carrying all 16 vote counters, one zip-to-bits sum.
    * Value-identical, including the degenerate rows: an empty token list
    * folds to 16 zero votes → all bits set (0xFFFF), and NULL text maps
    * to 0 via the final coalesce — exactly the old expression's
    * null-condition fallthrough. */
  def simhash16(text: Column): Column = {
    val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val zeros = array((0 until 16).map(_ => lit(0)): _*)
    val digitPos = array((1 to 16).map(lit): _*)
    val votes = aggregate(
      transform(tokens(text), t => md5(t)),
      zeros,
      (acc, h) => zip_with(acc, digitPos, (a, i) =>
        a + when(h.substr(i, lit(1)).isin(hi: _*), 1).otherwise(-1)))
    val bitVals = array((0 until 16).map(i => lit(1L << i)): _*)
    coalesce(
      aggregate(zip_with(votes, bitVals, (v, b) => when(v >= 0, b).otherwise(lit(0L))),
        lit(0L), (a, x) => a + x),
      lit(0L))
  }
}
