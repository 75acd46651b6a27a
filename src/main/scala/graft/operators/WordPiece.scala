package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer serving (Wu et al. 2016, arXiv:1609.08144 §4.1;
  * the BERT tokenizer's inference rule): segment each word by GREEDY
  * LONGEST-PREFIX MATCH against a subword vocabulary — at each position
  * take the longest vocabulary piece that prefixes the rest of the word,
  * advance past it, repeat; if no piece matches at some position the
  * WHOLE word becomes a single `[UNK]` token. This is a genuinely
  * different serving algorithm from BPE's merge-table replay
  * ([[Bpe.encodeWith]]): WordPiece never consults merge order, only
  * membership, and its failure mode is all-or-nothing per word.
  *
  * Position classes are real: a piece matched at the start of a word and
  * the same characters matched word-internally are DIFFERENT vocabulary
  * entries (BERT writes the latter `##piece`); induction and matching
  * both key on `(cont, piece)` where `cont = start > 0`.
  *
  * Vocabulary induction is a deterministic frequency floor (exact
  * integers, so the DuckDB oracle reproduces it bit-for-bit): every
  * letter-only substring of length ≤ [[MaxLen]] of every word, counted
  * with word-occurrence weight and within-word multiplicity, kept when
  * its count reaches `max(3, totalTokens/2000)` — the floor grows with
  * the corpus the way real vocabularies hold size against scale. Pieces
  * are LETTERS ONLY by policy (the numeral-handling choice many
  * production vocabs make): any digit-bearing word fails its walk at the
  * digit and surfaces as `[UNK]`, which is the real mid-word failure
  * semantics, exercised at every SF by the deterministic corpus
  * dressing in the query. Words longer than [[MaxWordChars]] are
  * `[UNK]` without segmentation — BERT's `max_input_chars_per_word`
  * guard, which also bounds per-word candidate fan-out at scale.
  *
  * Scale stance (100 TB): the corpus is scanned once (token explode →
  * word-frequency aggregation, map-side combined); candidate generation,
  * vocabulary induction, and the greedy walk all run on the DISTINCT-WORD
  * relation (corpus-sublinear — millions of rows at web scale, each with
  * ≤ `len × MaxLen` candidate structs). Serving is one equi-join of the
  * exploded corpus tokens against the per-word verdicts (AQE broadcasts
  * at test scale, keyed shuffle at real scale) plus one per-doc
  * aggregate. The walk itself is a single `aggregate` HOF over the
  * word's sorted match list — O(matches) per word, no recursion, no UDF.
  */
object WordPiece {

  /** Longest vocabulary piece considered (BERT vocabs carry longer
    * pieces; 4 keeps the candidate fan-out tight while exercising every
    * length class on the test corpus). */
  val MaxLen = 4

  /** BERT's max_input_chars_per_word: longer words are [UNK] outright. */
  val MaxWordChars = 32

  /** Distinct words with corpus-occurrence counts — the one corpus scan. */
  private[graft] def words(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** All (start, len ≤ MaxLen) substrings of each word ≤ MaxWordChars:
    * (word, n, s, l, piece, cont). Bounded: ≤ len × MaxLen rows/word. */
  private[graft] def candidates(w: DataFrame): DataFrame =
    w.where(length(col("word")) <= MaxWordChars)
      .select(col("word"), col("n"), explode(flatten(
        transform(sequence(lit(0), length(col("word")) - 1), s =>
          transform(sequence(lit(1), least(lit(MaxLen), length(col("word")) - s)), l =>
            struct(s.cast("int").as("s"), l.cast("int").as("l"),
              col("word").substr(s + lit(1), l).as("piece")))))).as("c"))
      .select(col("word"), col("n"), col("c.s").as("s"), col("c.l").as("l"),
        col("c.piece").as("piece"), (col("c.s") > 0).as("cont"))

  /** The induced vocabulary: (cont, piece) for letter-only pieces whose
    * weighted count reaches the corpus-relative floor. */
  private[graft] def vocab(w: DataFrame): DataFrame = {
    // r15 (advisor): exact-integer idiv, not floor(double-div) — past
    // ~4e15 total tokens the rounded double quotient can cross an
    // integer boundary and diverge from the oracle's exact `//`.
    val floor = w.agg(greatest(lit(3L),
      TextOps.idiv(sum("n"), lit(2000L))).as("min_cnt"))
    candidates(w)
      .where(col("piece").rlike("^[a-z]+$"))
      .groupBy("cont", "piece").agg(sum("n").as("cnt"))
      .crossJoin(broadcast(floor))
      .where(col("cnt") >= col("min_cnt"))
      .select(col("cont"), col("piece"))
  }

  /** Per-distinct-word greedy verdicts: (word, w_pieces, w_unk). The
    * match list is sorted (start asc, len desc) so the first element at
    * the walk position is the longest piece there; one `aggregate` pass
    * advances the position and counts pieces; a walk that stalls before
    * the end of the word (or a word past MaxWordChars, which generated
    * no candidates) is [UNK] with exactly one piece. */
  private[graft] def segments(w: DataFrame): DataFrame = {
    val voc = vocab(w)
    val matches = candidates(w)
      .join(voc, Seq("cont", "piece"))
      .groupBy("word")
      .agg(sort_array(collect_list(
        struct(col("s"), (lit(MaxLen) - col("l")).as("li"), col("l")))).as("ms"))
    w.join(matches, Seq("word"), "left")
      .select(col("word"), length(col("word")).as("len"),
        aggregate(col("ms"),
          struct(lit(0).as("p"), lit(0L).as("c")),
          (acc, m) => when(m.getField("s") === acc.getField("p"),
            struct((acc.getField("p") + m.getField("l")).as("p"),
              (acc.getField("c") + 1L).as("c")))
            .otherwise(acc)).as("r"))
      .select(col("word"),
        when(col("r.p") === col("len"), col("r.c")).otherwise(lit(1L)).as("w_pieces"),
        coalesce(col("r.p") =!= col("len"), lit(true)).as("w_unk"))
  }

  /** Doc-level serving: (doc_id, n_tokens, n_pieces, n_unk) for docs
    * with ≥ 1 token. Train-and-serve on the same corpus (the
    * [[Bpe.encode]] contract). */
  def encode(docs: DataFrame): DataFrame = {
    val d = Spread(docs)
    // r15: pin the distinct-word relation — unpinned, its four
    // consumers (the vocab floor, vocab candidates, the match list,
    // and the per-word walk spine) each re-ran the corpus tokenize +
    // word aggregate from the parquet scan (5 scans in PLANS_r14; the
    // d_containment recompute class). Pinned, the corpus tokenizes
    // once per leg (the serving explode is the only other pass) — the
    // same discipline Bpe.learn and UnigramLm already apply.
    d.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .join(segments(words(d).localCheckpoint()), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("w_pieces").as("n_pieces"),
        sum(when(col("w_unk"), 1L).otherwise(0L)).as("n_unk"))
  }
}
