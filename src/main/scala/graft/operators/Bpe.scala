package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge induction (Sennrich et al. 2016, arXiv:1508.07909 §3.1):
  * learn the first `steps` byte-pair merges from the corpus — per step,
  * count adjacent symbol pairs over the (frequency-weighted) vocabulary,
  * pick the most frequent (ties on the pair string), and merge its
  * occurrences greedy-leftmost in every word. This is the actual
  * tokenizer-training recurrence, not a frequency heuristic — the output
  * is the merge table a BPE tokenizer ships with.
  *
  * The greedy-leftmost merge is a per-word left fold: append each symbol
  * unless the accumulator ends with `x` and the symbol is `y`, in which
  * case the tail becomes `xy`. A just-merged tail can never re-trigger
  * (`xy == x` would need an empty `y`), which is exactly BPE's
  * non-overlapping scan — "aaa" under (a,a) gives [aa, a].
  *
  * Scale stance (100 TB): the corpus is scanned ONCE (token explode →
  * word-frequency aggregation, map-side combined); everything after runs
  * on the distinct-word vocabulary, which is corpus-sublinear (≈ millions
  * of rows at web scale). The vocabulary is pinned (`localCheckpoint`)
  * so the per-step branches don't re-scan the corpus, and each step's
  * 1-row top pair rides as a broadcast into the next fold — step count
  * bounds lineage like the PageRank/Lloyd loops. */
object Bpe {

  private def nPairs(syms: Column): Column = greatest(size(syms) - 1, lit(0))

  /** Adjacent symbol pairs, space-separated (symbols never contain a
    * space — they concatenate from tokenizer output). */
  private def pairsOf(syms: Column): Column =
    zip_with(slice(syms, lit(1), nPairs(syms)), slice(syms, lit(2), nPairs(syms)),
      (a, b) => concat(a, lit(" "), b))

  /** Greedy-leftmost merge of (px, py) in one word's symbol list. */
  private def mergeFold(syms: Column, px: Column, py: Column): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === px && s === py,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(px, py))))
        .otherwise(concat(acc, array(s))))

  /** The training loop: per-step 1-row top-pair tables plus the final
    * vocabulary (word, n, syms) with all `steps` merges applied. */
  private def learn(docs: DataFrame, steps: Int): (Seq[DataFrame], DataFrame) = {
    val words = Spread(docs)
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    var cur = words.withColumn("syms",
      transform(sequence(lit(1), length(col("word"))), i => col("word").substr(i, lit(1))))
    val tops = (1 to steps).map { k =>
      val top = cur
        .select(col("n"), explode(pairsOf(col("syms"))).as("pair"))
        .groupBy("pair").agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc).limit(1)
        .select(col("pair"), col("cnt"),
          split(col("pair"), " ").getItem(0).as("px"),
          split(col("pair"), " ").getItem(1).as("py"))
        .localCheckpoint() // 1 row; consumed by the output AND the next fold
      cur = cur.crossJoin(broadcast(top.select("px", "py")))
        .select(col("word"), col("n"),
          mergeFold(col("syms"), col("px"), col("py")).as("syms"))
      top.select(lit(k).as("step"), col("pair"), col("cnt").as("n"))
    }
    (tops, cur)
  }

  /** The merge table: (step, pair, n) for the first `steps` merges. */
  def merges(docs: DataFrame, steps: Int = 3): DataFrame =
    learn(docs, steps)._1.reduce(_.unionByName(_))

  /** Tokenizer serving: segment every document with the learned merge
    * table — (doc_id, n_tokens, n_subwords) for docs with ≥ 1 token.
    * The per-word subword count lives on the distinct-word VOCABULARY
    * (corpus-sublinear); scoring is one equi-join of the exploded corpus
    * tokens against it (AQE broadcasts it at test scale, keyed shuffle
    * at real scale — same query) plus one per-doc agg. The corpus text
    * is never re-segmented row by row — that's the point of training on
    * the word-frequency table. */
  def encode(docs: DataFrame, steps: Int = 3): DataFrame =
    encodeWith(Spread(docs), vocab(docs, steps))

  /** The trained tokenizer: (word, w_sub) — each distinct word's subword
    * count under the learned merges. Corpus-sublinear. */
  def vocab(docs: DataFrame, steps: Int = 3): DataFrame =
    learn(docs, steps)._2
      .select(col("word"), size(col("syms")).cast("long").as("w_sub"))

  /** Serving: segment `docs` against an already-trained vocabulary.
    * Words unseen at train time are segmented as single characters —
    * the no-merges-apply fallback (a left join + per-char count), so the
    * stream leg accepts out-of-vocabulary input instead of dropping it.
    * On the train corpus itself every word joins, reproducing
    * [[encode]] exactly. */
  def encodeWith(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .join(vocab, Seq("word"), "left")
      .withColumn("w_sub", coalesce(col("w_sub"), length(col("word")).cast("long")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w_sub").as("n_subwords"))

  /** R16: tokenizer FERTILITY by language — subwords per word under the
    * trained merges, grouped by the language-ID prediction: the metric
    * multilingual tokenizer/vocab design reads to see which languages a
    * shared vocabulary over-fragments (UniMax/NLLB-style vocabulary
    * sizing). Exact integers (fertility ×1000, floor). Docs with ≥ 1
    * token participate; per-language work is one equi-join + one agg on
    * top of [[encode]]'s corpus-sublinear chain. */
  def fertilityByLang(docs: DataFrame): DataFrame = {
    val d = Spread(docs) // ONE rebalance feeds both arms (no stacked Spread)
    encodeWith(d, vocab(docs, 3))
      .join(d.select(col("doc_id"), TextOps.langId(col("text")).as("pred_lang")), "doc_id")
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_words"), sum("n_subwords").as("n_subwords"))
      .select(col("pred_lang"), col("n_docs"), col("n_words"), col("n_subwords"),
        TextOps.idiv(col("n_subwords") * 1000, col("n_words")).as("fertility_x1000"))
  }
}
