package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece) tokenizer train + serve (Kudo 2018,
  * arXiv:1804.10959) — the third canonical subword family next to BPE
  * merge replay ([[Bpe]]) and WordPiece greedy longest-prefix
  * ([[WordPiece]]). Where BPE replays a learned merge ORDER and
  * WordPiece checks MEMBERSHIP left-to-right, the unigram model scores
  * every segmentation of a word as a product of independent piece
  * probabilities and serves the VITERBI-best split — so training must
  * estimate piece probabilities, not just collect a vocabulary.
  *
  * Training is HARD (Viterbi) EM, the integerizable variant of Kudo's
  * EM: the E-step segments every distinct word under the current piece
  * costs and counts the pieces the best paths actually use; the M-step
  * re-derives costs from those counts; pruning then drops multi-char
  * pieces whose Viterbi count misses the corpus-relative floor
  * (single-character pieces are NEVER pruned — the character-coverage
  * guarantee that makes every word segmentable, Kudo's "subword
  * regularization requires all characters"). Fractional expected
  * counts (soft EM) would break the engine-wide exact-integer
  * discipline, so costs are exact integer milli-weights:
  * `cost(piece) = (floor(log2 Σcnt) − floor(log2 cnt))·64 + 1` — the
  * bit-cost idiom [[NgramLm]] pinned (`floor(log2 n) = len(bin n)−1`
  * in both engines), scaled by 64 with a +1 per piece so one DP value
  * carries BOTH objectives: minimize total bit-cost, tie-break on
  * fewer pieces. A word's best DP value is `bits·64 + n_pieces`
  * (n_pieces ≤ 32 < 64, so the fields never carry) — the VALUE is
  * unique even when multiple paths achieve it, which is what makes the
  * serve deterministic across engines and partitionings.
  *
  * The Viterbi DP itself is one `aggregate` HOF over word positions —
  * per distinct word, the (start·8+len → cost) match map rides in a
  * single map column and the fold keeps the running best-cost array
  * plus the argmin piece length per position (smallest length wins
  * ties, pinned in both engines); backtracking is a second bounded
  * fold walking the chosen lengths. No UDFs, no recursion over rows.
  *
  * Scale stance (100 TB): ONE corpus scan (token explode → word
  * frequency, map-side combined); candidates, both Viterbi passes, the
  * E-step counts and the prune all run on the DISTINCT-WORD relation
  * (corpus-sublinear), pinned once with `localCheckpoint` (the
  * [[Bpe.learn]] discipline) so the EM rounds never re-touch parquet.
  * Serving is one equi-join of the exploded corpus tokens against the
  * per-word verdicts plus one per-doc aggregate — identical join shape
  * to [[Bpe.encodeWith]]/[[WordPiece.encode]].
  *
  * Reference scope note: the reference collector has no tokenizer
  * (SURVEY §2.7) — this is training-data-pipeline surface.
  */
object UnigramLm {

  /** Longest multi-character piece considered (the WordPiece fan-out
    * bound: candidates per word ≤ len × MaxLen). */
  val MaxLen = 4

  /** Words longer than this skip the DP: each character is its own
    * piece at a fixed conservative cost (the BERT
    * max_input_chars_per_word guard re-expressed without [UNK] — a
    * unigram model with full character coverage never rejects). */
  val MaxWordChars = 32

  /** Fixed per-character bit-cost charged to over-long words — engine-
    * shared constant, deliberately worse than any learned piece. */
  val LongWordCharBits = 40L

  /** Sentinel "infinite" DP cost: large enough to never win, small
    * enough that one addition can't overflow. */
  private val Inf = 4611686018427387L

  /** Distinct words with corpus-occurrence counts — the one corpus
    * scan. */
  private[graft] def words(docs: DataFrame): DataFrame =
    Spread(docs).select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** All (start, len ≤ MaxLen) substrings of each word ≤ MaxWordChars:
    * (word, n, s, l, piece). Position classes are NOT distinguished —
    * a unigram piece's probability is position-independent (unlike
    * WordPiece's `##` continuation marking). */
  private[graft] def candidates(w: DataFrame): DataFrame =
    w.where(length(col("word")) <= MaxWordChars)
      .select(col("word"), col("n"), explode(flatten(
        transform(sequence(lit(0), length(col("word")) - 1), s =>
          transform(sequence(lit(1), least(lit(MaxLen), length(col("word")) - s)), l =>
            struct(s.cast("int").as("s"), l.cast("int").as("l"),
              col("word").substr(s + lit(1), l).as("piece")))))).as("c"))
      .select(col("word"), col("n"), col("c.s").as("s"), col("c.l").as("l"),
        col("c.piece").as("piece"))

  /** Corpus-relative frequency floor shared by seeding and pruning. */
  private def floorOf(w: DataFrame): DataFrame =
    w.agg(greatest(lit(3L), TextOps.idiv(sum("n"), lit(2000L))).as("min_cnt"))

  /** Seed model (piece, cnt): every single-character piece observed
    * (any character — full coverage), plus letter-only multi-char
    * substrings whose occurrence-weighted count reaches the floor. */
  private[graft] def seed(w: DataFrame): DataFrame =
    candidates(w)
      .where(length(col("piece")) === 1 || col("piece").rlike("^[a-z]+$"))
      .groupBy("piece").agg(sum("n").as("cnt"))
      .crossJoin(broadcast(floorOf(w)))
      .where(length(col("piece")) === 1 || col("cnt") >= col("min_cnt"))
      .select(col("piece"), col("cnt"))

  /** Integer piece costs from a (piece, cnt) model:
    * `(fl2(Σcnt) − fl2(cnt))·64 + 1`. */
  private[graft] def costs(model: DataFrame): DataFrame = {
    val tot = model.agg(sum("cnt").as("tot"))
    model.crossJoin(broadcast(tot))
      .select(col("piece"),
        ((NgramLm.fl2(col("tot")) - NgramLm.fl2(col("cnt"))) * 64L + 1L).as("cost"))
  }

  /** Viterbi over each ≤[[MaxWordChars]] word under `model` costs:
    * (word, n, combined, ks) where `combined = bits·64 + n_pieces` and
    * `ks` lists the best path's pieces as `start·8 + len` keys (the
    * backtrack, smallest winning length per position). */
  private[graft] def viterbi(w: DataFrame, model: DataFrame): DataFrame = {
    val pc = candidates(w).join(model, "piece")
      .groupBy("word")
      .agg(map_from_entries(collect_list(struct(
        (col("s") * 8 + col("l")).as("k"), col("cost").as("v")))).as("cm"))
    val len = length(col("word"))
    // forward DP: b(j) = best cost of word[0,j); ch(j) = argmin piece
    // length at j (ties to the SHORTEST length — pinned, both engines)
    def tot(acc: Column, j: Column, l: Int): Column =
      when(j >= l, coalesce(
        element_at(acc.getField("b"), (j - lit(l) + 1).cast("int")) +
          element_at(col("cm"), ((j - lit(l)) * 8 + lit(l)).cast("int")),
        lit(Inf))).otherwise(lit(Inf))
    val dp = aggregate(
      sequence(lit(1), len),
      struct(array(lit(0L)).as("b"), array().cast("array<int>").as("ch")),
      (acc, j) => {
        val ts = (1 to MaxLen).map(l => tot(acc, j, l))
        val best = least(ts: _*)
        val chosen = when(ts(0) === best, 1)
          .when(ts(1) === best, 2)
          .when(ts(2) === best, 3)
          .otherwise(4)
        struct(concat(acc.getField("b"), array(best)).as("b"),
          concat(acc.getField("ch"), array(chosen.cast("int"))).as("ch"))
      })
    // backtrack: walk chosen lengths from the end; ≤ len steps
    val back = aggregate(
      sequence(lit(1), len),
      struct(len.cast("int").as("p"), array().cast("array<int>").as("ks")),
      (acc, _) => {
        val p = acc.getField("p")
        val l = element_at(col("ch"), p)
        when(p > 0, struct((p - l).cast("int").as("p"),
          concat(acc.getField("ks"), array(((p - l) * 8 + l).cast("int"))).as("ks")))
          .otherwise(acc)
      }).getField("ks")
    w.where(length(col("word")) <= MaxWordChars)
      .join(pc, "word")
      .select(col("word"), col("n"), col("cm"), dp.getField("b").as("b"),
        dp.getField("ch").as("ch"))
      .select(col("word"), col("n"),
        element_at(col("b"), (len + 1).cast("int")).as("combined"),
        back.as("ks"))
  }

  /** E-step piece counts: occurrence-weighted tally of the pieces the
    * Viterbi-best paths use. */
  private[graft] def emCounts(vit: DataFrame): DataFrame =
    vit.select(col("word"), col("n"), explode(col("ks")).as("k"))
      .select(col("n"), col("word")
        .substr((col("k") / 8).cast("int") + 1, pmod(col("k"), lit(8)).cast("int"))
        .as("piece"))
      .groupBy("piece").agg(sum("n").as("cnt"))

  /** The trained model after one hard-EM round + prune: single-char
    * pieces always survive (count floored at 1 so the bit-cost is
    * defined even for chars the E-step never chose); multi-char pieces
    * keep their Viterbi counts and must re-clear the corpus floor. */
  private[graft] def trainedModel(w: DataFrame): DataFrame = {
    val sd = seed(w).localCheckpoint()
    val e = emCounts(viterbi(w, costs(sd))).localCheckpoint()
    val chars = sd.where(length(col("piece")) === 1)
      .join(e.withColumnRenamed("cnt", "ecnt"), Seq("piece"), "left")
      .select(col("piece"), greatest(coalesce(col("ecnt"), lit(0L)), lit(1L)).as("cnt"))
    val multi = e.where(length(col("piece")) > 1)
      .crossJoin(broadcast(floorOf(w)))
      .where(col("cnt") >= col("min_cnt"))
      .select(col("piece"), col("cnt"))
    chars.unionByName(multi)
  }

  /** The learned vocabulary: (piece, cnt, cost) after EM + prune —
    * what a SentencePiece model file ships. */
  def vocab(docs: DataFrame): DataFrame = {
    val w = words(docs).localCheckpoint()
    val m = trainedModel(w).localCheckpoint()
    m.join(costs(m), "piece").select(col("piece"), col("cnt"), col("cost"))
  }

  /** Doc-level serving under the trained model: (doc_id, n_tokens,
    * n_pieces, cost_bits) — pieces and total bit-cost of the Viterbi
    * segmentation; over-long words charge [[LongWordCharBits]] per
    * character. Train-and-serve on the same corpus (the [[Bpe.encode]]
    * contract). */
  def encode(docs: DataFrame): DataFrame = {
    val w = words(docs).localCheckpoint()
    encodeWith(Spread(docs), w, costs(trainedModel(w)))
  }

  /** Serving against an ALREADY-TRAINED cost model (the
    * [[Bpe.encodeWith]] contract — how a stream serves a frozen
    * tokenizer): `model` is a (piece, cost) relation, `w` the distinct
    * words of THIS batch. Out-of-vocabulary CHARACTERS (chars the
    * training corpus never saw have no coverage piece, so the DP walks
    * into the Inf sentinel) take the same fixed per-character arm as
    * over-long words — the stream accepts any input instead of
    * dropping it; on the train corpus itself every char is covered and
    * this arm is dead. */
  def encodeWith(docs: DataFrame, w: DataFrame, model: DataFrame): DataFrame = {
    val verdicts = viterbi(w, model)
      .select(col("word"),
        when(col("combined") < Inf, pmod(col("combined"), lit(64L)))
          .otherwise(length(col("word")).cast("long")).as("w_pieces"),
        when(col("combined") < Inf, TextOps.idiv(col("combined"), lit(64L)))
          .otherwise(length(col("word")) * LongWordCharBits).as("w_bits"))
      .unionByName(
        // words that produced NO vocabulary match at all (every char
        // OOV) fall out of viterbi's inner pc join — same fixed arm
        w.where(length(col("word")) <= MaxWordChars)
          .join(candidates(w).join(model, "piece")
            .select("word").distinct(), Seq("word"), "left_anti")
          .select(col("word"),
            length(col("word")).cast("long").as("w_pieces"),
            (length(col("word")) * LongWordCharBits).as("w_bits")))
      .unionByName(
        w.where(length(col("word")) > MaxWordChars)
          .select(col("word"),
            length(col("word")).cast("long").as("w_pieces"),
            (length(col("word")) * LongWordCharBits).as("w_bits")))
    docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .join(verdicts, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("w_pieces").as("n_pieces"),
        sum("w_bits").as("cost_bits"))
  }
}
