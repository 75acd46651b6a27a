package graft.queries

import graft.operators.TextOps

/** DuckDB oracles for [[Training]] — list-function mirrors of the Spark
  * HOF expressions. Shared semantics that make this possible:
  *  - tokenization = lower → strip non-[a-z0-9 ] → split on spaces;
  *  - all hashing is md5 hex (lexicographic min of fixed-width hex ==
  *    128-bit minhash in both engines);
  *  - embeddings are quantized to integer-valued doubles before any
  *    arithmetic, so sums are exact and order-insensitive.
  */
object TrainingOracles {

  /** Token list of `text` (keep in lockstep with TextOps.tokens). */
  private val Toks =
    """list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'), t -> t <> '')"""

  private def stopIn(lang: String): String =
    TextOps.Stop(lang).map(w => s"'$w'").mkString("(", ", ", ")")

  private def hits(lang: String): String =
    s"len(list_filter(toks, t -> t IN ${stopIn(lang)}))"

  /** doc_id + toks CTE over documents. */
  private val TokCte =
    s"WITH tok AS (SELECT doc_id, text, lang, $Toks AS toks FROM documents)"

  /** 3-shingle list over toks (callers filter len(toks) >= 3). */
  private val Shingles =
    "list_transform(range(0, len(toks) - 2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])"

  private def minhash(salt: Int): String =
    s"list_min(list_transform(sh, s -> md5('$salt:' || s)))"

  /** Signature CTE: doc_id, sig0..sig3 (docs with >= 3 tokens). */
  private val SigCte =
    s"""$TokCte,
       |shi AS (SELECT doc_id, $Shingles AS sh FROM tok WHERE len(toks) >= 3),
       |sig AS (SELECT doc_id, ${minhash(0)} AS sig0, ${minhash(1)} AS sig1,
       |               ${minhash(2)} AS sig2, ${minhash(3)} AS sig3 FROM shi)""".stripMargin

  /** Bigram-LM surprisal chain ending in the per-doc `lmscore` CTE
    * (doc_id, n_bigrams, total_bits, bits_x1000) — shared by t_lm_score
    * and t_lm_tiers. */
  private val LmScoreCte =
    s"""$TokCte,
       |bg AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
       |                 i -> toks[i+1] || ' ' || toks[i+2])) AS bg
       |       FROM tok WHERE len(toks) >= 2),
       |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1),
       |c1 AS (SELECT string_split(bg, ' ')[1] AS w1, CAST(sum(c2) AS BIGINT) AS c1
       |       FROM c2 GROUP BY 1),
       |bits AS (SELECT c2.bg,
       |           (len(bin(c1.c1)) - 1) - (len(bin(c2.c2)) - 1) AS bits
       |         FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.w1),
       |lmscore AS (
       |  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |         CAST(sum(bits.bits) AS BIGINT) AS total_bits,
       |         CAST((sum(bits.bits) * 1000) // count(*) AS BIGINT) AS bits_x1000
       |  FROM bg JOIN bits USING (bg) GROUP BY 1)""".stripMargin

  /** BPE oracle plumbing — DuckDB's list_reduce needs acc type ==
    * element type, so the greedy-leftmost fold carries the merged word
    * as a "|s1|s2|..." string (the LIKE '%|x' suffix test is the
    * symbol-boundary-safe "last symbol == x" check) and re-splits. */
  private def bpeFold(symcol: String, px: String, py: String) =
    s"string_split(substr(list_reduce(list_prepend('', $symcol), " +
      s"(acc, s) -> CASE WHEN acc LIKE '%|' || $px AND s = $py " +
      s"THEN substr(acc, 1, len(acc) - len($px)) || $px || $py " +
      s"ELSE acc || '|' || s END), 2), '|')"

  private def bpePairs(symcol: String) =
    s"list_transform(range(0, len($symcol) - 1), " +
      s"i -> $symcol[i+1] || ' ' || $symcol[i+2])"

  private def bpeTop(p: String) =
    s"""SELECT pair, CAST(cnt AS BIGINT) AS cnt,
       |         string_split(pair, ' ')[1] AS px, string_split(pair, ' ')[2] AS py
       |       FROM (SELECT *, row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rn
       |             FROM $p) WHERE rn = 1""".stripMargin

  /** BPE chain through 3 merge steps: t1..t3 top-pair CTEs, w0..w2 the
    * vocabulary after 0..2 folds (consumers add w3 if they need the
    * final segmentation). */
  private val BpeChain =
    s"""$TokCte,
       |words AS (
       |  SELECT w AS word, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT unnest(toks) AS w FROM tok) GROUP BY 1),
       |w0 AS (SELECT word, n,
       |         list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms
       |       FROM words),
       |p1 AS (SELECT pair, sum(n) AS cnt FROM (
       |    SELECT n, unnest(${bpePairs("syms")}) AS pair FROM w0) GROUP BY 1),
       |t1 AS (${bpeTop("p1")}),
       |w1 AS (SELECT word, n, ${bpeFold("syms", "t1.px", "t1.py")} AS syms FROM w0, t1),
       |p2 AS (SELECT pair, sum(n) AS cnt FROM (
       |    SELECT n, unnest(${bpePairs("syms")}) AS pair FROM w1) GROUP BY 1),
       |t2 AS (${bpeTop("p2")}),
       |w2 AS (SELECT word, n, ${bpeFold("syms", "t2.px", "t2.py")} AS syms FROM w1, t2),
       |p3 AS (SELECT pair, sum(n) AS cnt FROM (
       |    SELECT n, unnest(${bpePairs("syms")}) AS pair FROM w2) GROUP BY 1),
       |t3 AS (${bpeTop("p3")})""".stripMargin

  /** PQ/ADC chain through the approximate-distance `pairs` CTE —
    * per-subspace centroids carried as (sum vector, count) so every
    * distance is exact-integer arithmetic until ONE division
    * (Σ(n·x − S)²/n²); the per-pair fold sums the 8 subspace distances
    * in j order via list(d2 ORDER BY j) → list_sum, matching Spark's
    * index-order aggregate() fold bit-for-bit. Shared by s_pq_topk and
    * s_refine. Defined lazily: EmbCte is referenced before its own
    * initializer otherwise. */
  /** IVF-PQ candidate chain ending in `ppairs(q_id, c_id, ad)` — the
    * ivfCells chain supplies cells + probes, the p-prefixed PQ CTEs
    * (`dims` collides) supply codes + per-query subspace distances, and
    * ADC folds ONLY over candidate pairs drawn from each query's two
    * probed cells. Mirrors Similarity.ivfPqTopK (IVF trained on the %7
    * sample, PQ codebook on the full corpus). Shared by s_ivfpq_topk and
    * s_ivfpq_refine. */
  private lazy val IvfPqChain: String = {
      val subD2p = "list_sum(list_transform(range(1, 9), t -> " +
        "pow(c.n * v.qv[c.j*8 + t] - c.sv[t], 2))) / (c.n * c.n)"
      s"""${ivfCellsCte("vec_id % 7 = 0")},
         |probes AS (
         |  SELECT vec_id AS q_id, c_label AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY score ASC, c_label ASC) AS rn
         |    FROM scored1 WHERE vec_id % 97 = 0) t WHERE rn <= 2),
         |cand AS (
         |  SELECT p.q_id, c.vec_id AS c_id
         |  FROM probes p JOIN cells c ON c.cell = p.cell AND c.vec_id <> p.q_id),
         |pdims AS (SELECT vec_id, label, qv, unnest(range(1, 65)) AS i FROM n),
         |psubcent AS (
         |  SELECT label AS c_label, (i-1)//8 AS j, i, sum(qv[i]) AS s, count(*) AS cnt
         |  FROM pdims GROUP BY 1, 2, 3),
         |pcentv AS (
         |  SELECT c_label, j, list(s ORDER BY i) AS sv, min(cnt) AS n
         |  FROM psubcent GROUP BY 1, 2),
         |pscored AS (
         |  SELECT v.vec_id, c.j, c.c_label, $subD2p AS d2
         |  FROM n v, pcentv c),
         |pcodes AS (
         |  SELECT vec_id, j, c_label AS code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, j
         |                                 ORDER BY d2 ASC, c_label ASC) AS rn
         |    FROM pscored) t WHERE rn = 1),
         |ppairs AS (
         |  SELECT d.vec_id AS q_id, k.vec_id AS c_id,
         |    list_sum(list(d.d2 ORDER BY d.j)) AS ad
         |  FROM pscored d
         |  JOIN pcodes k ON d.j = k.j AND d.c_label = k.code
         |  JOIN cand ON cand.q_id = d.vec_id AND cand.c_id = k.vec_id
         |  GROUP BY 1, 2)""".stripMargin
  }

  private lazy val PqChain = {
    val subD2 = "list_sum(list_transform(range(1, 9), t -> " +
      "pow(c.n * v.qv[c.j*8 + t] - c.sv[t], 2))) / (c.n * c.n)"
    s"""$EmbCte,
       |dims AS (SELECT vec_id, label, qv, unnest(range(1, 65)) AS i FROM n),
       |subcent AS (
       |  SELECT label AS c_label, (i-1)//8 AS j, i, sum(qv[i]) AS s, count(*) AS cnt
       |  FROM dims GROUP BY 1, 2, 3),
       |centv AS (
       |  SELECT c_label, j, list(s ORDER BY i) AS sv, min(cnt) AS n
       |  FROM subcent GROUP BY 1, 2),
       |scored AS (
       |  SELECT v.vec_id, c.j, c.c_label, $subD2 AS d2
       |  FROM n v, centv c),
       |codes AS (
       |  SELECT vec_id, j, c_label AS code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, j
       |                                 ORDER BY d2 ASC, c_label ASC) AS rn
       |    FROM scored) t WHERE rn = 1),
       |pairs AS (
       |  SELECT d.vec_id AS q_id, k.vec_id AS c_id,
       |    list_sum(list(d.d2 ORDER BY d.j)) AS ad
       |  FROM scored d JOIN codes k ON d.j = k.j AND d.c_label = k.code
       |  WHERE d.vec_id % 97 = 0 AND k.vec_id <> d.vec_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** dHash chain ending in the per-doc `dh` CTE (doc_id, dhash,
    * n_ones) — shared by m_dhash and m_dhash_nn. */
  private val DhashCte = {
    def gray(sx: String, sy: String) =
      s"((299*((doc_id + 7*$sx + 13*$sy) % 256) + " +
        s"587*((2*doc_id + 11*$sx + 3*$sy) % 256) + " +
        s"114*((5*doc_id + $sx + $sy) % 256)) // 1000)"
    val (gxy, gx1y) = (gray("((x * w) // 9)", "((y * h) // 8)"),
      gray("(((x+1) * w) // 9)", "((y * h) // 8)"))
    s"""WITH g AS (
       |  SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (3*doc_id) % 16 AS h
       |  FROM documents),
       |bb AS (
       |  SELECT doc_id, tx.x AS x, ty.y AS y,
       |    CASE WHEN $gx1y > $gxy THEN 1 ELSE 0 END AS bit
       |  FROM g, UNNEST(range(0, 8)) AS tx(x), UNNEST(range(0, 8)) AS ty(y)),
       |dh AS (
       |  SELECT doc_id,
       |    lower(lpad(to_hex(sum(bit * (1::HUGEINT << (y*8 + x)))::UBIGINT), 16, '0')) AS dhash,
       |    CAST(sum(bit) AS INT) AS n_ones
       |  FROM bb GROUP BY 1)""".stripMargin
  }

  /** WHT pHash chain ending in the per-doc `ph` CTE (doc_id, phash,
    * n_ones) — shared by m_phash and m_phash_nn. All-integer: luma from
    * the analytic BMP pixel formulas via 8×8 nearest resize, 2-D
    * Walsh-Hadamard coefficients as ±1-signed sums, discrete median of
    * the 63 ACs, strict > threshold. */
  /** R14 video-frame-signature relation: base videos + trimmed
    * re-publications (doc_id + 1e6 for doc_id ≡ 4 mod 9 — pixel time
    * shifted by 1, one fewer frame), each frame's exact channel sums
    * over the analytically re-derived pixel grid. Mirrors
    * Multimodal.videoFrameSigs. */
  /** R17 audio half of the AVI container: the interleaved `01wb` PCM
    * chunks re-derived analytically (trim twins share every surviving
    * chunk because samples key on the ABSOLUTE frame time) and reduced
    * to per-chunk exact integer stats — mirrors
    * Multimodal.decodeAviAudio over Multimodal.synthAviVideo. */
  private val AudioChunkCteInner =
    """ag AS (SELECT doc_id, 4 + doc_id % 5 AS frames, 40 + doc_id % 24 AS spc
      |       FROM documents),
      |avids AS (
      |  SELECT doc_id AS out_id, doc_id AS d, 0 AS toff, frames AS nf, spc FROM ag
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id, 1, frames - 1, spc FROM ag WHERE doc_id % 9 = 4),
      |asmp AS (
      |  SELECT v.out_id, CAST(c.c AS INT) AS chunk_idx,
      |    ((v.d*2654435761 + ((c.c + v.toff) * v.spc + k.k)*2246822519) % 4001) - 2000 AS v
      |  FROM avids v, UNNEST(range(0, v.nf)) AS c(c), UNNEST(range(0, v.spc)) AS k(k)),
      |achk AS (
      |  SELECT out_id, chunk_idx, CAST(count(*) AS INT) AS n_samples,
      |    CAST(sum(v) AS BIGINT) AS sum_s, CAST(sum(abs(v)) AS BIGINT) AS sum_l1,
      |    CAST(sum(v*v) AS BIGINT) AS energy, CAST(max(abs(v)) AS INT) AS peak
      |  FROM asmp GROUP BY 1, 2)""".stripMargin

  private val VideoSigCte =
    """WITH g AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (3*doc_id) % 8 AS h,
      |             4 + doc_id % 5 AS frames FROM documents),
      |vids AS (
      |  SELECT doc_id AS out_id, doc_id AS base_id, 0 AS toff, frames AS nf FROM g
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id, 1, frames - 1 FROM g WHERE doc_id % 9 = 4),
      |fr AS (
      |  SELECT i.out_id, g.doc_id AS d, g.w, g.h,
      |    CAST(t.t AS INT) AS frame_idx, t.t + i.toff AS t
      |  FROM vids i JOIN g ON g.doc_id = i.base_id,
      |       UNNEST(range(0, i.nf)) AS t(t)),
      |px AS (
      |  SELECT out_id, d, w, h, frame_idx, t, x.x AS x, y.y AS y
      |  FROM fr, UNNEST(range(0, w)) AS x(x), UNNEST(range(0, h)) AS y(y)),
      |vsig AS (
      |  SELECT out_id AS doc_id, frame_idx,
      |    w || ':' || h || ':' ||
      |    CAST(sum((d + 7*x + 13*y + 11*t) % 256) AS BIGINT) || ':' ||
      |    CAST(sum((2*d + 11*x + 3*y + 11*t) % 256) AS BIGINT) || ':' ||
      |    CAST(sum((5*d + x + y + 11*t) % 256) AS BIGINT) AS fsig
      |  FROM px GROUP BY out_id, frame_idx, w, h)""".stripMargin

  /** R14 audio-fingerprint relation: base rows + re-encoded variants
    * (doc_id + 1e6 for doc_id ≡ 3 mod 7, ±1 sample noise), samples
    * re-derived analytically from the hash-mixed synth, 65 window
    * energies with empty tail windows as 0, MEDIAN-thresholded bits
    * (quantile_disc(e, 0.5) = the exact sorted(e)(32) order statistic
    * over 65 values) packed MSB-first into 16 hex chars. Mirrors
    * Multimodal.audioFpOf. */
  private val AudioFpCte =
    """WITH g AS (SELECT doc_id, (64 + doc_id % 64) * (1 + doc_id % 2) AS total
      |           FROM documents),
      |ids AS (
      |  SELECT doc_id AS out_id, doc_id AS base_id, 0 AS pert FROM g
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id, 1 FROM g WHERE doc_id % 7 = 3),
      |smp AS (
      |  SELECT i.out_id, k.k AS k, g.total,
      |    (((g.doc_id*2654435761 + k.k*2246822519) % 4001) - 2000)
      |      + i.pert * ((g.doc_id + k.k) % 3 - 1) AS v
      |  FROM ids i JOIN g ON g.doc_id = i.base_id,
      |       UNNEST(range(0, g.total)) AS k(k)),
      |ew AS (
      |  SELECT out_id, CAST((k * 65) // total AS INT) AS w,
      |    CAST(sum(v * v) AS BIGINT) AS e
      |  FROM smp GROUP BY 1, 2),
      |allw AS (
      |  SELECT ow.out_id, ow.w, COALESCE(ew.e, 0) AS e
      |  FROM (SELECT i.out_id, w.w AS w
      |        FROM ids i, UNNEST(range(0, 65)) AS w(w)) ow
      |  LEFT JOIN ew ON ew.out_id = ow.out_id AND ew.w = ow.w),
      |med AS (
      |  SELECT out_id, quantile_disc(e, 0.5) AS m FROM allw GROUP BY 1),
      |bits AS (
      |  SELECT a.out_id, a.w,
      |    CASE WHEN a.e > med.m THEN 1 ELSE 0 END AS bit
      |  FROM allw a JOIN med ON med.out_id = a.out_id),
      |hexd AS (
      |  SELECT out_id, CAST(w // 4 AS INT) AS d,
      |    CAST(sum(bit * (CASE CAST(w % 4 AS INT)
      |      WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) AS INT) AS dval
      |  FROM bits WHERE w < 64 GROUP BY 1, 2),
      |afp_rel AS (
      |  SELECT out_id AS doc_id,
      |    string_agg(substr('0123456789abcdef', dval + 1, 1), '' ORDER BY d) AS afp
      |  FROM hexd GROUP BY 1)""".stripMargin

  private val PhashCte = {
    val luma =
      "((299*((doc_id + 7*((x*w)//8) + 13*((y*h)//8)) % 256) + " +
        "587*((2*doc_id + 11*((x*w)//8) + 3*((y*h)//8)) % 256) + " +
        "114*((5*doc_id + ((x*w)//8) + ((y*h)//8)) % 256)) // 1000)"
    s"""WITH g AS (
       |  SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (3*doc_id) % 16 AS h
       |  FROM documents),
       |lum AS (
       |  SELECT doc_id, tx.x AS x, ty.y AS y, $luma AS luma
       |  FROM g, UNNEST(range(0, 8)) AS tx(x), UNNEST(range(0, 8)) AS ty(y)),
       |wht AS (
       |  SELECT doc_id, tu.u AS u, tv.v AS v,
       |    sum(luma * (CASE WHEN (bit_count(x & u) + bit_count(y & v)) % 2 = 0
       |                THEN 1 ELSE -1 END)) AS c
       |  FROM lum, UNNEST(range(0, 8)) AS tu(u), UNNEST(range(0, 8)) AS tv(v)
       |  GROUP BY 1, 2, 3),
       |med AS (
       |  SELECT doc_id, quantile_disc(c, 0.5) AS m
       |  FROM wht WHERE NOT (u = 0 AND v = 0) GROUP BY 1),
       |ph AS (
       |  SELECT w.doc_id,
       |    lower(lpad(to_hex(sum(CASE WHEN NOT (u = 0 AND v = 0) AND c > m
       |      THEN (1::HUGEINT << (v*8 + u)) ELSE 0 END)::UBIGINT), 16, '0')) AS phash,
       |    CAST(sum(CASE WHEN NOT (u = 0 AND v = 0) AND c > m THEN 1 ELSE 0 END) AS INT) AS n_ones
       |  FROM wht w JOIN med USING (doc_id) GROUP BY 1)""".stripMargin
  }

  /** Quantized-embedding CTE: vec_id, label, qv, n2, bucket. */
  private val EmbCte =
    """WITH q AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, qv,
      |    list_sum(list_transform(qv, x -> x * x)) AS n2,
      |""".stripMargin +
      (1 to 8).map(i => s"CASE WHEN qv[$i] >= 0 THEN '1' ELSE '0' END")
        .mkString("    ", " || ", " AS bucket\n") +
      "  FROM q)"

  private val CosAB =
    "floor(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i])) / (sqrt(a.n2) * sqrt(b.n2)) * 1000000) / 1000000"

  /** Projected-vector list literal from the SHARED md5-seeded sign
    * matrix (Similarity.rpSigns — both engines splice the identical
    * {+1,0,−1} literals; the cross-engine claim is the projection
    * arithmetic and the retrieval on it, the rate-table discipline). */
  private val RpProj: String =
    graft.operators.Similarity.rpSigns.map { row =>
      row.zipWithIndex.collect { case (s, i) if s != 0 =>
        (if (s > 0) "+" else "-") + s"qv[${i + 1}]"
      }.mkString
    }.mkString("[", ",\n      ", "]")

  /** Projected corpus CTE chain over [[EmbCte]]'s `q`: pn(vec_id, pv,
    * pn2) — shared by the projected-top-k and recall oracles. */
  private val RpCte =
    s"""pn AS (
       |  SELECT vec_id, pv, list_sum(list_transform(pv, x -> x * x)) AS pn2
       |  FROM (SELECT vec_id, $RpProj AS pv FROM q) p)""".stripMargin

  /** Exact squared-L2 between two pn rows (integer-valued doubles). */
  private val RpD2 =
    "a.pn2 + b.pn2 - 2 * list_sum(list_transform(range(1, len(a.pv) + 1), i -> a.pv[i] * b.pv[i]))"

  /** Exact squared-L2 between two full-dim n rows. */
  private val FullD2 =
    "a.n2 + b.n2 - 2 * list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i]))"

  /** IVF serve oracle, parameterized by the Lloyd training-sample filter
    * over `n` (everything downstream — final assignment, probes — always
    * reads the FULL corpus, mirroring Similarity.trained/ivfProbe). */
  /** CTE chain ending in `cells(vec_id, qv, n2, cell)` — the Lloyd-
    * refined full-corpus cell assignment shared by the IVF serve oracles
    * and the SemDeDup oracle (scored1 also stays visible for probes). */
  private def ivfCellsCte(trainFilter: String): String = {
    def scoredFrom(centn: String) =
      s"""SELECT n.vec_id, n.qv, n.n2, c.c_label,
         |    c.cn2 - 2 * list_sum(list_transform(range(1, len(n.qv) + 1),
         |                                        i -> n.qv[i] * c.cv[i])) AS score
         |  FROM n, $centn c""".stripMargin
    def centsFrom(cells: String) =
      s"""SELECT c_label, cv, list_sum(list_transform(cv, x -> x * x)) AS cn2 FROM (
         |  SELECT c_label, list(c ORDER BY i) AS cv FROM (
         |    SELECT a.cell AS c_label, d.i, sum(a.qv[d.i]) / count(*) AS c
         |    FROM $cells a, (SELECT unnest(range(1, 65)) AS i) d GROUP BY 1, 2) t
         |  GROUP BY 1)""".stripMargin
    s"""$EmbCte,
       |tr AS (SELECT * FROM n WHERE $trainFilter),
       |dims AS (SELECT label, qv, unnest(range(1, len(qv) + 1)) AS i FROM tr),
       |cent0 AS (SELECT label AS c_label, i, sum(qv[i]) / count(*) AS c
       |          FROM dims GROUP BY 1, 2),
       |centv0 AS (SELECT c_label, list(c ORDER BY i) AS cv FROM cent0 GROUP BY 1),
       |centn0 AS (SELECT c_label, cv,
       |             list_sum(list_transform(cv, x -> x * x)) AS cn2 FROM centv0),
       |scored0 AS (
       |  SELECT n.vec_id, n.qv, n.n2, c.c_label,
       |    c.cn2 - 2 * list_sum(list_transform(range(1, len(n.qv) + 1),
       |                                        i -> n.qv[i] * c.cv[i])) AS score
       |  FROM tr n, centn0 c),
       |cells0 AS (
       |  SELECT vec_id, qv, n2, c_label AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY score ASC, c_label ASC) AS rn
       |    FROM scored0) t WHERE rn = 1),
       |centn1 AS (
       |  ${centsFrom("cells0")}),
       |scored1 AS (
       |  ${scoredFrom("centn1")}),
       |cells AS (
       |  SELECT vec_id, qv, n2, c_label AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY score ASC, c_label ASC) AS rn
       |    FROM scored1) t WHERE rn = 1)""".stripMargin
  }

  private def ivfTopKSql(trainFilter: String): String = {
    s"""${ivfCellsCte(trainFilter)},
       |probes AS (
       |  SELECT vec_id, qv, n2, c_label AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY score ASC, c_label ASC) AS rn
       |    FROM scored1 WHERE vec_id % 97 = 0) t WHERE rn <= 2)
       |SELECT q_id, rank, c_id, cos FROM (
       |  SELECT a.vec_id AS q_id, b.vec_id AS c_id, $CosAB AS cos,
       |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $CosAB DESC, b.vec_id ASC) AS rank
       |  FROM probes a JOIN cells b ON a.cell = b.cell AND b.vec_id <> a.vec_id) t
       |WHERE rank <= 3""".stripMargin
  }

  /** Multi-table hyperplane-LSH pair oracle — the code expressions are
    * generated from the SAME sign function the Spark expression uses
    * ([[graft.functions.HyperplaneCodes.sign]]), as literal ±qv[i] sums,
    * so banding is bit-identical across engines (projections of
    * integer-quantized embeddings are exact integers). */
  private def hyperplanePairsSql(tables: Int, bits: Int, threshold: String): String = {
    import graft.functions.HyperplaneCodes.sqlCode
    val codeCols = (0 until tables).map(t => s"${sqlCode(t, bits, 64)} AS code$t").mkString(",\n    ")
    val bandArms = (0 until tables)
      .map(t => s"SELECT vec_id, qv, n2, $t AS t, code$t AS code FROM coded")
      .mkString("\n  UNION ALL ")
    s"""$EmbCte,
       |coded AS (SELECT vec_id, qv, n2,
       |    $codeCols
       |  FROM n),
       |bands AS (
       |  $bandArms)
       |SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, $CosAB AS cos
       |FROM bands a JOIN bands b
       |  ON a.t = b.t AND a.code = b.code AND a.vec_id < b.vec_id
       |WHERE $CosAB >= $threshold""".stripMargin
  }

  /** Connected-components closure CTE chain ending in
    * `clustered(doc_id, cluster)` — shared by the cluster and keep-set
    * oracles. */
  private val ClusterCte =
    s"""${SigCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |bands0 AS (SELECT doc_id, unnest([md5(sig0 || sig1), md5(sig2 || sig3)]) AS band FROM sig),
       |bands AS (SELECT doc_id, band FROM (
       |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 64),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT a, b FROM edges
       |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |clustered AS (
       |  SELECT s.doc_id, least(s.doc_id, coalesce(min(r.b), s.doc_id)) AS cluster
       |  FROM sig s LEFT JOIN reach r ON r.a = s.doc_id
       |  GROUP BY s.doc_id)""".stripMargin

  /** The salted-hash split CASE over an arbitrary key expression —
    * generated from Training's boundary constants so the oracle can
    * never drift from the engine's split rule. */
  private def splitCaseOver(key: String, salt: String): String = {
    def thr(k: Int): String = if (k >= 256) "zz" else f"$k%02x"
    s"""CASE WHEN substr(md5('$salt:' || $key), 1, 2) < '${thr(Training.SplitTrain)}' THEN 'train'
       |       WHEN substr(md5('$salt:' || $key), 1, 2) < '${thr(Training.SplitVal)}' THEN 'val'
       |       ELSE 'test' END""".stripMargin
  }

  /** The doc-keyed split CASE (the t_sample rule, default salt). */
  private val SplitCase = splitCaseOver("doc_id", Training.SplitSalt)

  /** The last weights CTE of [[PerceptronCtes]]. */
  private val PerceptronLastW =
    s"w${Training.PerceptronEpochs * Training.PerceptronBatches}"

  /** [[PerceptronCtes]] + the held-out scoring chain, ending in
    * `se(doc_id, y, margin)` — test-split grams → hashed features →
    * margins against the trained weights (unseen buckets weight 0).
    * Shared by the eval / trained-AUC / calibration oracles, mirroring
    * QualityRules.perceptronTestMargins. */
  private lazy val PerceptronEvalCtes: String = {
    val last = PerceptronLastW
    s"""$PerceptronCtes,
       |ge AS (SELECT doc_id, pos, list_concat(toks,
       |    list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]))
       |      AS grams
       |  FROM tok2 WHERE $SplitCase = 'test'),
       |fe AS (SELECT doc_id,
       |    CASE WHEN pos THEN 1 ELSE -1 END AS y,
       |    ('0x' || substr(md5(gr), 1, 13))::BIGINT % 1024 AS bucket,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT doc_id, pos, unnest(grams) AS gr FROM ge) u
       |  GROUP BY 1, 2, 3),
       |se AS (SELECT fe.doc_id, fe.y,
       |    CAST(sum(fe.cnt * coalesce($last.w, 0)) AS BIGINT) AS margin
       |  FROM fe LEFT JOIN $last USING (bucket) GROUP BY 1, 2)""".stripMargin
  }

  /** [[graft.operators.QualityRules.SpamPhrase]] as a SQL literal
    * (defined before [[PerceptronCtes]], which splices it). */
  private val SpamSql = graft.operators.QualityRules.SpamPhrase

  /** Mini-batch-perceptron CTE chain, kept in lockstep with
    * QualityRules.perceptronTrain: planted-spam dressing → train-split
    * grams → hashed feature relation f(doc_id, y, bucket, cnt) → w0 = 0
    * over every training bucket → one (margin, gradient, weights) CTE
    * triple per update step (epoch e, mini-batch b = doc_id % B),
    * ending in `w{epochs·batches}`. All-BIGINT arithmetic. The
    * multi-referenced relations (f feeds every step; each w_s feeds the
    * next margin AND the next update) are `AS MATERIALIZED` — DuckDB's
    * inliner would otherwise re-expand the doubled reference chain
    * exponentially across 12 steps, the same blow-up the engine side
    * pins away with per-step localCheckpoint. */
  private val PerceptronCtes: String = {
    val b = Training.PerceptronBatches
    val steps = (1 to Training.PerceptronEpochs * b).map { s =>
      val batch = (s - 1) % b
      s"""m$s AS (SELECT f.doc_id, f.y, CAST(sum(f.cnt * w${s - 1}.w) AS BIGINT) AS margin
         |  FROM f JOIN w${s - 1} USING (bucket) WHERE f.doc_id % $b = $batch GROUP BY 1, 2),
         |g$s AS (SELECT bucket, CAST(sum(y * cnt) AS BIGINT) AS g FROM f
         |  WHERE doc_id IN (SELECT doc_id FROM m$s WHERE y * margin <= 0) GROUP BY 1),
         |w$s AS MATERIALIZED (SELECT w${s - 1}.bucket, CAST(w${s - 1}.w + coalesce(g$s.g, 0) AS BIGINT) AS w
         |  FROM w${s - 1} LEFT JOIN g$s USING (bucket))""".stripMargin
    }.mkString(",\n")
    s"""WITH dress AS (SELECT doc_id,
       |    text || CASE WHEN doc_id % 3 = 0 THEN '$SpamSql' ELSE '' END AS text,
       |    doc_id % 3 = 0 AS pos
       |  FROM documents),
       |tok2 AS MATERIALIZED (SELECT doc_id, pos, $Toks AS toks FROM dress),
       |g AS (SELECT doc_id, pos, list_concat(toks,
       |    list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]))
       |      AS grams
       |  FROM tok2 WHERE $SplitCase = 'train'),
       |f AS MATERIALIZED (SELECT doc_id,
       |    CASE WHEN pos THEN 1 ELSE -1 END AS y,
       |    ('0x' || substr(md5(gr), 1, 13))::BIGINT % 1024 AS bucket,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT doc_id, pos, unnest(grams) AS gr FROM g) u
       |  GROUP BY 1, 2, 3),
       |w0 AS MATERIALIZED (SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS w FROM f),
       |$steps""".stripMargin
  }

  /** CDC chunk CTE chain ending in `chunks(doc_id, chunk_id, chunk_fp,
    * n_tokens)` — shared by the chunk and shared-chunk oracles. */
  private val ChunkCte =
    s"""$TokCte,
       |pos AS (
       |  SELECT doc_id, toks, unnest(list_transform(range(0, len(toks)),
       |    i -> {'p': i, 'tok': toks[i+1]})) AS u
       |  FROM tok WHERE len(toks) >= 1),
       |flat AS (
       |  SELECT doc_id, u.p AS pos, u.tok AS tok,
       |    md5(array_to_string(toks[u.p+1 : u.p+4], ' ')) AS whash
       |  FROM pos),
       |marked AS (
       |  SELECT doc_id, pos, tok,
       |    CASE WHEN pos > 0 AND substr(whash, 1, 1) IN ('0','1') THEN 1 ELSE 0 END AS boundary
       |  FROM flat),
       |chunked AS (
       |  SELECT doc_id, pos, tok,
       |    CAST(sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS chunk_id
       |  FROM marked),
       |chunks AS (
       |  SELECT doc_id, chunk_id,
       |    md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp,
       |    count(*) AS n_tokens
       |  FROM chunked GROUP BY doc_id, chunk_id)""".stripMargin

  private val simhashSum = (0 until 16).map { i =>
    s"CASE WHEN list_sum(list_transform(toks, t -> CASE WHEN substr(md5(t), ${i + 1}, 1) IN " +
      s"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) >= 0 THEN ${1L << i} ELSE 0 END"
  }.mkString(" + ")

  /** 64-bit simhash CTE chain (mirrors Dedup.simhashes64 bit-for-bit):
    * vote i reads bit (i mod 4) of hex digit (i div 4) via set
    * membership (no hex-int conversion in either engine); bits OR
    * together, with bit 63 spelled `(-max-1)` because DuckDB parses the
    * bare min-BIGINT literal as INT128. Generated single-line so it
    * embeds safely inside stripMargin query strings. */
  private val Simhash64Cte: String = {
    val hexBitSets = Seq(
      Seq("1", "3", "5", "7", "9", "b", "d", "f"),
      Seq("2", "3", "6", "7", "a", "b", "e", "f"),
      Seq("4", "5", "6", "7", "c", "d", "e", "f"),
      Seq("8", "9", "a", "b", "c", "d", "e", "f"))
    val sums = (0 until 64).map { i =>
      val set = hexBitSets(i % 4).map(c => s"'$c'").mkString(", ")
      s"sum(CASE WHEN substr(h, ${i / 4 + 1}, 1) IN ($set) THEN 1 ELSE -1 END) AS s$i"
    }.mkString(", ")
    val bits = (0 until 64).map { i =>
      val v = if (i == 63) "(-9223372036854775807 - 1)" else s"${1L << i}"
      s"CASE WHEN s$i >= 0 THEN $v::BIGINT ELSE 0::BIGINT END"
    }.mkString(" | ")
    s"u64 AS (SELECT doc_id, unnest(toks) AS t FROM tok), " +
      s"h64 AS (SELECT doc_id, md5(t) AS h FROM u64), " +
      s"sums64 AS (SELECT doc_id, $sums FROM h64 GROUP BY doc_id), " +
      s"codes64 AS (SELECT doc_id, $bits AS code FROM sums64)"
  }

  /** The full t_pipeline2 gate chain (fuzzy-dedup keepers, sampling +
    * splits, decontamination, gopher + C4 keeps, token counts) as a CTE
    * prefix — t_pipeline2 selects from it directly and t_pipeline3
    * appends the classifier gate + span-dedup accounting. */
  private val Pipeline2Cte: String = {
    import Training.{SampleDefault, SampleRates, SampleSalt, SplitSalt, SplitTrain, SplitVal}
    def thr(k: Int): String = if (k >= 256) "zz" else f"$k%02x"
    val thrCase = SampleRates.toSeq.sorted.map { case (l, k) =>
      s"WHEN lang = '$l' THEN '${thr(k)}'"
    }.mkString("CASE ", " ", s" ELSE '${thr(SampleDefault)}' END")
    val wCase = SampleRates.toSeq.sorted.map { case (l, k) =>
      s"WHEN lang = '$l' THEN CAST(${256.0 / k} AS DOUBLE)"
    }.mkString("CASE ", " ", s" ELSE CAST(${256.0 / SampleDefault} AS DOUBLE) END")
    def splitCase(idExpr: String): String =
      s"""CASE WHEN substr(md5('$SplitSalt:' || $idExpr), 1, 2) < '${thr(SplitTrain)}' THEN 'train'
         |     WHEN substr(md5('$SplitSalt:' || $idExpr), 1, 2) < '${thr(SplitVal)}' THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""$ClusterCte,
       |keepers AS (SELECT DISTINCT cluster AS doc_id FROM clustered),
       |samp AS (
       |  SELECT doc_id, lang, $wCase AS weight, ${splitCase("doc_id")} AS split
       |  FROM documents
       |  WHERE substr(md5('$SampleSalt:' || doc_id), 1, 2) < $thrCase),
       |dshi AS (SELECT doc_id, list_distinct($Shingles) AS sh,
       |    ${splitCase("doc_id")} AS split
       |  FROM tok WHERE len(toks) >= 3),
       |dflat AS (SELECT doc_id, split, unnest(sh) AS s FROM dshi),
       |dev AS (SELECT DISTINCT s FROM dflat WHERE split <> 'train'),
       |contam AS (
       |  SELECT DISTINCT f.doc_id FROM dflat f JOIN dev ON f.s = dev.s
       |  WHERE f.split = 'train'),
       |ntok AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens FROM tok),
       |qsh AS (SELECT doc_id, toks, len(toks) AS n_tokens,
       |    list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]) AS s2,
       |    $Shingles AS s3
       |  FROM tok WHERE len(toks) >= 3),
       |qnarrow AS (SELECT doc_id, n_tokens,
       |    floor(CAST(len(s2) - len(list_distinct(s2)) AS DOUBLE) / len(s2) * 10000) / 10000 AS dup2,
       |    floor(CAST(len(s3) - len(list_distinct(s3)) AS DOUBLE) / len(s3) * 10000) / 10000 AS dup3
       |  FROM qsh),
       |qtop AS (SELECT doc_id, CAST(max(tf) AS BIGINT) AS max_tf FROM (
       |    SELECT doc_id, tok, count(*) AS tf FROM (
       |      SELECT doc_id, unnest(toks) AS tok FROM tok WHERE len(toks) >= 3) f
       |    GROUP BY 1, 2) g GROUP BY 1),
       |qbase AS (SELECT doc_id,
       |    floor(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) * 10000) / 10000 AS awl,
       |    ${hits("en")} AS stop_hits
       |  FROM tok),
       |gkeep AS (
       |  SELECT n.doc_id FROM qnarrow n
       |  JOIN qtop t ON t.doc_id = n.doc_id
       |  JOIN qbase b ON b.doc_id = n.doc_id
       |  WHERE n.n_tokens BETWEEN 30 AND 100000 AND b.awl BETWEEN 3.0 AND 10.0
       |    AND b.stop_hits >= 2 AND n.dup2 <= 0.20 AND n.dup3 <= 0.18
       |    AND floor(CAST(t.max_tf AS DOUBLE) / n.n_tokens * 10000) / 10000 <= 0.30),
       |qaug AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 3 = 0 THEN '. Done.' ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0 THEN ' {code}' ELSE '' END
       |    || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum' ELSE '' END
       |    || CASE WHEN doc_id % 13 = 0 THEN ' javascript required' ELSE '' END AS aug
       |  FROM documents),
       |c4keep AS (
       |  SELECT doc_id FROM qaug
       |  WHERE regexp_matches(aug, '[.!?]$$') AND NOT contains(aug, '{')
       |    AND NOT contains(aug, 'lorem ipsum') AND NOT contains(aug, 'javascript')
       |    AND len(list_filter(string_split_regex(regexp_replace(lower(aug), '[^a-z0-9 ]', ' ', 'g'), ' +'), t -> t <> '')) >= 5)""".stripMargin
  }

  /** R15: one Viterbi pass of the unigram-LM chain — the recursion
    * mirrors UnigramLm.viterbi's aggregate fold step for step: one
    * recursive step per word position, the running best-cost list
    * carried in `b`, the argmin piece length per position in `ch`
    * (ties to the SHORTEST length in both engines). Out-of-range
    * lookups are masked identically: a piece start < 0 never joins, so
    * its arm coalesces to the shared INF sentinel. */
  private def uniWalk(n: Int, pc: String): String =
    s"""walk$n(word, j, b, ch) AS (
       |  SELECT word, 0, [CAST(0 AS BIGINT)], CAST([] AS INT[])
       |  FROM wc WHERE len(word) <= 32
       |  UNION ALL
       |  SELECT word, j + 1, list_append(b, best),
       |         list_append(ch, CASE WHEN t1 = best THEN 1 WHEN t2 = best THEN 2
       |                              WHEN t3 = best THEN 3 ELSE 4 END)
       |  FROM (SELECT *, least(t1, t2, t3, t4) AS best FROM (
       |    SELECT w.word, w.j, w.b, w.ch,
       |           coalesce(w.b[w.j + 1] + p1.cost, 4611686018427387) AS t1,
       |           coalesce(w.b[w.j] + p2.cost, 4611686018427387) AS t2,
       |           coalesce(w.b[w.j - 1] + p3.cost, 4611686018427387) AS t3,
       |           coalesce(w.b[w.j - 2] + p4.cost, 4611686018427387) AS t4
       |    FROM walk$n w
       |    LEFT JOIN $pc p1 ON p1.word = w.word AND p1.l = 1 AND p1.s = w.j
       |    LEFT JOIN $pc p2 ON p2.word = w.word AND p2.l = 2 AND p2.s = w.j - 1
       |    LEFT JOIN $pc p3 ON p3.word = w.word AND p3.l = 3 AND p3.s = w.j - 2
       |    LEFT JOIN $pc p4 ON p4.word = w.word AND p4.l = 4 AND p4.s = w.j - 3
       |    WHERE w.j < len(w.word)) s0) s1),
       |fin$n AS (SELECT word, b, ch FROM walk$n WHERE j = len(word))""".stripMargin

  /** R15: the shared unigram-LM (SentencePiece) training chain — seed
    * vocabulary with integer bit-costs, one hard-EM round (Viterbi walk
    * + backtrack + occurrence-weighted piece recount), then the prune
    * (single chars always survive with counts floored at 1; multi-char
    * pieces re-clear the corpus floor). Mirrors UnigramLm.trainedModel. */
  private val UniChain =
    s"""WITH RECURSIVE tok AS (SELECT doc_id, $Toks AS toks FROM (
       |    SELECT doc_id, text ||
       |      CASE WHEN doc_id % 37 = 0 THEN ' x86' ELSE '' END ||
       |      CASE WHEN doc_id % 53 = 0 THEN ' ' || repeat('ab', 20) ELSE '' END AS text
       |    FROM documents)),
       |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n
       |       FROM (SELECT unnest(toks) AS word FROM tok) GROUP BY 1),
       |cand AS (SELECT word, n, c.s AS s, c.l AS l, c.piece AS piece
       |         FROM (SELECT word, n, unnest(flatten(list_transform(range(0, len(word)),
       |                  s -> list_transform(range(1, least(4, len(word) - s) + 1),
       |                       l -> {'s': s, 'l': l, 'piece': substr(word, s + 1, l)})))) AS c
       |               FROM wc WHERE len(word) <= 32)),
       |flo AS (SELECT greatest(3, CAST(sum(n) AS BIGINT) // 2000) AS min_cnt FROM wc),
       |seed AS (SELECT piece, cnt FROM (
       |           SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM cand
       |           WHERE len(piece) = 1 OR regexp_matches(piece, '^[a-z]+$$') GROUP BY 1), flo
       |         WHERE len(piece) = 1 OR cnt >= min_cnt),
       |c0 AS (SELECT piece, CAST(len(bin(tot)) - len(bin(cnt)) AS BIGINT) * 64 + 1 AS cost
       |       FROM seed, (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM seed)),
       |pc0 AS (SELECT c.word, c.s, c.l, m.cost FROM cand c JOIN c0 m USING (piece)),
       |${uniWalk(0, "pc0")},
       |back0(word, p, ps, pl) AS (
       |  SELECT word, len(word), CAST(NULL AS INT), CAST(NULL AS INT)
       |  FROM wc WHERE len(word) <= 32
       |  UNION ALL
       |  SELECT b.word, b.p - f.ch[b.p], b.p - f.ch[b.p], f.ch[b.p]
       |  FROM back0 b JOIN fin0 f USING (word) WHERE b.p > 0),
       |ecnt AS (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM (
       |           SELECT b.word, substr(b.word, b.ps + 1, b.pl) AS piece
       |           FROM back0 b WHERE b.ps IS NOT NULL) p JOIN wc USING (word) GROUP BY 1),
       |pr AS (SELECT s.piece, greatest(coalesce(e.cnt, 0), 1) AS cnt
       |       FROM (SELECT piece FROM seed WHERE len(piece) = 1) s
       |       LEFT JOIN ecnt e USING (piece)
       |       UNION ALL
       |       SELECT e.piece, e.cnt FROM ecnt e, flo
       |       WHERE len(e.piece) > 1 AND e.cnt >= min_cnt),
       |c1 AS (SELECT piece, CAST(len(bin(tot)) - len(bin(cnt)) AS BIGINT) * 64 + 1 AS cost
       |       FROM pr, (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM pr))""".stripMargin

  val all: Map[String, String] = Map(
    // unigram-LM vocabulary after hard-EM + prune (pieces, Viterbi
    // counts, integer bit-costs) — mirrors UnigramLm.vocab
    "t_unigram_vocab" ->
      s"""$UniChain
         |SELECT p.piece, p.cnt, CAST(c.cost AS BIGINT) AS cost
         |FROM pr p JOIN c1 c USING (piece)""".stripMargin,

    // unigram-LM doc serve: Viterbi pieces + total bit-cost under the
    // trained model; the DP value packs both (bits*64 + n_pieces), so
    // no second backtrack is needed — mirrors UnigramLm.encode
    "t_unigram_lm" ->
      s"""$UniChain,
         |pc1 AS (SELECT c.word, c.s, c.l, m.cost FROM cand c JOIN c1 m USING (piece)),
         |${uniWalk(1, "pc1")},
         |seg AS (SELECT wc.word,
         |          CASE WHEN len(wc.word) <= 32 THEN f.b[len(wc.word) + 1] % 64
         |               ELSE CAST(len(wc.word) AS BIGINT) END AS w_pieces,
         |          CASE WHEN len(wc.word) <= 32 THEN f.b[len(wc.word) + 1] // 64
         |               ELSE 40 * len(wc.word) END AS w_bits
         |        FROM wc LEFT JOIN fin1 f USING (word))
         |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(sum(s.w_pieces) AS BIGINT) AS n_pieces,
         |       CAST(sum(s.w_bits) AS BIGINT) AS cost_bits
         |FROM (SELECT doc_id, unnest(toks) AS word FROM tok) d JOIN seg s USING (word)
         |GROUP BY 1""".stripMargin,

    "t_text_stats" ->
      s"""$TokCte
         |SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpeish,
         |  floor(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) * 10000) / 10000 AS avg_word_len,
         |  floor(CAST(${hits("en")} AS DOUBLE) / len(toks) * 10000) / 10000 AS stopword_ratio,
         |  floor(CAST(length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text) * 10000) / 10000 AS punct_ratio,
         |  floor((0.4 * (CAST(${hits("en")} AS DOUBLE) / len(toks))
         |      + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
         |      + 0.3 * (1.0 - CAST(length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text))) * 10000) / 10000 AS quality_score
         |FROM tok""".stripMargin,

    // char-n-gram language ID: profile-hit sums GENERATED from the same
    // TextOps.Bigrams table the Spark expression uses
    "t_langid2" -> {
      def ghits(lang: String): String =
        TextOps.Bigrams(lang)
          .map(g => s"len(regexp_extract_all(lower(text), '$g'))")
          .mkString("(", " + ", ")")
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
         |         WHEN ${ghits("en")} >= ${ghits("de")} AND ${ghits("en")} >= ${ghits("fr")} AND ${ghits("en")} >= ${ghits("es")} THEN 'en'
         |         WHEN ${ghits("de")} >= ${ghits("fr")} AND ${ghits("de")} >= ${ghits("es")} THEN 'de'
         |         WHEN ${ghits("fr")} >= ${ghits("es")} THEN 'fr'
         |         ELSE 'es' END AS pred_lang
         |  FROM documents)
         |SELECT doc_id, pred_lang, pred_lang = lang AS lang_match FROM scored""".stripMargin
    },

    "t_langid" ->
      s"""$TokCte,
         |scored AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
         |         WHEN ${hits("en")} >= ${hits("de")} AND ${hits("en")} >= ${hits("fr")} AND ${hits("en")} >= ${hits("es")} THEN 'en'
         |         WHEN ${hits("de")} >= ${hits("fr")} AND ${hits("de")} >= ${hits("es")} THEN 'de'
         |         WHEN ${hits("fr")} >= ${hits("es")} THEN 'fr'
         |         ELSE 'es' END AS pred_lang
         |  FROM tok)
         |SELECT doc_id, pred_lang, pred_lang = lang AS lang_match FROM scored""".stripMargin,

    "t_fingerprint" ->
      s"""$TokCte
         |SELECT doc_id, md5(array_to_string(toks, ' ')) AS fingerprint FROM tok""".stripMargin,

    // r14 NFC audit: the IDENTICAL combining-char dressing (chr() forms
    // of the Scala \u escapes), re-normalized through DuckDB's own
    // nfc_normalize (utf8proc) — an independent NFC implementation
    // agreeing with the JDK kernel per row
    "t_nfc" ->
      """WITH dressed AS (
        |  SELECT doc_id, text ||
        |    CASE CAST(doc_id % 5 AS INT)
        |      WHEN 0 THEN ' e' || chr(769)
        |      WHEN 1 THEN ' A' || chr(778)
        |      WHEN 2 THEN ' ' || chr(8491)
        |      WHEN 3 THEN ' ' || chr(233)
        |      ELSE '' END AS dressed
        |  FROM documents)
        |SELECT doc_id, md5(nfc_normalize(dressed)) AS nfc_md5,
        |  nfc_normalize(dressed) <> dressed AS changed,
        |  CAST(length(dressed) AS BIGINT) AS n_before,
        |  CAST(length(nfc_normalize(dressed)) AS BIGINT) AS n_after
        |FROM dressed""".stripMargin,

    "d_exact" ->
      s"""$TokCte
         |SELECT md5(array_to_string(toks, ' ')) AS fingerprint,
         |  min(doc_id) AS canonical_doc_id, count(*) AS n_docs
         |FROM tok GROUP BY 1""".stripMargin,

    // r11 line-level boilerplate dedup: the oracle rebuilds the dressed
    // multi-line text analytically (Dedup.synthLines mirror), splits,
    // counts line recurrence across distinct docs, and reconstructs the
    // kept text md5 — full-computation mirror, no assumptions. (The
    // Spark side shuffles on md5(line) instead of the line text — a
    // transport choice invisible to the result.)
    "d_line_dedup" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    '== site ' || (doc_id % 7) || ' navigation ==' || chr(10) ||
        |    CASE WHEN doc_id % 2 = 0
        |         THEN 'accept cookies to continue' || chr(10) ELSE '' END ||
        |    text || chr(10) || '   ' || chr(10) ||
        |    'contact admin ' || (doc_id % 100) AS text
        |  FROM documents),
        |l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
        |ln AS (SELECT doc_id, CAST(i.i AS INT) AS pos, trim(ls[i.i + 1]) AS line
        |       FROM l, UNNEST(range(0, len(ls))) AS i(i)),
        |ne AS (SELECT * FROM ln WHERE line <> ''),
        |freq AS (SELECT line, count(DISTINCT doc_id) AS ndocs FROM ne GROUP BY line),
        |j AS (SELECT ne.doc_id, ne.pos, ne.line, freq.ndocs
        |      FROM ne JOIN freq ON ne.line = freq.line)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN ndocs < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN ndocs >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  md5(coalesce(string_agg(CASE WHEN ndocs < 3 THEN line END,
        |        chr(10) ORDER BY pos), '')) AS kept_md5
        |FROM j GROUP BY doc_id""".stripMargin,

    // r11 keep-first variant (the Dolma paragraph policy): a recurring
    // line keeps its EARLIEST document's copy — freq carries min(doc_id)
    "d_line_keepfirst" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    '== site ' || (doc_id % 7) || ' navigation ==' || chr(10) ||
        |    CASE WHEN doc_id % 2 = 0
        |         THEN 'accept cookies to continue' || chr(10) ELSE '' END ||
        |    text || chr(10) || '   ' || chr(10) ||
        |    'contact admin ' || (doc_id % 100) AS text
        |  FROM documents),
        |l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
        |ln AS (SELECT doc_id, CAST(i.i AS INT) AS pos, trim(ls[i.i + 1]) AS line
        |       FROM l, UNNEST(range(0, len(ls))) AS i(i)),
        |ne AS (SELECT * FROM ln WHERE line <> ''),
        |freq AS (SELECT line, count(DISTINCT doc_id) AS ndocs,
        |                min(doc_id) AS first_doc
        |         FROM ne GROUP BY line),
        |j AS (SELECT ne.doc_id, ne.pos, ne.line,
        |        (freq.ndocs < 3 OR ne.doc_id = freq.first_doc) AS kept
        |      FROM ne JOIN freq ON ne.line = freq.line)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        |  md5(coalesce(string_agg(CASE WHEN kept THEN line END,
        |        chr(10) ORDER BY pos), '')) AS kept_md5
        |FROM j GROUP BY doc_id""".stripMargin,

    "d_minhash" ->
      s"""$SigCte
         |SELECT doc_id, sig0, sig1, sig2, sig3 FROM sig""".stripMargin,

    // `bands` CTEs mirror Dedup.pairsWithinBuckets incl. the MaxBucket=64
    // occupancy cap (hot buckets emit no pairs).
    "d_lsh_pairs" ->
      s"""$SigCte,
         |bands0 AS (SELECT doc_id, unnest([md5(sig0 || sig1), md5(sig2 || sig3)]) AS band FROM sig),
         |bands AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 64)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id""".stripMargin,

    // banded-LSH recall curve vs exact inverted-index Jaccard truth:
    // pairs sharing >= 1 shingle get exact |∩| from the keyed self-join
    // (disjoint pairs have Jaccard 0), thresholds compare in exact
    // integers, candidates are the d_lsh_pairs banding verbatim
    "d_lsh_recall" ->
      s"""$SigCte,
         |shrow AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shi),
         |sz AS (SELECT doc_id, count(*) AS sz FROM shrow GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM shrow a JOIN shrow b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |jx AS (SELECT doc_a, doc_b, ni * 1000 // (x.sz + y.sz - ni) AS jx
         |       FROM inter JOIN sz x ON x.doc_id = doc_a
         |                  JOIN sz y ON y.doc_id = doc_b),
         |bands0 AS (SELECT doc_id, unnest([md5(sig0 || sig1), md5(sig2 || sig3)]) AS band FROM sig),
         |bands AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 64),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
         |scored AS (SELECT j.jx, (c.doc_a IS NOT NULL) AS caught
         |           FROM jx j LEFT JOIN cand c USING (doc_a, doc_b)),
         |th AS (SELECT unnest([50, 100, 200, 500]) AS threshold_milli)
         |SELECT CAST(th.threshold_milli AS BIGINT) AS threshold_milli,
         |  CAST(count(*) FILTER (WHERE jx >= th.threshold_milli) AS BIGINT) AS n_true,
         |  CAST(count(*) FILTER (WHERE jx >= th.threshold_milli AND caught) AS BIGINT) AS n_caught,
         |  CAST(CASE WHEN count(*) FILTER (WHERE jx >= th.threshold_milli) = 0 THEN 1000
         |       ELSE count(*) FILTER (WHERE jx >= th.threshold_milli AND caught) * 1000
         |            // count(*) FILTER (WHERE jx >= th.threshold_milli) END AS BIGINT)
         |    AS recall_permille
         |FROM scored, th GROUP BY 1""".stripMargin,

    // PageRank over the candidate graph, 3 unrolled iterations of the
    // SAME exact-int64 micro-rank recurrence the engine runs (floor
    // divisions, damping 85/100); sums cast back from HUGEINT so every
    // intermediate and the output stay BIGINT
    // id-oriented node-iterator triangle counting over the same capped
    // LSH candidate-pair relation the engine uses: each triangle {x<y<z}
    // appears once as the x→y→z wedge closed by the (x,z) edge
    "d_triangles" ->
      s"""$SigCte,
         |bands0 AS (SELECT doc_id, unnest([md5(sig0 || sig1), md5(sig2 || sig3)]) AS band FROM sig),
         |bands AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 64),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
         |tri AS (SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
         |  FROM pairs e1 JOIN pairs e2 ON e1.doc_b = e2.doc_a
         |  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri
         |FROM (SELECT unnest([a, b, c]) AS doc_id FROM tri) t GROUP BY 1""".stripMargin,

    "d_pagerank" ->
      s"""$SigCte,
         |bands0 AS (SELECT doc_id, unnest([md5(sig0 || sig1), md5(sig2 || sig3)]) AS band FROM sig),
         |bands AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 64),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |deg AS (SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
         |nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
         |r0 AS (SELECT doc_id, 1000000000000 // n AS rank FROM deg CROSS JOIN nv),
         |c1 AS (SELECT e.dst AS doc_id, CAST(sum(r.rank // d.deg) AS BIGINT) AS s
         |  FROM edges e JOIN r0 r ON r.doc_id = e.src JOIN deg d ON d.doc_id = e.src GROUP BY 1),
         |r1 AS (SELECT d.doc_id, (15000000000000 // (100 * n)) + (85 * coalesce(c.s, 0)) // 100 AS rank
         |  FROM deg d CROSS JOIN nv LEFT JOIN c1 c ON c.doc_id = d.doc_id),
         |c2 AS (SELECT e.dst AS doc_id, CAST(sum(r.rank // d.deg) AS BIGINT) AS s
         |  FROM edges e JOIN r1 r ON r.doc_id = e.src JOIN deg d ON d.doc_id = e.src GROUP BY 1),
         |r2 AS (SELECT d.doc_id, (15000000000000 // (100 * n)) + (85 * coalesce(c.s, 0)) // 100 AS rank
         |  FROM deg d CROSS JOIN nv LEFT JOIN c2 c ON c.doc_id = d.doc_id),
         |c3 AS (SELECT e.dst AS doc_id, CAST(sum(r.rank // d.deg) AS BIGINT) AS s
         |  FROM edges e JOIN r2 r ON r.doc_id = e.src JOIN deg d ON d.doc_id = e.src GROUP BY 1),
         |r3 AS (SELECT d.doc_id, (15000000000000 // (100 * n)) + (85 * coalesce(c.s, 0)) // 100 AS rank
         |  FROM deg d CROSS JOIN nv LEFT JOIN c3 c ON c.doc_id = d.doc_id)
         |SELECT doc_id, rank FROM r3""".stripMargin,

    // synchronous LPA over the candidate graph, 3 unrolled rounds of the
    // engine's exact recurrence: per vertex the most frequent NEIGHBOR
    // label, ties to the smallest label; minhash-domain singletons keep
    // their own id
    "d_lpa" -> {
      def round(prev: String, n: String, l: String) =
        s"""$n AS (SELECT e.src AS doc_id, l.label, count(*) AS cnt
           |  FROM edges e JOIN $prev l ON l.doc_id = e.dst GROUP BY 1, 2),
           |$l AS (SELECT doc_id, label FROM (
           |  SELECT doc_id, label,
           |         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, label ASC) AS rn
           |  FROM $n) t WHERE rn = 1)""".stripMargin
      s"""$SigCte,
         |bands0 AS (SELECT doc_id, unnest([md5(sig0 || sig1), md5(sig2 || sig3)]) AS band FROM sig),
         |bands AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 64),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |l0 AS (SELECT DISTINCT src AS doc_id, src AS label FROM edges),
         |${round("l0", "n1", "l1")},
         |${round("l1", "n2", "l2")},
         |${round("l2", "n3", "l3")}
         |SELECT s.doc_id, coalesce(l3.label, s.doc_id) AS label
         |FROM sig s LEFT JOIN l3 ON l3.doc_id = s.doc_id""".stripMargin
    },

    "d_jaccard" ->
      s"""$SigCte,
         |bands0 AS (SELECT doc_id, unnest([sig0, sig1, sig2, sig3]) AS band FROM sig),
         |bands AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 64),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
         |shset AS (SELECT doc_id, list_distinct(sh) AS ss FROM shi)
         |SELECT doc_a, doc_b,
         |  floor(CAST(len(list_filter(x.ss, e -> list_contains(y.ss, e))) AS DOUBLE)
         |        / (len(x.ss) + len(y.ss) - len(list_filter(x.ss, e -> list_contains(y.ss, e))) * 1.0) * 10000) / 10000 AS jaccard
         |FROM pairs JOIN shset x ON x.doc_id = doc_a JOIN shset y ON y.doc_id = doc_b""".stripMargin,

    // r14 (third closing): asymmetric shingle containment over the
    // loose (r=1) banded candidates of the quote-dressed corpus —
    // Broder's second resemblance measure; `quoted` flags high
    // containment with low jaccard (the partial-dup verdict)
    "d_containment" -> {
      s"""WITH dress AS (SELECT a.doc_id,
         |    a.text || CASE WHEN a.doc_id % 17 = 0 AND b.text IS NOT NULL
         |      THEN ' ' || b.text ELSE '' END AS text
         |  FROM documents a LEFT JOIN documents b ON b.doc_id = a.doc_id + 1),
         |tok AS (SELECT doc_id, $Toks AS toks FROM dress),
         |shi AS (SELECT doc_id, $Shingles AS sh FROM tok WHERE len(toks) >= 3),
         |sig AS (SELECT doc_id, ${minhash(0)} AS sig0, ${minhash(1)} AS sig1,
         |               ${minhash(2)} AS sig2, ${minhash(3)} AS sig3 FROM shi),
         |bands0 AS (SELECT doc_id, unnest([sig0, sig1, sig2, sig3]) AS band FROM sig),
         |bands AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 64),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
         |shset AS (SELECT doc_id, list_distinct(sh) AS ss FROM shi),
         |scored AS (SELECT doc_a, doc_b,
         |    floor(CAST(len(list_filter(x.ss, e -> list_contains(y.ss, e))) AS DOUBLE)
         |          / len(x.ss) * 10000) / 10000 AS contain_a,
         |    floor(CAST(len(list_filter(x.ss, e -> list_contains(y.ss, e))) AS DOUBLE)
         |          / len(y.ss) * 10000) / 10000 AS contain_b,
         |    floor(CAST(len(list_filter(x.ss, e -> list_contains(y.ss, e))) AS DOUBLE)
         |          / (len(x.ss) + len(y.ss) - len(list_filter(x.ss, e -> list_contains(y.ss, e))))
         |          * 10000) / 10000 AS jaccard
         |  FROM pairs JOIN shset x ON x.doc_id = doc_a JOIN shset y ON y.doc_id = doc_b)
         |SELECT doc_a, doc_b, contain_a, contain_b, jaccard,
         |  (contain_a >= 0.8 OR contain_b >= 0.8) AND jaccard < 0.7 AS quoted
         |FROM scored""".stripMargin
    },

    "d_simhash" ->
      s"""$TokCte
         |SELECT doc_id, $simhashSum AS simhash16 FROM tok""".stripMargin,

    // pigeonhole-banded hamming-ball pairs (3 chunks over the 16-bit
    // code, 256 occupancy cap, xor+bit_count verification) — mirrors
    // Dedup.simhashNeighbors chunk boundaries bit-for-bit
    "d_simhash_nn" ->
      s"""$TokCte,
         |codes AS (SELECT doc_id, $simhashSum AS code FROM tok),
         |bands0 AS (SELECT doc_id, unnest([
         |    'b0:' || CAST(code & 63 AS VARCHAR),
         |    'b1:' || CAST((code >> 6) & 31 AS VARCHAR),
         |    'b2:' || CAST((code >> 11) & 31 AS VARCHAR)]) AS band FROM codes),
         |bands AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 256),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(x.code, y.code)) AS INT) AS hamming
         |FROM pairs JOIN codes x ON x.doc_id = doc_a JOIN codes y ON y.doc_id = doc_b
         |WHERE bit_count(xor(x.code, y.code)) <= 2""".stripMargin,

    // production 64-bit simhash codes (one unnest + 64-sum group-by; the
    // OR of per-bit CASEs mirrors Dedup.simhashes64's bitwiseOR reduce)
    "d_simhash64" ->
      s"""$TokCte, $Simhash64Cte
         |SELECT doc_id, code FROM codes64""".stripMargin,

    // 64-bit hamming-ball pairs at the production 22/21/21 banding
    // geometry (LSH occupancy cap 64, arithmetic-shift + mask chunk
    // reads — identical bits in both engines for negative codes)
    "d_simhash_nn64" ->
      s"""$TokCte, $Simhash64Cte,
         |bands640 AS (SELECT doc_id, unnest([
         |    'c0:' || CAST(code & 4194303 AS VARCHAR),
         |    'c1:' || CAST((code >> 22) & 2097151 AS VARCHAR),
         |    'c2:' || CAST((code >> 43) & 2097151 AS VARCHAR)]) AS band FROM codes64),
         |bands64 AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands640) t WHERE bsz <= 64),
         |pairs64 AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands64 a JOIN bands64 b ON a.band = b.band AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(x.code, y.code)) AS INT) AS hamming
         |FROM pairs64 JOIN codes64 x ON x.doc_id = doc_a JOIN codes64 y ON y.doc_id = doc_b
         |WHERE bit_count(xor(x.code, y.code)) <= 2""".stripMargin,

    // Connected components over the capped LSH pair graph: the oracle
    // computes the transitive closure with a recursive CTE and takes the
    // min reachable doc_id — the same fixpoint Dedup.connectedComponents'
    // label propagation converges to.
    "d_dup_clusters" ->
      s"""$ClusterCte
         |SELECT doc_id, cluster FROM clustered""".stripMargin,

    // the dedup deliverable: one kept (cluster-min) doc per cluster +
    // cluster size
    "d_dedup_keep" ->
      s"""$ClusterCte
         |SELECT cluster AS doc_id, CAST(count(*) AS BIGINT) AS n_docs
         |FROM clustered GROUP BY 1""".stripMargin,

    // r10 quality-aware keep: same clusters, argmax by (quality, -id) —
    // the oracle recomputes quality from the t_text_stats mirror and
    // picks via a window (naive is fine oracle-side)
    "d_dedup_best" ->
      s"""$ClusterCte,
         |qsc AS (SELECT t.doc_id,
         |  floor((0.4 * (CAST(${hits("en")} AS DOUBLE) / len(toks))
         |      + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
         |      + 0.3 * (1.0 - CAST(length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text))) * 10000) / 10000 AS q
         |  FROM tok t),
         |rr AS (SELECT c.cluster, c.doc_id, qsc.q,
         |         row_number() OVER (PARTITION BY c.cluster
         |                            ORDER BY qsc.q DESC, c.doc_id ASC) AS rn,
         |         count(*) OVER (PARTITION BY c.cluster) AS n_docs
         |       FROM clustered c JOIN qsc USING (doc_id))
         |SELECT cluster, CAST(n_docs AS BIGINT) AS n_docs,
         |  doc_id AS keep_doc, q AS keep_quality
         |FROM rr WHERE rn = 1""".stripMargin,

    // incremental ingest verdict: index shard = doc_id % 3 <> 0, incoming
    // shard = doc_id % 3 = 0; new = absent from the index AND first copy
    // within the incoming shard (the oracle states the exact semantics the
    // engine's bloom-prefiltered split must reproduce verbatim)
    "d_incremental" ->
      s"""$TokCte,
         |fp AS (SELECT doc_id, md5(array_to_string(toks, ' ')) AS fingerprint FROM tok),
         |idx AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 3 <> 0),
         |inc AS (SELECT doc_id, fingerprint,
         |          doc_id = min(doc_id) OVER (PARTITION BY fingerprint) AS first_in_shard
         |        FROM fp WHERE doc_id % 3 = 0)
         |SELECT doc_id, fingerprint,
         |  first_in_shard AND NOT EXISTS (
         |    SELECT 1 FROM idx WHERE idx.fingerprint = inc.fingerprint) AS is_new
         |FROM inc""".stripMargin,

    // C4-style span dedup: k=5 token spans, global first occurrence (by
    // doc_id, then position) wins; the window formulation here and the
    // Spark side's min-struct winner election elect the SAME row.
    "d_span_dedup" ->
      s"""$TokCte,
         |blocks AS (
         |  SELECT doc_id, toks, unnest(range(0, (len(toks) + 4) // 5)) AS pos FROM tok),
         |spans AS (
         |  SELECT doc_id, pos,
         |    array_to_string(list_slice(toks, pos*5 + 1, pos*5 + 5), ' ') AS span
         |  FROM blocks),
         |ranked AS (
         |  SELECT doc_id, pos, span,
         |    row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
         |  FROM spans),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_spans,
         |    count(*) FILTER (WHERE rn = 1) AS n_kept,
         |    coalesce(string_agg(span, ' ' ORDER BY pos) FILTER (WHERE rn = 1), '')
         |      AS clean_text
         |  FROM ranked GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.n_spans, 0) AS n_spans,
         |  coalesce(a.n_kept, 0) AS n_kept, coalesce(a.clean_text, '') AS clean_text
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,

    // Exact-substring dedup (Lee et al. 2022): 8-token sliding-window
    // fingerprints, global first occurrence (doc_id, pos) keeps; a token
    // is removed iff covered by a non-keeper duplicated window. Same
    // packed-BIGINT winner election as the Spark side.
    "d_substr_dedup" ->
      s"""$TokCte,
         |occ AS (
         |  SELECT doc_id, pos,
         |    md5(array_to_string(list_slice(toks, pos + 1, pos + 8), ' ')) AS fp
         |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS pos
         |        FROM tok WHERE len(toks) >= 8)),
         |elected AS (
         |  SELECT fp, count(*) AS c, min(doc_id * 1048576 + pos) AS win
         |  FROM occ GROUP BY fp),
         |losers AS (
         |  SELECT o.doc_id, o.pos
         |  FROM occ o JOIN elected e ON o.fp = e.fp
         |  WHERE e.c >= 2 AND o.doc_id * 1048576 + o.pos <> e.win),
         |toki AS (
         |  SELECT doc_id, i, toks[i+1] AS tok
         |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks))) AS i FROM tok)),
         |removed AS (
         |  SELECT DISTINCT t.doc_id, t.i
         |  FROM toki t JOIN losers l ON t.doc_id = l.doc_id
         |    AND t.i BETWEEN l.pos AND l.pos + 7),
         |agg AS (
         |  SELECT t.doc_id, count(*) AS n_tokens, count(r.i) AS n_removed,
         |    md5(coalesce(string_agg(t.tok, ' ' ORDER BY t.i) FILTER (WHERE r.i IS NULL), ''))
         |      AS kept_md5
         |  FROM toki t LEFT JOIN removed r ON t.doc_id = r.doc_id AND t.i = r.i
         |  GROUP BY t.doc_id)
         |SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
         |  coalesce(a.n_removed, 0) AS n_removed,
         |  coalesce(a.kept_md5, md5('')) AS kept_md5
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,

    // SemDeDup over the s_ivf_topk cell assignment (same sample-trained
    // Lloyd centroids): drop any vector with a lower-id cell-mate at
    // cosine >= 0.3, keep-lowest-id retention.
    "d_semdedup" ->
      s"""${ivfCellsCte("vec_id % 7 = 0")},
         |dropped AS (
         |  SELECT DISTINCT b.vec_id FROM cells a JOIN cells b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE $CosAB >= 0.3)
         |SELECT c.vec_id, c.cell, (d.vec_id IS NULL) AS keep
         |FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id""".stripMargin,

    // margin-based bitext mining mirror: same IVF cells, vec_id-parity
    // language halves, MULTIPROBE source side (nprobe=2 nearest cells
    // from scored1 — the d_sem_decontam bench device), shifted integer
    // cosine (floor(cos·1e6)+1e6), k=4 neighborhood means as exact
    // integer floor averages, margin = scos·2000 // (s_knn + t_knn),
    // forward top-1 with (margin desc, scos desc, t_id asc) ties,
    // mined at margin >= 1030 permille
    "t_bitext_mine" ->
      s"""${ivfCellsCte("vec_id % 7 = 0")},
         |src AS (SELECT c_label AS cell, vec_id AS s_id, qv AS sq, n2 AS sn2 FROM (
         |          SELECT *, row_number() OVER (PARTITION BY vec_id
         |            ORDER BY score ASC, c_label ASC) AS rn
         |          FROM scored1 WHERE vec_id % 2 = 0) t WHERE rn <= 2),
         |tgt AS (SELECT cell, vec_id AS t_id, qv AS tq, n2 AS tn2
         |        FROM cells WHERE vec_id % 2 = 1),
         |cand AS (SELECT s.s_id, t.t_id,
         |    CAST(floor(list_sum(list_transform(range(1, len(s.sq) + 1), i -> s.sq[i] * t.tq[i]))
         |         / (sqrt(s.sn2) * sqrt(t.tn2)) * 1000000) AS BIGINT) + 1000000 AS scos
         |  FROM src s JOIN tgt t USING (cell)),
         |sknn AS (SELECT s_id, CAST(sum(scos) // count(*) AS BIGINT) AS s_knn FROM (
         |    SELECT *, row_number() OVER (PARTITION BY s_id ORDER BY scos DESC, t_id ASC) AS rn
         |    FROM cand) t WHERE rn <= 4 GROUP BY 1),
         |tknn AS (SELECT t_id, CAST(sum(scos) // count(*) AS BIGINT) AS t_knn FROM (
         |    SELECT *, row_number() OVER (PARTITION BY t_id ORDER BY scos DESC, s_id ASC) AS rn
         |    FROM cand) t WHERE rn <= 4 GROUP BY 1),
         |scoredp AS (SELECT c.s_id, c.t_id, c.scos,
         |    CAST(c.scos * 2000 // greatest(s.s_knn + t.t_knn, 1) AS BIGINT) AS margin_permille
         |  FROM cand c JOIN sknn s USING (s_id) JOIN tknn t USING (t_id))
         |SELECT s_id, t_id, CAST(scos - 1000000 AS BIGINT) AS cos_x1m, margin_permille
         |FROM (SELECT *, row_number() OVER (PARTITION BY s_id
         |        ORDER BY margin_permille DESC, scos DESC, t_id ASC) AS rn
         |      FROM scoredp) t
         |WHERE rn = 1 AND margin_permille >= 1030""".stripMargin,

    // bitext recall mirror: the approx chain verbatim plus the EXACT
    // all-pairs arm (cross join is the oracle's semantic statement; the
    // engine's exact arm folds per-vector over broadcast arrays)
    "t_bitext_recall" -> {
      // r17 sweep: the approx chain is stamped once per nprobe (the
      // CTE-suffix device); the exact all-pairs arm is computed once
      def app(p: Int) =
        s"""src$p AS (SELECT c_label AS cell, vec_id AS s_id, qv AS sq, n2 AS sn2 FROM (
           |          SELECT *, row_number() OVER (PARTITION BY vec_id
           |            ORDER BY score ASC, c_label ASC) AS rn
           |          FROM scored1 WHERE vec_id % 2 = 0) t WHERE rn <= $p),
           |cand$p AS (SELECT s.s_id, t.t_id,
           |    CAST(floor(list_sum(list_transform(range(1, len(s.sq) + 1), i -> s.sq[i] * t.tq[i]))
           |         / (sqrt(s.sn2) * sqrt(t.tn2)) * 1000000) AS BIGINT) + 1000000 AS scos
           |  FROM src$p s JOIN tgt t USING (cell)),
           |sknn$p AS (SELECT s_id, CAST(sum(scos) // count(*) AS BIGINT) AS s_knn FROM (
           |    SELECT *, row_number() OVER (PARTITION BY s_id ORDER BY scos DESC, t_id ASC) AS rn
           |    FROM cand$p) t WHERE rn <= 4 GROUP BY 1),
           |tknn$p AS (SELECT t_id, CAST(sum(scos) // count(*) AS BIGINT) AS t_knn FROM (
           |    SELECT *, row_number() OVER (PARTITION BY t_id ORDER BY scos DESC, s_id ASC) AS rn
           |    FROM cand$p) t WHERE rn <= 4 GROUP BY 1),
           |scoredp$p AS (SELECT c.s_id, c.t_id, c.scos,
           |    CAST(c.scos * 2000 // greatest(s.s_knn + t.t_knn, 1) AS BIGINT) AS margin_permille
           |  FROM cand$p c JOIN sknn$p s USING (s_id) JOIN tknn$p t USING (t_id)),
           |approx$p AS (SELECT s_id, t_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY s_id
           |      ORDER BY margin_permille DESC, scos DESC, t_id ASC) AS rn FROM scoredp$p) t
           |  WHERE rn = 1 AND margin_permille >= 1030)""".stripMargin
      s"""${ivfCellsCte("vec_id % 7 = 0")},
         |tgt AS (SELECT cell, vec_id AS t_id, qv AS tq, n2 AS tn2
         |        FROM cells WHERE vec_id % 2 = 1),
         |${app(1)},
         |${app(2)},
         |${app(4)},
         |apx AS (SELECT 1 AS nprobe, s_id, t_id FROM approx1
         |        UNION ALL SELECT 2, s_id, t_id FROM approx2
         |        UNION ALL SELECT 4, s_id, t_id FROM approx4),
         |srcall AS (SELECT vec_id AS s_id, qv AS sq, n2 AS sn2
         |           FROM cells WHERE vec_id % 2 = 0),
         |candx AS (SELECT s.s_id, t.t_id,
         |    CAST(floor(list_sum(list_transform(range(1, len(s.sq) + 1), i -> s.sq[i] * t.tq[i]))
         |         / (sqrt(s.sn2) * sqrt(t.tn2)) * 1000000) AS BIGINT) + 1000000 AS scos
         |  FROM srcall s, tgt t),
         |sknnx AS (SELECT s_id, CAST(sum(scos) // count(*) AS BIGINT) AS s_knn FROM (
         |    SELECT *, row_number() OVER (PARTITION BY s_id ORDER BY scos DESC, t_id ASC) AS rn
         |    FROM candx) t WHERE rn <= 4 GROUP BY 1),
         |tknnx AS (SELECT t_id, CAST(sum(scos) // count(*) AS BIGINT) AS t_knn FROM (
         |    SELECT *, row_number() OVER (PARTITION BY t_id ORDER BY scos DESC, s_id ASC) AS rn
         |    FROM candx) t WHERE rn <= 4 GROUP BY 1),
         |scoredx AS (SELECT c.s_id, c.t_id, c.scos,
         |    CAST(c.scos * 2000 // greatest(s.s_knn + t.t_knn, 1) AS BIGINT) AS margin_permille
         |  FROM candx c JOIN sknnx s USING (s_id) JOIN tknnx t USING (t_id)),
         |ex AS (SELECT s_id, t_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY s_id
         |      ORDER BY margin_permille DESC, scos DESC, t_id ASC) AS rn FROM scoredx) t
         |  WHERE rn = 1 AND margin_permille >= 1030),
         |f AS (SELECT p.nprobe, e.s_id, (a.s_id IS NOT NULL) AS caught
         |      FROM ex e CROSS JOIN (VALUES (1), (2), (4)) p(nprobe)
         |      LEFT JOIN apx a ON a.nprobe = p.nprobe
         |        AND e.s_id = a.s_id AND e.t_id = a.t_id)
         |SELECT nprobe, CAST(count(*) AS BIGINT) AS n_exact,
         |       CAST(sum(CASE WHEN caught THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
         |       CAST(CASE WHEN count(*) = 0 THEN 1000
         |            ELSE sum(CASE WHEN caught THEN 1 ELSE 0 END) * 1000 // count(*) END
         |         AS BIGINT) AS recall_permille
         |FROM f GROUP BY 1""".stripMargin
    },

    // tokenizer fertility mirror: t_bpe_encode's per-doc subword counts
    // joined to the t_langid prediction, rolled up per language with
    // the exact ×1000 floor ratio
    "t_tok_fertility" ->
      s"""$BpeChain,
         |w3 AS (SELECT word, n, ${bpeFold("syms", "t3.px", "t3.py")} AS syms FROM w2, t3),
         |enc AS (SELECT t.doc_id, count(*) AS n_words, sum(len(w3.syms)) AS n_subwords
         |        FROM (SELECT doc_id, unnest(toks) AS word FROM tok) t
         |        JOIN w3 ON t.word = w3.word GROUP BY 1),
         |pl AS (SELECT doc_id,
         |    CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
         |         WHEN ${hits("en")} >= ${hits("de")} AND ${hits("en")} >= ${hits("fr")} AND ${hits("en")} >= ${hits("es")} THEN 'en'
         |         WHEN ${hits("de")} >= ${hits("fr")} AND ${hits("de")} >= ${hits("es")} THEN 'de'
         |         WHEN ${hits("fr")} >= ${hits("es")} THEN 'fr'
         |         ELSE 'es' END AS pred_lang
         |  FROM tok)
         |SELECT pl.pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(enc.n_words) AS BIGINT) AS n_words,
         |  CAST(sum(enc.n_subwords) AS BIGINT) AS n_subwords,
         |  CAST(sum(enc.n_subwords) * 1000 // sum(enc.n_words) AS BIGINT)
         |    AS fertility_x1000
         |FROM enc JOIN pl USING (doc_id) GROUP BY 1""".stripMargin,

    // curriculum mirror: global (bits_x1000, doc_id) rank — the naive
    // unpartitioned window is fine oracle-side; the engine decomposes it
    // into metadata-scale cumulative counts + a partitioned window
    "t_curriculum" ->
      s"""$LmScoreCte
         |SELECT doc_id, bits_x1000,
         |  CAST(row_number() OVER (ORDER BY bits_x1000, doc_id) AS BIGINT) AS rank,
         |  CAST((row_number() OVER (ORDER BY bits_x1000, doc_id) - 1) * 4
         |    // (SELECT count(*) FROM lmscore) AS BIGINT) AS phase
         |FROM lmscore""".stripMargin,

    // semantic decontamination mirror: same IVF cells, benchmark slice
    // vec_id % 41 = 0, within-cell cosine hits, best = max cos then
    // lowest benchmark id
    "d_sem_decontam" ->
      s"""${ivfCellsCte("vec_id % 7 = 0")},
         |bench AS (SELECT c_label AS cell, vec_id AS b_id, qv, n2 FROM (
         |            SELECT *, row_number() OVER (PARTITION BY vec_id
         |              ORDER BY score ASC, c_label ASC) AS rn
         |            FROM scored1 WHERE vec_id % 41 = 0) t WHERE rn <= 2),
         |corp AS (SELECT cell, vec_id, qv, n2 FROM cells WHERE vec_id % 41 <> 0),
         |cand AS (SELECT a.vec_id, b.b_id, $CosAB AS cos
         |         FROM corp a JOIN bench b ON a.cell = b.cell
         |         WHERE $CosAB >= 0.3),
         |agg AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_hits FROM cand GROUP BY 1),
         |best AS (SELECT vec_id, b_id, cos FROM (
         |           SELECT *, row_number() OVER (PARTITION BY vec_id
         |             ORDER BY cos DESC, b_id ASC) AS rn FROM cand) t WHERE rn = 1)
         |SELECT c.vec_id, c.cell, (a.vec_id IS NOT NULL) AS contaminated,
         |       coalesce(a.n_hits, 0) AS n_hits,
         |       coalesce(be.b_id, -1) AS best_bench,
         |       coalesce(be.cos, -1.0) AS best_cos
         |FROM corp c LEFT JOIN agg a USING (vec_id) LEFT JOIN best be USING (vec_id)""".stripMargin,

    // recall of the cell-bounded decontamination vs exact brute truth:
    // same cells/bench/corp/cand chain; exact = unbounded bench cross
    "d_sem_recall" ->
      s"""${ivfCellsCte("vec_id % 7 = 0")},
         |bench AS (SELECT c_label AS cell, vec_id AS b_id, qv, n2, rn FROM (
         |            SELECT *, row_number() OVER (PARTITION BY vec_id
         |              ORDER BY score ASC, c_label ASC) AS rn
         |            FROM scored1 WHERE vec_id % 41 = 0) t WHERE rn <= 4),
         |corp AS (SELECT cell, vec_id, qv, n2 FROM cells WHERE vec_id % 41 <> 0),
         |cand AS (SELECT a.vec_id, CAST(min(b.rn) AS BIGINT) AS min_rn
         |         FROM corp a JOIN bench b ON a.cell = b.cell
         |         WHERE $CosAB >= 0.3 GROUP BY 1),
         |ex AS (SELECT a.vec_id FROM corp a, bench b
         |       WHERE $CosAB >= 0.3 AND b.rn = 1 GROUP BY 1),
         |f AS (SELECT p.nprobe, c.vec_id, (e.vec_id IS NOT NULL) AS hit,
         |             (ap.min_rn IS NOT NULL AND ap.min_rn <= p.nprobe) AS caught
         |      FROM corp c CROSS JOIN (VALUES (1), (2), (4)) p(nprobe)
         |      LEFT JOIN ex e ON c.vec_id = e.vec_id
         |      LEFT JOIN cand ap ON c.vec_id = ap.vec_id)
         |SELECT nprobe,
         |       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         |       CAST(sum(CASE WHEN hit AND caught THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
         |       CAST(CASE WHEN sum(CASE WHEN hit THEN 1 ELSE 0 END) = 0 THEN 1000
         |            ELSE sum(CASE WHEN hit AND caught THEN 1 ELSE 0 END) * 1000
         |                 // sum(CASE WHEN hit THEN 1 ELSE 0 END) END AS BIGINT)
         |         AS recall_permille
         |FROM f GROUP BY 1""".stripMargin,

    "d_cdc_chunks" ->
      s"""$ChunkCte
         |SELECT doc_id, chunk_id, chunk_fp, n_tokens FROM chunks""".stripMargin,

    // shared-run detection: chunk fingerprints present in > 1 document
    "d_chunk_dups" ->
      s"""$ChunkCte
         |SELECT chunk_fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  min(doc_id) AS first_doc_id
         |FROM chunks GROUP BY 1 HAVING count(DISTINCT doc_id) > 1""".stripMargin,

    "t_top_terms" ->
      s"""$TokCte,
         |flat AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM flat GROUP BY 1, 2),
         |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM flat GROUP BY 1),
         |scored AS (
         |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         |    floor(tf.tf * (SELECT CAST(count(*) AS DOUBLE) FROM documents) / df.df
         |          * 10000) / 10000 AS score
         |  FROM tf JOIN df ON tf.tok = df.tok)
         |SELECT doc_id, rank, tok, tf, df, score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, tok ASC) AS rank
         |  FROM scored) t
         |WHERE rank <= 3""".stripMargin,

    // same exact-integer BM25 the engine runs: RSJ odds kept linear
    // (milli-scaled, no log) and tf saturation folded into one floor
    // division — see Retrieval.bm25TopK for the derivation
    "t_bm25" -> {
      val qtVals = Training.Bm25Queries.flatMap { case (qid, text) =>
        text.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
          .map(t => s"($qid, '$t')")
      }.mkString(", ")
      s"""$TokCte,
         |flat AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM flat GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |                 CAST(sum(dl) AS BIGINT) AS total_tok FROM dl),
         |qt AS (SELECT * FROM (VALUES $qtVals) v(query_id, tok)),
         |m AS (SELECT qt.query_id, tf.doc_id, tf.tf, df.df, dl.dl,
         |             s.n_docs, s.total_tok
         |      FROM tf JOIN qt ON tf.tok = qt.tok
         |        JOIN df ON tf.tok = df.tok
         |        JOIN dl ON tf.doc_id = dl.doc_id, stats s),
         |t AS (SELECT query_id, doc_id, tf,
         |        (1000*(2*n_docs - 2*df + 1)) // (2*df + 1) AS odds_milli,
         |        1000*tf + 300 +
         |          (900*((1000000*dl) // ((1000*total_tok) // n_docs))) // 1000
         |          AS den_milli
         |      FROM m),
         |sc AS (SELECT query_id, doc_id,
         |        CAST(sum((odds_milli * ((2200000*tf) // den_milli)) // 1000)
         |          AS BIGINT) AS score_milli,
         |        CAST(count(*) AS BIGINT) AS n_hit
         |      FROM t GROUP BY 1, 2)
         |SELECT query_id, rank, doc_id, score_milli, n_hit FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY score_milli DESC, doc_id ASC) AS rank FROM sc) r
         |WHERE rank <= 5""".stripMargin
    },

    "s_brute_topk" ->
      s"""$EmbCte
         |SELECT q_id, rank, c_id, cos FROM (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id, $CosAB AS cos,
         |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $CosAB DESC, b.vec_id ASC) AS rank
         |  FROM n a JOIN n b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id % 97 = 0) t
         |WHERE rank <= 5""".stripMargin,

    // r11 filtered search: the brute mirror with the same-label
    // pre-filter in the join condition — candidates outside the query's
    // category never get a distance
    "s_filter_topk" ->
      s"""$EmbCte
         |SELECT q_id, rank, c_id, cos FROM (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id, $CosAB AS cos,
         |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $CosAB DESC, b.vec_id ASC) AS rank
         |  FROM n a JOIN n b ON b.vec_id <> a.vec_id AND b.label = a.label
         |  WHERE a.vec_id % 97 = 0) t
         |WHERE rank <= 5""".stripMargin,

    // r14 hard-negative mining: the filtered-topk mirror with the label
    // predicate FLIPPED (nearest wrong-class candidates)
    "s_hard_negatives" ->
      s"""$EmbCte
         |SELECT q_id, rank, c_id, cos FROM (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id, $CosAB AS cos,
         |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $CosAB DESC, b.vec_id ASC) AS rank
         |  FROM n a JOIN n b ON b.label <> a.label
         |  WHERE a.vec_id % 97 = 0) t
         |WHERE rank <= 5""".stripMargin,

    "s_bucket_topk" ->
      s"""$EmbCte
         |SELECT q_id, rank, c_id, cos FROM (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id, $CosAB AS cos,
         |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $CosAB DESC, b.vec_id ASC) AS rank
         |  FROM n a JOIN n b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
         |  WHERE a.vec_id % 97 = 0) t
         |WHERE rank <= 3""".stripMargin,

    // Multi-table hyperplane LSH blocking — the code expressions are
    // generated from the SAME sign function the Spark expression uses
    // (HyperplaneCodes.sign), as literal ±qv[i] sums, so banding is
    // bit-identical across engines (projections of integer-quantized
    // embeddings are exact integers).
    // MMR greedy unrolled (select=3 of brute top-5, λ=0.5 ⇒ score =
    // rel − maxsim): same decision tree as Similarity.mmrRerank
    "s_mmr" ->
      s"""$EmbCte,
         |cand AS (
         |  SELECT q_id, rank, c_id, cos FROM (
         |    SELECT a.vec_id AS q_id, b.vec_id AS c_id, $CosAB AS cos,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY $CosAB DESC, b.vec_id ASC) AS rank
         |    FROM n a JOIN n b ON b.vec_id <> a.vec_id
         |    WHERE a.vec_id % 97 = 0) t
         |  WHERE rank <= 5),
         |ps AS (
         |  SELECT x.q_id, x.c_id AS a_id, y.c_id AS b_id, $CosAB AS sim
         |  FROM cand x JOIN cand y ON x.q_id = y.q_id AND x.c_id <> y.c_id
         |  JOIN n a ON a.vec_id = x.c_id JOIN n b ON b.vec_id = y.c_id),
         |s1 AS (SELECT q_id, c_id AS s1_id FROM cand WHERE rank = 1),
         |st2 AS (
         |  SELECT c.q_id, c.c_id, c.cos - p.sim AS sc
         |  FROM cand c JOIN s1 ON s1.q_id = c.q_id
         |  JOIN ps p ON p.q_id = c.q_id AND p.a_id = c.c_id AND p.b_id = s1.s1_id
         |  WHERE c.rank > 1),
         |s2 AS (SELECT q_id, c_id AS s2_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, c_id ASC) AS rn
         |    FROM st2) t
         |  WHERE rn = 1),
         |st3 AS (
         |  SELECT c.q_id, c.c_id, c.cos - greatest(p1.sim, p2.sim) AS sc
         |  FROM cand c JOIN s1 ON s1.q_id = c.q_id JOIN s2 ON s2.q_id = c.q_id
         |  JOIN ps p1 ON p1.q_id = c.q_id AND p1.a_id = c.c_id AND p1.b_id = s1.s1_id
         |  JOIN ps p2 ON p2.q_id = c.q_id AND p2.a_id = c.c_id AND p2.b_id = s2.s2_id
         |  WHERE c.rank > 1 AND c.c_id <> s2.s2_id),
         |s3 AS (SELECT q_id, c_id AS s3_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, c_id ASC) AS rn
         |    FROM st3) t
         |  WHERE rn = 1)
         |SELECT q_id, 1 AS mmr_rank, s1_id AS c_id FROM s1
         |UNION ALL SELECT q_id, 2, s2_id FROM s2
         |UNION ALL SELECT q_id, 3, s3_id FROM s3""".stripMargin,

    "s_near_dups" -> hyperplanePairsSql(
      graft.operators.Similarity.NearDupTables, graft.operators.Similarity.NearDupBits, "0.95"),

    "s_sim_pairs" -> hyperplanePairsSql(
      graft.operators.Similarity.NearDupTables, 8, "0.3"),

    // Lloyd-refined IVF with multiprobe (mirror of Similarity.ivfTopK,
    // lloydIters=1, nprobe=2): seed means per label → re-assign → recompute
    // means → final assignment (index) + 2-nearest probes per query. All
    // centroid arithmetic is sequential index-order double math in both
    // engines, so even the fractional post-Lloyd centroids are bit-equal.
    "s_ivf_topk" -> ivfTopKSql("vec_id % 7 = 0"),

    // k-means report mirror: same Lloyd cells CTE; exact inertia via
    // Σ‖q‖² − ‖s‖²/m (all BIGINT — no order-dependent double sum).
    // m and Σn2 replicate across dims in g; max() collapses them.
    "s_kmeans" ->
      s"""${ivfCellsCte("vec_id % 7 = 0")},
         |g AS (SELECT cell, d.i AS i, CAST(sum(qv[d.i]) AS BIGINT) AS sv,
         |             CAST(count(*) AS BIGINT) AS m_i, CAST(sum(n2) AS BIGINT) AS sn2_i
         |      FROM cells, (SELECT unnest(range(1, 65)) AS i) d GROUP BY 1, 2)
         |SELECT cell, max(m_i) AS n_vectors, max(sn2_i) AS sum_n2,
         |       CAST(sum(sv * sv) AS BIGINT) AS ss,
         |       ((max(m_i) * max(sn2_i) - CAST(sum(sv * sv) AS BIGINT)) * 1000) // max(m_i)
         |         AS inertia_milli
         |FROM g GROUP BY 1""".stripMargin,

    // r11 ANN evaluation: recall@3 of the IVF serve against the exact
    // brute ground truth. Both arms are the EXISTING oracle chains
    // nested as CTE subqueries (local WITH scopes), joined on
    // (q_id, c_id) and folded per query in exact integer millis.
    // r14 (third closing): sparse random projection 64→16 — exact
    // integer squared-L2 ranking in the projected space (no sqrt, no
    // division: the d² form never meets a zero-norm NaN)
    "s_rproj_topk" ->
      s"""$EmbCte,
         |$RpCte
         |SELECT q_id, rank, c_id, d2 FROM (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
         |    CAST($RpD2 AS BIGINT) AS d2,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY $RpD2 ASC, b.vec_id ASC) AS rank
         |  FROM pn a JOIN pn b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id % 97 = 0) t
         |WHERE rank <= 5""".stripMargin,

    // r14 (third closing): JL quality — recall@5 of the projected-space
    // L2 ranking vs the exact full-dimension L2 ground truth, per query
    "s_rproj_recall" ->
      s"""$EmbCte,
         |$RpCte,
         |ap AS (SELECT q_id, c_id FROM (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY $RpD2 ASC, b.vec_id ASC) AS rank
         |  FROM pn a JOIN pn b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id % 97 = 0) t
         |WHERE rank <= 5),
         |gt AS (SELECT q_id, c_id FROM (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY $FullD2 ASC, b.vec_id ASC) AS rank
         |  FROM n a JOIN n b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id % 97 = 0) t
         |WHERE rank <= 5),
         |j AS (
         |  SELECT g.q_id, CASE WHEN x.c_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM gt g LEFT JOIN ap x ON g.q_id = x.q_id AND g.c_id = x.c_id)
         |SELECT q_id, CAST(count(*) AS BIGINT) AS k,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST((sum(hit) * 1000) // count(*) AS BIGINT) AS recall_milli
         |FROM j GROUP BY q_id""".stripMargin,

    "s_recall" ->
      s"""WITH ivf AS (
         |${ivfTopKSql("vec_id % 7 = 0")}
         |), gt AS (
         |$EmbCte
         |SELECT q_id, c_id FROM (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
         |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $CosAB DESC, b.vec_id ASC) AS rank
         |  FROM n a JOIN n b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id % 97 = 0) t
         |WHERE rank <= 3
         |), j AS (
         |  SELECT g.q_id, CASE WHEN i.c_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM gt g LEFT JOIN ivf i ON g.q_id = i.q_id AND g.c_id = i.c_id)
         |SELECT q_id, CAST(count(*) AS BIGINT) AS k,
         |  CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST((sum(hit) * 1000) // count(*) AS BIGINT) AS recall_milli
         |FROM j GROUP BY q_id""".stripMargin,

    // Incremental-ingest mirror (Similarity.ivfAppendTopK): centroids
    // train on the BASE corpus sample only (the delta batch vec_id%5=0
    // arrives after training); final assignment + probes run over the
    // FULL corpus against the frozen centroids — append-then-probe must
    // equal index-everything-then-probe, so only the train filter moves.
    "s_ivf_append" -> ivfTopKSql("vec_id % 7 = 0 AND vec_id % 5 <> 0"),

    // PQ/ADC mirror: per-subspace centroids carried as (sum vector,
    // count) so every distance is exact-integer arithmetic until ONE
    // division (Σ(n·x − S)²/n²); the per-pair fold sums the 8 subspace
    // distances in j order via list(d2 ORDER BY j) → list_sum, matching
    // Spark's index-order aggregate() fold bit-for-bit.
    // IVF-PQ composition: the ivfCells chain supplies cells + probes,
    // the PQ chain (p-prefixed CTEs — `dims` collides) supplies codes +
    // the per-query subspace distances; ADC folds ONLY over candidate
    // pairs drawn from each query's two probed cells. Mirrors
    // Similarity.ivfPqTopK (IVF trained on the %7 sample, PQ codebook on
    // the full corpus, both the engine's conventions).
    "s_ivfpq_topk" ->
      s"""$IvfPqChain
         |SELECT q_id, rank, c_id, adist FROM (
         |  SELECT q_id, c_id, floor(ad * 1000000) / 1000000 AS adist,
         |    row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS rank
         |  FROM ppairs) t
         |WHERE rank <= 3""".stripMargin,

    // full serving stack: IVF-PQ coarse top-10 per query, exact-cosine
    // re-rank to 3 (the s_refine tail over the IVF-PQ candidate chain)
    "s_ivfpq_refine" ->
      s"""$IvfPqChain,
         |icand AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS rank
         |    FROM ppairs) t
         |  WHERE rank <= 10)
         |SELECT q_id, rank, c_id, cos FROM (
         |  SELECT icand.q_id, icand.c_id, $CosAB AS cos,
         |    row_number() OVER (PARTITION BY icand.q_id ORDER BY $CosAB DESC, icand.c_id ASC) AS rank
         |  FROM icand JOIN n a ON a.vec_id = icand.q_id
         |             JOIN n b ON b.vec_id = icand.c_id) t
         |WHERE rank <= 3""".stripMargin,

    // SQ8 mirror: per-dim min/max over the quantized corpus, affine
    // 0..255 codes by exact floor division, symmetric integer L2 —
    // every intermediate an exact integer in both engines
    "s_sq_topk" ->
      s"""$EmbCte,
         |ddims AS (SELECT vec_id, qv, unnest(range(1, 65)) AS i FROM n),
         |dstats AS (SELECT i, min(qv[i]) AS mn, max(qv[i]) AS mx
         |           FROM ddims GROUP BY i),
         |statrow AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
         |            FROM dstats),
         |coded AS (
         |  SELECT vec_id,
         |    list_transform(range(1, 65), i ->
         |      floor((qv[i] - mns[i]) * 255 / greatest(mxs[i] - mns[i], 1))) AS codes
         |  FROM n, statrow)
         |SELECT q_id, rank, c_id, d2 FROM (
         |  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
         |    list_sum(list_transform(range(1, 65), i ->
         |      pow(a.codes[i] - b.codes[i], 2))) AS d2,
         |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |      list_sum(list_transform(range(1, 65), i ->
         |        pow(a.codes[i] - b.codes[i], 2))) ASC, b.vec_id ASC) AS rank
         |  FROM coded a JOIN coded b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id % 97 = 0) t
         |WHERE rank <= 3""".stripMargin,

    "s_pq_topk" ->
      s"""$PqChain
         |SELECT q_id, rank, c_id, adist FROM (
         |  SELECT q_id, c_id, floor(ad * 1000000) / 1000000 AS adist,
         |    row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS rank
         |  FROM pairs) t
         |WHERE rank <= 3""".stripMargin,

    // two-stage refine mirror: PQ top-10 coarse candidates, exact
    // quantized cosine re-rank to top-3 (chain CTEs shared with
    // s_pq_topk)
    "s_refine" ->
      s"""$PqChain,
         |cand AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS rank
         |    FROM pairs) t
         |  WHERE rank <= 10)
         |SELECT q_id, rank, c_id, cos FROM (
         |  SELECT cand.q_id, cand.c_id, $CosAB AS cos,
         |    row_number() OVER (PARTITION BY cand.q_id ORDER BY $CosAB DESC, cand.c_id ASC) AS rank
         |  FROM cand JOIN n a ON a.vec_id = cand.q_id
         |            JOIN n b ON b.vec_id = cand.c_id) t
         |WHERE rank <= 3""".stripMargin,

    // PII-redaction mirror: same augmented text, same regexes (simple
    // enough to mean the same under Java regex and RE2), 'g' flag matches
    // Spark's replace-all default.
    "t_redact" -> {
      import graft.operators.TextOps.{EmailRe, Ipv4Re}
      val aug = "text || ' contact user' || doc_id || '@mail.example.com from 10.' || " +
        "(doc_id % 250) || '.0.' || (doc_id % 7)"
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace($aug, '$EmailRe', '<EMAIL>', 'g'),
         |                 '$Ipv4Re', '<IP>', 'g') AS redacted,
         |  CAST(len(regexp_extract_all($aug, '$EmailRe')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all($aug, '$Ipv4Re')) AS INT) AS n_ips
         |FROM documents""".stripMargin
    },

    // r17: E.164 phone redaction — the over-long 16-digit twin can
    // never match the 15-digit-capped pattern and must survive
    "t_redact_phone" -> {
      import graft.operators.TextOps.PhoneRe
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    '+1415' || lpad((doc_id % 10000000)::VARCHAR, 7, '0') AS v
         |  FROM documents),
         |aug AS (
         |  SELECT doc_id, text || ' call ' || v || ' ref ' || v || '99999' AS t
         |  FROM base)
         |SELECT doc_id,
         |  regexp_replace(t, '$PhoneRe', '<PHONE>', 'g') AS redacted,
         |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS INT) AS n_phones
         |FROM aug""".stripMargin
    },

    // r17: mod-97-gated IBAN redaction — check digits derive in-SQL by
    // the same exact-integer char fold the validator uses; the
    // +50-shifted twin (never congruent mod 97) must SURVIVE
    "t_redact_iban" -> {
      import graft.operators.TextOps.IbanRe
      // running mod-97 char fold over string expression `s` (seed '0')
      def m97(sx: String) =
        s"""list_reduce(
           |  list_prepend('0', list_transform(range(1, len($sx) + 1),
           |    i -> substring($sx, i::INT, 1))),
           |  (a, b) -> CASE WHEN b BETWEEN '0' AND '9'
           |    THEN ((a::BIGINT * 10 + (ascii(b) - 48)) % 97)::VARCHAR
           |    ELSE ((a::BIGINT * 100 + (ascii(b) - 55)) % 97)::VARCHAR END)::BIGINT""".stripMargin
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    repeat(lpad((doc_id % 1000000)::VARCHAR, 6, '0'), 3) AS bban
         |  FROM documents),
         |chk AS (
         |  SELECT doc_id, text, bban,
         |    98 - ${m97("(bban || 'DE00')")} AS c
         |  FROM base),
         |nums AS (
         |  SELECT doc_id, text,
         |    'DE' || lpad(c::VARCHAR, 2, '0') || bban AS v,
         |    'DE' || lpad(((c + 50) % 100)::VARCHAR, 2, '0') || bban AS iv
         |  FROM chk),
         |aug AS (
         |  SELECT doc_id, text || ' iban ' || v || ' ref ' || iv AS t FROM nums),
         |red AS (
         |  SELECT doc_id, t,
         |    list_filter(regexp_extract_all(t, '$IbanRe'),
         |      x -> ${m97("(substring(x, 5) || substring(x, 1, 4))")} = 1) AS valid
         |  FROM aug)
         |SELECT doc_id,
         |  list_reduce(list_prepend(t, valid), (a, b) -> replace(a, b, '<IBAN>')) AS redacted,
         |  CAST(len(valid) AS INT) AS n_ibans
         |FROM red""".stripMargin
    },

    // r13: Luhn-gated card redaction — the check digit derives in-SQL
    // by the same exact-integer fold the validator uses; the +5-shifted
    // invalid twin must SURVIVE redaction (the checksum gate is what
    // separates PII from random ids)
    "t_redact_cards" -> {
      import graft.operators.TextOps.CardRe
      // Luhn mod-10 sum of digit string `d` with parity offset `off`
      def luhn(d: String, off: String) =
        s"""list_sum(list_transform(range(1, len($d)+1),
           |  i -> CASE WHEN (len($d) - i + $off) % 2 = 1
           |        THEN substring($d, i::INT, 1)::INT * 2 -
           |             CASE WHEN substring($d, i::INT, 1)::INT > 4 THEN 9 ELSE 0 END
           |        ELSE substring($d, i::INT, 1)::INT END))""".stripMargin
      val stripped = "regexp_replace(x, '[^0-9]', '', 'g')"
      // per-doc separator format: dashes / spaces / bare by doc_id % 3
      def fmt(n: String) =
        s"""CASE WHEN doc_id % 3 = 0 THEN
           |    substring($n,1,4) || '-' || substring($n,5,4) || '-' ||
           |    substring($n,9,4) || '-' || substring($n,13,4)
           |  WHEN doc_id % 3 = 1 THEN
           |    substring($n,1,4) || ' ' || substring($n,5,4) || ' ' ||
           |    substring($n,9,4) || ' ' || substring($n,13,4)
           |  ELSE $n END""".stripMargin
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    '453957876' || lpad((doc_id % 1000000)::VARCHAR, 6, '0') AS pay
         |  FROM documents),
         |chk AS (
         |  SELECT doc_id, text, pay,
         |    (10 - (${luhn("pay", "1")} % 10)) % 10 AS c
         |  FROM base),
         |nums AS (
         |  SELECT doc_id, text,
         |    pay || c::VARCHAR AS v, pay || ((c + 5) % 10)::VARCHAR AS iv
         |  FROM chk),
         |aug AS (
         |  SELECT doc_id,
         |    text || ' pay with ' || ${fmt("v")} || ' order ' || ${fmt("iv")} AS t
         |  FROM nums),
         |red AS (
         |  SELECT doc_id, t,
         |    list_filter(regexp_extract_all(t, '$CardRe'),
         |      x -> ${luhn(stripped, "0")} % 10 = 0) AS valid
         |  FROM aug)
         |SELECT doc_id,
         |  list_reduce(list_prepend(t, valid), (a, b) -> replace(a, b, '<CARD>')) AS redacted,
         |  len(valid)::INT AS n_cards
         |FROM red""".stripMargin
    },

    // Concat-and-chunk packing mirror: pure integer window arithmetic;
    // CAST ... AS BIGINT on the running sum (DuckDB window sums of BIGINT
    // return HUGEINT, and the driver's hasher is type-sensitive).
    "t_pack" ->
      s"""$TokCte,
         |t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks, doc_id % 8 AS bucket
         |      FROM tok WHERE len(toks) > 0),
         |c AS (SELECT *, CAST(COALESCE(sum(n_toks) OVER (PARTITION BY bucket ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start FROM t),
         |x AS (SELECT bucket, doc_id, n_toks, start,
         |        unnest(range(start // 512, (start + n_toks - 1) // 512 + 1)) AS seq_id FROM c)
         |SELECT bucket, seq_id, doc_id,
         |  greatest(seq_id * 512 - start, 0) AS tok_start,
         |  least((seq_id + 1) * 512, start + n_toks) - greatest(seq_id * 512, start) AS tok_len
         |FROM x""".stripMargin,

    // Thresholds/weights generated from the SAME constants the Spark query
    // uses (Training.SampleRates etc.), so both engines filter on identical
    // md5-prefix comparisons and emit identical weight doubles.
    "t_sample" -> {
      import Training.{SampleDefault, SampleRates, SampleSalt, SplitSalt, SplitTrain, SplitVal}
      def thr(k: Int): String = if (k >= 256) "zz" else f"$k%02x"
      val thrCase = SampleRates.toSeq.sorted.map { case (l, k) =>
        s"WHEN lang = '$l' THEN '${thr(k)}'"
      }.mkString("CASE ", " ", s" ELSE '${thr(SampleDefault)}' END")
      // CAST: a bare decimal literal parses as DECIMAL in DuckDB, not DOUBLE
      val wCase = SampleRates.toSeq.sorted.map { case (l, k) =>
        s"WHEN lang = '$l' THEN CAST(${256.0 / k} AS DOUBLE)"
      }.mkString("CASE ", " ", s" ELSE CAST(${256.0 / SampleDefault} AS DOUBLE) END")
      s"""SELECT doc_id, lang, $wCase AS weight,
         |  CASE WHEN substr(md5('$SplitSalt:' || doc_id), 1, 2) < '${thr(SplitTrain)}' THEN 'train'
         |       WHEN substr(md5('$SplitSalt:' || doc_id), 1, 2) < '${thr(SplitVal)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents
         |WHERE substr(md5('$SampleSalt:' || doc_id), 1, 2) < $thrCase""".stripMargin
    },

    // Decontamination mirror: same split hash thresholds (generated from
    // Training's constants), same distinct-3-shingle overlap. The join key
    // is the raw shingle here vs its md5 in Spark — identical pairing,
    // the hash only bounds key width in flight.
    "t_decontam" -> {
      import Training.{SplitSalt, SplitTrain, SplitVal}
      def thr(k: Int): String = if (k >= 256) "zz" else f"$k%02x"
      s"""$TokCte,
         |shi AS (SELECT doc_id, list_distinct($Shingles) AS sh,
         |    CASE WHEN substr(md5('$SplitSalt:' || doc_id), 1, 2) < '${thr(SplitTrain)}' THEN 'train'
         |         WHEN substr(md5('$SplitSalt:' || doc_id), 1, 2) < '${thr(SplitVal)}' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM tok WHERE len(toks) >= 3),
         |flat AS (SELECT doc_id, split, unnest(sh) AS s FROM shi),
         |ev AS (SELECT DISTINCT s FROM flat WHERE split <> 'train'),
         |shared AS (
         |  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM flat f JOIN ev ON f.s = ev.s WHERE f.split = 'train' GROUP BY 1)
         |SELECT t.doc_id, CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
         |  COALESCE(s.n_shared, 0) > 0 AS contaminated
         |FROM (SELECT doc_id FROM shi WHERE split = 'train') t
         |LEFT JOIN shared s ON s.doc_id = t.doc_id""".stripMargin
    },

    // fractional-overlap mirror: count both totals in one pass via the
    // LEFT JOIN null-count; keep threshold by integer cross-mult
    "t_decontam2" -> {
      import Training.{SplitSalt, SplitTrain, SplitVal}
      def thr(k: Int): String = if (k >= 256) "zz" else f"$k%02x"
      s"""$TokCte,
         |shi AS (SELECT doc_id, list_distinct($Shingles) AS sh,
         |    CASE WHEN substr(md5('$SplitSalt:' || doc_id), 1, 2) < '${thr(SplitTrain)}' THEN 'train'
         |         WHEN substr(md5('$SplitSalt:' || doc_id), 1, 2) < '${thr(SplitVal)}' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM tok WHERE len(toks) >= 3),
         |flat AS (SELECT doc_id, split, unnest(sh) AS s FROM shi),
         |ev AS (SELECT DISTINCT s, true AS hit FROM flat WHERE split <> 'train')
         |SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(count(ev.hit) AS BIGINT) AS n_shared,
         |  count(ev.hit) * 100 < count(*) * 10 AS keep
         |FROM flat f LEFT JOIN ev ON f.s = ev.s
         |WHERE f.split = 'train' GROUP BY 1""".stripMargin
    },

    // BPE merge mirror: same pair counts, same tie-break, same
    // greedy-leftmost fold (chain CTEs shared with t_bpe_encode)
    "t_bpe_merges" ->
      s"""$BpeChain
         |SELECT 1 AS step, pair, cnt AS n FROM t1
         |UNION ALL SELECT 2, pair, cnt FROM t2
         |UNION ALL SELECT 3, pair, cnt FROM t3""".stripMargin,

    // tokenizer serving mirror: every corpus token joined to its
    // post-merge subword count on the w3 vocabulary
    "t_bpe_encode" ->
      s"""$BpeChain,
         |w3 AS (SELECT word, n, ${bpeFold("syms", "t3.px", "t3.py")} AS syms FROM w2, t3)
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(sum(len(w3.syms)) AS BIGINT) AS n_subwords
         |FROM (SELECT doc_id, unnest(toks) AS word FROM tok) t
         |JOIN w3 ON t.word = w3.word GROUP BY 1""".stripMargin,

    // WordPiece greedy longest-prefix-match mirror (WordPiece.encode):
    // same dressed corpus, same (cont, piece) letter-only vocabulary
    // under the exact max(3, ntok//2000) floor, and the same greedy walk
    // — here as a recursive CTE over the per-(word, start) LONGEST match
    // (Spark's sorted-list fold picks the same piece at every position).
    // A word whose walk stalls before its end (digit words, words past
    // the 32-char cap) is [UNK]: exactly 1 piece.
    "t_wordpiece" ->
      s"""WITH RECURSIVE tok AS (SELECT doc_id, $Toks AS toks FROM (
         |    SELECT doc_id,
         |           text || CASE WHEN doc_id % 37 = 0 THEN ' 1996' ELSE '' END
         |                || CASE WHEN doc_id % 41 = 0 THEN ' x86' ELSE '' END AS text
         |    FROM documents)),
         |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n
         |       FROM (SELECT unnest(toks) AS word FROM tok) GROUP BY 1),
         |cand AS (SELECT word, n, c.s AS s, c.l AS l, c.piece AS piece, c.s > 0 AS cont
         |         FROM (SELECT word, n, unnest(flatten(list_transform(range(0, len(word)),
         |                  s -> list_transform(range(1, least(4, len(word) - s) + 1),
         |                       l -> {'s': s, 'l': l, 'piece': substr(word, s + 1, l)})))) AS c
         |               FROM wc WHERE len(word) <= 32)),
         |flo AS (SELECT greatest(3, CAST(sum(n) AS BIGINT) // 2000) AS min_cnt FROM wc),
         |voc AS (SELECT cont, piece FROM (
         |          SELECT cont, piece, CAST(sum(n) AS BIGINT) AS cnt FROM cand
         |          WHERE regexp_matches(piece, '^[a-z]+$$') GROUP BY 1, 2), flo
         |        WHERE cnt >= min_cnt),
         |best AS (SELECT c.word, c.s, max(c.l) AS l
         |         FROM cand c JOIN voc v ON v.cont = c.cont AND v.piece = c.piece
         |         GROUP BY 1, 2),
         |walk AS (SELECT word, CAST(0 AS BIGINT) AS p, CAST(0 AS BIGINT) AS c FROM wc
         |         UNION ALL
         |         SELECT w.word, w.p + b.l, w.c + 1
         |         FROM walk w JOIN best b ON b.word = w.word AND b.s = w.p),
         |fin AS (SELECT word, max(p) AS p, max(c) AS c FROM walk GROUP BY 1),
         |seg AS (SELECT wc.word,
         |               CASE WHEN f.p = len(wc.word) THEN f.c ELSE CAST(1 AS BIGINT) END AS w_pieces,
         |               f.p <> len(wc.word) AS w_unk
         |        FROM wc JOIN fin f ON f.word = wc.word)
         |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(sum(s.w_pieces) AS BIGINT) AS n_pieces,
         |       CAST(sum(CASE WHEN s.w_unk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
         |FROM (SELECT doc_id, unnest(toks) AS word FROM tok) d
         |JOIN seg s ON s.word = d.word
         |GROUP BY 1""".stripMargin,

    // token-budget selection mirror: the engine's two-stage bounded
    // prefix sums are SEMANTICALLY one global cumulative sum in the
    // total order (q DESC, salt bucket, doc_id) — the oracle states that
    // single window; cum itself is compared, not just the verdict
    "t_token_budget" ->
      s"""$TokCte,
         |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |                (CAST(len(list_filter(toks, t -> t IN ${stopIn("en")})) AS BIGINT) * 1000)
         |                  // CAST(len(toks) AS BIGINT) AS q,
         |                substr(md5('tb1:' || doc_id), 1, 1) AS sb
         |         FROM tok WHERE len(toks) >= 1),
         |bud AS (SELECT (CAST(sum(n_tokens) AS BIGINT) * 2) // 5 AS budget FROM base),
         |sel AS (SELECT doc_id, n_tokens, q,
         |               sum(n_tokens) OVER (ORDER BY q DESC, sb ASC, doc_id ASC
         |                                   ROWS UNBOUNDED PRECEDING) AS cum
         |        FROM base)
         |SELECT s.doc_id, s.n_tokens, s.q, CAST(s.cum AS BIGINT) AS cum,
         |       s.cum <= b.budget AS kept
         |FROM sel s, bud b""".stripMargin,

    // vocabulary growth mirror: first occurrence = min(doc_id), integer
    // range buckets, one running-total window over the ≤10-row aggregate
    "t_vocab_growth" ->
      s"""WITH tok AS (SELECT doc_id, $Toks AS toks FROM (
         |    SELECT doc_id, text || ' w' || (doc_id // 7) AS text
         |    FROM documents)),
         |w AS (SELECT word, min(doc_id) AS first_doc
         |      FROM (SELECT doc_id, unnest(toks) AS word FROM tok) GROUP BY 1),
         |mx AS (SELECT max(doc_id) AS mx FROM tok WHERE len(toks) >= 1),
         |pb AS (SELECT first_doc * 10 // (mx + 1) AS bucket,
         |              CAST(count(*) AS BIGINT) AS new_types
         |       FROM w, mx GROUP BY 1)
         |SELECT CAST(bucket AS BIGINT) AS bucket, new_types,
         |       CAST(sum(new_types) OVER (ORDER BY bucket
         |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
         |FROM pb""".stripMargin,

    // dedup savings mirror: min-doc_id canonical election, exact permille
    "d_savings" ->
      s"""WITH tok AS (SELECT doc_id, source, $Toks AS toks FROM documents),
         |base AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
         |                md5(array_to_string(toks, ' ')) AS fp
         |         FROM tok WHERE len(toks) >= 1),
         |canon AS (SELECT fp, min(doc_id) AS canon_id FROM base GROUP BY 1)
         |SELECT b.source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(b.n_tokens) AS BIGINT) AS n_tokens,
         |       CAST(sum(CASE WHEN b.doc_id <> c.canon_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |       CAST(sum(CASE WHEN b.doc_id <> c.canon_id THEN b.n_tokens ELSE 0 END) AS BIGINT) AS dup_tokens,
         |       CAST(sum(CASE WHEN b.doc_id <> c.canon_id THEN b.n_tokens ELSE 0 END) AS BIGINT) * 1000
         |         // CAST(sum(b.n_tokens) AS BIGINT) AS savings_permille
         |FROM base b JOIN canon c ON c.fp = b.fp
         |GROUP BY 1""".stripMargin,

    // corpus health report mirror: same two aggregates, exact permille
    "t_corpus_stats" ->
      s"""WITH tok AS (SELECT doc_id, source, $Toks AS toks FROM documents),
         |base AS (SELECT doc_id, source, toks FROM tok WHERE len(toks) >= 1),
         |ds AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |              CAST(sum(len(toks)) AS BIGINT) AS n_tokens
         |       FROM base GROUP BY 1),
         |ws AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types,
         |              CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
         |       FROM (SELECT source, word, count(*) AS n
         |             FROM (SELECT source, unnest(toks) AS word FROM base)
         |             GROUP BY 1, 2)
         |       GROUP BY 1)
         |SELECT d.source, d.n_docs, d.n_tokens, w.n_types, w.n_hapax,
         |       w.n_types * 1000 // d.n_tokens AS ttr_permille,
         |       d.n_tokens // d.n_docs AS mean_doc_len
         |FROM ds d JOIN ws w ON w.source = d.source""".stripMargin,

    // length-batching mirror: each arm stated as ONE global row_number
    // window (the semantic form of the engine's two-stage bounded rank)
    "t_length_batch" ->
      s"""$TokCte,
         |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len,
         |                substr(md5('lenb1:' || doc_id), 1, 2) AS h
         |         FROM tok WHERE len(toks) >= 1),
         |l AS (SELECT len, row_number() OVER (ORDER BY len, doc_id) AS rk FROM base),
         |r AS (SELECT len, row_number() OVER (ORDER BY h, doc_id) AS rk FROM base),
         |la AS (SELECT 'length' AS arm, (rk - 1) // 64 AS batch_idx,
         |              CAST(count(*) AS BIGINT) AS n_docs,
         |              CAST(max(len) AS BIGINT) AS max_len,
         |              CAST(sum(len) AS BIGINT) AS sum_len
         |       FROM l GROUP BY 2),
         |ra AS (SELECT 'random' AS arm, (rk - 1) // 64 AS batch_idx,
         |              CAST(count(*) AS BIGINT) AS n_docs,
         |              CAST(max(len) AS BIGINT) AS max_len,
         |              CAST(sum(len) AS BIGINT) AS sum_len
         |       FROM r GROUP BY 2)
         |SELECT arm, batch_idx, n_docs, max_len, sum_len,
         |       n_docs * max_len - sum_len AS padding
         |FROM (SELECT * FROM la UNION ALL SELECT * FROM ra)""".stripMargin,

    // FIM mirror: identical hash gates/cuts, identical PSM sentinel
    // re-serialization via DuckDB list slices (1-based inclusive ends —
    // toks[1:lo] / toks[hi+1:n] / toks[lo+1:hi] land exactly on Spark's
    // slice(start, length) windows)
    "t_fim" ->
      s"""$TokCte,
         |base AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
         |                substr(md5('fim1:' || doc_id), 1, 1) < '8' AS applied,
         |                ('0x' || substr(md5('fim1c1:' || doc_id), 1, 8))::BIGINT
         |                  % (len(toks) + 1) AS h1,
         |                ('0x' || substr(md5('fim1c2:' || doc_id), 1, 8))::BIGINT
         |                  % (len(toks) + 1) AS h2
         |         FROM tok WHERE len(toks) >= 1),
         |c AS (SELECT doc_id, toks, n, applied,
         |             least(h1, h2) AS lo, greatest(h1, h2) AS hi FROM base)
         |SELECT doc_id, n AS n_tokens, applied,
         |  CASE WHEN applied THEN lo END AS cut_lo,
         |  CASE WHEN applied THEN hi END AS cut_hi,
         |  CASE WHEN applied THEN lo END AS n_prefix,
         |  CASE WHEN applied THEN hi - lo END AS n_middle,
         |  CASE WHEN applied THEN n - hi END AS n_suffix,
         |  CASE WHEN applied THEN md5(array_to_string(
         |         ['<PRE>'] || toks[1:lo] || ['<SUF>'] || toks[hi+1:n]
         |           || ['<MID>'] || toks[lo+1:hi], ' '))
         |       ELSE md5(array_to_string(toks, ' ')) END AS fp
         |FROM c""".stripMargin,

    // UniMax allocation mirror: identical ascending-size recursive
    // recurrence, identical exact-integer budget/cap constants
    "t_unimax" ->
      s"""WITH RECURSIVE tok AS (SELECT source, $Toks AS toks FROM documents),
         |usrc AS (SELECT source, CAST(sum(len(toks)) AS BIGINT) AS n
         |         FROM tok WHERE len(toks) >= 1 GROUP BY 1),
         |ord AS (SELECT source, n,
         |               CAST(row_number() OVER (ORDER BY n ASC, source ASC) AS INT) AS i,
         |               CAST(count(*) OVER () AS BIGINT) AS k FROM usrc),
         |alloc(i, r, a, source, n) AS (
         |  SELECT CAST(0 AS INT), t * 11 // 10, CAST(NULL AS BIGINT),
         |         CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
         |  FROM (SELECT CAST(sum(n) AS BIGINT) AS t FROM usrc) t0
         |  UNION ALL
         |  SELECT o.i, al.r - least(o.n * 9 // 8, al.r // (o.k - al.i)),
         |         least(o.n * 9 // 8, al.r // (o.k - al.i)), o.source, o.n
         |  FROM alloc al JOIN ord o ON o.i = al.i + 1)
         |SELECT source, n AS n_tokens, a AS alloc,
         |       CAST(a * 1000 // n AS BIGINT) AS rate_permille
         |FROM alloc WHERE source IS NOT NULL""".stripMargin,

    // realized UniMax admission mirror: the allocation recurrence +
    // full-epoch repeats (rate // 1000) + the annealMix fractional
    // salted-hash draw at rate % 1000 permille
    "t_unimax_admit" ->
      s"""WITH RECURSIVE tok AS (SELECT doc_id, source, $Toks AS toks FROM documents),
         |usrc AS (SELECT source, CAST(sum(len(toks)) AS BIGINT) AS n
         |         FROM tok WHERE len(toks) >= 1 GROUP BY 1),
         |ord AS (SELECT source, n,
         |               CAST(row_number() OVER (ORDER BY n ASC, source ASC) AS INT) AS i,
         |               CAST(count(*) OVER () AS BIGINT) AS k FROM usrc),
         |alloc(i, r, a, source, n) AS (
         |  SELECT CAST(0 AS INT), t * 11 // 10, CAST(NULL AS BIGINT),
         |         CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
         |  FROM (SELECT CAST(sum(n) AS BIGINT) AS t FROM usrc) t0
         |  UNION ALL
         |  SELECT o.i, al.r - least(o.n * 9 // 8, al.r // (o.k - al.i)),
         |         least(o.n * 9 // 8, al.r // (o.k - al.i)), o.source, o.n
         |  FROM alloc al JOIN ord o ON o.i = al.i + 1),
         |rate AS (SELECT source, a * 1000 // n AS rate_permille
         |         FROM alloc WHERE source IS NOT NULL),
         |base AS (SELECT t.source, t.doc_id, CAST(len(t.toks) AS BIGINT) AS nt,
         |                r.rate_permille
         |         FROM tok t JOIN rate r USING (source) WHERE len(t.toks) >= 1),
         |picked AS (SELECT source, nt, rate_permille,
         |             rate_permille // 1000
         |             + CASE WHEN ('0x' || substr(md5('unimax1:' || doc_id), 1, 8))::BIGINT
         |                         * 1000 < (rate_permille % 1000) * 4294967296
         |                    THEN 1 ELSE 0 END AS picks
         |           FROM base)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(nt) AS BIGINT) AS n_tokens,
         |       CAST(max(rate_permille) AS BIGINT) AS rate_permille,
         |       CAST(sum(nt * picks) AS BIGINT) AS tok_admitted,
         |       CAST(sum(nt * picks) * 1000 // sum(nt) AS BIGINT) AS realized_permille
         |FROM picked GROUP BY 1""".stripMargin,

    // annealed-mixture mirror: same permille interpolation (shares
    // bounded in permille BY DESIGN so no cross-multiplied product can
    // overflow), same per-epoch salted hash admission as t_lang_balance
    "t_anneal_mix" ->
      s"""WITH tok AS (SELECT doc_id, source, $Toks AS toks FROM documents),
         |base AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
         |                (CAST(len(list_filter(toks, t -> t IN ${stopIn("en")})) AS BIGINT) * 1000)
         |                  // CAST(len(toks) AS BIGINT) AS q
         |         FROM tok WHERE len(toks) >= 1),
         |src AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t_s,
         |               CAST(sum(q * n_tokens) AS BIGINT) AS qt_s
         |        FROM base GROUP BY 1),
         |tot AS (SELECT CAST(sum(t_s) AS BIGINT) AS tt,
         |               CAST(sum(qt_s) AS BIGINT) AS qtt FROM src),
         |sh AS (SELECT source, t_s, tt, t_s * 1000 // tt AS nat_pm,
         |              CASE WHEN qtt = 0 THEN 0 ELSE qt_s * 1000 // qtt END AS qual_pm
         |       FROM src, tot),
         |ep AS (SELECT unnest(range(0, 4)) AS epoch),
         |rate AS (SELECT epoch, source, nat_pm, qual_pm,
         |                (nat_pm * (3 - epoch) + qual_pm * epoch) // 3 AS mix_pm,
         |                least(1000, ((nat_pm * (3 - epoch) + qual_pm * epoch) // 3)
         |                            * (tt // 2) // t_s) AS rate_pm
         |         FROM sh, ep)
         |SELECT r.epoch, b.source,
         |  CAST(max(r.nat_pm) AS BIGINT) AS nat_permille,
         |  CAST(max(r.qual_pm) AS BIGINT) AS qual_permille,
         |  CAST(max(r.mix_pm) AS BIGINT) AS mix_permille,
         |  CAST(max(r.rate_pm) AS BIGINT) AS rate_permille,
         |  CAST(sum(CASE WHEN ('0x' || substr(md5('anneal1:' || r.epoch || ':' || b.doc_id), 1, 8))::BIGINT
         |                     * 1000 < r.rate_pm * 4294967296 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN ('0x' || substr(md5('anneal1:' || r.epoch || ':' || b.doc_id), 1, 8))::BIGINT
         |                     * 1000 < r.rate_pm * 4294967296 THEN b.n_tokens ELSE 0 END) AS BIGINT) AS tok_kept
         |FROM base b JOIN rate r ON r.source = b.source
         |GROUP BY 1, 2""".stripMargin,

    // bigram-LM surprisal mirror: context counts derived from the bigram
    // table, exact-integer floor-log2 via len(bin(n))-1 in both engines
    // (chain shared with t_lm_tiers)
    // r10 stupid-backoff trigram LM (train on doc_id % 2 = 0, score all;
    // alpha = 0.4 pinned as the 1322 milli-bit penalty; all-integer).
    // Mirrors NgramLm.backoffScore join-for-join.
    "t_lm_backoff" ->
      s"""$TokCte,
         |tr AS (SELECT toks FROM tok WHERE doc_id % 2 = 0),
         |uw AS (SELECT unnest(toks) AS w FROM tr),
         |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM uw GROUP BY 1),
         |bw AS (SELECT unnest(list_transform(range(0, len(toks) - 1),
         |                i -> toks[i+1] || ' ' || toks[i+2])) AS bg
         |       FROM tr WHERE len(toks) >= 2),
         |bi AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM bw GROUP BY 1),
         |tw AS (SELECT unnest(list_transform(range(0, len(toks) - 2),
         |                 i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS tg
         |        FROM tr WHERE len(toks) >= 3),
         |tri AS (SELECT tg, CAST(count(*) AS BIGINT) AS ct FROM tw GROUP BY 1),
         |n AS (SELECT CAST(sum(cu) AS BIGINT) AS nt FROM uni),
         |pos AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 2),
         |                  i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS tg
         |        FROM tok WHERE len(toks) >= 3),
         |pk AS (SELECT doc_id, tg,
         |         string_split(tg, ' ')[1] || ' ' || string_split(tg, ' ')[2] AS bg_ctx,
         |         string_split(tg, ' ')[2] || ' ' || string_split(tg, ' ')[3] AS bg,
         |         string_split(tg, ' ')[2] AS w2, string_split(tg, ' ')[3] AS w3
         |       FROM pos),
         |sc AS (SELECT p.doc_id,
         |    CASE WHEN t.ct IS NOT NULL
         |           THEN ((len(bin(cx.cb)) - 1) - (len(bin(t.ct)) - 1)) * 1000
         |         WHEN b.cb IS NOT NULL
         |           THEN 1322 + ((len(bin(u2.cu)) - 1) - (len(bin(b.cb)) - 1)) * 1000
         |         WHEN u3.cu IS NOT NULL
         |           THEN 2644 + ((len(bin(n.nt)) - 1) - (len(bin(u3.cu)) - 1)) * 1000
         |         ELSE 2644 + (len(bin(n.nt)) - 1) * 1000 END AS mbits,
         |    CASE WHEN t.ct IS NULL THEN 1 ELSE 0 END AS backed
         |  FROM pk p
         |  LEFT JOIN tri t ON p.tg = t.tg
         |  LEFT JOIN bi cx ON p.bg_ctx = cx.bg
         |  LEFT JOIN bi b ON p.bg = b.bg
         |  LEFT JOIN uni u2 ON p.w2 = u2.w
         |  LEFT JOIN uni u3 ON p.w3 = u3.w
         |  CROSS JOIN n)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |  CAST(sum(backed) AS BIGINT) AS n_backoff,
         |  CAST(sum(mbits) AS BIGINT) AS total_mbits,
         |  CAST(sum(mbits) // count(*) AS BIGINT) AS mean_mbits
         |FROM sc GROUP BY 1""".stripMargin,

    "t_lm_score" ->
      s"""$LmScoreCte
         |SELECT doc_id, n_bigrams, total_bits, bits_x1000 FROM lmscore""".stripMargin,

    // CCNet tercile mirror: distinct-value histogram, cumulative window,
    // smallest value reaching ceil(t·n/3) as the cut
    "t_lm_tiers" ->
      s"""$LmScoreCte,
         |hist AS (SELECT bits_x1000 AS v, CAST(count(*) AS BIGINT) AS cnt
         |         FROM lmscore GROUP BY 1),
         |cum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
         |               sum(cnt) OVER () AS n FROM hist),
         |b AS (SELECT min(CASE WHEN cum * 3 >= n THEN v END) AS b1,
         |             min(CASE WHEN cum * 3 >= n * 2 THEN v END) AS b2 FROM cum)
         |SELECT s.doc_id, s.bits_x1000,
         |  CAST(CASE WHEN s.bits_x1000 <= b.b1 THEN 0
         |            WHEN s.bits_x1000 <= b.b2 THEN 1 ELSE 2 END AS BIGINT) AS tier
         |FROM lmscore s, b""".stripMargin,

    // r11 CCNet bucket sampling: the tiers chain + the deterministic
    // 2-hex md5 keep threshold per tier (keep-all / 50% / ~10%) — the
    // t_sample hashing convention, replayed exactly
    "t_ccnet_sample" ->
      s"""$LmScoreCte,
         |hist AS (SELECT bits_x1000 AS v, CAST(count(*) AS BIGINT) AS cnt
         |         FROM lmscore GROUP BY 1),
         |cum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
         |               sum(cnt) OVER () AS n FROM hist),
         |b AS (SELECT min(CASE WHEN cum * 3 >= n THEN v END) AS b1,
         |             min(CASE WHEN cum * 3 >= n * 2 THEN v END) AS b2 FROM cum),
         |tiered AS (
         |  SELECT s.doc_id, s.bits_x1000,
         |    CAST(CASE WHEN s.bits_x1000 <= b.b1 THEN 0
         |              WHEN s.bits_x1000 <= b.b2 THEN 1 ELSE 2 END AS BIGINT) AS tier,
         |    substr(md5('ccnet:' || s.doc_id), 1, 2) AS skey
         |  FROM lmscore s, b)
         |SELECT doc_id, bits_x1000, tier, skey FROM tiered
         |WHERE skey < CASE tier WHEN 0 THEN 'zz' WHEN 1 THEN '80' ELSE '1a' END""".stripMargin,

    // r14 language rebalancing: exact-integer mirror — achievable total
    // bounded by the scarcest targeted language, per-language budgets,
    // cross-multiplied 32-bit hash threshold (no float rate exists)
    "t_lang_balance" ->
      """WITH t(lang, tp) AS (VALUES ('en', 400), ('de', 150),
        |    ('fr', 150), ('es', 150), ('zh', 150)),
        |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
        |      FROM documents GROUP BY 1),
        |j AS (SELECT c.lang, c.n_lang,
        |        CAST(coalesce(t.tp, 0) AS BIGINT) AS target_permille
        |      FROM c LEFT JOIN t ON t.lang = c.lang),
        |nt AS (SELECT min(n_lang * 1000 // target_permille) AS n_total
        |       FROM j WHERE target_permille > 0),
        |b AS (SELECT lang, n_lang, target_permille,
        |        CAST(n_total * target_permille // 1000 AS BIGINT) AS budget
        |      FROM j, nt)
        |SELECT d.doc_id, d.lang, b.n_lang, b.target_permille, b.budget,
        |  ('0x' || substr(md5('langbal:' || d.doc_id), 1, 8))::BIGINT * b.n_lang
        |    < b.budget * 4294967296 AS kept
        |FROM documents d JOIN b ON b.lang = d.lang""".stripMargin,

    // chunk mirror: same stride-64/48 windows, clamped list slice,
    // md5-of-joined-tokens content gate (range() excludes its stop,
    // sequence() includes it — 0..n-1 step 48 lands identically)
    "t_chunk" ->
      s"""$TokCte
         |SELECT doc_id, CAST(st // 48 AS BIGINT) AS chunk_idx,
         |  CAST(st AS BIGINT) AS start_tok,
         |  CAST(len(toks[st+1:st+64]) AS BIGINT) AS n_chunk_toks,
         |  md5(array_to_string(toks[st+1:st+64], ' ')) AS fp
         |FROM (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS st
         |      FROM tok WHERE len(toks) > 0) u""".stripMargin,

    // winnowing mirror: same 4-gram md5s, same composite-string windowed
    // argmin (hash || reversed zero-padded position ⇒ min hash, max pos)
    // r10 WARC: the oracle states the per-doc record fields analytically
    // (strlen = payload UTF-8 bytes; md5 over the same bytes); the Spark
    // side writes REAL WARC bytes and parses them back — and the gzip
    // variant must produce the IDENTICAL relation after inflating the
    // member stream, so both share this SQL.
    "t_warc_records" ->
      """WITH w AS (SELECT doc_id, text FROM documents)
        |SELECT doc_id, 'response' AS warc_type,
        |  'https://site' || (doc_id % 250) || '.example.com/p' || doc_id AS target_uri,
        |  CAST(strlen(text) AS BIGINT) AS content_length,
        |  md5(text) AS payload_md5
        |FROM w""".stripMargin,

    "t_warc_gzip" ->
      """WITH w AS (SELECT doc_id, text FROM documents)
        |SELECT doc_id, 'response' AS warc_type,
        |  'https://site' || (doc_id % 250) || '.example.com/p' || doc_id AS target_uri,
        |  CAST(strlen(text) AS BIGINT) AS content_length,
        |  md5(text) AS payload_md5
        |FROM w""".stripMargin,

    // r11 WET: the oracle states the extracted-text stats analytically
    // (the payload round-trips the container bit-exactly, so text/toks
    // over the original column equal the recovered payload's)
    "t_wet" ->
      s"""$TokCte
         |SELECT doc_id, 'conversion' AS warc_type,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  md5(text) AS payload_md5
         |FROM tok""".stripMargin,

    // r11 robots compliance: the oracle rebuilds the deterministic rule
    // table (UrlOps.robotsRules mirror) and replays RFC 9309 §2.2.2
    // longest-match with the allow-wins tie-break as a windowed argmax;
    // the Spark side broadcasts the rules and resolves the winner with
    // an in-aggregate struct max — same ordering, one shuffle
    "t_robots" ->
      """WITH d AS (SELECT doc_id, doc_id % 250 AS site, '/p' || doc_id AS path
        |           FROM documents),
        |s AS (SELECT unnest(range(0, 250)) AS g),
        |r AS (
        |  SELECT g AS site, '/' AS prefix, FALSE AS allow FROM s WHERE g % 5 = 0
        |  UNION ALL SELECT g, '/p', FALSE FROM s WHERE g % 5 = 1
        |  UNION ALL SELECT g, '/p1', TRUE FROM s WHERE g % 5 = 1
        |  UNION ALL SELECT g, '/q', FALSE FROM s WHERE g % 5 = 2),
        |m AS (
        |  SELECT d.doc_id, d.site, d.path, r.prefix, r.allow,
        |    row_number() OVER (PARTITION BY d.doc_id
        |      ORDER BY len(r.prefix) DESC, r.allow DESC, r.prefix DESC) AS rn
        |  FROM d LEFT JOIN r ON d.site = r.site AND starts_with(d.path, r.prefix))
        |SELECT doc_id, CAST(site AS BIGINT) AS site, path,
        |  coalesce(allow, TRUE) AS allowed,
        |  coalesce(prefix, '') AS matched_rule
        |FROM m WHERE rn = 1""".stripMargin,

    // r12: t_robots_warc recovers pages AND rules from real WARC bytes
    // (robots.txt captures parsed by the RFC 9309 group parser, hostile
    // dressing included) — the EFFECTIVE rules are the same analytic
    // table, so the oracle is t_robots' verbatim: the container walk and
    // the rule-document parsing are transport, not semantics
    "t_robots_warc" ->
      """WITH d AS (SELECT doc_id, doc_id % 250 AS site, '/p' || doc_id AS path
        |           FROM documents),
        |s AS (SELECT unnest(range(0, 250)) AS g),
        |r AS (
        |  SELECT g AS site, '/' AS prefix, FALSE AS allow FROM s WHERE g % 5 = 0
        |  UNION ALL SELECT g, '/p', FALSE FROM s WHERE g % 5 = 1
        |  UNION ALL SELECT g, '/p1', TRUE FROM s WHERE g % 5 = 1
        |  UNION ALL SELECT g, '/q', FALSE FROM s WHERE g % 5 = 2),
        |m AS (
        |  SELECT d.doc_id, d.site, d.path, r.prefix, r.allow,
        |    row_number() OVER (PARTITION BY d.doc_id
        |      ORDER BY len(r.prefix) DESC, r.allow DESC, r.prefix DESC) AS rn
        |  FROM d LEFT JOIN r ON d.site = r.site AND starts_with(d.path, r.prefix))
        |SELECT doc_id, CAST(site AS BIGINT) AS site, path,
        |  coalesce(allow, TRUE) AS allowed,
        |  coalesce(prefix, '') AS matched_rule
        |FROM m WHERE rn = 1""".stripMargin,

    // r13: crawl-delay + sitemap directives out of the same robots.txt
    // captures — the oracle states the per-site expectation analytically
    // (first valid delay in the * group; sitemaps are global directives
    // in document order, incl. the one planted in the badbot group; the
    // orphan and badbot delays never leak; 404 sites absent)
    "t_robots_delay" ->
      """WITH s AS (SELECT unnest(range(0, 250)) AS site),
        |d AS (SELECT site, 'https://site' || site || '.example.com' AS host
        |      FROM s WHERE site % 5 <> 4)
        |SELECT CAST(site AS BIGINT) AS site,
        |  CAST(CASE WHEN site % 5 = 0 THEN 2
        |            WHEN site % 5 = 2 THEN 5 END AS BIGINT) AS crawl_delay,
        |  CAST(CASE WHEN site % 5 = 0 THEN 1 WHEN site % 5 = 1 THEN 2
        |            WHEN site % 5 = 2 THEN 1 ELSE 0 END AS BIGINT) AS n_sitemaps,
        |  CASE WHEN site % 5 = 0 THEN host || '/sitemap.xml'
        |       WHEN site % 5 = 1 THEN host || '/sitemap.xml,' || host || '/sitemap2.xml'
        |       WHEN site % 5 = 2 THEN host || '/from-badbot.xml'
        |       ELSE '' END AS sitemaps
        |FROM d""".stripMargin,

    // r13: sitemap parse — analytic per-site expectation (urlset sites
    // get 1 + site%3 url entries with the dressed loc/lastmod/priority;
    // index sites get 2 shard refs; the ghost-comment and loc-less
    // entries never surface)
    "t_sitemap" ->
      """WITH s AS (SELECT unnest(range(0, 250)) AS site),
        |h AS (SELECT site, 'https://site' || site || '.example.com' AS host FROM s),
        |idx AS (
        |  SELECT site, host, unnest(range(0, 2)) AS pos FROM h WHERE site % 5 = 4),
        |idx2 AS (
        |  SELECT site, 'sitemap' AS kind, pos,
        |    host || '/sitemap' || (pos + 1) || '.xml' AS loc,
        |    '' AS lastmod, CAST(-1 AS BIGINT) AS priority_permille
        |  FROM idx),
        |u AS (
        |  SELECT site, host, unnest(range(0, 1 + site % 3)) AS pos
        |  FROM h WHERE site % 5 <> 4),
        |u2 AS (
        |  SELECT site, 'url' AS kind, pos,
        |    host || '/p' || pos || CASE WHEN pos = 0 THEN '?a=1&b=2' ELSE '' END AS loc,
        |    CASE WHEN pos % 2 = 0 THEN '2026-08-1' || pos ELSE '' END AS lastmod,
        |    CAST(CASE WHEN pos = 0 THEN 500 WHEN pos = 1 THEN 1000
        |              ELSE -1 END AS BIGINT) AS priority_permille
        |  FROM u)
        |SELECT CAST(site AS BIGINT) AS site, kind, CAST(pos AS INT) AS pos,
        |  loc, lastmod, priority_permille
        |FROM (SELECT * FROM idx2 UNION ALL SELECT * FROM u2)""".stripMargin,

    // r13: the crawl frontier — sitemap url entries filtered by the
    // robots longest-match on each loc's PATH, paced by the site's
    // crawl-delay (default 1 s): sites %5=0 lose everything to
    // Disallow /, %5=1 keep only /p1 (the Allow carve-out), %5=2 keep
    // all at delay 5, %5=3 keep all at delay 1, %5=4 have no url
    // entries (index shards)
    "t_frontier" ->
      """WITH s AS (SELECT unnest(range(0, 250)) AS site),
        |u AS (SELECT site, unnest(range(0, 1 + site % 3)) AS pos
        |      FROM s WHERE site % 5 <> 4),
        |a AS (
        |  SELECT site, pos FROM u WHERE site % 5 = 1 AND pos = 1
        |  UNION ALL SELECT site, pos FROM u WHERE site % 5 IN (2, 3)),
        |o AS (
        |  SELECT site, pos,
        |    row_number() OVER (PARTITION BY site ORDER BY pos) AS fetch_order
        |  FROM a)
        |SELECT CAST(site AS BIGINT) AS site,
        |  'https://site' || site || '.example.com/p' || pos ||
        |    CASE WHEN pos = 0 THEN '?a=1&b=2' ELSE '' END AS loc,
        |  CAST(fetch_order AS INT) AS fetch_order,
        |  CAST(CASE WHEN site % 5 = 2 THEN 5 ELSE 1 END AS BIGINT) AS delay_s,
        |  CAST((fetch_order - 1) * CASE WHEN site % 5 = 2 THEN 5 ELSE 1 END
        |    AS BIGINT) AS fetch_at_s
        |FROM o""".stripMargin,

    // r11 mixed-container WARC: the oracle states the SURVIVING records
    // analytically — only the response arm of each 3-record capture,
    // with the image payloads' exact-integer pixel sums (the
    // m_mixed_pixels formulas — any container corruption changes them)
    // and md5(text) for the text payloads. The Spark side writes the
    // full interleaved request/response/metadata stream as REAL WARC
    // bytes, parses it back, filters on the WARC-Type header, and
    // sniff-dispatches the payload through the Multimodal codecs.
    "t_warc_mixed" ->
      """WITH img AS (
        |  SELECT doc_id, 'png' AS format,
        |    8 + (5*doc_id) % 16 AS w, 8 + (11*doc_id) % 16 AS h
        |  FROM documents WHERE doc_id % 4 = 1
        |  UNION ALL
        |  SELECT doc_id, 'gif', 8 + (7*doc_id) % 16, 8 + (13*doc_id) % 16
        |  FROM documents WHERE doc_id % 4 = 2
        |  UNION ALL
        |  SELECT doc_id, 'bmp', 8 + doc_id % 16, 8 + (3*doc_id) % 16
        |  FROM documents WHERE doc_id % 4 = 3),
        |px AS (
        |  SELECT doc_id, format, w, h, tx.x AS x, ty.y AS y,
        |    (doc_id + 3*tx.x + 5*ty.y) % 256 AS gi
        |  FROM img, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y)),
        |ia AS (
        |  SELECT doc_id, format, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |    CAST(count(*) AS BIGINT) AS n_px,
        |    CAST(sum(CASE WHEN format = 'gif' THEN gi
        |             ELSE (doc_id + 7*x + 13*y) % 256 END) AS BIGINT) AS sum_r,
        |    CAST(sum(CASE WHEN format = 'gif' THEN (2*gi) % 256
        |             ELSE (2*doc_id + 11*x + 3*y) % 256 END) AS BIGINT) AS sum_g,
        |    CAST(sum(CASE WHEN format = 'gif' THEN (5*gi) % 256
        |             ELSE (5*doc_id + x + y) % 256 END) AS BIGINT) AS sum_b
        |  FROM px GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, 'response' AS warc_type, format, width, height,
        |  n_px, sum_r, sum_g, sum_b, '' AS text_md5
        |FROM ia
        |UNION ALL
        |SELECT doc_id, 'response' AS warc_type, 'text' AS format,
        |  CAST(0 AS INT) AS width, CAST(0 AS INT) AS height,
        |  CAST(0 AS BIGINT) AS n_px, CAST(0 AS BIGINT) AS sum_r,
        |  CAST(0 AS BIGINT) AS sum_g, CAST(0 AS BIGINT) AS sum_b,
        |  md5(text) AS text_md5
        |FROM documents WHERE doc_id % 4 = 0""".stripMargin,

    // r10 URL canonicalization: the oracle rebuilds BOTH the dressed URL
    // (mirror of UrlOps.synthUrl's column arithmetic) and the canonical
    // form analytically; the Spark side genuinely PARSES the dressed
    // string back (regexp scheme/host/port/path/qs splits, tracking-param
    // filter, bytewise param sort).
    "t_url_norm" ->
      """WITH u AS (
        |  SELECT doc_id, doc_id % 250 AS g,
        |    CASE WHEN doc_id % 4 = 1 THEN 'HTTPS'
        |         WHEN doc_id % 4 = 3 THEN 'Https' ELSE 'https' END ||
        |    '://' ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'www.'
        |         WHEN doc_id % 9 = 1 THEN 'WWW.' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN 'Site' ELSE 'site' END ||
        |      (doc_id % 250) || '.example.com' ||
        |    CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END ||
        |    '/a' || ((doc_id % 250) % 10) || '/p' || (doc_id % 250) || '?' ||
        |    CASE WHEN doc_id % 2 = 1 THEN 'ref=home&id=' || (doc_id % 250)
        |         ELSE 'id=' || (doc_id % 250) || '&ref=home' END ||
        |    CASE WHEN doc_id % 6 = 0 THEN '&utm_source=feed' || (doc_id % 3) ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0 THEN '&fbclid=f' || doc_id ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0 THEN '#sec' || (doc_id % 4) ELSE '' END AS url
        |  FROM documents
        |)
        |SELECT doc_id, url,
        |  'https://site' || g || '.example.com/a' || (g % 10) || '/p' || g ||
        |    '?id=' || g || '&ref=home' AS canonical_url
        |FROM u""".stripMargin,

    "d_url_dups" ->
      """SELECT
        |  'https://site' || (doc_id % 250) || '.example.com/a' ||
        |    ((doc_id % 250) % 10) || '/p' || (doc_id % 250) ||
        |    '?id=' || (doc_id % 250) || '&ref=home' AS canonical_url,
        |  count(*) AS n_dups, min(doc_id) AS keep_doc
        |FROM documents
        |GROUP BY 1 HAVING count(*) >= 2""".stripMargin,

    "t_winnow" ->
      s"""$TokCte,
         |kg AS (SELECT doc_id, i AS kpos,
         |         md5(array_to_string(toks[i+1:i+4], ' ')) AS h
         |       FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 3)) AS i
         |             FROM tok WHERE len(toks) >= 4) u),
         |wm AS (SELECT doc_id, kpos,
         |         min(h || ':' || lpad(CAST(100000000 - kpos AS VARCHAR), 9, '0'))
         |           OVER (PARTITION BY doc_id ORDER BY kpos
         |                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
         |       FROM kg)
         |SELECT DISTINCT doc_id,
         |  CAST(100000000 - CAST(substr(wmin, 34, 9) AS BIGINT) AS BIGINT) AS pos,
         |  substr(wmin, 1, 32) AS fp
         |FROM wm WHERE kpos >= 3""".stripMargin,

    // DSIR mirror: same 13-hex md5 bucket rule as t_quality_clf, both
    // count columns from one conditional agg, add-one exact floor-log2
    // ratio weights
    "t_dsir" ->
      s"""$TokCte,
         |g AS (SELECT doc_id, lang,
         |    ('0x' || substr(md5(gr), 1, 13))::BIGINT % 1024 AS bucket
         |  FROM (SELECT doc_id, lang, unnest(list_concat(toks,
         |    list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]))) AS gr
         |  FROM tok) u),
         |w AS (SELECT bucket,
         |    (len(bin(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1 AS BIGINT))) - 1)
         |  - (len(bin(CAST(count(*) + 1 AS BIGINT))) - 1) AS w
         |  FROM g GROUP BY 1)
         |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |  CAST(sum(w.w) AS BIGINT) AS dsir_score,
         |  CAST(floor(sum(w.w) * 1000.0 / count(*)) AS BIGINT) AS score_x1000
         |FROM g JOIN w ON g.bucket = w.bucket GROUP BY 1""".stripMargin,

    // epoch shuffle mirror: same shard hash (13-hex md5 mod), same
    // independent order hash, same tie-break
    "t_epoch_shuffle" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5('ep1-shard:' || doc_id), 1, 13))::BIGINT % 8 AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY ('0x' || substr(md5('ep1-shard:' || doc_id), 1, 13))::BIGINT % 8
        |    ORDER BY md5('ep1-ord:' || doc_id), doc_id) AS BIGINT) AS pos
        |FROM documents""".stripMargin,

    // vocabulary induction mirror: same tokenization, same rank order,
    // same exact-integer cumulative coverage
    "t_vocab" ->
      s"""$TokCte,
         |flat AS (SELECT unnest(toks) AS tok FROM tok),
         |counts AS (SELECT tok, count(*) AS n FROM flat GROUP BY 1),
         |ranked AS (
         |  SELECT tok, n,
         |    row_number() OVER (ORDER BY n DESC, tok ASC) AS rank,
         |    sum(n) OVER (ORDER BY n DESC, tok ASC
         |                 ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(n) OVER () AS total
         |  FROM counts)
         |SELECT rank, tok, n, floor(CAST(cum AS DOUBLE) / total * 1000000) / 1000000 AS coverage
         |FROM ranked WHERE rank <= 50""".stripMargin,

    // Pipeline composition mirror: the sample/split/keep/decontam pieces
    // are the SAME fragments as their standalone oracles (shared
    // constants), re-chained — decontam CTEs renamed d* to avoid
    // colliding with SigCte's shi.
    "t_pipeline" -> {
      import Training.{SampleDefault, SampleRates, SampleSalt, SplitSalt, SplitTrain, SplitVal}
      def thr(k: Int): String = if (k >= 256) "zz" else f"$k%02x"
      val thrCase = SampleRates.toSeq.sorted.map { case (l, k) =>
        s"WHEN lang = '$l' THEN '${thr(k)}'"
      }.mkString("CASE ", " ", s" ELSE '${thr(SampleDefault)}' END")
      val wCase = SampleRates.toSeq.sorted.map { case (l, k) =>
        s"WHEN lang = '$l' THEN CAST(${256.0 / k} AS DOUBLE)"
      }.mkString("CASE ", " ", s" ELSE CAST(${256.0 / SampleDefault} AS DOUBLE) END")
      def splitCase(idExpr: String): String =
        s"""CASE WHEN substr(md5('$SplitSalt:' || $idExpr), 1, 2) < '${thr(SplitTrain)}' THEN 'train'
           |     WHEN substr(md5('$SplitSalt:' || $idExpr), 1, 2) < '${thr(SplitVal)}' THEN 'val'
           |     ELSE 'test' END""".stripMargin
      s"""$ClusterCte,
         |keepers AS (SELECT DISTINCT cluster AS doc_id FROM clustered),
         |samp AS (
         |  SELECT doc_id, lang, $wCase AS weight, ${splitCase("doc_id")} AS split
         |  FROM documents
         |  WHERE substr(md5('$SampleSalt:' || doc_id), 1, 2) < $thrCase),
         |dshi AS (SELECT doc_id, list_distinct($Shingles) AS sh,
         |    ${splitCase("doc_id")} AS split
         |  FROM tok WHERE len(toks) >= 3),
         |dflat AS (SELECT doc_id, split, unnest(sh) AS s FROM dshi),
         |dev AS (SELECT DISTINCT s FROM dflat WHERE split <> 'train'),
         |contam AS (
         |  SELECT DISTINCT f.doc_id FROM dflat f JOIN dev ON f.s = dev.s
         |  WHERE f.split = 'train'),
         |ntok AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens FROM tok)
         |SELECT s.doc_id, s.lang, s.split, s.weight, n.n_tokens
         |FROM samp s
         |JOIN keepers k ON s.doc_id = k.doc_id
         |JOIN ntok n ON n.doc_id = s.doc_id
         |WHERE NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = s.doc_id)""".stripMargin
    },

    // source-mixing quota table: budget = corpus//2, per source
    // max(fair-share floor, proportional half) capped at supply — all
    // floor-div BIGINT (sums cast from HUGEINT)
    "t_mix" ->
      s"""WITH pt AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len($Toks)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
         |               CAST(count(*) AS BIGINT) AS ns FROM pt)
         |SELECT source, n_docs, n_tokens,
         |  least(n_tokens, greatest((t // 2) // ns, n_tokens // 2)) AS quota_tokens,
         |  (least(n_tokens, greatest((t // 2) // ns, n_tokens // 2)) * 1000000) // n_tokens AS rate_ppm
         |FROM pt CROSS JOIN tot""".stripMargin,

    // r14 sqrt-temperature mixing: same per-source CTE, quotas
    // proportional to the representation-proof integer sqrt (double
    // seed + Newton + exact candidate scan — the q_stats mirror)
    "t_mix_sqrt" ->
      s"""WITH pt AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len($Toks)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |sg AS (SELECT *, GREATEST(CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT), 1) AS g0 FROM pt),
         |sh AS (SELECT *, (g0 + n_tokens // g0) // 2 AS g1 FROM sg),
         |si AS (SELECT source, n_docs, n_tokens,
         |    CASE WHEN (g1+2)*(g1+2) <= n_tokens THEN g1+2
         |         WHEN (g1+1)*(g1+1) <= n_tokens THEN g1+1
         |         WHEN g1*g1         <= n_tokens THEN g1
         |         WHEN (g1-1)*(g1-1) <= n_tokens THEN g1-1
         |         WHEN (g1-2)*(g1-2) <= n_tokens THEN g1-2
         |         ELSE 0 END AS r_sqrt
         |  FROM sh),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
         |               CAST(sum(r_sqrt) AS BIGINT) AS ts FROM si)
         |SELECT source, n_docs, n_tokens, r_sqrt,
         |  least(n_tokens, ((t // 2) * r_sqrt) // ts) AS quota_tokens,
         |  (least(n_tokens, ((t // 2) * r_sqrt) // ts) * 1000000) // n_tokens AS rate_ppm
         |FROM si CROSS JOIN tot""".stripMargin,

    // t_pipeline plus the quality-verdict gates (gopher conjunction, C4
    // keep) as two more EXISTS filters — the same fragments as the
    // standalone t_gopher_keep / t_c4_rules oracles, q*-prefixed to keep
    // the shared CTE namespace collision-free
    // NOTE both pipeline entries CONCATENATE the pre-stripped prefix —
    // interpolating it under a second stripMargin would eat one pipe of
    // the qaug CTE's leading-`||` concat lines
    "t_pipeline2" ->
      (Pipeline2Cte + "\n" +
        """SELECT s.doc_id, s.lang, s.split, s.weight, n.n_tokens
          |FROM samp s
          |JOIN keepers k ON s.doc_id = k.doc_id
          |JOIN gkeep g ON g.doc_id = s.doc_id
          |JOIN c4keep c4 ON c4.doc_id = s.doc_id
          |JOIN ntok n ON n.doc_id = s.doc_id
          |WHERE NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = s.doc_id)""".stripMargin),

    // pipeline v3 = v2's gate chain + the hashed linear classifier gate +
    // span-dedup accounting (post-dedup token mass per surviving doc)
    "t_pipeline3" ->
      (Pipeline2Cte + ",\n" +
        """clfkeep AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      coalesce(list_sum(list_transform(
         |        list_concat(toks,
         |          list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2])),
         |        gr -> ((('0x' || substr(md5(gr), 1, 13))::BIGINT % 1024) * 2654435761) % 2003 - 1001)), 0) AS score
         |    FROM tok) t
         |  WHERE score >= 0),
         |sblocks AS (SELECT doc_id, toks, unnest(range(0, (len(toks) + 4) // 5)) AS pos FROM tok),
         |sspans AS (SELECT doc_id, pos, list_slice(toks, pos*5 + 1, pos*5 + 5) AS sp FROM sblocks),
         |sranked AS (
         |  SELECT doc_id, len(sp) AS sptok,
         |    row_number() OVER (PARTITION BY array_to_string(sp, ' ') ORDER BY doc_id, pos) AS rn
         |  FROM sspans),
         |sclean AS (
         |  SELECT doc_id,
         |    CAST(coalesce(sum(sptok) FILTER (WHERE rn = 1), 0) AS INT) AS n_tokens_clean
         |  FROM sranked GROUP BY doc_id)
         |SELECT s.doc_id, s.lang, s.split, s.weight, n.n_tokens, sc.n_tokens_clean,
         |  (k.doc_id IS NOT NULL) AS dedup_keep,
         |  (c.doc_id IS NULL) AS decontam_ok,
         |  (g.doc_id IS NOT NULL) AS gopher_keep,
         |  (c4.doc_id IS NOT NULL) AS c4_keep,
         |  (cf.doc_id IS NOT NULL) AS clf_keep,
         |  (k.doc_id IS NOT NULL AND c.doc_id IS NULL AND g.doc_id IS NOT NULL
         |   AND c4.doc_id IS NOT NULL AND cf.doc_id IS NOT NULL) AS keep
         |FROM samp s
         |LEFT JOIN keepers k ON s.doc_id = k.doc_id
         |LEFT JOIN contam c ON s.doc_id = c.doc_id
         |LEFT JOIN gkeep g ON g.doc_id = s.doc_id
         |LEFT JOIN c4keep c4 ON c4.doc_id = s.doc_id
         |LEFT JOIN clfkeep cf ON cf.doc_id = s.doc_id
         |JOIN ntok n ON n.doc_id = s.doc_id
         |JOIN sclean sc ON sc.doc_id = s.doc_id""".stripMargin),

    // Repetition-signal mirror: integer-derived ratios, floor-trunc 4dp;
    // n_tokens CAST to INT (Spark size() is 32-bit), max_tf to BIGINT.
    // C4 gates over the SAME deterministic augmentation the Spark side
    // applies (doc_id-keyed suffix mix — the synthetic corpus alone is
    // punctuation-free, which would make every gate vacuous)
    "t_c4_rules" ->
      """WITH aug AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 3 = 0 THEN '. Done.' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' {code}' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum' ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0 THEN ' javascript required' ELSE '' END AS aug
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    regexp_matches(aug, '[.!?]$') AS ends_punct,
        |    contains(aug, '{') AS has_brace,
        |    contains(aug, 'lorem ipsum') AS has_lorem,
        |    contains(aug, 'javascript') AS has_policy,
        |    len(regexp_extract_all(aug, '\.')) AS n_dots,
        |    len(list_filter(string_split_regex(regexp_replace(lower(aug), '[^a-z0-9 ]', ' ', 'g'), ' +'), t -> t <> '')) AS n_words
        |  FROM aug)
        |SELECT doc_id, ends_punct, has_brace, has_lorem, has_policy, n_dots, n_words,
        |  ends_punct AND NOT has_brace AND NOT has_lorem AND NOT has_policy
        |    AND n_words >= 5 AS keep
        |FROM sig""".stripMargin,

    // Gopher-family verdict over the rep-stats + text-stats signals; the
    // ratio gates compare identical floor-truncated 4-decimal values
    "t_gopher_keep" ->
      s"""$TokCte,
         |sh AS (SELECT doc_id, toks, len(toks) AS n_tokens,
         |    list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]) AS s2,
         |    $Shingles AS s3
         |  FROM tok WHERE len(toks) >= 3),
         |narrow AS (SELECT doc_id, n_tokens,
         |    floor(CAST(len(s2) - len(list_distinct(s2)) AS DOUBLE) / len(s2) * 10000) / 10000 AS dup_2gram_frac,
         |    floor(CAST(len(s3) - len(list_distinct(s3)) AS DOUBLE) / len(s3) * 10000) / 10000 AS dup_3gram_frac
         |  FROM sh),
         |top AS (SELECT doc_id, CAST(max(tf) AS BIGINT) AS max_tf FROM (
         |    SELECT doc_id, tok, count(*) AS tf FROM (
         |      SELECT doc_id, unnest(toks) AS tok FROM tok WHERE len(toks) >= 3) f
         |    GROUP BY 1, 2) g GROUP BY 1),
         |base AS (SELECT doc_id,
         |    floor(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) * 10000) / 10000 AS avg_word_len,
         |    ${hits("en")} AS stop_hits
         |  FROM tok),
         |gates AS (
         |  SELECT n.doc_id,
         |    n.n_tokens BETWEEN 30 AND 100000 AS g_words,
         |    b.avg_word_len BETWEEN 3.0 AND 10.0 AS g_len,
         |    b.stop_hits >= 2 AS g_stop,
         |    n.dup_2gram_frac <= 0.20 AS g_rep2,
         |    n.dup_3gram_frac <= 0.18 AS g_rep3,
         |    floor(CAST(t.max_tf AS DOUBLE) / n.n_tokens * 10000) / 10000 <= 0.30 AS g_top
         |  FROM narrow n JOIN top t ON t.doc_id = n.doc_id
         |  JOIN base b ON b.doc_id = n.doc_id)
         |SELECT doc_id, g_words, g_len, g_stop, g_rep2, g_rep3, g_top,
         |  g_words AND g_len AND g_stop AND g_rep2 AND g_rep3 AND g_top AS keep
         |FROM gates""".stripMargin,

    // hashed linear classifier: same 13-hex-char md5 bucket parity as
    // q_cms_freq; weights are the multiply-mod surrogate in
    // QualityRules.weight. list_sum of an empty gram list is NULL in
    // DuckDB (Spark's aggregate() returns the 0 seed) — hence coalesce.
    "t_quality_clf" ->
      s"""$TokCte,
         |g AS (SELECT doc_id,
         |    list_concat(toks,
         |      list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]))
         |      AS grams
         |  FROM tok)
         |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_feats,
         |  CAST(coalesce(list_sum(list_transform(grams, gr ->
         |    ((('0x' || substr(md5(gr), 1, 13))::BIGINT % 1024) * 2654435761) % 2003 - 1001)), 0)
         |    AS BIGINT) AS score,
         |  coalesce(list_sum(list_transform(grams, gr ->
         |    ((('0x' || substr(md5(gr), 1, 13))::BIGINT % 1024) * 2654435761) % 2003 - 1001)), 0) >= 0
         |    AS keep
         |FROM g""".stripMargin,

    // r13: exact Mann-Whitney AUC of the hashed classifier vs the en
    // label — same score SQL as t_quality_clf, quantized to 64-wide
    // bins, cumulative negatives over the bounded bin histogram,
    // 2U = sum pos(b)*(2*neg_below(b) + neg_eq(b)), 6-dp floor-trunc
    // division at the very end (CASTs keep DuckDB off HUGEINT)
    "t_clf_auc" ->
      s"""$TokCte,
         |g AS (SELECT doc_id, lang,
         |    list_concat(toks,
         |      list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]))
         |      AS grams
         |  FROM tok),
         |sc AS (SELECT doc_id, lang = 'en' AS pos,
         |    coalesce(list_sum(list_transform(grams, gr ->
         |      ((('0x' || substr(md5(gr), 1, 13))::BIGINT % 1024) * 2654435761) % 2003 - 1001)), 0)
         |      AS score
         |  FROM g),
         |hist AS (SELECT CAST(floor(score / 64) AS BIGINT) AS bin,
         |    CAST(count(CASE WHEN pos THEN 1 END) AS BIGINT) AS np,
         |    CAST(count(CASE WHEN NOT pos THEN 1 END) AS BIGINT) AS nn
         |  FROM sc GROUP BY 1),
         |cum AS (SELECT bin, np, nn,
         |    CAST(coalesce(sum(nn) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS neg_below
         |  FROM hist)
         |SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
         |  CAST(sum(np * (2 * neg_below + nn)) AS BIGINT) AS u2,
         |  CASE WHEN sum(np) > 0 AND sum(nn) > 0 THEN
         |    floor(CAST(sum(np * (2 * neg_below + nn)) AS DOUBLE) /
         |          (2 * sum(np) * sum(nn)) * 1000000) / 1000000 END AS auc
         |FROM cum""".stripMargin,

    // r13: the keep-threshold confusion matrix — same score SQL, keep =
    // score >= 0, exact BIGINT counts, 6-dp floor-trunc ratios (F1 via
    // 2tp/(2tp+fp+fn): one division, no float intermediates)
    "t_clf_pr" ->
      s"""$TokCte,
         |g AS (SELECT doc_id, lang,
         |    list_concat(toks,
         |      list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]))
         |      AS grams
         |  FROM tok),
         |sc AS (SELECT doc_id, lang = 'en' AS pos,
         |    coalesce(list_sum(list_transform(grams, gr ->
         |      ((('0x' || substr(md5(gr), 1, 13))::BIGINT % 1024) * 2654435761) % 2003 - 1001)), 0)
         |      >= 0 AS keep
         |  FROM g),
         |m AS (SELECT
         |    CAST(count(CASE WHEN keep AND pos THEN 1 END) AS BIGINT) AS tp,
         |    CAST(count(CASE WHEN keep AND NOT pos THEN 1 END) AS BIGINT) AS fp,
         |    CAST(count(CASE WHEN NOT keep AND pos THEN 1 END) AS BIGINT) AS fn,
         |    CAST(count(CASE WHEN NOT keep AND NOT pos THEN 1 END) AS BIGINT) AS tn
         |  FROM sc)
         |SELECT tp, fp, fn, tn,
         |  CASE WHEN tp + fp > 0 THEN
         |    floor(CAST(tp AS DOUBLE) / (tp + fp) * 1000000) / 1000000 END AS precision,
         |  CASE WHEN tp + fn > 0 THEN
         |    floor(CAST(tp AS DOUBLE) / (tp + fn) * 1000000) / 1000000 END AS recall,
         |  CASE WHEN 2 * tp + fp + fn > 0 THEN
         |    floor(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) * 1000000) / 1000000 END AS f1
         |FROM m""".stripMargin,

    // r14 (second closing): TRAINED classifier weights — the mini-batch
    // perceptron unrolled as honest SQL, one (m_s, g_s, w_s) CTE triple
    // per update step (epoch × mini-batch). All-BIGINT arithmetic: the
    // margin is an integer dot product, the update an integer sum — so
    // the learned model hash-matches the engine bit-for-bit.
    "t_clf_train" -> {
      s"""$PerceptronCtes
         |SELECT bucket, w FROM $PerceptronLastW""".stripMargin
    },

    // RHO-loss selection mirror: the eval chain's held-out margins
    // composed with the (independent, name-disjoint) LM-score chain —
    // LmScoreCte's leading WITH is stripped so both hang off one WITH;
    // hinge slack 4096 (the calibration bin width), permille
    // normalization by corpus max, losses-crossed selection
    "t_rho_select" -> {
      s"""$PerceptronEvalCtes,
         |${LmScoreCte.stripPrefix("WITH ")},
         |rj AS (SELECT se.doc_id, se.y, se.margin, l.bits_x1000,
         |         greatest(0, 4096 - (CASE WHEN se.y = 1 THEN se.margin
         |                                  ELSE -se.margin END)) AS tloss
         |       FROM se JOIN lmscore l USING (doc_id)),
         |rmx AS (SELECT greatest(max(tloss), 1) AS mt,
         |               greatest(max(bits_x1000), 1) AS mr FROM rj)
         |SELECT t.doc_id, (t.y = 1) AS pos, t.margin, t.bits_x1000,
         |       CAST(t.tloss * 1000 // rmx.mt
         |            - t.bits_x1000 * 1000 // rmx.mr AS BIGINT) AS rho_milli,
         |       (t.tloss * 1000 // rmx.mt - t.bits_x1000 * 1000 // rmx.mr) > 0
         |         AS selected
         |FROM rj t, rmx""".stripMargin
    },

    // r14 (second closing): held-out evaluation of the trained model —
    // fit on 'train', scored on 'test' (disjoint salted-hash splits),
    // unseen buckets weight 0 via LEFT JOIN, keep = margin > 0, exact
    // BIGINT confusion matrix, 6-dp floor-trunc metrics with
    // zero-denominator NULL guards (the t_clf_pr discipline).
    "t_clf_eval" -> {
      s"""$PerceptronEvalCtes,
         |m AS (SELECT
         |    CAST(count(CASE WHEN margin > 0 AND y = 1 THEN 1 END) AS BIGINT) AS tp,
         |    CAST(count(CASE WHEN margin > 0 AND y = -1 THEN 1 END) AS BIGINT) AS fp,
         |    CAST(count(CASE WHEN margin <= 0 AND y = 1 THEN 1 END) AS BIGINT) AS fn,
         |    CAST(count(CASE WHEN margin <= 0 AND y = -1 THEN 1 END) AS BIGINT) AS tn
         |  FROM se)
         |SELECT tp, fp, fn, tn,
         |  CASE WHEN tp + fp + fn + tn > 0 THEN
         |    floor(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) * 1000000) / 1000000 END AS accuracy,
         |  CASE WHEN tp + fp > 0 THEN
         |    floor(CAST(tp AS DOUBLE) / (tp + fp) * 1000000) / 1000000 END AS precision,
         |  CASE WHEN tp + fn > 0 THEN
         |    floor(CAST(tp AS DOUBLE) / (tp + fn) * 1000000) / 1000000 END AS recall,
         |  CASE WHEN 2 * tp + fp + fn > 0 THEN
         |    floor(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) * 1000000) / 1000000 END AS f1
         |FROM m""".stripMargin
    },

    // r14 (third closing): exact Mann-Whitney AUC of the TRAINED
    // model's held-out margins — the t_clf_auc rank arithmetic over the
    // shared eval chain (64-wide bins, half-credit ties, 6-dp trunc)
    "t_clf_train_auc" ->
      s"""$PerceptronEvalCtes,
         |hist AS (SELECT CAST(floor(margin / 64) AS BIGINT) AS bin,
         |    CAST(count(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS np,
         |    CAST(count(CASE WHEN y = -1 THEN 1 END) AS BIGINT) AS nn
         |  FROM se GROUP BY 1),
         |cum AS (SELECT bin, np, nn,
         |    CAST(coalesce(sum(nn) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS neg_below
         |  FROM hist)
         |SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
         |  CAST(sum(np * (2 * neg_below + nn)) AS BIGINT) AS u2,
         |  CASE WHEN sum(np) > 0 AND sum(nn) > 0 THEN
         |    floor(CAST(sum(np * (2 * neg_below + nn)) AS DOUBLE) /
         |          (2 * sum(np) * sum(nn)) * 1000000) / 1000000 END AS auc
         |FROM cum""".stripMargin,

    // r14 (third closing): reliability diagram of the trained model —
    // clamped FLOOR-division margin bins (explicit floor(): DuckDB's
    // `//` truncates toward zero on negatives, Spark's idiv floors —
    // the one integer-division dialect gap, stated here so it can't
    // regress), per-bin positive rate in exact permille
    "t_clf_calibration" ->
      s"""$PerceptronEvalCtes
         |SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(CASE WHEN y = 1 THEN 1 END) AS BIGINT) AS n_pos,
         |  CAST((count(CASE WHEN y = 1 THEN 1 END) * 1000) // count(*) AS BIGINT)
         |    AS pos_permille
         |FROM (SELECT y,
         |    greatest(least(CAST(floor(margin / 4096) AS BIGINT), 8), -8) AS bin
         |  FROM se) b
         |GROUP BY bin""".stripMargin,

    // r14 (second closing): exact-k-per-language uniform sample — the
    // oracle states the semantics as ONE naive window; the engine's
    // two-stage bounded ranking must elect the identical rows.
    "t_reservoir" -> {
      import Training.{ReservoirK, ReservoirSalt}
      s"""SELECT doc_id, lang, pos FROM (
         |  SELECT doc_id, lang, CAST(row_number() OVER (
         |      PARTITION BY lang ORDER BY md5('$ReservoirSalt:' || doc_id), doc_id)
         |    AS BIGINT) AS pos
         |  FROM documents) t
         |WHERE pos <= $ReservoirK""".stripMargin
    },

    // r14 (second closing): leakage-safe splits — the split key is the
    // near-dup CLUSTER representative, so members travel together.
    "d_cluster_split" ->
      s"""$ClusterCte
         |SELECT doc_id, cluster, ${splitCaseOver("cluster", Training.ClusterSplitSalt)} AS split
         |FROM clustered""".stripMargin,

    // r14 (second closing): the leakage audit — candidate pairs whose
    // members split apart under the naive doc-keyed rule vs the
    // cluster-keyed rule (structurally zero: same cluster ⇒ same key).
    "d_split_leakage" ->
      s"""$ClusterCte
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(count(CASE WHEN ${splitCaseOver("p.doc_a", Training.SplitSalt)}
         |    <> ${splitCaseOver("p.doc_b", Training.SplitSalt)} THEN 1 END) AS BIGINT) AS naive_leaks,
         |  CAST(count(CASE WHEN ${splitCaseOver("ca.cluster", Training.ClusterSplitSalt)}
         |    <> ${splitCaseOver("cb.cluster", Training.ClusterSplitSalt)} THEN 1 END) AS BIGINT) AS cluster_leaks
         |FROM pairs p
         |JOIN clustered ca ON ca.doc_id = p.doc_a
         |JOIN clustered cb ON cb.doc_id = p.doc_b""".stripMargin,

    "t_rep_stats" ->
      s"""$TokCte,
         |sh AS (SELECT doc_id, toks, len(toks) AS n_tokens,
         |    list_transform(range(0, len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]) AS s2,
         |    $Shingles AS s3
         |  FROM tok WHERE len(toks) >= 3),
         |narrow AS (SELECT doc_id, n_tokens,
         |    floor(CAST(len(s2) - len(list_distinct(s2)) AS DOUBLE) / len(s2) * 10000) / 10000 AS dup_2gram_frac,
         |    floor(CAST(len(s3) - len(list_distinct(s3)) AS DOUBLE) / len(s3) * 10000) / 10000 AS dup_3gram_frac
         |  FROM sh),
         |top AS (SELECT doc_id, CAST(max(tf) AS BIGINT) AS max_tf FROM (
         |    SELECT doc_id, tok, count(*) AS tf FROM (
         |      SELECT doc_id, unnest(toks) AS tok FROM tok WHERE len(toks) >= 3) f
         |    GROUP BY 1, 2) g GROUP BY 1)
         |SELECT n.doc_id, CAST(n.n_tokens AS INT) AS n_tokens,
         |  n.dup_2gram_frac, n.dup_3gram_frac,
         |  floor(CAST(t.max_tf AS DOUBLE) / n.n_tokens * 10000) / 10000 AS top_token_frac
         |FROM narrow n JOIN top t ON t.doc_id = n.doc_id""".stripMargin,

    // unigram entropy proxy: sum_bits = Σ_tok tf · (len(bin(n // tf)) - 1)
    // — the exact-integer floor-log2 of the floored inverse probability,
    // identical to Spark's fl2(idiv(n, tf)); milli scores by int floor
    // division (QualityRules.unigramEntropy)
    "t_entropy" ->
      s"""$TokCte,
         |u AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n, unnest(toks) AS tok
         |      FROM tok WHERE len(toks) > 0),
         |tf AS (SELECT doc_id, n, tok, CAST(count(*) AS BIGINT) AS tf
         |       FROM u GROUP BY 1, 2, 3)
         |SELECT doc_id, n AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(sum(tf * (len(bin(n // tf)) - 1)) AS BIGINT) AS sum_bits,
         |  CAST((1000 * sum(tf * (len(bin(n // tf)) - 1))) // n AS BIGINT) AS ent_milli,
         |  CAST((1000 * count(*)) // n AS BIGINT) AS ttr_milli
         |FROM tf GROUP BY doc_id, n""".stripMargin,

    // df-capped inverted-index cosine pairs (DocSim.cosinePairs): pairs
    // exist only through shared kept shingles (2 <= df <= 16); the
    // explicit HUGEINT casts force DuckDB into int128 for the
    // 10^6·dot² and n1_sq·n2_sq products (BIGINT multiplication would
    // throw Out of Range at dot ≳ 3·10⁶ — exactly the regime Spark
    // handles via DECIMAL(38,0)); `//` == idiv38 bit-for-bit
    "d_docsim" ->
      s"""$TokCte,
         |shi AS (SELECT doc_id, $Shingles AS sh FROM tok WHERE len(toks) >= 3),
         |shu AS (SELECT doc_id, unnest(sh) AS sh FROM shi),
         |stf AS (SELECT doc_id, sh, CAST(count(*) AS BIGINT) AS tf
         |        FROM shu GROUP BY 1, 2),
         |kept AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM stf GROUP BY 1) t
         |         WHERE df BETWEEN 2 AND 16),
         |p AS (SELECT stf.doc_id, stf.sh, stf.tf FROM stf JOIN kept USING (sh)),
         |norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n_sq
         |          FROM p GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         |                 CAST(count(*) AS BIGINT) AS n_shared,
         |                 CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
         |          FROM p a JOIN p b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc1, doc2, n_shared, dot, x.n_sq AS n1_sq, y.n_sq AS n2_sq,
         |  CAST((1000000::HUGEINT * dot * dot) // (x.n_sq::HUGEINT * y.n_sq) AS BIGINT) AS cos2_micro
         |FROM pairs JOIN norms x ON x.doc_id = doc1 JOIN norms y ON y.doc_id = doc2
         |WHERE (1000000::HUGEINT * dot * dot) // (x.n_sq::HUGEINT * y.n_sq) >= 100000""".stripMargin,

    // Hybrid more-like-this retrieval with reciprocal-rank fusion:
    // lexical leg = BM25 (same milli algebra as t_bm25) over the query
    // doc's rarest df<=400 tokens (top 16 by df asc, tok asc; the cap
    // sits near n_docs because the synthetic vocabulary is closed — see
    // Hybrid scaladoc); vector
    // leg = exact quantized cosine top-10 under the vec_id % 97 query
    // rule; fusion = sum of 1000000 // (60 + rank) with absent legs
    // contributing 0, ties on id.
    "s_hybrid" ->
      s"""$TokCte,
         |flat AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok
         |         FROM tok WHERE len(toks) > 0),
         |tfh AS (SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
         |        FROM flat GROUP BY 1, 2, 3),
         |dfh AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tfh GROUP BY 1),
         |statsh AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |                  CAST(sum(len(toks)) AS BIGINT) AS total_tok
         |           FROM tok WHERE len(toks) > 0),
         |qids AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 97 = 0),
         |qth AS (SELECT query_id, tok, df FROM (
         |    SELECT q.query_id, t.tok, d.df,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY d.df ASC, t.tok ASC) AS rn
         |    FROM tfh t JOIN qids q ON t.doc_id = q.query_id
         |      JOIN dfh d ON t.tok = d.tok
         |    WHERE d.df <= 400) z WHERE rn <= 16),
         |lexsc AS (SELECT query_id, doc_id,
         |    CAST(sum((((1000*(2*s.n_docs - 2*q.df + 1)) // (2*q.df + 1))
         |      * ((2200000*t.tf) // (1000*t.tf + 300 +
         |          (900*((1000000*t.dl) // ((1000*s.total_tok) // s.n_docs))) // 1000)))
         |      // 1000) AS BIGINT) AS score_milli
         |  FROM tfh t JOIN qth q ON t.tok = q.tok, statsh s
         |  WHERE t.doc_id <> q.query_id
         |  GROUP BY 1, 2),
         |lex AS (SELECT query_id, doc_id AS id, CAST(rank_lex AS INT) AS rank_lex FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_milli DESC, doc_id ASC) AS rank_lex FROM lexsc) r
         |  WHERE rank_lex <= 10),
         |eq AS (SELECT vec_id,
         |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
         |  FROM embeddings),
         |en AS (SELECT vec_id, qv,
         |    list_sum(list_transform(qv, x -> x * x)) AS n2 FROM eq),
         |vec AS (SELECT query_id, id, CAST(rank_vec AS INT) AS rank_vec FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS id,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |        floor(list_sum(list_transform(range(1, len(a.qv) + 1),
         |          i -> a.qv[i] * b.qv[i])) / (sqrt(a.n2) * sqrt(b.n2)) * 1000000)
         |          / 1000000 DESC, b.vec_id ASC) AS rank_vec
         |    FROM en a JOIN en b ON b.vec_id <> a.vec_id
         |    WHERE a.vec_id % 97 = 0) t
         |  WHERE rank_vec <= 10),
         |fused AS (SELECT coalesce(lex.query_id, vec.query_id) AS query_id,
         |    coalesce(lex.id, vec.id) AS id, rank_lex, rank_vec,
         |    CAST(coalesce(1000000 // (60 + rank_lex), 0) +
         |         coalesce(1000000 // (60 + rank_vec), 0) AS BIGINT) AS rrf_milli
         |  FROM lex FULL OUTER JOIN vec
         |    ON lex.query_id = vec.query_id AND lex.id = vec.id)
         |SELECT query_id, CAST(rank AS INT) AS rank, id, rrf_milli, rank_lex, rank_vec
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY rrf_milli DESC, id ASC) AS rank FROM fused) f
         |WHERE rank <= 5""".stripMargin,

    // Ingest-time near-dup serving: the frozen df-capped inverted index
    // over the index shard (doc_id % 3 <> 0; df <= 16, no df >= 2 floor
    // — a corpus singleton can match an incoming doc), incoming docs
    // (doc_id % 3 = 0) pruned to the frozen vocabulary and joined
    // through the posting lists; same HUGEINT-carried exact cos² as
    // d_docsim.
    "d_docsim_serve" ->
      s"""$TokCte,
         |shi AS (SELECT doc_id, $Shingles AS sh FROM tok WHERE len(toks) >= 3),
         |shu AS (SELECT doc_id, unnest(sh) AS sh FROM shi),
         |stf AS (SELECT doc_id, sh, CAST(count(*) AS BIGINT) AS tf
         |        FROM shu GROUP BY 1, 2),
         |itf0 AS (SELECT doc_id, sh, tf FROM stf WHERE doc_id % 3 <> 0),
         |kept AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM itf0 GROUP BY 1) t
         |         WHERE df <= 16),
         |p AS (SELECT itf0.doc_id, itf0.sh, itf0.tf FROM itf0 JOIN kept USING (sh)),
         |norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n_sq
         |          FROM p GROUP BY 1),
         |intf AS (SELECT stf.doc_id AS in_doc_id, stf.sh, stf.tf AS tf_in
         |         FROM stf JOIN kept USING (sh) WHERE stf.doc_id % 3 = 0),
         |normsin AS (SELECT in_doc_id, CAST(sum(tf_in * tf_in) AS BIGINT) AS n_in_sq
         |            FROM intf GROUP BY 1),
         |pairs AS (SELECT intf.in_doc_id, p.doc_id,
         |                 CAST(count(*) AS BIGINT) AS n_shared,
         |                 CAST(sum(intf.tf_in * p.tf) AS BIGINT) AS dot
         |          FROM intf JOIN p ON intf.sh = p.sh
         |          GROUP BY 1, 2)
         |SELECT in_doc_id, doc_id, n_shared, dot,
         |  CAST((1000000::HUGEINT * dot * dot) // (x.n_in_sq::HUGEINT * y.n_sq) AS BIGINT) AS cos2_micro
         |FROM pairs JOIN normsin x USING (in_doc_id) JOIN norms y USING (doc_id)
         |WHERE (1000000::HUGEINT * dot * dot) // (x.n_in_sq::HUGEINT * y.n_sq) >= 100000""".stripMargin,

    // The Spark side builds REAL container headers and parses them back
    // (Multimodal.decodeHeader); the oracle recomputes the expected
    // metadata analytically from the same deterministic inputs. Header
    // sizes: PNG 33, GIF 13, BMP 54; payload = doc_id % 64 bytes.
    "m_decode" ->
      """SELECT doc_id,
        |  CASE strlen(text) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'bmp' END AS format,
        |  CAST(64 + doc_id % 256 AS INT) AS width,
        |  CAST(64 + (7 * doc_id) % 256 AS INT) AS height,
        |  CASE strlen(text) % 3 WHEN 0 THEN 33 WHEN 1 THEN 13 ELSE 54 END
        |    + doc_id % 64 AS n_bytes
        |FROM documents""".stripMargin,

    // mirrors Multimodal.synthJpeg's deterministic SOF fields; the Spark
    // side walks REAL JPEG marker segments (SOI -> APP0 -> DQT -> SOFn)
    // to recover them. n_bytes = 124 fixed header/trailer bytes + the
    // doc's entropy payload.
    "m_jpeg_meta" ->
      """SELECT doc_id, 'jpeg' AS format,
        |  (doc_id % 2 = 1) AS progressive,
        |  CAST(32 + doc_id % 512 AS INT) AS width,
        |  CAST(32 + (5 * doc_id) % 512 AS INT) AS height,
        |  124 + doc_id % 64 AS n_bytes
        |FROM documents""".stripMargin,

    // r11 WebP: mirrors Multimodal.synthWebp's deterministic dialect
    // cycle and dims; the Spark side writes REAL RIFF/WEBP containers
    // and probes them back (fourcc dispatch, VP8 start-code guard,
    // VP8L bit-unpack, VP8X 24-bit canvas)
    "m_webp_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'vp8' WHEN 1 THEN 'vp8l' ELSE 'vp8x' END AS format,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 16 + (3*doc_id) % 64
        |       WHEN 1 THEN 16 + (7*doc_id) % 64
        |       ELSE 16 + (11*doc_id) % 200 END AS INT) AS width,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 16 + (5*doc_id) % 64
        |       WHEN 1 THEN 16 + (9*doc_id) % 64
        |       ELSE 16 + (13*doc_id) % 200 END AS INT) AS height,
        |  CASE WHEN doc_id % 3 = 1 THEN 26 ELSE 30 END + 2*(doc_id % 16) AS n_bytes
        |FROM documents""".stripMargin,

    // r11 EXIF: mirrors Multimodal.synthExifJpeg's deterministic TIFF
    // fields; the Spark side walks REAL JPEG markers to APP1 and parses
    // the TIFF IFD0 back in the declared byte order
    "m_exif" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
        |  CAST(1 + doc_id % 8 AS INT) AS orientation,
        |  CAST(3 AS INT) AS n_ifd,
        |  CAST(32 + doc_id % 512 AS INT) AS width,
        |  CAST(32 + (5 * doc_id) % 512 AS INT) AS height
        |FROM documents""".stripMargin,

    // r12 GPS scrub: every third doc ships a GPS-less EXIF (unchanged
    // passthrough), the rest carry a real GPS IFD that the byte-surgical
    // scrub must remove — md5 changes, length doesn't, orientation still
    // parses, and the post-scrub GPS re-walk finds nothing. All six
    // columns are genuinely computed Spark-side (md5 compare, re-walk);
    // the oracle states the invariants analytically.
    "m_exif_scrub" ->
      """SELECT doc_id,
        |  (doc_id % 3 <> 2) AS had_gps,
        |  (doc_id % 3 <> 2) AS changed,
        |  TRUE AS len_equal,
        |  CAST(1 + doc_id % 8 AS INT) AS orientation,
        |  FALSE AS gps_after
        |FROM documents""".stripMargin,

    // mirrors Multimodal.synthAudio's deterministic header fields; the
    // Spark side PARSES them back out of real RIFF bytes (chunk walk)
    "m_audio" ->
      """SELECT doc_id, 'wav' AS container,
        |  CAST(1 + doc_id % 2 AS INT) AS channels,
        |  CAST(CASE strlen(text) % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |       ELSE 44100 END AS INT) AS sample_rate,
        |  CAST(16 AS INT) AS bits,
        |  (doc_id % 256) // ((1 + doc_id % 2) * 2) AS n_samples,
        |  44 + doc_id % 256 AS n_bytes
        |FROM documents""".stripMargin,

    // Full BMP pixel decode features: the Spark side synthesizes a real
    // 24-bit BMP, DECODES the bytes (stride, bottom-up rows, BGR), and
    // sums channels; the oracle computes the same exact-integer sums
    // straight from the pixel function over the (w × h) grid.
    "m_pixels" ->
      """WITH g AS (
        |  SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (3*doc_id) % 16 AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, tx.x AS x, ty.y AS y
        |  FROM g, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y))
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  count(*) AS n_px,
        |  CAST(sum((doc_id + 7*x + 13*y) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*doc_id + 11*x + 3*y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((5*doc_id + x + y) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3""".stripMargin,

    // Full PNG decode features: the Spark side synthesizes a real
    // zlib-compressed PNG (all five scanline filters cycling), DECODES
    // it (chunk walk + CRC + inflate + unfilter), and sums channels; the
    // oracle computes the same exact-integer sums straight from the
    // pixel function over the (w × h) grid — PNG dims differ from BMP's
    // so this is not a re-hash of m_pixels.
    "m_png_pixels" ->
      """WITH g AS (
        |  SELECT doc_id, 8 + (5*doc_id) % 16 AS w, 8 + (11*doc_id) % 16 AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, tx.x AS x, ty.y AS y
        |  FROM g, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y))
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  count(*) AS n_px,
        |  CAST(sum((doc_id + 7*x + 13*y) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*doc_id + 11*x + 3*y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((5*doc_id + x + y) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3""".stripMargin,

    // Full GIF decode features: the Spark side synthesizes a real GIF89a
    // (256-entry color table + variable-width LZW with dictionary
    // growth), DECODES it (block walk + LZW + palette mapping), and sums
    // channels; palette entry i = (i, 2i mod 256, 5i mod 256) and pixel
    // index (id + 3x + 5y) mod 256 are both analytic, so the oracle
    // computes the sums without touching bytes.
    "m_gif_pixels" ->
      """WITH g AS (
        |  SELECT doc_id, 8 + (7*doc_id) % 16 AS w, 8 + (13*doc_id) % 16 AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, (doc_id + 3*tx.x + 5*ty.y) % 256 AS i
        |  FROM g, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y))
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  count(*) AS n_px,
        |  CAST(sum(i) AS BIGINT) AS sum_r,
        |  CAST(sum((2*i) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((5*i) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3""".stripMargin,

    // Mixed-container decode: doc_id mod 3 selects the container
    // (png/gif/bmp), one magic-sniff dispatch decodes all three; the
    // oracle unions the three analytic branches with each format's own
    // dimensions and channel functions.
    "m_mixed_pixels" ->
      """WITH png AS (
        |  SELECT doc_id, 'png' AS format, 8 + (5*doc_id) % 16 AS w, 8 + (11*doc_id) % 16 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |gif AS (
        |  SELECT doc_id, 'gif' AS format, 8 + (7*doc_id) % 16 AS w, 8 + (13*doc_id) % 16 AS h
        |  FROM documents WHERE doc_id % 3 = 1),
        |bmp AS (
        |  SELECT doc_id, 'bmp' AS format, 8 + doc_id % 16 AS w, 8 + (3*doc_id) % 16 AS h
        |  FROM documents WHERE doc_id % 3 = 2),
        |gg AS (SELECT * FROM png UNION ALL SELECT * FROM gif UNION ALL SELECT * FROM bmp),
        |px AS (
        |  SELECT doc_id, format, w, h, tx.x AS x, ty.y AS y,
        |    (doc_id + 3*tx.x + 5*ty.y) % 256 AS gi
        |  FROM gg, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y))
        |SELECT doc_id, format, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  count(*) AS n_px,
        |  CAST(sum(CASE WHEN format = 'gif' THEN gi
        |           ELSE (doc_id + 7*x + 13*y) % 256 END) AS BIGINT) AS sum_r,
        |  CAST(sum(CASE WHEN format = 'gif' THEN (2*gi) % 256
        |           ELSE (2*doc_id + 11*x + 3*y) % 256 END) AS BIGINT) AS sum_g,
        |  CAST(sum(CASE WHEN format = 'gif' THEN (5*gi) % 256
        |           ELSE (5*doc_id + x + y) % 256 END) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3, 4""".stripMargin,

    // Real PCM sample decode: sample k of doc = ((id·31 + k·17) mod
    // 4001) − 2000, written as 16-bit LE two's complement into a real
    // WAV data chunk and read BACK by the chunk walk; the oracle
    // computes the same exact-integer amplitude stats analytically.
    "m_audio_stats" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(1 + doc_id % 2 AS INT) AS channels,
        |    (64 + doc_id % 64) * (1 + doc_id % 2) AS total
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, channels, total,
        |    ((doc_id*31 + k.k*17) % 4001) - 2000 AS v
        |  FROM g, UNNEST(range(0, total)) AS k(k))
        |SELECT doc_id, channels, CAST(total AS BIGINT) AS n_samples,
        |  CAST(sum(v) AS BIGINT) AS sum_amp,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(sum(v*v) AS BIGINT) AS sum_sq,
        |  CAST(max(abs(v)) AS INT) AS peak
        |FROM s GROUP BY 1, 2, 3""".stripMargin,

    // r12: exact time-domain audio features over the same analytic PCM
    // stream as m_audio_stats — zero crossings via lag(), raw
    // autocorrelation at lags 1-4 via lead() (NULL tails drop out of
    // sum, matching the k in [0, n-lag) bound); all-integer
    "m_audio_acf" ->
      """WITH g AS (
        |  SELECT doc_id, (64 + doc_id % 64) * (1 + doc_id % 2) AS total
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, k.k AS k,
        |    ((doc_id*31 + k.k*17) % 4001) - 2000 AS v
        |  FROM g, UNNEST(range(0, total)) AS k(k)),
        |a AS (
        |  SELECT doc_id, v,
        |    lag(v) OVER w AS vp,
        |    lead(v, 1) OVER w AS v1, lead(v, 2) OVER w AS v2,
        |    lead(v, 3) OVER w AS v3, lead(v, 4) OVER w AS v4
        |  FROM s WINDOW w AS (PARTITION BY doc_id ORDER BY k))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(CASE WHEN vp * v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
        |  CAST(sum(v * v1) AS BIGINT) AS acf1,
        |  CAST(sum(v * v2) AS BIGINT) AS acf2,
        |  CAST(sum(v * v3) AS BIGINT) AS acf3,
        |  CAST(sum(v * v4) AS BIGINT) AS acf4
        |FROM a GROUP BY 1""".stripMargin,

    // Video frame sampling: the Spark side synthesizes a real nested
    // RIFF AVI (avih header + movi '00db' frame chunks), walks it back,
    // and decodes every 2nd frame; motion is the +11t channel shift, so
    // the oracle enumerates (doc, even t, x, y) analytically.
    "m_video_frames" ->
      """WITH g AS (
        |  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (3*doc_id) % 8 AS h,
        |    4 + doc_id % 5 AS n_frames
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, w, h, n_frames, t.t AS t
        |  FROM g, UNNEST(range(0, n_frames)) AS t(t) WHERE t.t % 2 = 0),
        |px AS (
        |  SELECT doc_id, w, h, n_frames, t, tx.x AS x, ty.y AS y
        |  FROM f, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y))
        |SELECT doc_id, CAST(t AS INT) AS frame_idx, CAST(n_frames AS INT) AS n_frames,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(sum((doc_id + 7*x + 13*y + 11*t) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*doc_id + 11*x + 3*y + 11*t) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((5*doc_id + x + y + 11*t) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3, 4, 5""".stripMargin,

    // Nearest-neighbor resize to 8×8 (src pixel = x*srcW // 8, exact
    // integer mapping) THROUGH a re-encode/decode round trip on the
    // Spark side; the oracle samples the pixel function at the mapped
    // coordinates.
    "m_resize" ->
      """WITH g AS (
        |  SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (3*doc_id) % 16 AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, (tx.x * w) // 8 AS sx, (ty.y * h) // 8 AS sy
        |  FROM g, UNNEST(range(0, 8)) AS tx(x), UNNEST(range(0, 8)) AS ty(y))
        |SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  count(*) AS n_px,
        |  CAST(sum((doc_id + 7*sx + 13*sy) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*doc_id + 11*sx + 3*sy) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((5*doc_id + sx + sy) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1""".stripMargin,

    // dHash mirror: the oracle samples the pixel function at the 9×8
    // nearest-resize coordinates, same integer BT.601 luma, bit y*8+x
    // via 2^k HUGEINT sum → UBIGINT → fixed-width hex (== Spark's
    // two's-complement %016x); chain shared with m_dhash_nn
    "m_dhash" ->
      s"""$DhashCte
         |SELECT doc_id, dhash, n_ones FROM dh""".stripMargin,

    // pigeonhole-banded hamming-ball pairs over the dHash codes: 4
    // chunks of 4 hex chars, 256 occupancy cap, per-chunk xor+bit_count
    // verification — complete for hamming ≤ 3
    "m_dhash_nn" -> {
      val ham = "list_sum(list_transform(range(0, 4), c -> " +
        "bit_count(xor(('0x' || substr(x.dhash, c*4 + 1, 4))::BIGINT, " +
        "('0x' || substr(y.dhash, c*4 + 1, 4))::BIGINT))))"
      s"""$DhashCte,
         |bands0 AS (SELECT doc_id, unnest(list_transform(range(0, 4),
         |    c -> 'c' || c || ':' || substr(dhash, c*4 + 1, 4))) AS band FROM dh),
         |bands AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 256),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(ham AS INT) AS hamming FROM (
         |  SELECT doc_a, doc_b, $ham AS ham
         |  FROM pairs JOIN dh x ON x.doc_id = doc_a JOIN dh y ON y.doc_id = doc_b) t
         |WHERE ham <= 3""".stripMargin
    },

    "m_phash" ->
      s"""$PhashCte
         |SELECT doc_id, phash, n_ones FROM ph""".stripMargin,

    // r14 video frame signatures: the synth frames re-derived
    // analytically (pixel grid unnested), each frame reduced to the
    // exact w:h:sum_r:sum_g:sum_b signature; trimmed re-publications
    // shift pixel time by 1 and drop a frame
    "m_video_sig" ->
      s"""$VideoSigCte
         |SELECT doc_id, frame_idx, fsig FROM vsig""".stripMargin,

    // shot-level dedup: distinct (doc, sig), occupancy cap, self-join
    // on the signature, >=3 shared
    "m_video_dups" ->
      s"""$VideoSigCte,
         |dsig AS (SELECT DISTINCT doc_id, fsig FROM vsig),
         |capped AS (SELECT doc_id, fsig FROM (
         |  SELECT *, count(*) OVER (PARTITION BY fsig) AS bsz FROM dsig) t
         |  WHERE bsz <= 256)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM capped a JOIN capped b ON a.fsig = b.fsig AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,

    // r17: per-video audio-track rollup over the interleaved 01wb chunks
    "m_video_audio" ->
      s"""WITH $AudioChunkCteInner
         |SELECT out_id AS doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(n_samples) AS BIGINT) AS n_samples,
         |  CAST(sum(sum_s) AS BIGINT) AS sum_s,
         |  CAST(sum(sum_l1) AS BIGINT) AS sum_l1,
         |  CAST(sum(energy) AS BIGINT) AS energy,
         |  CAST(max(peak) AS INT) AS peak
         |FROM achk GROUP BY 1""".stripMargin,

    // r17: cross-modal confirmation — the pixel-arm pairs (m_video_dups
    // shape) inner-joined with the audio-chunk-signature pairs from the
    // same container
    "m_av_pairs" ->
      s"""$VideoSigCte,
         |$AudioChunkCteInner,
         |dsig AS (SELECT DISTINCT doc_id, fsig FROM vsig),
         |capped AS (SELECT doc_id, fsig FROM (
         |  SELECT *, count(*) OVER (PARTITION BY fsig) AS bsz FROM dsig) t
         |  WHERE bsz <= 256),
         |vd AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS n_shared_frames
         |  FROM capped a JOIN capped b ON a.fsig = b.fsig AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 3),
         |adsig AS (SELECT DISTINCT out_id AS doc_id,
         |    n_samples || ':' || sum_s || ':' || sum_l1 || ':' || energy || ':' || peak AS asig
         |  FROM achk),
         |acapped AS (SELECT doc_id, asig FROM (
         |  SELECT *, count(*) OVER (PARTITION BY asig) AS bsz FROM adsig) t
         |  WHERE bsz <= 256),
         |ad AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS n_shared_audio
         |  FROM acapped a JOIN acapped b ON a.asig = b.asig AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 3)
         |SELECT vd.doc_a, vd.doc_b, vd.n_shared_frames, ad.n_shared_audio
         |FROM vd JOIN ad ON vd.doc_a = ad.doc_a AND vd.doc_b = ad.doc_b""".stripMargin,

    // r14 audio fingerprints: the synth PCM re-derived analytically
    // (m_audio_acf precedent, hash-mixed constants), 65 window energies
    // (empty tail windows = 0), median-thresholded bits packed into 16
    // hex chars digit-by-digit — the m_phash code format
    "m_audio_fp" ->
      s"""$AudioFpCte
         |SELECT doc_id, afp FROM afp_rel""".stripMargin,

    // banded retrieval over the audio codes — the m_phash_nn banding
    // verbatim, finding the re-encoded variants (hamming 0-1)
    "m_audio_nn" -> {
      val ham = "list_sum(list_transform(range(0, 4), c -> " +
        "bit_count(xor(('0x' || substr(x.afp, c*4 + 1, 4))::BIGINT, " +
        "('0x' || substr(y.afp, c*4 + 1, 4))::BIGINT))))"
      s"""$AudioFpCte,
         |bands0 AS (SELECT doc_id, unnest(list_transform(range(0, 4),
         |    c -> 'c' || c || ':' || substr(afp, c*4 + 1, 4))) AS band FROM afp_rel),
         |bands AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 256),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(ham AS INT) AS hamming FROM (
         |  SELECT doc_a, doc_b, $ham AS ham
         |  FROM pairs JOIN afp_rel x ON x.doc_id = doc_a JOIN afp_rel y ON y.doc_id = doc_b) t
         |WHERE ham <= 3""".stripMargin
    },

    // same pigeonhole banding as m_dhash_nn, over the WHT codes
    "m_phash_nn" -> {
      val ham = "list_sum(list_transform(range(0, 4), c -> " +
        "bit_count(xor(('0x' || substr(x.phash, c*4 + 1, 4))::BIGINT, " +
        "('0x' || substr(y.phash, c*4 + 1, 4))::BIGINT))))"
      s"""$PhashCte,
         |bands0 AS (SELECT doc_id, unnest(list_transform(range(0, 4),
         |    c -> 'c' || c || ':' || substr(phash, c*4 + 1, 4))) AS band FROM ph),
         |bands AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM bands0) t WHERE bsz <= 256),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(ham AS INT) AS hamming FROM (
         |  SELECT doc_a, doc_b, $ham AS ham
         |  FROM pairs JOIN ph x ON x.doc_id = doc_a JOIN ph y ON y.doc_id = doc_b) t
         |WHERE ham <= 3""".stripMargin
    },

    // r12: cross-modal duplicate confirmation — intersection of the
    // caption MinHash-LSH candidate pairs (SigCte bands, cap 64) and
    // the image WHT-pHash hamming ball (PhashCte bands, cap 256);
    // both chains merge into one WITH (no CTE name collisions)
    "m_pair_dups" -> {
      val ham = "list_sum(list_transform(range(0, 4), c -> " +
        "bit_count(xor(('0x' || substr(x.phash, c*4 + 1, 4))::BIGINT, " +
        "('0x' || substr(y.phash, c*4 + 1, 4))::BIGINT))))"
      s"""$SigCte,
         |${PhashCte.stripPrefix("WITH ")},
         |tb0 AS (SELECT doc_id, unnest([md5(sig0 || sig1), md5(sig2 || sig3)]) AS band FROM sig),
         |tb AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM tb0) t WHERE bsz <= 64),
         |tpairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM tb a JOIN tb b ON a.band = b.band AND a.doc_id < b.doc_id),
         |pb0 AS (SELECT doc_id, unnest(list_transform(range(0, 4),
         |    c -> 'c' || c || ':' || substr(phash, c*4 + 1, 4))) AS band FROM ph),
         |pb AS (SELECT doc_id, band FROM (
         |  SELECT *, count(*) OVER (PARTITION BY band) AS bsz FROM pb0) t WHERE bsz <= 256),
         |ppairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM pb a JOIN pb b ON a.band = b.band AND a.doc_id < b.doc_id),
         |pham AS (SELECT doc_a, doc_b, CAST(ham AS INT) AS hamming FROM (
         |  SELECT doc_a, doc_b, $ham AS ham
         |  FROM ppairs JOIN ph x ON x.doc_id = doc_a JOIN ph y ON y.doc_id = doc_b) t
         |  WHERE ham <= 3)
         |SELECT doc_a, doc_b, (hamming IS NOT NULL) AS img_confirmed, hamming
         |FROM tpairs LEFT JOIN pham USING (doc_a, doc_b)""".stripMargin
    },

    "m_frames" ->
      """SELECT doc_id, frame_idx, frame_idx * 1000 // n_frames AS frame_ts_ms
        |FROM (SELECT doc_id, 1 + n_bytes % 5 AS n_frames,
        |        unnest(range(0, 1 + n_bytes % 5)) AS frame_idx
        |      FROM (SELECT doc_id,
        |              CASE strlen(text) % 3 WHEN 0 THEN 33 WHEN 1 THEN 13 ELSE 54 END
        |                + doc_id % 64 AS n_bytes
        |            FROM documents) b) t""".stripMargin,

    // r12: HTML extraction — the markup is hostile and varies by doc id
    // (mixed-case tags, ghost comments/script/style, quoted '>' attrs,
    // <br> splits, decimal/hex character references) but the EXPECTED
    // extraction is uniform, so the oracle states it analytically from
    // the same halves of `text` the synthesis embedded (the
    // synthRobotsTxt discipline: any parsing defect perturbs the
    // recovered blocks and breaks the hash)
    "t_html_text" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    trim(substr(text, 1, strlen(text)//2)) AS h1,
         |    trim(substr(text, strlen(text)//2 + 1)) AS h2
         |  FROM documents)
         |SELECT doc_id,
         |  'Doc ' || doc_id || ' & friends' AS title,
         |  'Home About' || chr(10) || 'Doc ' || doc_id || chr(10) || h1 ||
         |    chr(10) || h2 || chr(10) || 'A & B C' || chr(10) ||
         |    'See ref ' || (doc_id % 7) || ' here' || chr(10) || 'Contact' AS text,
         |  CAST(7 AS INT) AS n_blocks, CAST(4 AS INT) AS n_links
         |FROM h""".stripMargin,

    // r13: table linearization — the synthTableHtml corpus' analytic
    // expectation: one pipe-joined block per row; caption its own block;
    // paragraph-split cell content stays one cell; the empty cell drops
    // from the join; the nested table emits outer-row-so-far, its own
    // rows, then the outer row resumes
    "t_html_table" ->
      """SELECT doc_id,
        |  'intro ' || doc_id || chr(10) ||
        |  'spec ' || doc_id || chr(10) ||
        |  'k | v' || chr(10) ||
        |  'a ' || doc_id || ' | b1 b2' || chr(10) ||
        |  CASE WHEN doc_id % 5 = 0 THEN 'c2 & ' || doc_id
        |       ELSE 'c1 | c2 & ' || doc_id END || chr(10) ||
        |  CASE WHEN doc_id % 4 = 0
        |       THEN 'pre' || chr(10) || 'n1 | n2' || chr(10) || 'post | z ' || doc_id || chr(10)
        |       ELSE '' END ||
        |  'outro ' || doc_id AS text,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 9 ELSE 6 END AS BIGINT) AS n_blocks
        |FROM documents""".stripMargin,

    "t_html_links" ->
      """SELECT doc_id, CAST(pos AS INT) AS pos,
        |  CASE pos WHEN 0 THEN '/home' WHEN 1 THEN '/about'
        |    WHEN 2 THEN 'https://site' || ((7*doc_id + 3) % 250) || '.example.com/p' || doc_id
        |    ELSE '/contact' END AS href,
        |  CASE pos WHEN 0 THEN 'Home' WHEN 1 THEN 'About'
        |    WHEN 2 THEN 'ref ' || (doc_id % 7) ELSE 'Contact' END AS anchor
        |FROM (SELECT doc_id, unnest(range(0, 4)) AS pos FROM documents) t""".stripMargin,

    // r12: head/metadata curation signals — the synthesis varies attr
    // case and plants a decoy description meta (with a quoted '>')
    // that the robots first-win must skip; lang rides the REAL lang
    // column through the html lang attribute
    // r12: PageRank over the REAL extracted link graph (site-level
    // distinct edges from the absolute content hrefs) — the same
    // exact-int64 recurrence as d_pagerank, directed
    "t_link_rank" ->
      """WITH e AS (SELECT DISTINCT doc_id % 250 AS src, (7*doc_id + 3) % 250 AS dst
        |  FROM documents),
        |deg AS (SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
        |r0 AS (SELECT doc_id, 1000000000000 // n AS rank FROM deg CROSS JOIN nv),
        |c1 AS (SELECT e.dst AS doc_id, CAST(sum(r.rank // d.deg) AS BIGINT) AS s
        |  FROM e JOIN r0 r ON r.doc_id = e.src JOIN deg d ON d.doc_id = e.src GROUP BY 1),
        |r1 AS (SELECT d.doc_id, (15000000000000 // (100 * n)) + (85 * coalesce(c.s, 0)) // 100 AS rank
        |  FROM deg d CROSS JOIN nv LEFT JOIN c1 c ON c.doc_id = d.doc_id),
        |c2 AS (SELECT e.dst AS doc_id, CAST(sum(r.rank // d.deg) AS BIGINT) AS s
        |  FROM e JOIN r1 r ON r.doc_id = e.src JOIN deg d ON d.doc_id = e.src GROUP BY 1),
        |r2 AS (SELECT d.doc_id, (15000000000000 // (100 * n)) + (85 * coalesce(c.s, 0)) // 100 AS rank
        |  FROM deg d CROSS JOIN nv LEFT JOIN c2 c ON c.doc_id = d.doc_id),
        |c3 AS (SELECT e.dst AS doc_id, CAST(sum(r.rank // d.deg) AS BIGINT) AS s
        |  FROM e JOIN r2 r ON r.doc_id = e.src JOIN deg d ON d.doc_id = e.src GROUP BY 1),
        |r3 AS (SELECT d.doc_id, (15000000000000 // (100 * n)) + (85 * coalesce(c.s, 0)) // 100 AS rank
        |  FROM deg d CROSS JOIN nv LEFT JOIN c3 c ON c.doc_id = d.doc_id)
        |SELECT doc_id AS site, rank FROM r3""".stripMargin,

    // r12: the consent layer — robots longest-match verdict (the
    // t_robots analytic rules) AND the page's own noindex meta
    // r12: the composed crawl curation verdict — main-text token count
    // (9 fixed tokens + the two halves' word counts: the '&' in the
    // entity paragraph normalizes to whitespace) x the consent gates
    "t_crawl_pipeline" ->
      """WITH hh AS (
        |  SELECT doc_id,
        |    trim(substr(text, 1, strlen(text)//2)) AS h1,
        |    trim(substr(text, strlen(text)//2 + 1)) AS h2
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, 9 + len(string_split(h1, ' ')) + len(string_split(h2, ' ')) AS nt
        |  FROM hh),
        |d AS (SELECT doc_id, doc_id % 250 AS site, '/p' || doc_id AS path
        |      FROM documents),
        |s AS (SELECT unnest(range(0, 250)) AS g),
        |r AS (
        |  SELECT g AS site, '/' AS prefix, FALSE AS allow FROM s WHERE g % 5 = 0
        |  UNION ALL SELECT g, '/p', FALSE FROM s WHERE g % 5 = 1
        |  UNION ALL SELECT g, '/p1', TRUE FROM s WHERE g % 5 = 1
        |  UNION ALL SELECT g, '/q', FALSE FROM s WHERE g % 5 = 2),
        |m AS (
        |  SELECT d.doc_id, d.site, r.allow,
        |    row_number() OVER (PARTITION BY d.doc_id
        |      ORDER BY len(r.prefix) DESC, r.allow DESC, r.prefix DESC) AS rn
        |  FROM d LEFT JOIN r ON d.site = r.site AND starts_with(d.path, r.prefix)),
        |v AS (SELECT doc_id, CAST(site AS BIGINT) AS site,
        |        (coalesce(allow, TRUE) AND NOT (doc_id % 7 = 0)) AS consented
        |      FROM m WHERE rn = 1)
        |SELECT v.doc_id, v.site, CAST(t.nt AS INT) AS n_tokens, v.consented,
        |  (v.consented AND t.nt >= 20) AS kept
        |FROM v JOIN t ON t.doc_id = v.doc_id""".stripMargin,

    "t_consent_filter" ->
      """WITH d AS (SELECT doc_id, doc_id % 250 AS site, '/p' || doc_id AS path
        |           FROM documents),
        |s AS (SELECT unnest(range(0, 250)) AS g),
        |r AS (
        |  SELECT g AS site, '/' AS prefix, FALSE AS allow FROM s WHERE g % 5 = 0
        |  UNION ALL SELECT g, '/p', FALSE FROM s WHERE g % 5 = 1
        |  UNION ALL SELECT g, '/p1', TRUE FROM s WHERE g % 5 = 1
        |  UNION ALL SELECT g, '/q', FALSE FROM s WHERE g % 5 = 2),
        |m AS (
        |  SELECT d.doc_id, d.site, r.allow,
        |    row_number() OVER (PARTITION BY d.doc_id
        |      ORDER BY len(r.prefix) DESC, r.allow DESC, r.prefix DESC) AS rn
        |  FROM d LEFT JOIN r ON d.site = r.site AND starts_with(d.path, r.prefix)),
        |v AS (SELECT doc_id, CAST(site AS BIGINT) AS site,
        |        coalesce(allow, TRUE) AS robots_allowed
        |      FROM m WHERE rn = 1)
        |SELECT doc_id, site, robots_allowed,
        |  (doc_id % 7 = 0) AS noindex,
        |  (robots_allowed AND NOT (doc_id % 7 = 0)) AS kept
        |FROM v""".stripMargin,

    "t_html_meta" ->
      """SELECT doc_id, lang AS html_lang,
        |  CASE WHEN doc_id % 7 = 0 THEN 'noindex,nofollow'
        |       WHEN doc_id % 7 = 3 THEN 'index,follow' ELSE '' END AS meta_robots,
        |  CASE WHEN doc_id % 3 <> 1
        |       THEN 'https://site' || (doc_id % 250) || '.example.com/p' || doc_id
        |       ELSE '' END AS canonical,
        |  (doc_id % 7 = 0) AS noindex
        |FROM documents""".stripMargin,

    // the link-density boilerplate filter drops the nav (0.9) and the
    // footer (1.0) and keeps the five prose blocks (<= 0.36)
    "t_html_main" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    trim(substr(text, 1, strlen(text)//2)) AS h1,
        |    trim(substr(text, strlen(text)//2 + 1)) AS h2
        |  FROM documents)
        |SELECT doc_id,
        |  'Doc ' || doc_id || chr(10) || h1 || chr(10) || h2 || chr(10) ||
        |    'A & B C' || chr(10) || 'See ref ' || (doc_id % 7) || ' here' AS main_text,
        |  CAST(5 AS INT) AS n_main_blocks
        |FROM h""".stripMargin,

    // the complete crawl->corpus pipeline: WARC(html) -> extractor ->
    // WET shard -> WET reader; the md5 is over the uniform expected
    // extraction, so any defect in ANY of the three round-trips (or the
    // extractor) perturbs it
    "t_wet_build" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    trim(substr(text, 1, strlen(text)//2)) AS h1,
        |    trim(substr(text, strlen(text)//2 + 1)) AS h2
        |  FROM documents),
        |t AS (
        |  SELECT doc_id,
        |    'Home About' || chr(10) || 'Doc ' || doc_id || chr(10) || h1 ||
        |      chr(10) || h2 || chr(10) || 'A & B C' || chr(10) ||
        |      'See ref ' || (doc_id % 7) || ' here' || chr(10) || 'Contact' AS txt
        |  FROM h)
        |SELECT doc_id, 'conversion' AS warc_type,
        |  CAST(strlen(txt) AS BIGINT) AS n_chars, md5(txt) AS payload_md5
        |FROM t""".stripMargin,

    // pages recovered from text/html WARC response records: identical
    // expectation plus the Target-URI-derived site key — the container
    // walk and the markup parse compose without perturbing either
    "t_html_warc" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    trim(substr(text, 1, strlen(text)//2)) AS h1,
        |    trim(substr(text, strlen(text)//2 + 1)) AS h2
        |  FROM documents)
        |SELECT doc_id, doc_id % 250 AS site,
        |  'Doc ' || doc_id || ' & friends' AS title,
        |  'Home About' || chr(10) || 'Doc ' || doc_id || chr(10) || h1 ||
        |    chr(10) || h2 || chr(10) || 'A & B C' || chr(10) ||
        |    'See ref ' || (doc_id % 7) || ' here' || chr(10) || 'Contact' AS text,
        |  CAST(7 AS INT) AS n_blocks, CAST(4 AS INT) AS n_links
        |FROM h""".stripMargin,
  )
}
