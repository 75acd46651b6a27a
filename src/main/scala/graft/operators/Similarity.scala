package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Cross-engine determinism: floats are quantized to integer-valued
  * doubles (`round(x*1000)`) before any arithmetic, so dot products and
  * norms are exact integers (« 2^53) in both Spark and DuckDB and the
  * cosine is bit-identical regardless of summation order. This is the
  * declared semantic of the operator, not a test hack — a production
  * pipeline quantizing to int8/int16 does the same thing.
  *
  * Scale stance (100 TB): the query set is broadcast (queries ≪ corpus),
  * so brute-force top-k is one narrow pass over the corpus — no shuffle
  * until the per-query top-k reduction. The LSH-bucketed variant shrinks
  * the candidate set per query to one bucket: shuffle on the 8-bit bucket
  * code, candidates meet only within their bucket (IVF-style).
  */
object Similarity {

  /** Quantized embedding: integer-valued doubles. */
  def quantized(e: Column): Column =
    transform(e, x => round(x.cast("double") * 1000))

  /** Exact dot product of two quantized vectors — the native codegen'd
    * [[graft.functions.DotProduct]] expression (allocation-free loop;
    * identical summation order to the HOF formulation it replaces). */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot(a, b)

  /** Cosine similarity of quantized vectors, 6 decimals (truncated —
    * see TextOps.trunc for why not round()). */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    TextOps.trunc(dot(a, b) / (sqrt(na) * sqrt(nb)), 6)

  /** Sign-bit bucket over the first 8 dims — the coarse IVF/LSH cell. */
  def signBucket(e: Column): Column =
    concat((1 to 8).map(i =>
      when(element_at(e, i) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** Quantize + pre-compute norms. `spread` rebalances a single-split scan
    * first — worth one exchange only when the downstream kernel is
    * CPU-bound over the whole corpus (brute-force cosines, centroid
    * posexplode); for the bucket-pruned paths the per-row work after the
    * broadcast join is too small to pay for the shuffle. */
  private def prepared(embeddings: DataFrame, spread: Boolean = false): DataFrame = {
    val withLabel =
      if (embeddings.columns.contains("label")) embeddings
      else embeddings.withColumn("label", lit(0)) // single IVF seed cell
    (if (spread) Spread(withLabel) else withLabel)
      .select(col("vec_id"), col("label"), quantized(col("embedding")).as("q"))
      .withColumn("n2", dot(col("q"), col("q")))
  }

  /** Brute-force cosine top-k: every ~97th vector queries the whole
    * corpus. Query side broadcast; ranking ties broken by candidate id. */
  def bruteTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val corpus = prepared(embeddings, spread = true)
    val queries = corpus
      .filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    corpus
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        cosine(col("qq"), col("q"), col("qn2"), col("n2")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos")
  }

  /** R11: FILTERED vector search — top-k restricted to candidates
    * satisfying a metadata predicate, here the production-common
    * same-category filter (`candidate.label = query.label`). The filter
    * rides IN the join condition — the PRE-filtering strategy every
    * vector store prefers when the predicate is selective (post-filtering
    * a plain top-k under-fills k) — and because it is an equi-predicate
    * the plan upgrades from the brute path's query-broadcast nested loop
    * to a hash join keyed on label: candidates outside the query's
    * category are never distance-scored. Same output shape as
    * [[bruteTopK]]. */
  def filteredTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val corpus = prepared(embeddings, spread = true)
    val queries = corpus
      .filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("q").as("qq"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    corpus
      .join(broadcast(queries),
        col("vec_id") =!= col("q_id") && col("label") === col("q_label"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        cosine(col("qq"), col("q"), col("qn2"), col("n2")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos")
  }

  /** R14: HARD-NEGATIVE mining — for each query vector, the k most
    * similar candidates with a DIFFERENT label (the retrieval-training
    * step contrastive models run over their corpus: nearest wrong-class
    * examples make the hardest negatives). The inequality predicate
    * can't hash-join, so this is deliberately the queries-broadcast
    * shape ([[bruteTopK]]'s documented queries ≪ corpus envelope); at
    * production scale compose the ANN candidate stage first
    * ([[ivfTopK]] with a larger k) and apply the label filter to the
    * candidate relation instead. Same output shape as [[bruteTopK]]. */
  def hardNegatives(embeddings: DataFrame, k: Int): DataFrame = {
    val corpus = prepared(embeddings, spread = true)
    val queries = corpus
      .filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("q").as("qq"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    corpus
      .join(broadcast(queries), col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        cosine(col("qq"), col("q"), col("qn2"), col("n2")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos")
  }

  /** LSH/IVF-bucketed approximate top-k: queries only meet candidates in
    * their own sign bucket. Same output shape as [[bruteTopK]]. */
  def bucketedTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val corpus = prepared(embeddings)
      .withColumn("bucket", signBucket(col("q")))
    val queries = corpus
      .filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), col("q").as("qq"),
        col("n2").as("qn2"), col("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    corpus
      .join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        cosine(col("qq"), col("q"), col("qn2"), col("n2")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos")
  }

  /** Element-wise mean vectors per cell over `(c_label, q)` rows. Sums of
    * integer-valued doubles are exact and the final division + the
    * index-order norm sum are sequentially evaluated in both engines, so
    * the centroid vectors — and everything derived from them — are
    * bit-identical across engines even once they turn fractional after a
    * Lloyd step. */
  private def meanCentroids(pts: DataFrame): DataFrame =
    pts
      .select(col("c_label"), posexplode(col("q")).as(Seq("i", "x")))
      .groupBy("c_label", "i")
      .agg((sum("x") / count(lit(1))).as("c"))
      .groupBy("c_label")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        s => s("c")).as("cv"))
      .withColumn("cn2", dot(col("cv"), col("cv")))

  /** IVF seed centroids: mean per `label` cell (k-means++ stand-in — the
    * generator's label IS a cluster hint, as a production pipeline would
    * seed from a sample). */
  def centroids(corpus: DataFrame): DataFrame =
    meanCentroids(corpus.select(col("label").as("c_label"), col("q")))

  /** The `n` nearest centroids per vector (min ||v-c||², i.e. min of
    * cn2 - 2·v·c since ||v||² is constant per vector; ties break by cell
    * id). The centroid set rides along as ONE broadcast row holding an
    * array of centroid structs, and the argmin is a per-row
    * score-and-sort over that array — a narrow map stage. The r3 shape
    * (crossJoin row blowup + row_number window) shuffled corpus×k rows
    * on vec_id just to pick each row's minimum; at 100 TB that window
    * exchange was the plan's only corpus-sized shuffle, and it carried
    * k× the corpus. Identical arithmetic and (score, cell) tie-break —
    * struct sort orders field-wise — so the oracle mirror is unchanged. */
  private[operators] def nearestCells(corpus: DataFrame, cents: DataFrame, n: Int): DataFrame = {
    val centArr = cents.agg(
      collect_list(struct(col("c_label"), col("cv"), col("cn2"))).as("cents"))
    corpus
      .crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("q"), col("n2"),
        slice(array_sort(transform(col("cents"), c =>
          struct((c.getField("cn2") - lit(2) * dot(col("q"), c.getField("cv"))).as("score"),
            c.getField("c_label").as("cell")))), 1, n).as("near"))
      .select(col("vec_id"), col("q"), col("n2"), posexplode(col("near")).as(Seq("i", "nc")))
      .select(col("vec_id"), col("q"), col("n2"),
        col("nc.cell").as("cell"), (col("i") + 1).as("rn"))
  }

  /** Assign every vector to its single nearest centroid. */
  def assignCells(corpus: DataFrame, cents: DataFrame): DataFrame =
    nearestCells(corpus, cents, 1).drop("rn")

  /** One Lloyd (k-means) step: re-assign to the nearest centroid, then
    * recompute cell means. Each step is one broadcast-join pass + one
    * aggregation over the corpus. */
  def lloydStep(corpus: DataFrame, cents: DataFrame): DataFrame =
    meanCentroids(assignCells(corpus, cents).select(col("cell").as("c_label"), col("q")))

  /** IVF top-k: Lloyd-refined centroids, queries probe their `nprobe`
    * nearest cells — the classic inverted-file ANN layout with multiprobe
    * (nprobe=1 has a recall cliff for queries near a cell boundary; their
    * true neighbors sit in the adjacent cell).
    *
    * At 100 TB the cells are the partition keys of the index table and a
    * probe reads `nprobe` partitions; Lloyd training runs on the
    * deterministic `vec_id % trainSampleMod = 0` sample (1 = full
    * corpus, the oracle-mirrored default) — serving always assigns and
    * probes the FULL corpus, only centroid fitting reads the sample. A
    * candidate belongs to exactly one cell and a query's probed cells are
    * distinct, so multiprobe introduces no duplicate candidates. */
  /** Build the IVF index: the assigned-cells relation
    * `(vec_id, q, n2, cell)` plus the trained centroid table. The cells
    * relation is what a deployment PERSISTS partitioned by `cell`
    * (`df.write.partitionBy("cell")`) — a probe then reads exactly
    * `nprobe` partition directories (partition pruning, no scan of the
    * rest of the corpus; SimilaritySpec proves the pruned plan). */
  /** Training: pinned prepared corpus + trained centroid table. */
  private def trained(embeddings: DataFrame, lloydIters: Int,
      trainSampleMod: Int): (DataFrame, DataFrame) = {
    val corpus = prepared(embeddings, spread = true)
    // The centroid table is a few KB (one row per cell), but its lineage
    // contains a full-corpus aggregation per Lloyd step — left lazy, every
    // consumer (cell assignment, query probe, each further Lloyd step)
    // re-runs that whole subtree, and the r3 plan recomputed the corpus
    // scan ~4x. Materializing each centroid generation pins training to
    // exactly one corpus pass per Lloyd step and leaves the serving plan
    // with one scan per arm (cells + query probe). At cluster scale this
    // table is checkpoint-or-collect sized either way.
    def pin(df: DataFrame): DataFrame = df.localCheckpoint()
    // the prepared corpus is read once per training pass + twice at
    // serve; pin it too so quantization/norms run once (at 100 TB
    // training reads a sample instead — see trainSampleMod — and the
    // serve arms read the columnar index table; this pin is the local
    // analog)
    val pinnedCorpus = pin(corpus)
    val trainCorpus =
      if (trainSampleMod <= 1) pinnedCorpus
      else pinnedCorpus.filter(col("vec_id") % trainSampleMod === 0)
    // intermediate centroid generations are each consumed exactly once
    // (by the next Lloyd step), so the whole training chain stays ONE
    // lazy tree over the pinned corpus and only the final generation —
    // consumed by both serving arms — is pinned: 2 training jobs total.
    var cents = centroids(trainCorpus)
    for (_ <- 1 to lloydIters) cents = lloydStep(trainCorpus, cents)
    (pinnedCorpus, pin(cents))
  }

  def ivfIndex(embeddings: DataFrame, lloydIters: Int = 1,
      trainSampleMod: Int = 1): (DataFrame, DataFrame) = {
    val (corpus, cents) = trained(embeddings, lloydIters, trainSampleMod)
    (assignCells(corpus, cents), cents)
  }

  /** INCREMENTAL index maintenance: assign a batch of NEW vectors against
    * the EXISTING trained centroids — no retraining, no touch of the
    * already-indexed corpus. This is how a production index absorbs
    * streaming ingest at 100 TB: the append is one narrow pass over the
    * new batch (per-row argmin against the broadcast centroid row), its
    * output appends to the same cell-partitioned storage
    * (`write.partitionBy("cell").mode("append")`), and probes see old and
    * new rows identically because assignment is a pure function of the
    * frozen centroids. Centroid refresh is a periodic OFFLINE re-train +
    * atomic index swap, never an inline mutation. SimilaritySpec proves
    * append-then-probe ≡ index-everything-at-once-then-probe. */
  def ivfAppend(newVectors: DataFrame, cents: DataFrame): DataFrame =
    assignCells(prepared(newVectors), cents)

  /** R14 (4th closing): the k-means CLUSTERING REPORT — per-cluster
    * size and EXACT inertia over the Lloyd-refined assignment (the
    * diagnostic a deployment reads before trusting an IVF layout or a
    * SemDeDup prune: empty/fat cells and inertia say whether k and the
    * iteration count were enough).
    *
    * Inertia is exact by the computational identity
    * `Σ‖q − s/m‖² = Σ‖q‖² − ‖s‖²/m` (s = component-wise integer sum,
    * m = cluster size): every term is an exact BIGINT of the quantized
    * coordinates, so no order-dependent double sum ever forms — a
    * per-member double accumulation would hash-diverge across engines
    * under Spark's partition-order nondeterminism (the sumMoney rule).
    * Reported as `inertia_milli` (×1000, floor-div by m; numerator
    * bound: m·Σn2·1000 — BIGINT-safe through ~10⁹ vectors/cluster at
    * this quantization). ONE corpus pass after assignment: component
    * sums, sizes, and Σn2 all come off the same posexplode aggregate
    * (m and Σn2 replicate across the 64 dims; max() collapses them). */
  def kmeansStats(embeddings: DataFrame, lloydIters: Int = 1,
      trainSampleMod: Int = 1): DataFrame = {
    val (cells, _) = ivfIndex(embeddings, lloydIters, trainSampleMod)
    cells
      // n2 rides as a double through the cosine paths but holds an exact
      // integer (‖q‖² of the quantized coords) — pin it back to BIGINT
      .select(col("cell"), col("n2").cast("long").as("n2"),
        posexplode(col("q")).as(Seq("i", "x")))
      .groupBy("cell", "i")
      // the quantized coords are exact integers carried as doubles too
      .agg(sum(col("x").cast("long")).as("sv"), count(lit(1)).as("m_i"),
        sum("n2").as("sn2_i"))
      .groupBy("cell")
      .agg(max("m_i").as("n_vectors"), max("sn2_i").as("sum_n2"),
        sum(col("sv") * col("sv")).as("ss"))
      .select(col("cell"), col("n_vectors"), col("sum_n2"), col("ss"),
        expr("(n_vectors * sum_n2 - ss) * 1000 div n_vectors").as("inertia_milli"))
  }

  /** Top-k probe over a built (possibly persisted-and-reloaded) index:
    * queries meet candidates only inside their `nprobe` nearest cells. */
  def ivfProbe(cells: DataFrame, cents: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val probes = nearestCells(queries, cents, nprobe)
      .select(col("vec_id").as("q_id"), col("q").as("qq"),
        col("n2").as("qn2"), col("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    cells
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        cosine(col("qq"), col("q"), col("qn2"), col("n2")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos")
  }

  def ivfTopK(embeddings: DataFrame, k: Int, lloydIters: Int = 1, nprobe: Int = 2,
      trainSampleMod: Int = 1): DataFrame = {
    // queries come from the pinned corpus, not the cells relation — the
    // assignment argmin then runs exactly once (in the probe's candidate
    // arm) instead of once more per query-arm consumer
    val (corpus, cents) = trained(embeddings, lloydIters, trainSampleMod)
    val cells = assignCells(corpus, cents)
    ivfProbe(cells, cents, corpus.filter(col("vec_id") % 97 === 0), k, nprobe)
  }

  /** The incremental-ingest serving path end-to-end: train + index the
    * BASE corpus (`vec_id % deltaMod != 0`), [[ivfAppend]] the delta
    * batch against the FROZEN centroids, probe the combined index.
    * Because assignment is a pure function of the centroids, this must
    * equal index-everything-then-probe with base-trained centroids —
    * SimilaritySpec asserts that equality in-engine, and the
    * `s_ivf_append` oracle pins the combined path against DuckDB. */
  def ivfAppendTopK(embeddings: DataFrame, k: Int, lloydIters: Int = 1,
      nprobe: Int = 2, trainSampleMod: Int = 1, deltaMod: Int = 5): DataFrame = {
    val (cells0, cents) = ivfIndex(
      embeddings.filter(col("vec_id") % deltaMod =!= 0), lloydIters, trainSampleMod)
    val cells = cells0.unionByName(
      ivfAppend(embeddings.filter(col("vec_id") % deltaMod === 0), cents))
    ivfProbe(cells, cents,
      prepared(embeddings).filter(col("vec_id") % 97 === 0), k, nprobe)
  }

  /** PQ codebook shape: 64-dim vectors split into `PqM` subspaces of
    * `PqDim` dims (shared with the oracle generator). */
  val PqM = 8
  val PqDim = 8

  /** Squared L2 between subvector `qsub` (integer-valued) and the
    * centroid stored as SUM vector `sv` + count `n`: the mean is never
    * materialized — `Σ(n·x − S)² / n²` keeps every intermediate an exact
    * integer until ONE final division, so the double is bit-identical in
    * both engines (same trick as the exact-decimal money math). */
  private def subD2(qsub: Column, sv: Column, n: Column): Column =
    aggregate(sequence(lit(1), lit(PqDim)), lit(0.0d),
      (acc, t) => acc +
        pow(n * element_at(qsub, t) - element_at(sv, t), lit(2))) / (n * n)

  /** Product quantization top-k (ADC — asymmetric distance computation).
    *
    * Train: per-subspace codebooks from the label cells (deterministic
    * seed means, the IVF convention here). Encode: every vector becomes
    * `PqM` small codes — the compressed index a deployment PERSISTS is
    * `PqM` bytes/vector instead of 256 B of floats, which is the whole
    * point at 100 TB: after encoding, probes rescan only the code table.
    * Probe: each query precomputes its distance TABLE (labels × PqM tiny
    * rows, broadcast), then one narrow pass over the codes joins the
    * table and folds the `PqM` partial distances in index order (exact
    * sequential double sum — collect_list is re-sorted by `j` before the
    * fold, so shuffle arrival order can't change the result).
    *
    * Plan shape: codebook = one agg over the corpus; encode = per-row
    * argmin over ONE broadcast codebook-array row (narrow, same shape as
    * [[assignCells]]); probe = codes ⋈ broadcast(dtab) + one (q_id, c_id)
    * exchange + WindowGroupLimit top-k. No corpus-sized non-bin shuffle.
    */
  /** PQ codebook as ONE broadcast row: per-(label, subspace) centroid
    * carried as (sum vector, count). */
  private def pqCodebook(corpus: DataFrame): DataFrame =
    corpus
      .select(col("label").as("c_label"), posexplode(col("q")).as(Seq("i0", "x")))
      .withColumn("j", (col("i0") / PqDim).cast("int"))
      .groupBy("c_label", "j", "i0")
      .agg(sum("x").as("s"), count(lit(1)).as("cnt"))
      .groupBy("c_label", "j")
      .agg(transform(array_sort(collect_list(struct(col("i0"), col("s")))),
        e => e("s")).as("sv"), first("cnt").as("n"))
      .agg(collect_list(struct(col("j"), col("c_label"), col("sv"), col("n"))).as("cents"))

  /** Encode: argmin centroid per subspace → PqM codes per vector (one
    * narrow pass over ONE broadcast codebook row). */
  private def pqEncode(corpus: DataFrame, centArr: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(centArr))
      .select(col("vec_id"), transform(sequence(lit(0), lit(PqM - 1)), j =>
        element_at(array_sort(transform(
          filter(col("cents"), c => c.getField("j") === j),
          c => struct(
            subD2(slice(col("q"), j * PqDim + 1, lit(PqDim)),
              c.getField("sv"), c.getField("n")).as("d2"),
            c.getField("c_label").as("lbl")))), 1).getField("lbl").as("code"))
        .as("codes"))

  /** Per-query ADC distance table: (q_id, j, label) → d2; labels×PqM
    * tiny rows per query, broadcast into the probe join. */
  private def pqDistTable(queries: DataFrame, centArr: DataFrame): DataFrame =
    queries
      .crossJoin(broadcast(centArr))
      .select(col("vec_id").as("q_id"), col("q"), explode(col("cents")).as("c"))
      .select(col("q_id"), col("c.j").as("j"), col("c.c_label").as("c_label"),
        subD2(slice(col("q"), col("c.j") * PqDim + 1, lit(PqDim)),
          col("c.sv"), col("c.n")).as("d2"))

  /** ADC rank of a (q_id, c_id) candidate relation: codes ⋈ broadcast
    * distance table, the PqM partial distances folded in j order (exact
    * sequential double sum). `cand = None` scans all (query, code) pairs
    * — the flat-PQ shape; `Some(pairs)` restricts the fold to the given
    * candidate pairs (the IVF-PQ shape). */
  private def pqRank(coded: DataFrame, dtab: DataFrame, k: Int,
      cand: Option[DataFrame]): DataFrame = {
    val flat0 = coded.select(col("vec_id").as("c_id"),
      posexplode(col("codes")).as(Seq("j", "code")))
    val flat = cand match {
      case None => flat0
      // no broadcast hint: AQE broadcasts the candidate relation at test
      // scale; a many-query production probe correctly shuffles on c_id
      case Some(pairs) => flat0.join(pairs, Seq("c_id"))
    }
    val joinCond = cand match {
      case None => flat0("j") === dtab("j") && col("code") === col("c_label") &&
        col("q_id") =!= col("c_id")
      // the candidate relation already carries q_id (and excludes self)
      case Some(_) => flat("j") === dtab("j") && col("code") === col("c_label") &&
        flat("q_id") === dtab("q_id")
    }
    val w = Window.partitionBy(dtab("q_id"))
      .orderBy(col("adist").asc, col("c_id").asc)
    flat.join(broadcast(dtab), joinCond)
      .groupBy(dtab("q_id"), col("c_id"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(dtab("j"), col("d2")))), e => e("d2")),
        lit(0.0d), (a, x) => a + x).as("ad"))
      .withColumn("adist", TextOps.trunc(col("ad"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(dtab("q_id").as("q_id"), col("rank"), col("c_id"), col("adist"))
  }

  def pqTopK(embeddings: DataFrame, k: Int): DataFrame =
    // r17: pinned — three consumers below (codebook, encode, distance
    // table) each re-ran the scan+quantize pass unpinned
    pqTopKFrom(prepared(embeddings, spread = true).localCheckpoint(), k)

  /** [[pqTopK]] over an already-prepared (and pinned) corpus — shared
    * with the refine path so the corpus is quantized once per query. */
  private def pqTopKFrom(corpus: DataFrame, k: Int): DataFrame = {
    val centArr = pqCodebook(corpus)
    val coded = pqEncode(corpus, centArr)
    val dtab = pqDistTable(corpus.filter(col("vec_id") % 97 === 0), centArr)
    pqRank(coded, dtab, k, cand = None)
  }

  /** IVF-PQ — the production composition of the two index halves
    * (FAISS's IVFPQ layout, here without residual encoding, documented):
    * the IVF coarse quantizer restricts each query to its `nprobe`
    * cells' candidates, and the ADC distance is then computed from the
    * PqM-byte CODES of those candidates alone — the probe never reads a
    * full-precision vector OR a code outside the probed cells. At 100 TB
    * the cells partition the code table (`partitionBy("cell")`), so a
    * probe reads `nprobe` partitions of an already-compressed relation:
    * the scan is smaller than flat-PQ by the cell fan-out AND smaller
    * than IVF-Flat by the code compression, which is exactly why this is
    * the layout production vector stores ship. Exactness discipline
    * unchanged: every distance is the same exact-integer ADC fold, so
    * the composition is oracle-checkable bit-for-bit.
    *
    * SCALE BOUND (r10, PlanLint-pinned): the candidate restriction
    * broadcasts the PROBES relation (queries × nprobe rows) into the
    * code-table join — correct only while queries ≪ corpus, which is
    * the definition of a serving query set. A corpus-scale query
    * stream (e.g. all-pairs self-join shapes) must NOT reuse this
    * composition as-is: drop the `broadcast()` hint so the cell join
    * becomes a keyed shuffle on `cell` — same query, both sides
    * exchange on the cell key, no driver-sized collect anywhere. */
  def ivfPqTopK(embeddings: DataFrame, k: Int = 3, lloydIters: Int = 1,
      nprobe: Int = 2, trainSampleMod: Int = 1): DataFrame = {
    val (corpus, cents) = trained(embeddings, lloydIters, trainSampleMod)
    ivfPqTopKFrom(corpus, cents, k, nprobe)
  }

  /** [[ivfPqTopK]] over an already-trained (pinned corpus, centroids)
    * pair — shared with the refine path (r17: the refine previously
    * re-prepared the embedding table itself on top of the trained
    * corpus this call already pinned). */
  private def ivfPqTopKFrom(corpus: DataFrame, cents: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val cells = assignCells(corpus, cents)
    val queries = corpus.filter(col("vec_id") % 97 === 0)
    // IVF arm: each query's nprobe cells → candidate (q_id, c_id) pairs
    val probes = nearestCells(queries, cents, nprobe)
      .select(col("vec_id").as("q_id"), col("cell"))
    val cand = cells.select(col("vec_id").as("c_id"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .select("q_id", "c_id")
    // PQ arm: full-corpus codebook (the pqTopK convention), candidate-only ADC
    val centArr = pqCodebook(corpus)
    val coded = pqEncode(corpus, centArr)
    val dtab = pqDistTable(queries, centArr)
    pqRank(coded, dtab, k, cand = Some(cand))
  }

  /** Two-stage retrieval — the FAISS IVFPQ+refine serving pattern: PQ/ADC
    * produces `kCoarse` candidates per query from the compressed code
    * table alone, then ONLY those pairs read their full-precision vectors
    * back for an exact-cosine re-rank to the final `k`. Refine work is
    * queries × kCoarse, never queries × corpus — the expensive exact
    * metric touches a candidate set that is already bounded, the same
    * candidates-only discipline as [[Dedup.jaccardOnCandidates]].
    *
    * Recall dominance (SimilaritySpec): any true top-k member the coarse
    * stage retrieves at all is GUARANTEED into the refined top-k (every
    * candidate with a higher exact cosine is itself a true top-≤k
    * member), so refine ≥ raw PQ at equal k by construction. */
  def pqRefineTopK(embeddings: DataFrame, kCoarse: Int = 10, k: Int = 3): DataFrame = {
    // r17: ONE pinned prepared corpus serves the coarse PQ stage AND
    // both refine vector reads (the previous shape re-prepared the
    // embedding table twice more inside the refine join)
    val corpus = prepared(embeddings, spread = true).localCheckpoint()
    refineExact(pqTopKFrom(corpus, kCoarse).select("q_id", "c_id"), corpus, k)
  }

  /** Exact-cosine re-rank of an arbitrary (q_id, c_id) candidate
    * relation over an already-prepared corpus: only those pairs read
    * their full-precision vectors back. Shared by the flat-PQ and
    * IVF-PQ refine paths. */
  private def refineExact(cand: DataFrame, v: DataFrame, k: Int): DataFrame = {
    val qv = v.select(col("vec_id").as("q_id"), col("q").as("qq"), col("n2").as("qn2"))
    val cv = v.select(col("vec_id").as("c_id"), col("q").as("cq"), col("n2").as("cn2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id").asc)
    cand.join(qv, "q_id").join(cv, "c_id")
      .select(col("q_id"), col("c_id"),
        cosine(col("qq"), col("cq"), col("qn2"), col("cn2")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos")
  }

  /** The full FAISS-style serving stack — IVF coarse cells → PQ/ADC over
    * candidate codes → exact re-rank of the kCoarse survivors. Refine
    * work stays queries × kCoarse; everything upstream reads only probed
    * cells' codes (see [[ivfPqTopK]]). */
  def ivfPqRefineTopK(embeddings: DataFrame, kCoarse: Int = 10, k: Int = 3,
      lloydIters: Int = 1, nprobe: Int = 2, trainSampleMod: Int = 1): DataFrame = {
    // r17: the refine reuses the trained pair's pinned corpus for its
    // full-precision vector reads instead of re-preparing the table
    val (corpus, cents) = trained(embeddings, lloydIters, trainSampleMod)
    refineExact(
      ivfPqTopKFrom(corpus, cents, kCoarse, nprobe).select("q_id", "c_id"),
      corpus, k)
  }

  /** Scalar quantization (SQ8) top-k — the third production compression
    * layout next to PQ and IVF-PQ (Lucene / pgvector's int8 path): each
    * dimension is affinely mapped to 0..255 by the corpus per-dim
    * min/max, every vector becomes 64 single-byte codes, and search is a
    * SYMMETRIC exact-integer L2 over the codes. Unlike PQ there is no
    * codebook — the decode is two constants per dimension — and unlike
    * IVF there is no pruning: the win is pure scan bandwidth (1 byte/dim
    * vs 8, an 8× smaller corpus read at equal layout), so the plan is
    * the brute shape over a compressed relation: queries broadcast, ONE
    * corpus pass, top-k per query. Every quantity (mins, maxes, codes,
    * distances) is an exact integer — floor((q-mn)*255/(mx-mn)) of
    * integer-valued doubles — so the oracle mirrors it bit-for-bit. */
  def sqTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val corpus = prepared(embeddings, spread = true)
    // per-dimension min/max over the corpus, collected as ONE broadcast row
    val stats = corpus
      .select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("i"), col("mn")))),
          e => e("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("i"), col("mx")))),
          e => e("mx")).as("mxs"))
    def encode(q: Column, mns: Column, mxs: Column): Column =
      transform(sequence(lit(1), lit(64)), i => {
        val mn = element_at(mns, i)
        val d = greatest(element_at(mxs, i) - mn, lit(1.0d))
        floor((element_at(q, i) - mn) * lit(255.0d) / d)
      })
    val coded = corpus.crossJoin(broadcast(stats))
      .select(col("vec_id"), encode(col("q"), col("mns"), col("mxs")).as("codes"))
    val queries = coded.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), col("codes").as("qc"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("d2").asc, col("c_id").asc)
    coded.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        aggregate(sequence(lit(1), lit(64)), lit(0.0d), (acc, i) =>
          acc + pow(element_at(col("qc"), i) - element_at(col("codes"), i), lit(2)))
          .as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "d2")
  }

  /** Default near-dup LSH shape — shared with the DuckDB oracle generator
    * so both sides band identically. */
  val NearDupTables = 4
  val NearDupBits = 16

  /** Embedding-cosine near-duplicate pairs via multi-table random-
    * hyperplane LSH ([[graft.functions.HyperplaneCodes]]): a vector emits
    * one `bits`-bit sign code per table; pairs meet iff they collide in
    * ≥ 1 table, then the exact quantized cosine filters at `threshold`.
    *
    * Scale: bucket count per table is 2^bits and grows with the
    * parameterization (bits ≈ log2(n / target_occupancy)), unlike a fixed
    * sign-prefix code whose 256 cells force O((n/256)²) pairing at any
    * corpus size. The self-join shuffles on the (table, code) band key —
    * the same streamed-pairs shape as [[Dedup.pairsWithinBuckets]]; both
    * sides reuse one exchange. Recall = 1 − (1 − p^bits)^tables with
    * p = 1 − θ/π; raise `tables` for recall, `bits` for occupancy. */
  def cosineNearDups(embeddings: DataFrame, threshold: Double,
                     tables: Int = NearDupTables, bits: Int = NearDupBits): DataFrame = {
    val bands = prepared(embeddings)
      .withColumn("codes", graft.functions.HyperplaneCodes.codes(col("q"), tables, bits))
      .select(col("vec_id"), col("q"), col("n2"),
        posexplode(col("codes")).as(Seq("t", "code")))
      .hint("shuffle_hash")
    bands.as("a")
      .join(bands.as("b"),
        col("a.t") === col("b.t") && col("a.code") === col("b.code") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.q"), col("b.q"), col("a.n2"), col("b.n2")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /** MMR diversity re-rank (Carbonell & Goldstein 1998): select `select`
    * of each query's exact top-`k` greedily by λ·relevance −
    * (1−λ)·max-similarity-to-already-selected. λ = 0.5, where the argmax
    * reduces to (relevance − maxsim) — the greedy steps are UNROLLED
    * (select = 3) so both engines execute the identical decision tree;
    * ties break on candidate id like every ranking here.
    *
    * Scale stance: re-ranking cost is O(queries · k²) and INDEPENDENT of
    * corpus size — after bruteTopK (or any ANN serve path with the same
    * output shape) the corpus is touched only to fetch candidate vectors
    * (two hash joins on vec_id); the pair-similarity relation is ≤ k²
    * rows per query and every greedy step is a per-query window argmax.
    */
  /** R11: ANN serving evaluation — recall@k of the IVF index against the
    * exact brute-force ground truth, per query. The metric every vector
    * store publishes (and the gate a deployment tunes nprobe against):
    * recall@k = |approx ∩ exact| / k, reported in exact integer millis.
    *
    * Scale shape: reuses the two serving paths as-is — the IVF arm reads
    * nprobe cells per query, the ground-truth arm is the brute pass you
    * run OFFLINE on a sampled query set (here the %97 sample both arms
    * share) — joined on (q_id, c_id) and folded per query. Evaluation
    * cost is sample-sized, never corpus². */
  def annRecall(embeddings: DataFrame, k: Int = 3): DataFrame = {
    val approx = ivfTopK(embeddings, k, trainSampleMod = 7)
      .select(col("q_id"), col("c_id")).withColumn("hit", lit(1L))
    val exact = bruteTopK(embeddings, k).select(col("q_id"), col("c_id"))
    exact.join(approx, Seq("q_id", "c_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k"), sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("q_id"), col("k"), col("n_hits"),
        expr("n_hits * 1000 DIV k").as("recall_milli"))
  }

  def mmrRerank(embeddings: DataFrame, k: Int = 5): DataFrame = {
    // Both pinned (`localCheckpoint`): the unrolled greedy steps consume
    // `cand` four times and `ps` three — unpinned, each consumer re-ran
    // the corpus-scale bruteTopK + vector-fetch subtree (76 parquet
    // scans, r10 plan audit). Both relations are candidate-bounded
    // (queries·k and queries·k² rows), so the pin is metadata-sized;
    // the corpus is now scanned only in the two build jobs.
    val cand = bruteTopK(embeddings, k).localCheckpoint() // q_id, rank, c_id, cos
    val corpus = prepared(embeddings)
    val va = corpus.select(col("vec_id").as("a_id"), col("q").as("qa"), col("n2").as("na"))
    val vb = corpus.select(col("vec_id").as("b_id"), col("q").as("qb"), col("n2").as("nb"))
    val ps = cand.select(col("q_id"), col("c_id").as("a_id"))
      .join(cand.select(col("q_id"), col("c_id").as("b_id")), Seq("q_id"))
      .filter(col("a_id") =!= col("b_id"))
      .join(va, "a_id").join(vb, "b_id")
      .select(col("q_id"), col("a_id"), col("b_id"),
        cosine(col("qa"), col("qb"), col("na"), col("nb")).as("sim"))
      .localCheckpoint()
    def simTo(sel: String) = ps.select(col("q_id"), col("a_id").as("c_id"),
      col("b_id").as(s"${sel}_id"), col("sim").as(s"sim_$sel"))
    val w = Window.partitionBy("q_id").orderBy(col("sc").desc, col("c_id").asc)
    val s1 = cand.filter(col("rank") === 1).select(col("q_id"), col("c_id").as("s1_id"))
    val rem = cand.filter(col("rank") > 1)
    val s2 = rem.join(s1, "q_id")
      .join(simTo("s1"), Seq("q_id", "c_id", "s1_id"))
      .withColumn("sc", col("cos") - col("sim_s1"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("c_id").as("s2_id"))
    val s3 = rem.join(s1, "q_id").join(s2, "q_id")
      .filter(col("c_id") =!= col("s2_id"))
      .join(simTo("s1"), Seq("q_id", "c_id", "s1_id"))
      .join(simTo("s2"), Seq("q_id", "c_id", "s2_id"))
      .withColumn("sc", col("cos") - greatest(col("sim_s1"), col("sim_s2")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("c_id").as("s3_id"))
    s1.select(col("q_id"), lit(1).as("mmr_rank"), col("s1_id").as("c_id"))
      .unionByName(s2.select(col("q_id"), lit(2).as("mmr_rank"), col("s2_id").as("c_id")))
      .unionByName(s3.select(col("q_id"), lit(3).as("mmr_rank"), col("s3_id").as("c_id")))
  }

  /** R14 (third closing): sparse RANDOM-PROJECTION dimensionality
    * reduction (Achlioptas 2003's database-friendly JL transform) — the
    * cheapen-the-vectors step before a brute/ANN pass: 64-d quantized
    * embeddings project to [[RpDim]] dims through a deterministic
    * {+1, 0, −1} sign matrix (density 6/16), so each projected
    * coordinate is an exact ±sum of input coordinates — all-integer,
    * order-free, bit-identical cross-engine. The matrix derives from
    * md5("rp:i:j") (first hex digit: 0-2 → +1, 3-5 → −1, else 0) and is
    * spliced into both engines as literals — the rate-table/threshold
    * discipline; the cross-engine claim is the projection arithmetic
    * and the retrieval built on it.
    *
    * What JL buys and what it doesn't (both measured, the d_simhash_nn
    * documented-contrast discipline): squared distances are preserved
    * in expectation at the scale factor RpDim·density = 16·(6/16) = 6
    * (spec-pinned: the per-pair ratio d²_proj/(6·d²_full) concentrates
    * around 1), but NN-IDENTITY recall on THIS corpus is weak — the
    * synthetic embeddings are near-orthogonal random points whose
    * neighbor sets are separated by hair-thin distance gaps, so 4×
    * compression scrambles the ranking (measured recall@5 vs exact L2:
    * 0.10 at 16 dims, 0.20 at 32, 0.30 at 48). Production corpora with
    * real cluster structure sit far higher; `s_rproj_recall` exists
    * precisely so a deployment measures its own trade instead of
    * trusting the lemma. */
  val RpDim = 16
  val RpSrcDim = 64
  lazy val rpSigns: IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until RpDim).map { j =>
      (0 until RpSrcDim).map { i =>
        val h = md.digest(s"rp:$i:$j".getBytes("UTF-8"))
        val d = (h(0) >> 4) & 0xf
        if (d <= 2) 1 else if (d <= 5) -1 else 0
      }
    }
  }

  /** Projected vector over a pre-quantized embedding column. */
  def rprojOf(q: Column): Column =
    array(rpSigns.map { row =>
      row.zipWithIndex.collect {
        case (s, i) if s != 0 =>
          if (s > 0) element_at(q, i + 1) else -element_at(q, i + 1)
      }.reduce(_ + _)
    }: _*)

  /** Exact top-k in the PROJECTED space, ranked by squared L2 distance
    * (all-integer — no sqrt, no division, no zero-norm NaN hazard):
    * d² = |a|² + |b|² − 2·a·b. Same %97 query sample and broadcast
    * shape as [[bruteTopK]], but each distance costs RpDim multiplies
    * instead of 64 — the 4× kernel cut is the point of the projection.
    * At 100 TB the projected corpus is also 4× smaller to persist. */
  def rprojTopK(embeddings: DataFrame, k: Int = 5): DataFrame = {
    // the projected corpus is PINNED (localCheckpoint — the DocSim
    // postings posture: in production this is the persisted reduced
    // index, 4× smaller than the corpus it replaces). Unpinned,
    // CollapseProject substitutes the ~400-node projection expression
    // into pn2 and then into both sides of every d², and the optimizer
    // chews seconds on the multiplied tree (measured at sf0.1: 3.5 s
    // standalone where the IDENTICAL subtree inside s_rproj_recall paid
    // 0.96 s — the plan, not the data, was the cost; pinned, 1.4 s).
    val corpus = Spread(embeddings)
      .select(col("vec_id"), rprojOf(quantized(col("embedding"))).as("p"))
      .withColumn("pn2", dot(col("p"), col("p")))
      .localCheckpoint()
    val queries = corpus.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), col("p").as("qp"), col("pn2").as("qn2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("d2").asc, col("c_id").asc)
    corpus
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        (col("qn2") + col("pn2") - lit(2) * dot(col("qp"), col("p")))
          .cast("long").as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "d2")
  }

  /** JL-quality evaluation: recall@k of the projected-space L2 top-k
    * against the exact full-dimension L2 top-k on the same query sample
    * — the [[annRecall]] shape with the projection as the approximate
    * arm, so the speed/recall trade the projection buys is a measured
    * number, not a claim. Both arms are exact integer rankings. */
  def rprojRecall(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val full = Spread(embeddings)
      .select(col("vec_id"), quantized(col("embedding")).as("q"))
      .withColumn("n2", dot(col("q"), col("q")))
    val queries = full.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("d2").asc, col("c_id").asc)
    val exact = full
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        (col("qn2") + col("n2") - lit(2) * dot(col("qq"), col("q")))
          .cast("long").as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"))
    val approx = rprojTopK(embeddings, k)
      .select(col("q_id"), col("c_id")).withColumn("hit", lit(1L))
    exact.join(approx, Seq("q_id", "c_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k"), sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("q_id"), col("k"), col("n_hits"),
        expr("n_hits * 1000 DIV k").as("recall_milli"))
  }
}
