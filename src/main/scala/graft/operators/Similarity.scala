package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TopKByScore}

/** Similarity search over embedding columns.
  *
  * The brute-force path is the correctness baseline: broadcast the (small)
  * query side, score every candidate with the codegen'd cosine expression,
  * keep top-k per query. The scan over candidates is embarrassingly
  * parallel and the only shuffle is the per-query top-k selection — at
  * 100 TB the scored-candidate stream is what matters, and it never
  * materializes more than the scan itself.
  *
  * Selection discipline: every search path selects through the bounded-heap
  * [[graft.functions.TopKByScore]] aggregate ([[heapSelect]]) — map-side
  * partial aggregation reduces each task to ≤k rows per query *before* the
  * shuffle and no sort of the scored stream ever happens. The Window
  * formulation ([[bruteForceTopK]]) is kept as the spec cross-check only.
  *
  * [[ivfTopK]] is the scale path: coarse-quantize candidates into `nlist`
  * cells (offline k-means in real pipelines; hash-binning here), probe only
  * the closest `nprobe` cells per query — a pre-filter that cuts scored
  * candidates by ~nlist/nprobe while reusing the same scoring kernel.
  */
object Similarity {

  /** Bounded-heap top-k selection over a scored stream `(qid, nid,
    * score_raw)`. Returns `(qid, nid, score, rnk)` with `score` rounded to
    * 4 decimals and a deterministic tiebreak on `nid` (the heap's own
    * ordering). This is the selection shape that survives 100 TB: the
    * shuffle carries ≤ k rows per query per map task regardless of corpus
    * size, and there is no Window/Sort of the scored stream.
    */
  private[operators] def heapSelect(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("qid")
      .agg(TopKByScore.topK(col("score_raw"), col("nid"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.id").as("nid"),
        round(col("col.score"), 4).as("score"), (col("pos") + 1).as("rnk"))

  /** Per-query-k variant over `(qid, top_k, nid, score_raw)`: one heap of
    * size `maxK` per query (the aggregate's k is a plan constant), trimmed
    * to each query's own `top_k` after explosion — honoring the reference's
    * per-row `top_k` semantic (cfg.py:34) at heap cost `max(top_k)`.
    */
  private[operators] def heapSelectPerQuery(scored: DataFrame, maxK: Int): DataFrame =
    scored.groupBy("qid", "top_k")
      .agg(TopKByScore.topK(col("score_raw"), col("nid"), maxK).as("tk"))
      .select(col("qid"), col("top_k"), posexplode(col("tk")))
      .filter(col("pos") < col("top_k"))
      .select(col("qid"), col("col.id").as("nid"),
        round(col("col.score"), 4).as("score"), (col("pos") + 1).as("rnk"))

  /** `max(top_k)` of a query batch — one scalar aggregate over the (small)
    * query side, fetched on the driver to size the heap. Query batches are
    * driver-broadcast-sized by construction, so this job is trivial.
    */
  private[operators] def maxTopK(queries: DataFrame): Int = {
    val k = queries.agg(max(col("top_k"))).head().getAs[Number](0)
    require(k != null && k.intValue() > 0, "top_k must be a positive integer")
    k.intValue()
  }

  /** Spark-conf key bounding how many probed query rows a disk-index
    * search may collect to the driver (default 2^22 ≈ 4M rows). */
  val MaxProbeRowsConf = "graft.search.maxProbeRows"
  private val MaxProbeRowsDefault = 1 << 22

  /** Driver-bounded collect of a probed query batch. The disk-index
    * searches fold `queries × nprobe` rows into the plan (partition
    * filter + broadcast side) — driver-sized for every sane serving
    * batch, but an accidental corpus-as-queries call must fail LOUDLY at
    * the cap instead of OOMing the driver. `take(cap + 1)` never fetches
    * more than the cap needs to prove the violation.
    */
  private[operators] def collectProbeBatch(
      probedPlan: DataFrame, what: String): Array[org.apache.spark.sql.Row] = {
    val cap = probedPlan.sparkSession.conf
      .get(MaxProbeRowsConf, MaxProbeRowsDefault.toString).toInt
    val rows = probedPlan.take(cap + 1)
    require(rows.length <= cap,
      s"$what produced more than $cap probed rows (queries × nprobe) — " +
        s"the query batch must be driver-sized; split the batch or raise " +
        s"$MaxProbeRowsConf")
    rows
  }

  /** Expects `queries(qid, qvec)` and `candidates(nid, nvec)`.
    * Returns `(qid, nid, score, rnk)`, `rnk <= k`, deterministic tiebreak
    * on `nid`. Window formulation — the spec cross-check for the heap
    * paths, not the scale path.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("qid"), col("qvec").cast("array<double>").as("qv")))
    val scored = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"))
      .crossJoin(q)
      .withColumn("score_raw", GraftFunctions.vecCosine(col("qv"), col("v")))
    val w = Window.partitionBy("qid").orderBy(col("score_raw").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), round(col("score_raw"), 4).as("score"), col("rnk"))
  }

  /** Exact inner-product (MIPS) top-k — the brute-force reference for the
    * IVF-PQ family, whose ADC scores approximate the INNER product (the
    * Jégou et al. formulation), not the cosine: measuring PQ recall
    * against a cosine reference would conflate metric choice with index
    * error. Same plan shape as [[bruteForceTopKHeap]] (broadcast queries ×
    * codegen dot × bounded-heap selection).
    */
  def bruteForceTopKDot(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("qid"), col("qvec").cast("array<double>").as("qv")))
    val scored = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"))
      .crossJoin(q)
      .select(col("qid"), col("nid"),
        GraftFunctions.vecDot(col("qv"), col("v")).as("score_raw"))
    heapSelect(scored, k)
  }

  /** Same contract as [[bruteForceTopK]], selected by the bounded heap. */
  def bruteForceTopKHeap(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("qid"), col("qvec").cast("array<double>").as("qv")))
    val scored = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"))
      .crossJoin(q)
      .select(col("qid"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    heapSelect(scored, k)
  }

  /** Matryoshka (MRL) truncated retrieval: cosine top-k over only the
    * FIRST `dims` components of matryoshka-trained embeddings
    * (Kusupati et al. 2022) — the cheap first pass of a
    * coarse-to-fine pipeline (truncated search, optionally re-ranked
    * full-dim via [[DiskIvfPqIndex.searchRefined]]'s shape). Truncation
    * is a `slice`; renormalization is implicit in the cosine kernel
    * (which divides by both truncated norms), so the whole operator
    * rides the existing codegen scoring scan with `dims/d` of the
    * arithmetic and — on a column-pruned layout that stores prefix
    * slices — `dims/d` of the bytes.
    *
    * Same contract as [[bruteForceTopKHeap]]: `(qid, nid, score, rnk)`,
    * score is the truncated-space cosine rounded to 4dp.
    */
  def matryoshkaTopK(
      queries: DataFrame, candidates: DataFrame, k: Int, dims: Int): DataFrame = {
    require(dims > 0, s"dims must be positive, got $dims")
    bruteForceTopKHeap(
      queries.withColumn("qvec", slice(col("qvec"), 1, dims)),
      candidates.withColumn("nvec", slice(col("nvec"), 1, dims)), k)
  }

  /** Two-stage matryoshka search: [[matryoshkaTopK]]'s truncated coarse
    * pass keeps `rerank ≥ k` survivors per query, then ONLY those
    * `queries × rerank` rows are re-scored with the full-dimension cosine
    * and re-selected to `k` — the complete MRL coarse-to-fine shape
    * (same two-stage discipline as [[DiskIvfPqIndex.searchRefined]]: the
    * expensive kernel touches a candidate set bounded by `rerank`, never
    * the corpus).
    *
    * Scale shape: stage 1 scans the corpus at `dims/d` arithmetic; stage
    * 2 is a broadcast-sized semi-join (queries × rerank survivor ids)
    * back onto the candidate table — full vectors are read only for
    * survivors, which is the I/O win when the layout stores prefix and
    * tail slices separately.
    *
    * Returns `(qid, nid, score, rnk)` with `score` the FULL-dimension
    * cosine, `rnk` the full-dimension rank within the surviving set.
    */
  def matryoshkaTopKRefined(
      queries: DataFrame, candidates: DataFrame,
      k: Int, dims: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val coarse = matryoshkaTopK(queries, candidates, rerank, dims)
      .select(col("qid").as("s_qid"), col("nid").as("s_nid"))
    val q = broadcast(queries.select(col("qid"),
      col("qvec").cast("array<double>").as("qv")))
    val survivors = broadcast(coarse)
    val scored = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"))
      .join(survivors, col("nid") === col("s_nid"))
      .join(q, col("qid") === col("s_qid"))
      .select(col("qid"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    heapSelect(scored, k)
  }

  /** Metadata-filtered top-k with a scalar k applied to every query —
    * convenience overload of [[filteredTopKPerQuery]]. */
  def filteredTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame =
    filteredTopKPerQuery(queries.withColumn("top_k", lit(k)), candidates)

  /** Metadata-filtered top-k — the reference's flagship search semantic:
    * each query row carries its own `filter` JSON (reference `cfg.py:33`)
    * AND its own `top_k` (reference `cfg.py:34`, consumed by
    * `index.search`, `dataset.py:136-140`).
    *
    * Expects `queries(qid, qvec, filter, top_k)` (filter: JSON string or
    * null = match-all) and `candidates(nid, nvec, metadata)` (metadata:
    * JSON string). The filter is data, so it cannot be compiled into the
    * plan; [[graft.functions.JsonFilterMatch]] interprets it per pair
    * inside the whole-stage-codegen'd scoring scan, *before* the cosine
    * kernel runs — filtered-out candidates are never scored. Selection is
    * one `max(top_k)` heap per query trimmed to the row's own `top_k`.
    */
  def filteredTopKPerQuery(queries: DataFrame, candidates: DataFrame): DataFrame = {
    val maxK = maxTopK(queries)
    val q = broadcast(queries.select(
      col("qid"), col("qvec").cast("array<double>").as("qv"), col("filter"),
      col("top_k").cast("int").as("top_k")))
    val scored = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"), col("metadata"))
      .crossJoin(q)
      .filter(GraftFunctions.jsonFilterMatch(col("filter"), col("metadata")))
      .select(col("qid"), col("top_k"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    heapSelectPerQuery(scored, maxK)
  }

  /** Sparse top-k over the reference's sparse struct surface: queries carry
    * `sparse_vector struct<indices: array<bigint>, values: array<float>>`
    * and their own `top_k` (reference `cfg.py:32,34`); candidates carry
    * `sparse_values` of the same struct shape (reference `cfg.py:26`,
    * `MAINTAINERS.md:97`).
    *
    * PLAN: posting-list retrieval, not scored brute force. The broadcast
    * query batch explodes into `(qid, index, weight)` postings; candidates
    * explode into the same shape; a broadcast hash EQUI-join on the shared
    * `index` touches ONLY index-overlapping (query, candidate) pairs, and
    * a partial-aggregated `sum(q_weight * n_weight)` per (qid, nid)
    * reassembles the dot product — the inverted-index query plan of a
    * sparse/BM25 engine, declared with built-in operators. Zero-overlap
    * pairs are never materialized, let alone scored: at 100 TB with a
    * realistic sparse vocabulary, a 10k-query batch scores the pairs that
    * share a term (typically 0.1–10% of the cross product) instead of a
    * full corpus×batch scoring pass — 10–1000× less work than the
    * crossJoin formulation this replaced. Map-side partial aggregation
    * bounds the shuffle to distinct surviving (qid, nid) pairs per task.
    *
    * Scores are identical to the merge-join
    * [[graft.functions.SparseDotProduct]] semantic: sum over shared
    * indices, pairs with no overlap (the old `score = 0` rows) dropped,
    * and — preserving the previous contract exactly — overlapping pairs
    * whose products sum ≤ 0 are dropped too.
    */
  def sparseTopKPerQuery(queries: DataFrame, candidates: DataFrame): DataFrame = {
    val maxK = maxTopK(queries)
    val q = queries.select(
      col("qid"),
      col("sparse_vector.indices").cast("array<long>").as("qi"),
      col("sparse_vector.values").cast("array<double>").as("qw"),
      col("top_k").cast("int").as("top_k"))
    // query postings: one row per (query, index) — batch_size × nnz rows,
    // still broadcast-sized (the explode happens on the broadcast side)
    val qPost = broadcast(q
      .select(col("qid"), col("top_k"), col("qw"),
        posexplode(col("qi")).as(Seq("qpos", "idx")))
      .select(col("qid"), col("top_k"), col("idx"),
        element_at(col("qw"), col("qpos") + 1).as("qval")))
    // candidate postings: the corpus-side explode is a codegen Generate —
    // no shuffle; each row carries one (candidate, index, weight) triple
    val cPost = candidates
      .select(col("nid"),
        col("sparse_values.indices").cast("array<long>").as("ni"),
        col("sparse_values.values").cast("array<double>").as("nw"))
      .select(col("nid"), col("nw"), posexplode(col("ni")).as(Seq("npos", "idx")))
      .select(col("nid"), col("idx"),
        element_at(col("nw"), col("npos") + 1).as("nval"))
    val scored = cPost.join(qPost, "idx")
      .groupBy(col("qid"), col("top_k"), col("nid"))
      .agg(sum(col("qval") * col("nval")).as("score_raw"))
      .filter(col("score_raw") > 0.0)
    heapSelectPerQuery(scored, maxK)
  }

  /** Filter-aware posting-list sparse search — [[sparseTopKPerQuery]]'s
    * plan with each query row's JSON metadata `filter` (reference
    * `cfg.py:33`: the query row carries `sparse_vector` + `filter` +
    * `top_k` together) enforced the way [[filteredTopKPerQuery]] does for
    * dense: interpreted in-scan, BEFORE any scoring arithmetic.
    *
    * Where the filter sits in the posting plan: on the posting-join
    * stream, between the broadcast index equi-join and the multiply —
    * the Spark translation of an inverted-index engine intersecting
    * posting lists with a filter bitmap. A filtered-out (query,
    * candidate) pairing contributes NOTHING to the partial aggregate, so
    * the score shuffle is bounded by surviving overlapping pairs only.
    * The candidate's `metadata` string rides its posting rows (nnz-fold
    * column duplication at scan time, no extra shuffle — the same
    * trade the posting explode already makes for `nid`), and the match
    * predicate evaluates per posting row; callers with very fat metadata
    * and high-nnz vectors should project the filtered fields into a
    * compact struct first.
    *
    * Expects `queries(qid, sparse_vector, filter, top_k)` and
    * `candidates(nid, sparse_values, metadata)`. Returns
    * `(qid, nid, score, rnk)` with per-row `top_k` honored.
    */
  def sparseFilteredTopKPerQuery(queries: DataFrame, candidates: DataFrame): DataFrame = {
    val maxK = maxTopK(queries)
    val q = queries.select(
      col("qid"),
      col("sparse_vector.indices").cast("array<long>").as("qi"),
      col("sparse_vector.values").cast("array<double>").as("qw"),
      col("filter"),
      col("top_k").cast("int").as("top_k"))
    val qPost = broadcast(q
      .select(col("qid"), col("top_k"), col("filter"), col("qw"),
        posexplode(col("qi")).as(Seq("qpos", "idx")))
      .select(col("qid"), col("top_k"), col("filter"), col("idx"),
        element_at(col("qw"), col("qpos") + 1).as("qval")))
    val cPost = candidates
      .select(col("nid"), col("metadata"),
        col("sparse_values.indices").cast("array<long>").as("ni"),
        col("sparse_values.values").cast("array<double>").as("nw"))
      .select(col("nid"), col("metadata"), col("nw"),
        posexplode(col("ni")).as(Seq("npos", "idx")))
      .select(col("nid"), col("metadata"), col("idx"),
        element_at(col("nw"), col("npos") + 1).as("nval"))
    val scored = cPost.join(qPost, "idx")
      .filter(GraftFunctions.jsonFilterMatch(col("filter"), col("metadata")))
      .groupBy(col("qid"), col("top_k"), col("nid"))
      .agg(sum(col("qval") * col("nval")).as("score_raw"))
      .filter(col("score_raw") > 0.0)
    heapSelectPerQuery(scored, maxK)
  }

  /** Hybrid dense+sparse filtered top-k — the COMPLETE reference query-row
    * surface in one search: each query row carries `vector`,
    * `sparse_vector`, `filter` and `top_k` (reference `cfg.py:30-36`), and
    * candidates carry `values`-shaped `nvec`, `sparse_values` and
    * `metadata`. The score is the convex combination
    * `alpha * cosine(dense) + (1 - alpha) * sparseDot(sparse)` — the
    * standard hybrid-search blend. `alpha = 1` degenerates to
    * [[filteredTopKPerQuery]]; `alpha = 0` to pure sparse relevance.
    * Filtering happens before scoring; selection is the per-row-k heap.
    *
    * Why the sparse leg here stays the inline merge-join
    * [[graft.functions.SparseDotProduct]] rather than the posting-list
    * plan of [[sparseTopKPerQuery]]: with `alpha > 0` a zero-overlap pair
    * still carries a live score (`alpha * cosine`) and can legitimately
    * rank — so the pair stream CANNOT be pruned to index-overlapping
    * pairs, and the brute-force dense term forces every filtered pair to
    * be materialized anyway. Given that stream, the merge-join dot is the
    * cheapest per-pair evaluation (O(nnz_q + nnz_n), inside the same
    * whole-stage-codegen scan as the cosine); a posting-list side
    * computation would have to shuffle the full dense-scored stream by
    * (qid, nid) to join back — strictly more work. Callers wanting pure
    * sparse relevance at scale should call [[sparseTopKPerQuery]]
    * directly, which IS the posting-list plan.
    */
  def hybridTopKPerQuery(
      queries: DataFrame,
      candidates: DataFrame,
      alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    val maxK = maxTopK(queries)
    val q = broadcast(queries.select(
      col("qid"), col("qvec").cast("array<double>").as("qv"),
      col("sparse_vector.indices").cast("array<long>").as("qi"),
      col("sparse_vector.values").cast("array<double>").as("qw"),
      col("filter"), col("top_k").cast("int").as("top_k")))
    val scored = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"),
        col("sparse_values.indices").cast("array<long>").as("ni"),
        col("sparse_values.values").cast("array<double>").as("nw"),
        col("metadata"))
      .crossJoin(q)
      .filter(GraftFunctions.jsonFilterMatch(col("filter"), col("metadata")))
      .select(col("qid"), col("top_k"), col("nid"),
        (lit(alpha) * GraftFunctions.vecCosine(col("qv"), col("v")) +
          lit(1.0 - alpha) *
            GraftFunctions.sparseDot(col("qi"), col("qw"), col("ni"), col("nw")))
          .as("score_raw"))
    heapSelectPerQuery(scored, maxK)
  }

  /** IVF-style approximate top-k: assign each candidate to one of `nlist`
    * cells, compute per-query cell affinity against broadcast centroids,
    * score only candidates in the query's best `nprobe` cells.
    *
    * Cell assignment here is a deterministic projection hash over the
    * vector (sign pattern of leading dimensions) so the operator is
    * self-contained; production use would persist k-means centroids and
    * `repartition(col("cell"))` + sort within partitions once, giving
    * cell-pruned scans on every subsequent query batch.
    */
  def ivfTopK(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      signBits: Int = 4): DataFrame = {
    def cellOf(vec: String): org.apache.spark.sql.Column =
      (0 until signBits).map { i =>
        when(element_at(col(vec), i + 1) >= 0, 1 << i).otherwise(0)
      }.reduce(_ + _)

    val q = broadcast(
      queries.select(col("qid"), col("qvec").cast("array<double>").as("qv"))
        .withColumn("cell", cellOf("qv")))
    val c = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"))
      .withColumn("cell", cellOf("v"))
    // nprobe=1 on the sign-hash: same-cell candidates only.
    val scored = c.join(q, "cell")
      .select(col("qid"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    heapSelect(scored, k)
  }

  /** Multi-probe IVF: each query probes its own cell plus every
    * single-bit-flip neighbor cell (`signBits + 1` probes). Near-boundary
    * vectors — the recall loss of single-probe IVF — land in a flipped
    * cell, so multi-probe recovers most of them while still scoring only
    * `(signBits+1)/2^signBits` of the corpus. Candidates have exactly one
    * cell and probe cells are distinct, so no per-query dedup is needed.
    */
  def ivfTopKMultiProbe(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      signBits: Int = 4): DataFrame = {
    def cellOf(vec: String): org.apache.spark.sql.Column =
      (0 until signBits).map { i =>
        when(element_at(col(vec), i + 1) >= 0, 1 << i).otherwise(0)
      }.reduce(_ + _)

    val q = broadcast(
      queries.select(col("qid"), col("qvec").cast("array<double>").as("qv"))
        .withColumn("cell0", cellOf("qv"))
        .select(col("qid"), col("qv"),
          explode(transform(sequence(lit(0), lit(signBits)), i =>
            when(i === 0, col("cell0"))
              .otherwise(col("cell0").bitwiseXOR(
                call_function("shiftleft", lit(1), i - 1)))))
            .as("cell")))
    val c = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"))
      .withColumn("cell", cellOf("v"))
    val scored = c.join(q, "cell")
      .select(col("qid"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    heapSelect(scored, k)
  }
}
