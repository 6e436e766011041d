package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Product quantization (PQ) for inner-product ANN at 100 TB.
  *
  * Where int8 quantization ([[Quantization]]) compresses 4×, PQ compresses
  * dim×4-bytes down to `m` CODE BYTES per vector (64-dim float → 4 bytes at
  * m=4,k=16): the vector is split into `m` subvectors, each quantized to
  * its nearest cell of a per-subspace Lloyd codebook. Search never touches
  * the original vectors — scores come from the codes plus the (tiny)
  * codebook — so the 100 TB corpus becomes a ~1.6 TB code table and the
  * scan/shuffle cost drops by the same factor.
  *
  * Scoring uses the asymmetric-distance identity for inner product: the
  * dot of a query against a PQ-reconstructed vector equals the SUM of
  * per-subspace dots against the coded centroids. That makes the classic
  * ADC lookup-table formulation exact, not approximate: per query an m×k
  * table of partial dots ([[adcTable]], computed once on the broadcast
  * query side), then each scanned row costs m `element_at` lookups + adds
  * ([[adcLookupScore]]) — a ~dim/m constant-factor cut on the scan kernel
  * versus reconstructing the vector per row. Codebooks and tables ride
  * into the plan as single literal/broadcast objects — plans stay O(1)
  * like [[KMeans]]'s.
  *
  * Training is deterministic ([[KMeans.train]]: seeded init, fixed iters),
  * so a captured codebook lets an independent engine replicate encoding
  * and scoring bit-for-bit — which is exactly how the q64 oracle checks
  * this operator.
  */
object ProductQuantization {

  /** Per-subspace codebooks: `codebooks(sub)(cell)` is a subDim-length
    * centroid. `dim = m * subDim` must hold for encoded vectors.
    */
  final case class PQCodebook(subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
  }

  /** Train m Lloyd codebooks of k cells each over `df(vecCol)`'s subvector
    * slices. Driver state: m × k × subDim doubles — the codebook a real PQ
    * index persists. `dim` is the (fixed) vector dimensionality; it must be
    * divisible by `m`.
    *
    * All m subspaces train TOGETHER — seeding AND iterating are each ONE
    * distributed pass over the corpus. Seeds are the k subvectors with the
    * smallest xxhash64 rendering per subspace (the same deterministic rule
    * as [[KMeans.train]]), selected in a single pass by the
    * payload-carrying bounded heap ([[graft.functions.TopKRowsByScore]]:
    * score = −hash, tie-break on the exact hash, subvector rides as the
    * payload — no join-back, no per-subspace scans). Each Lloyd iteration
    * then explodes every vector into its m (subspace, cell, subvector)
    * assignments and partial-aggregates per (subspace, cell). Total corpus
    * passes: 1 + iters, versus m × (1 + iters) for independent training.
    */
  def train(
      df: DataFrame,
      vecCol: Column,
      dim: Int,
      m: Int = 4,
      k: Int = 16,
      iters: Int = 3): PQCodebook = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val subDim = dim / m
    val v = vecCol.cast("array<double>")
    val vecs = df.select(v.as("v")).where(v.isNotNull)
    def sub(s: Int): Column = slice(col("v"), s * subDim + 1, subDim)

    // deterministic per-subspace seeds (same rule as KMeans.train: the k
    // smallest-xxhash subvectors), all m subspaces selected in ONE pass.
    // −hash as a double is order-preserving (rounding is monotone) and the
    // exact hash is the heap's tie-break id, so selection is exact.
    import graft.functions.TopKRowsByScore
    val seedPackets = vecs
      .select(explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"), sub(s).as("sv"))): _*)).as("p"))
      .select(col("p.sub").as("sub"),
        xxhash64(col("p.sv").cast("string")).as("h"), col("p.sv").as("sv"))
      .groupBy("sub")
      .agg(TopKRowsByScore.topKRows(
        -col("h").cast("double"), col("h"), col("sv"), k).as("seeds"))
      .collect()
    val codebooks: Array[Array[Array[Double]]] = Array.ofDim(m)
    seedPackets.foreach { r =>
      codebooks(r.getInt(0)) = r.getSeq[org.apache.spark.sql.Row](1)
        .map(_.getSeq[Double](2).toArray).toArray
    }
    require(codebooks.forall(cb => cb != null && cb.nonEmpty),
      "PQ training needs a non-empty vector column")

    import graft.functions.CentroidFunctions
    for (_ <- 1 to iters) {
      // one pass: every vector contributes m (subspace, cell, subvector)
      // rows; the update is a single partial-aggregated groupBy
      val probes = (0 until m).map { s =>
        struct(lit(s).as("sub"),
          element_at(CentroidFunctions.nearestCentroids(sub(s), codebooks(s), 1), 1)
            .as("cell"),
          sub(s).as("sv"))
      }
      val sums = vecs
        .select(explode(array(probes: _*)).as("p"))
        .groupBy(col("p.sub"), col("p.cell"))
        .agg(count(lit(1)).as("n"), CentroidFunctions.vecSum(col("p.sv")).as("s"))
        .collect()
      val next = codebooks.map(_.map(_.clone()))
      sums.foreach { r =>
        val (s, cell) = (r.getInt(0), r.getInt(1))
        val n = r.getLong(2).toDouble
        next(s)(cell) = r.getSeq[Double](3).map(_ / n).toArray
      }
      for (s <- 0 until m; c <- codebooks(s).indices) codebooks(s)(c) = next(s)(c)
    }
    PQCodebook(subDim, codebooks)
  }

  /** `m`-byte PQ codes (as `array<int>`, one cell id per subspace) for a
    * vector column. Pure projection — no shuffle; the nearest-cell search
    * per subspace is the same codegen expression k-means assignment uses.
    */
  def encode(vec: Column, cb: PQCodebook): Column = {
    val v = vec.cast("array<double>")
    array((0 until cb.m).map { s =>
      KMeans.assignCell(slice(v, s * cb.subDim + 1, cb.subDim), cb.codebooks(s))
    }: _*)
  }

  /** PQ-reconstructed vector from a codes column: per subspace, the coded
    * centroid, concatenated. The codebook is one nested-array literal.
    */
  def decode(codes: Column, cb: PQCodebook): Column = {
    val cbLit = typedlit(cb.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    flatten(transform(codes, (code, s) =>
      element_at(element_at(cbLit, s + 1), code + 1)))
  }

  /** The per-query ADC lookup table (Jégou et al. §V.A): an m×k nested
    * array where `lut[s][c] = dot(q_sub_s, codebooks(s)(c))`. Computed as
    * a projection on the QUERY side — batch-sized, so the m·k·subDim
    * multiplies happen once per query, not once per scanned row. Entry
    * `(s, c)` is the exact partial dot [[adcLookupScore]] will look up,
    * evaluated by the same codegen dot kernel over the same slice order
    * the decode-then-dot formulation used.
    */
  def adcTable(qvec: Column, cb: PQCodebook): Column = {
    val v = qvec.cast("array<double>")
    array((0 until cb.m).map { s =>
      array((0 until cb.k).map { c =>
        GraftFunctions.vecDot(slice(v, s * cb.subDim + 1, cb.subDim),
          typedlit(cb.codebooks(s)(c).toSeq))
      }: _*)
    }: _*)
  }

  /** The ADC scan kernel: score a coded row with m array lookups + adds
    * against a per-query [[adcTable]] — no reconstruction, no full-dim
    * dot (a ~dim/m constant-factor cut on the per-row work). `prefix`
    * terms (e.g. IVF's per-cell coarse dot) fold in FIRST, so the sum
    * associates `(((prefix + p₀) + p₁) + …)` — fixed left-to-right
    * subspace order, which is what lets an oracle replay the FP sum
    * exactly.
    */
  def adcLookupScore(lut: Column, codes: Column, m: Int,
      prefix: Seq[Column] = Nil): Column =
    (prefix ++ (0 until m).map(s =>
      element_at(element_at(lut, s + 1), element_at(codes, s + 1) + 1)))
      .reduce(_ + _)

  /** Asymmetric (query-exact, candidate-coded) inner-product top-k.
    * Expects `queries(qid, qvec)` and `encoded(nid, codes)` (from
    * [[encode]]). Scores come from the classic ADC lookup-table
    * formulation: the m×k partial-dot table ([[adcTable]]) is computed
    * once per query on the broadcast side, and each candidate row costs
    * m lookups + adds ([[adcLookupScore]]) — identical arithmetic to
    * dot(query, reconstruction), with the sum associated per subspace.
    * Selection is the bounded-heap aggregate (no sort of the scored
    * stream). Returns `(qid, nid, score, rnk)`.
    */
  def adcTopK(queries: DataFrame, encoded: DataFrame, cb: PQCodebook, k: Int): DataFrame = {
    val q = broadcast(queries
      .select(col("qid"), col("qvec").cast("array<double>").as("qv"))
      .withColumn("lut", adcTable(col("qv"), cb))
      .select(col("qid"), col("lut")))
    val scored = encoded
      .crossJoin(q)
      .select(col("qid"), col("nid"),
        adcLookupScore(col("lut"), col("codes"), cb.m).as("score_raw"))
    Similarity.heapSelect(scored, k)
  }
}
