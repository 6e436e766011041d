package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** OPQ — Optimized Product Quantization (Ge et al., "Optimized Product
  * Quantization for Approximate Nearest Neighbor Search", CVPR 2013):
  * learn an orthogonal rotation R that re-axes the data before PQ so the
  * axis-aligned subspace grid captures cross-dimension correlation and
  * variance imbalance, minimizing ‖R·v − decode(encode(R·v))‖².
  * Alternating optimization:
  *
  *   1. fix R  → train PQ codebooks on the rotated sample;
  *   2. fix codes → solve the orthogonal Procrustes problem
  *      R* = argmin_R Σᵢ‖R·xᵢ − ŷᵢ‖² = U·Vᵀ, where Ŷ·Xᵀ = U·Σ·Vᵀ (SVD)
  *      and ŷᵢ is the PQ reconstruction of the previous rotation's code.
  *
  * Training runs on a DRIVER-SIDED SAMPLE — the production posture for
  * every PQ-family trainer (codebooks are corpus-size-independent
  * statistics; FAISS trains OPQ on ~10⁵ sample vectors regardless of
  * corpus size). The corpus-wide work is only [[rotate]] (a codegen'd
  * matrix–vector projection, one map stage) plus the standard
  * [[ProductQuantization.encode]]; at 100 TB both are single-pass and
  * shuffle-free, and the d×d rotation (64×64 doubles ≈ 32 KB) rides into
  * the plan as one literal.
  *
  * Rotated coordinates are rounded to 9 decimals ([[RotateScale]]) on the
  * engine side AND in the oracle replay — a determinism firewall: the
  * two engines' dot products agree to ~1e-15, so quantizing at 1e-9 makes
  * every downstream argmin/rank decision bit-identical across engines
  * while perturbing the geometry by an amount that cannot move recall.
  *
  * No reference analogue (the reference ships vectors to a server); this
  * is index-build machinery for the Spark-side ANN stack, composing with
  * [[ProductQuantization.adcTopK]] unchanged — OPQ is a pre-rotation, not
  * a new scorer.
  */
object Opq {

  /** Decimal places rotated coordinates are quantized to (engine and
    * oracle both) — see the determinism-firewall note above. */
  val RotateScale = 9

  final case class OpqModel(r: Array[Array[Double]], pq: ProductQuantization.PQCodebook) {
    def dim: Int = r.length
  }

  /** `R · v` as a projection column, each output coordinate rounded to
    * [[RotateScale]] decimals. d codegen dot kernels over one d×d literal
    * — no shuffle, no UDF; at 100 TB this is a map stage fused into
    * whatever scan feeds it.
    */
  def rotate(vec: Column, r: Array[Array[Double]]): Column = {
    val v = vec.cast("array<double>")
    array(r.map(row =>
      round(GraftFunctions.vecDot(typedlit(row.toSeq), v), RotateScale)): _*)
  }

  /** Deterministic driver-sized sample: the `maxSample` rows with the
    * smallest `xxhash64(vector)` — one bounded-heap pass, stable across
    * partitioning, corpus-size-independent driver memory. The same
    * smallest-hash rule the distributed trainers seed with.
    */
  def sampleVectors(df: DataFrame, vecCol: Column, maxSample: Int): Array[Array[Double]] = {
    val v = vecCol.cast("array<double>")
    df.select(v.as("v")).where(v.isNotNull)
      .orderBy(xxhash64(col("v").cast("string")), col("v").cast("string"))
      .limit(maxSample)
      .collect()
      .map(_.getSeq[Double](0).toArray)
  }

  /** Train rotation + codebooks on a driver-resident sample. Deterministic:
    * fixed iteration counts, deterministic k-means init (first k distinct
    * subvectors in sample order), LAPACK SVD of an input that is itself a
    * deterministic function of the sample.
    */
  def train(
      sample: Array[Array[Double]],
      m: Int,
      k: Int = 16,
      pqIters: Int = 3,
      opqIters: Int = 3): OpqModel = {
    require(sample.nonEmpty, "OPQ training needs a non-empty sample")
    val d = sample.head.length
    require(d % m == 0, s"dim=$d must be divisible by m=$m")
    // Identity init would be a fixed point of the alternation: with ŷ an
    // axis-aligned quantization of x, M = Σ ŷ·xᵀ is symmetric PSD, its SVD
    // has U = V, and Procrustes returns I forever. The paper's parametric
    // init breaks that: rotate into the PCA basis with eigenvalues
    // greedily PRODUCT-balanced across subspaces (2-D distortion of a
    // k-cell quantizer scales with √(λ₁λ₂), so balancing the per-subspace
    // eigenvalue products equalizes — and thereby minimizes — the total),
    // then let the alternation refine non-parametrically.
    var r = if (opqIters > 0) pcaAllocationInit(sample, m)
      else Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var pq: ProductQuantization.PQCodebook = null
    for (_ <- 0 until opqIters) {
      val rotated = sample.map(matVec(r, _))
      pq = localPqTrain(rotated, m, k, pqIters)
      val recon = rotated.map(x => localDecode(localEncode(x, pq), pq))
      r = procrustes(sample, recon)
    }
    val rotated = sample.map(matVec(r, _))
    pq = localPqTrain(rotated, m, k, pqIters)
    OpqModel(r, pq)
  }

  /** [[sampleVectors]] + [[train]] in one call — the distributed entry. */
  def trainOnSample(
      df: DataFrame,
      vecCol: Column,
      m: Int,
      k: Int = 16,
      pqIters: Int = 3,
      opqIters: Int = 3,
      maxSample: Int = 65536): OpqModel =
    train(sampleVectors(df, vecCol, maxSample), m, k, pqIters, opqIters)

  /** Mean squared reconstruction error of a PQ codebook over a
    * driver-resident sample — the quantity OPQ minimizes; used by the
    * specs to prove the rotation EARNS its place (error strictly below
    * plain PQ's on anisotropic data).
    */
  def quantizationMse(
      sample: Array[Array[Double]],
      pq: ProductQuantization.PQCodebook,
      r: Option[Array[Array[Double]]] = None): Double = {
    val pts = r.fold(sample)(rot => sample.map(matVec(rot, _)))
    val errs = pts.map { x =>
      val y = localDecode(localEncode(x, pq), pq)
      var s = 0.0
      var i = 0
      while (i < x.length) { val dlt = x(i) - y(i); s += dlt * dlt; i += 1 }
      s
    }
    errs.sum / errs.length
  }

  // ---- driver-side kernels (sample-sized inputs only) ----

  private def matVec(r: Array[Array[Double]], v: Array[Double]): Array[Double] =
    r.map { row =>
      var s = 0.0
      var i = 0
      while (i < v.length) { s += row(i) * v(i); i += 1 }
      s
    }

  /** Plain Lloyd per subspace on the (sample-sized) rotated points.
    * Init: first k DISTINCT subvectors in sample order; empty cells keep
    * their previous centroid — both standard and deterministic.
    */
  private def localPqTrain(
      pts: Array[Array[Double]], m: Int, k: Int, iters: Int): ProductQuantization.PQCodebook = {
    val d = pts.head.length
    val subDim = d / m
    val codebooks = Array.tabulate(m) { s =>
      val subs = pts.map(_.slice(s * subDim, (s + 1) * subDim))
      val init = subs.map(_.toSeq).distinct.take(k).map(_.toArray).toArray
      val cb = if (init.length >= k) init
        else init ++ Array.fill(k - init.length)(init.head.clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(k, subDim)(0.0)
        val counts = Array.fill(k)(0L)
        subs.foreach { sv =>
          val c = nearestCell(sv, cb)
          counts(c) += 1
          var i = 0
          while (i < subDim) { sums(c)(i) += sv(i); i += 1 }
        }
        for (c <- 0 until k if counts(c) > 0; i <- 0 until subDim)
          cb(c)(i) = sums(c)(i) / counts(c)
      }
      cb
    }
    ProductQuantization.PQCodebook(subDim, codebooks)
  }

  private def nearestCell(sv: Array[Double], cb: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      var s = 0.0
      var i = 0
      while (i < sv.length) { val dlt = sv(i) - cb(c)(i); s += dlt * dlt; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  private[operators] def localEncode(
      x: Array[Double], pq: ProductQuantization.PQCodebook): Array[Int] =
    Array.tabulate(pq.m)(s =>
      nearestCell(x.slice(s * pq.subDim, (s + 1) * pq.subDim), pq.codebooks(s)))

  private[operators] def localDecode(
      codes: Array[Int], pq: ProductQuantization.PQCodebook): Array[Double] =
    codes.zipWithIndex.flatMap { case (c, s) => pq.codebooks(s)(c) }

  /** The OPQ paper's parametric initialization: PCA basis with the
    * eigenvalues allocated greedily to subspaces so per-subspace
    * eigenvalue PRODUCTS balance (largest remaining λ goes to the
    * non-full bucket with the smallest log-product). Output row i of R
    * is the eigenvector its bucket slot received — orthogonal because
    * the eigenvector basis is.
    */
  private def pcaAllocationInit(
      sample: Array[Array[Double]], m: Int): Array[Array[Double]] = {
    import breeze.linalg.{eigSym, DenseMatrix}
    val d = sample.head.length
    val subDim = d / m
    val n = sample.length
    val mean = new Array[Double](d)
    sample.foreach { x =>
      var i = 0
      while (i < d) { mean(i) += x(i); i += 1 }
    }
    var i = 0
    while (i < d) { mean(i) /= n; i += 1 }
    val cov = DenseMatrix.zeros[Double](d, d)
    sample.foreach { x =>
      var a = 0
      while (a < d) {
        var b = 0
        while (b < d) { cov(a, b) += (x(a) - mean(a)) * (x(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    val es = eigSym(cov)
    val idxDesc = (0 until d).sortBy(c => -es.eigenvalues(c))
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val logProd = Array.fill(m)(0.0)
    idxDesc.foreach { c =>
      val open = (0 until m).filter(buckets(_).length < subDim)
      val b = open.minBy(t => (logProd(t), t))
      buckets(b) += c
      logProd(b) += math.log(math.max(es.eigenvalues(c), 1e-12))
    }
    val order = buckets.flatten.toArray
    Array.tabulate(d, d)((out, in) => es.eigenvectors(in, order(out)))
  }

  /** R* = argmin_{RᵀR=I} Σᵢ‖R·xᵢ − ŷᵢ‖² = U·Vᵀ from SVD(Ŷ·Xᵀ). */
  private def procrustes(
      xs: Array[Array[Double]], ys: Array[Array[Double]]): Array[Array[Double]] = {
    import breeze.linalg.{svd, DenseMatrix}
    val d = xs.head.length
    val mAcc = DenseMatrix.zeros[Double](d, d)
    var n = 0
    while (n < xs.length) {
      val x = xs(n)
      val y = ys(n)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { mAcc(i, j) += y(i) * x(j); j += 1 }
        i += 1
      }
      n += 1
    }
    val res = svd(mAcc)
    val rMat = res.U * res.Vt
    Array.tabulate(d, d)((i, j) => rMat(i, j))
  }
}
