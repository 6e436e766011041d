package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CentroidFunctions

/** DataFrame-native Lloyd k-means for IVF coarse quantization.
  *
  * Each iteration is one distributed pass: vectors are assigned to their
  * nearest centroid by the [[graft.functions.NearestCentroids]] expression
  * (the codebook rides along as ONE `double[][]` reference object — plans
  * stay O(1) in k × dim instead of folding k × dim literals into the tree,
  * which costs seconds of data-independent Catalyst/janino overhead per
  * iteration), and the centroid update is a single partial-aggregated
  * `groupBy(cell).agg(vec_sum)` ([[graft.functions.VectorSumAgg]]).
  * Driver state per iteration is exactly k × dim doubles — what a real ANN
  * index stores as its coarse codebook. Candidate rows never collect.
  */
object KMeans {

  /** Nearest-centroid id for a (float/double array) vector column. */
  def assignCell(vec: Column, centroids: Array[Array[Double]]): Column =
    element_at(CentroidFunctions.nearestCentroids(vec, centroids, 1), 1)

  /** The query's `nprobe` nearest cells, closest first. */
  def probeCells(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    CentroidFunctions.nearestCentroids(vec, centroids, nprobe)

  /** Lloyd iterations over `df(vecCol)` (array<float|double>).
    * Initialization is deterministic: the k vectors with the smallest
    * xxhash64 of their rendering — a seeded pseudo-random sample that is
    * reproducible across runs. Empty cells keep their previous centroid.
    * Returns k × dim centroids.
    */
  def train(
      df: DataFrame,
      vecCol: Column,
      k: Int,
      iters: Int = 5): Array[Array[Double]] = {
    val vecs = df.select(vecCol.cast("array<double>").as("v")).where(vecCol.isNotNull)

    var centroids: Array[Array[Double]] = vecs
      .withColumn("h", xxhash64(col("v").cast("string")))
      .orderBy("h").limit(k)
      .select("v").collect()
      .map(_.getSeq[Double](0).toArray)

    for (_ <- 1 to iters) {
      val sums = vecs
        .withColumn("cell", assignCell(col("v"), centroids))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), CentroidFunctions.vecSum(col("v")).as("s"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val cell = r.getInt(0)
        val n = r.getLong(1).toDouble
        val s = r.getSeq[Double](2)
        next(cell) = s.map(_ / n).toArray
      }
      centroids = next
    }
    centroids
  }

  /** Mean squared distance of every vector to its assigned centroid —
    * the quantity Lloyd iterations minimize; used to verify convergence.
    */
  def sse(df: DataFrame, vecCol: Column, centroids: Array[Array[Double]]): Double =
    df.where(vecCol.isNotNull)
      .select(avg(CentroidFunctions.nearestCentroidDist(
        vecCol.cast("array<double>"), centroids)))
      .head().getDouble(0)
}
