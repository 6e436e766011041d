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

  /** Lloyd k-means over MANY groups at once — each iteration is ONE
    * distributed pass over the union, however many groups there are.
    * Semantically identical to calling [[train]] once per group on that
    * group's rows (same deterministic smallest-hash seeding, same update
    * arithmetic, empty cells keep their previous centroid), but the job
    * count is group-count-independent: seeding is one windowed pass,
    * every iteration one `groupBy(g, cell)` aggregate. This is what lets
    * [[DiskIvfIndex.rebalance]] split N hot cells without driver-pacing
    * N separate training chains.
    *
    * Per-row assignment dispatches on the row's group via a `when` chain —
    * each branch carries its group's codebook as one reference object
    * (the [[graft.functions.NearestCentroids]] plan-size discipline), so
    * the plan stays O(groups) nodes, not O(groups × k × dim) literals.
    *
    * Groups with fewer than `k` rows get that many centroids. Returns
    * group → (≤k) × dim centroids.
    */
  def trainPerGroup(
      df: DataFrame,
      groupCol: Column,
      vecCol: Column,
      k: Int,
      iters: Int = 5): Map[Int, Array[Array[Double]]] = {
    import org.apache.spark.sql.expressions.Window
    val vecs = df
      .select(groupCol.cast("int").as("g"), vecCol.cast("array<double>").as("v"))
      .where(vecCol.isNotNull)
    // seeds: the k smallest-hash vectors WITHIN each group (one pass; the
    // collect is bounded by groups × k codebook rows, never corpus rows)
    val seeds = vecs
      .withColumn("h", xxhash64(col("v").cast("string")))
      .withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy("h")))
      .filter(col("rn") <= k)
      .select("g", "rn", "v").collect()
    var cents: Map[Int, Array[Array[Double]]] = seeds
      .groupBy(_.getInt(0)).map { case (g, rows) =>
        g -> rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      }
    if (cents.isEmpty) return cents
    def assignExpr(c: Map[Int, Array[Array[Double]]]): Column = {
      val gs = c.keys.toSeq.sorted
      gs.tail.foldLeft(
        when(col("g") === gs.head, assignCell(col("v"), c(gs.head)))) {
        (acc, g) => acc.when(col("g") === g, assignCell(col("v"), c(g)))
      }
    }
    for (_ <- 1 to iters) {
      val sums = vecs
        .withColumn("cell", assignExpr(cents))
        .groupBy("g", "cell")
        .agg(count(lit(1)).as("n"), CentroidFunctions.vecSum(col("v")).as("s"))
        .collect()
      val next = cents.map { case (g, cs) => g -> cs.map(_.clone()) }
      sums.foreach { r =>
        val g = r.getInt(0)
        val cell = r.getInt(1)
        val n = r.getLong(2).toDouble
        val s = r.getSeq[Double](3)
        next(g)(cell) = s.map(_ / n).toArray
      }
      cents = next
    }
    cents
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
