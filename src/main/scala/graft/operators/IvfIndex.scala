package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Build-once / query-many IVF index over an embedding corpus.
  *
  * [[IvfIndex.build]] assigns every candidate to a cell, repartitions by
  * cell and persists — paying the corpus shuffle exactly once. Each
  * subsequent [[IvfIndex.search]] broadcasts the query batch, joins on the
  * (co-located) cell key with zero additional shuffle of the corpus, and
  * reuses the codegen cosine kernel. On a cluster the persisted frame
  * would instead be a bucketed table on `cell` (see [[Bucketing]]) so the
  * layout survives across jobs; the query-side plan is identical.
  */
final class IvfIndex private (
    private[operators] val cells: DataFrame,
    val signBits: Int) {

  /** Top-k per query; `multiProbe` adds single-bit-flip neighbor cells. */
  def search(queries: DataFrame, k: Int, multiProbe: Boolean = true): DataFrame = {
    val q0 = queries.select(col("qid"), col("qvec").cast("array<double>").as("qv"))
      .withColumn("cell0", IvfIndex.cellOf("qv", signBits))
    val probed =
      if (!multiProbe) q0.select(col("qid"), col("qv"), col("cell0").as("cell"))
      else q0.select(col("qid"), col("qv"),
        explode(transform(sequence(lit(0), lit(signBits)), i =>
          when(i === 0, col("cell0"))
            .otherwise(col("cell0").bitwiseXOR(call_function("shiftleft", lit(1), i - 1)))))
          .as("cell"))
    val scored = cells.join(broadcast(probed), "cell")
      .select(col("qid"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    Similarity.heapSelect(scored, k)
  }

  def unpersist(): Unit = cells.unpersist()
}

object IvfIndex {

  private[operators] def cellOf(vec: String, signBits: Int) =
    (0 until signBits).map { i =>
      when(element_at(col(vec), i + 1) >= 0, 1 << i).otherwise(0)
    }.reduce(_ + _)

  /** Expects `candidates(nid, nvec)`. One shuffle (repartition by cell),
    * then the layout is reused by every search.
    */
  def build(candidates: DataFrame, signBits: Int = 4): IvfIndex = {
    val cells = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"))
      .withColumn("cell", cellOf("v", signBits))
      .repartition(col("cell"))
      .persist()
    new IvfIndex(cells, signBits)
  }

  /** Data-adaptive variant: Lloyd-trained centroids instead of sign-hash
    * cells. Training is [[KMeans.train]] (`iters` distributed passes);
    * the corpus then shuffles once into cell partitions exactly like
    * [[build]]. Quality difference: trained cells follow the data's
    * density, so a given recall needs fewer probes than hash binning.
    */
  def buildTrained(
      candidates: DataFrame,
      nlist: Int = 16,
      iters: Int = 5): TrainedIvfIndex = {
    val base = candidates.select(col("nid"), col("nvec").cast("array<double>").as("v"))
    val centroids = KMeans.train(base, col("v"), nlist, iters)
    val cells = base
      .withColumn("cell", KMeans.assignCell(col("v"), centroids))
      .repartition(col("cell"))
      .persist()
    new TrainedIvfIndex(cells, centroids)
  }
}

/** IVF index with a trained coarse codebook; queries probe their `nprobe`
  * nearest cells (closest centroids first), so recall/cost is tunable per
  * search without touching the persisted layout.
  */
final class TrainedIvfIndex private[operators] (
    private[operators] val cells: DataFrame,
    val centroids: Array[Array[Double]]) {

  def search(queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    val probed = queries
      .select(col("qid"), col("qvec").cast("array<double>").as("qv"))
      .select(col("qid"), col("qv"),
        explode(KMeans.probeCells(col("qv"), centroids, nprobe)).as("cell"))
    val scored = cells.join(broadcast(probed), "cell")
      .select(col("qid"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    Similarity.heapSelect(scored, k)
  }

  def unpersist(): Unit = cells.unpersist()
}
