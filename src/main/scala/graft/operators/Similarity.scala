package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over embedding columns.
  *
  * The brute-force path is the correctness baseline: broadcast the (small)
  * query side, score every candidate with the codegen'd cosine expression,
  * keep top-k per query. The scan over candidates is embarrassingly
  * parallel and the only shuffle is the per-query top-k selection — at
  * 100 TB the scored-candidate stream is what matters, and it never
  * materializes more than the scan itself.
  *
  * [[ivfTopK]] is the scale path: coarse-quantize candidates into `nlist`
  * cells (offline k-means in real pipelines; hash-binning here), probe only
  * the closest `nprobe` cells per query — a pre-filter that cuts scored
  * candidates by ~nlist/nprobe while reusing the same scoring kernel.
  */
object Similarity {

  /** Expects `queries(qid, qvec)` and `candidates(nid, nvec)`.
    * Returns `(qid, nid, score, rnk)`, `rnk <= k`, deterministic tiebreak
    * on `nid`.
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

  /** Same contract as [[bruteForceTopK]], but the per-query selection runs
    * through the bounded-heap [[graft.functions.TopKByScore]] aggregate
    * instead of a Window sort: partial aggregation reduces every map task
    * to ≤k rows per query *before* the shuffle, and no global sort of the
    * scored stream ever happens. This is the formulation that survives
    * 100 TB of candidates.
    */
  def bruteForceTopKHeap(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("qid"), col("qvec").cast("array<double>").as("qv")))
    val scored = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"))
      .crossJoin(q)
      .select(col("qid"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    scored.groupBy("qid")
      .agg(graft.functions.TopKByScore.topK(col("score_raw"), col("nid"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.id").as("nid"),
        round(col("col.score"), 4).as("score"), (col("pos") + 1).as("rnk"))
  }

  /** Metadata-filtered top-k — the reference's flagship search semantic:
    * each query row carries its own `filter` JSON (reference `cfg.py:33`)
    * that must admit a candidate's `metadata` before it is scored.
    *
    * Expects `queries(qid, qvec, filter)` (filter: JSON string or null =
    * match-all) and `candidates(nid, nvec, metadata)` (metadata: JSON
    * string). The filter is data, so it cannot be compiled into the plan;
    * [[graft.functions.JsonFilterMatch]] interprets it per pair inside the
    * whole-stage-codegen'd scoring scan, *before* the cosine kernel runs —
    * filtered-out candidates are never scored. Selection uses the
    * bounded-heap aggregate, so the shuffle carries ≤ k rows per query per
    * map task regardless of corpus size.
    */
  def filteredTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("qid"), col("qvec").cast("array<double>").as("qv"), col("filter")))
    val scored = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"), col("metadata"))
      .crossJoin(q)
      .filter(GraftFunctions.jsonFilterMatch(col("filter"), col("metadata")))
      .select(col("qid"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    scored.groupBy("qid")
      .agg(graft.functions.TopKByScore.topK(col("score_raw"), col("nid"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.id").as("nid"),
        round(col("col.score"), 4).as("score"), (col("pos") + 1).as("rnk"))
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
      .withColumn("score_raw", GraftFunctions.vecCosine(col("qv"), col("v")))
    val w = Window.partitionBy("qid").orderBy(col("score_raw").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), round(col("score_raw"), 4).as("score"), col("rnk"))
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
      .withColumn("score_raw", GraftFunctions.vecCosine(col("qv"), col("v")))
    val w = Window.partitionBy("qid").orderBy(col("score_raw").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), round(col("score_raw"), 4).as("score"), col("rnk"))
  }
}
