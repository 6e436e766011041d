package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TopKByScore, TopKRowsByScore}

/** Per-group top-k selection for curation: "keep the best N documents per
  * language / domain / source" — the selection step after quality scoring.
  *
  * Same scale discipline as search selection ([[Similarity]]): the
  * bounded-heap [[TopKByScore]] aggregate reduces every map task to ≤k
  * rows per group BEFORE the shuffle, so cost is O(#groups × k × #tasks)
  * and no sort of the scored corpus ever appears in the plan — a Window
  * would sort each group's full row set.
  */
object Ranking {

  /** Top-`k` ids per group by score (ties broken toward the smaller id).
    * Returns `(group, id, score, rnk)` with `score` rounded to 4 decimals.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCol: Column,
      idCol: Column,
      scoreCol: Column,
      k: Int): DataFrame =
    df.select(groupCol.as("group"), idCol.as("id"),
        scoreCol.cast("double").as("score_raw"))
      .groupBy("group")
      .agg(TopKByScore.topK(col("score_raw"), col("id"), k).as("tk"))
      .select(col("group"), posexplode(col("tk")))
      .select(col("group"), col("col.id").as("id"),
        round(col("col.score"), 4).as("score"), (col("pos") + 1).as("rnk"))

  /** Payload-carrying per-group top-k: like [[topKPerGroup]], but the
    * selected rows' data (`payload` — typically a struct of the columns
    * the caller wants) comes back WITH the selection, eliminating the
    * join-back stage a bare-id selection needs. The payload never enters
    * the heap comparisons; shuffle bytes grow only by the payload size of
    * the ≤k kept rows per group per task.
    */
  def topKRowsPerGroup(
      df: DataFrame,
      groupCol: Column,
      idCol: Column,
      scoreCol: Column,
      payload: Column,
      k: Int): DataFrame =
    df.select(groupCol.as("group"), idCol.as("id"),
        scoreCol.cast("double").as("score_raw"), payload.as("payload"))
      .groupBy("group")
      .agg(TopKRowsByScore.topKRows(
        col("score_raw"), col("id"), col("payload"), k).as("tk"))
      .select(col("group"), posexplode(col("tk")))
      .select(col("group"), col("col.id").as("id"),
        round(col("col.score"), 4).as("score"),
        col("col.payload").as("payload"), (col("pos") + 1).as("rnk"))

  /** Reciprocal-rank fusion of per-query rankings — the standard combiner
    * for hybrid retrieval (dense ∪ sparse ∪ keyword): each ranking
    * contributes `1/(c + rank)` per (query, candidate) and the fused lists
    * are re-ranked on the summed score. Rank-based, so modalities with
    * incomparable score scales fuse without calibration — the property
    * that makes RRF the default in production hybrid search.
    *
    * Scale shape: inputs are already bounded (≤k rows per query from the
    * heap selectors), so the union + `groupBy(qid, nid)` aggregate touches
    * O(#queries × k × #rankings) rows regardless of corpus size, and the
    * final selection is the same bounded heap. Expects rankings shaped
    * `(qid, nid, rnk)`; returns `(qid, nid, score, rnk)`.
    */
  def reciprocalRankFusionPerQuery(
      rankings: Seq[DataFrame],
      k: Int,
      c: Int = 60): DataFrame = {
    require(rankings.size >= 2, "fusion needs at least two rankings")
    val contribs = rankings.map(_.select(col("qid"), col("nid"),
        (lit(1.0) / (lit(c.toDouble) + col("rnk").cast("double"))).as("contrib")))
      .reduce(_ unionByName _)
    val fused = contribs.groupBy("qid", "nid")
      .agg(sum("contrib").as("score_raw"))
    Similarity.heapSelect(fused, k)
  }
}
