package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKByScore

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
}
