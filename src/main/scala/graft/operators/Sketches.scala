package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB defaults.
  *
  * Exact distinct-count shuffles every distinct key; exact percentiles sort
  * every group. Both sketches below are mergeable (map-side partial
  * aggregation, constant-size state per group), so cost is one scan plus a
  * sketch-sized shuffle regardless of cardinality. Accuracy is checked
  * against exact results in `SketchesSpec` (they are deliberately NOT in
  * the DuckDB oracle gate: HLL/KLL implementations differ across engines).
  */
object Sketches {

  /** HyperLogLog++ distinct count, `rsd` relative standard deviation. */
  def approxDistinct(df: DataFrame, valueCol: Column, groupCols: Seq[Column],
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(approx_count_distinct(valueCol, rsd).as("approx_distinct"))

  /** Quantile sketch per group, `accuracy` = 1/precision (10000 ≈ 0.01%). */
  def approxQuantiles(df: DataFrame, valueCol: Column, groupCols: Seq[Column],
      probabilities: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(percentile_approx(
        valueCol,
        array(probabilities.map(lit): _*),
        lit(accuracy)).as("approx_quantiles"))

  /** Reusable HLL sketch column (mergeable across batches/partitions):
    * `hll_sketch_agg` produces a binary sketch that `hll_union_agg` can
    * fold incrementally — the shape for maintaining distinct counts over a
    * growing 100 TB corpus without rescanning history.
    */
  def hllSketch(df: DataFrame, valueCol: Column, groupCols: Seq[Column]): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(hll_sketch_agg(valueCol).as("hll_sketch"))

  def hllUnionEstimate(sketches: DataFrame, sketchCol: Column,
      groupCols: Seq[Column]): DataFrame =
    sketches.groupBy(groupCols: _*)
      .agg(hll_sketch_estimate(hll_union_agg(sketchCol)).as("distinct_estimate"))

  /** Frequent items per group via Misra–Gries ([[graft.functions
    * .HeavyHittersAgg]]): ≤ `k` counters per group per map task, merged
    * sketch-wise — the shuffle carries O(k) per group no matter how many
    * item instances the corpus holds. Guarantee (not exactness) is the
    * contract: every item with frequency > n/(k+1) is reported, and
    * estimates undercount by at most n/(k+1). Exact `groupBy(item)`
    * counting shuffles every distinct item; at 100 TB the per-source
    * "what dominates this crawl" question wants exactly this sketch. */
  def heavyHitters(df: DataFrame, itemCol: Column, groupCols: Seq[Column],
      k: Int): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(graft.functions.HeavyHittersAgg.heavyHitters(itemCol, k)
        .as("heavy_hitters"))
}
