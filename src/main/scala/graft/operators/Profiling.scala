package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column row/null/distinct counts and
  * min/max — the "analyze" step a data-quality gate runs before a corpus
  * enters training.
  *
  * Shape: ONE aggregation job computes every column's metrics (Spark
  * plans the multi-distinct via Expand — still a single partial-aggregated
  * shuffle), then a local explode unpivots the single result row into one
  * row per column. min/max are rendered as strings so heterogeneous
  * column types unify into one frame.
  *
  * `distinct_count` here is exact (`COUNT(DISTINCT)`) so the DuckDB
  * oracle can match it bit-for-bit; at 100 TB swap in
  * `approx_count_distinct` (HLL, mergeable, constant memory — see
  * [[Sketches]]) — the plan shape is otherwise identical.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    } :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    row
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("null_count"),
        col(s"nd_$c").as("distinct_count"),
        col(s"mn_$c").as("min_value"),
        col(s"mx_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }
}
