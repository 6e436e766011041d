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

  /** Fixed-width histogram of a numeric column — the length/score
    * distribution view every corpus report includes.
    *
    * Two jobs: a (min, max) aggregate (two doubles to the driver), then
    * bucket assignment as a codegen expression feeding one
    * partial-aggregated count — the value stream shuffles as (bucket,
    * partial count) rows, bytes per partition. Values at `max` clamp into
    * the last bucket; only non-empty buckets return.
    *
    * Returns `(bucket, lo, hi, cnt)` with `lo`/`hi` the bucket bounds.
    */
  def histogram(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be > 0")
    val v = col(valueCol).cast("double")
    val Array(lo, hi) = df.filter(v.isNotNull)
      .agg(min(v), max(v)).collect()(0) match {
      case r if r.isNullAt(0) =>
        throw new IllegalArgumentException(s"histogram($valueCol): no non-null values")
      case r => Array(r.getDouble(0), r.getDouble(1))
    }
    val width = (hi - lo) / nBuckets
    val bucket =
      if (width == 0.0) lit(0L) // constant column: everything in bucket 0
      else least(lit(nBuckets - 1L), floor((v - lo) / width)).cast("long")
    df.filter(v.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bucket"),
        round(lit(lo) + col("bucket") * width, 4).as("lo"),
        round(lit(lo) + (col("bucket") + 1) * width, 4).as("hi"),
        col("cnt"))
  }
}
