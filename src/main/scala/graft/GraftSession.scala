package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session bootstrap for the graft engine.
  *
  * Encodes the scale posture once: AQE on (runtime re-planning, skew-join
  * splitting, partition coalescing), shuffle partitions sized to the
  * environment instead of the 200 default, UTC timestamps, and the
  * nanosecond-parquet compatibility flag the corpus needs. On a cluster
  * the same settings apply — only `master` and the partition count change.
  */
object GraftSession {

  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Coalesce post-shuffle partitions by SIZE, not up to the default
      // parallelism: parallelismFirst=true (the default) pins tiny shuffles
      // at `shuffle.partitions` tasks, paying per-task dispatch for
      // microseconds of work; size-based coalescing is also the documented
      // recommendation for production. At 100 TB the same setting prevents
      // over-tiny partitions after selective filters.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4m")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Reads the capacity-guard observations (bucketPairs drop counts) and
      // logs a WARN on any recall-trading drop — guards must never be silent.
      .config("spark.sql.queryExecutionListeners",
        "graft.tools.GuardMetricsListener")

  /** Local session with every graft SQL function registered. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = builder(cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
