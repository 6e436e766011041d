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
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

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
