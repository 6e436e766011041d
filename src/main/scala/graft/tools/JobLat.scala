package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch: raw local-mode job-scheduling latency probe. */
object JobLat {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (_ <- 1 to 5) spark.range(1000000).selectExpr("sum(id)").collect()
    var t0 = System.nanoTime()
    for (_ <- 1 to 30) spark.range(100).repartition(32).count()
    println(f"PROBE shuffle-job avg ms: ${(System.nanoTime() - t0) / 30 / 1e6}%.1f")
    t0 = System.nanoTime()
    for (_ <- 1 to 30) spark.range(100).count()
    println(f"PROBE simple-job avg ms: ${(System.nanoTime() - t0) / 30 / 1e6}%.1f")
    spark.stop()
  }
}
