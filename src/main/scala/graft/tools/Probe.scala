package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe (kept out of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.sources.Events.normalize(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    ev.printSchema()
    ev.show(3, false)
    spark.stop()
  }
}
