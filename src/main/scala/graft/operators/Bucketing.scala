package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for shuffle-free repeated joins.
  *
  * A fact table joined against the same key every day re-pays its shuffle
  * on every run. Writing both sides bucketed by the join key (same bucket
  * count) makes the join a zero-exchange zip of co-located buckets —
  * at 100 TB the difference between reshuffling the corpus per query and
  * never shuffling it again. Bucketing requires saveAsTable (bucket
  * metadata lives in the catalog, not the parquet files).
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(tableName)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Hive-style partitioned layout: one directory per value. A filter on
    * the partition column prunes whole directories at planning time
    * (`PartitionFilters` on the scan, zero bytes read from pruned ones) —
    * the coarsest and cheapest data-skipping lever at 100 TB. Use
    * low-cardinality columns (lang, dt, modality); high-cardinality
    * partition keys explode the file count and kill the listing phase.
    */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(dir)
}
