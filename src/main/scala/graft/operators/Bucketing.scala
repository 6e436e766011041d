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

  /** Small-file compaction for a partitioned layout: incremental appends
    * (streaming `foreachBatch`, [[graft.operators.IvfIndex]]/
    * [[graft.operators.IvfPq]] `append`) accumulate one-or-more files
    * per batch per partition, and at 100 TB the file COUNT — not the
    * bytes — eventually dominates planning (listing, footer reads, task
    * scheduling all scale with it). Rewrite the layout with
    * `targetFileBytes`-sized output files per partition dir.
    *
    * Shape: ONE scan of the layout, repartitioned by the partition
    * columns plus a within-partition slice index derived from the
    * current file sizes (total partition bytes / target), then a
    * partitioned overwrite into a fresh directory — never in place, so a
    * failed compaction leaves the source untouched (swap directories on
    * success; at scale, atomically via a metastore location update).
    * Data is preserved byte-for-byte (spec-checked); only the file
    * grouping changes.
    */
  def compactPartitioned(
      spark: SparkSession,
      dir: String,
      outDir: String,
      partitionCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    require(partitionCols.nonEmpty, "compactPartitioned needs partition columns")
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    import org.apache.spark.sql.functions._
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Never in place — ENFORCED, not just documented. mode("overwrite")
    // deletes outDir first, so outDir==dir would destroy the layout the
    // lazy scan is still reading, and either path nested in the other is
    // the same accident one level down.
    val qIn = fs.makeQualified(root).toUri.getPath.stripSuffix("/") + "/"
    val outRoot = new org.apache.hadoop.fs.Path(outDir)
    val qOut = outRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(outRoot).toUri.getPath.stripSuffix("/") + "/"
    require(!qIn.startsWith(qOut) && !qOut.startsWith(qIn),
      s"compactPartitioned must write to a fresh directory, never in place " +
        s"(in=$qIn out=$qOut)")
    val df = spark.read.parquet(dir)
    // Per-partition-DIR byte totals from the file system listing (driver
    // metadata, no data scan): each dir gets its own slice count
    // ceil(dirBytes / target), so a partition below the target collapses
    // to ONE file while a hot partition fans out to just enough writers.
    // A single global slice count would shatter small partitions into
    // `slices` shards each — the very problem being fixed.
    val files = fs.listFiles(root, true)
    val dirBytes = scala.collection.mutable.Map.empty[String, Long]
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val d = f.getPath.getParent.toUri.getPath
        dirBytes(d) = dirBytes.getOrElse(d, 0L) + f.getLen
      }
    }
    val sliceOf: Map[String, Long] = dirBytes.toMap.map { case (d, b) =>
      d -> math.max(1L, (b + targetFileBytes - 1) / targetFileBytes)
    }
    // Each row's source DIRECTORY via the _metadata.file_path column —
    // the same string family the listing produced, so hive-escaped
    // values, __HIVE_DEFAULT_PARTITION__ nulls, and partition-type
    // inference ("01" read back as 1) all match byte-for-byte, where a
    // key rebuilt from col(c).cast("string") would not. Both sides are
    // normalized to the scheme-less URI path.
    val dirCol = regexp_replace(
      regexp_replace(col("_metadata.file_path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"),
      "/[^/]*$", "")
    val sliceN = coalesce(element_at(typedlit(sliceOf), dirCol), lit(1L))
    val sliced = df.withColumn("__slice",
      pmod(xxhash64(struct(df.columns.map(col): _*)), sliceN))
    // (partitionCols, __slice) hash-routes each dir's rows to its
    // sliceN writer groups; co-located groups of the same dir merge
    // into one (larger) file — file sizes land in [target, ~2×target]
    sliced
      .repartition((partitionCols.map(col) :+ col("__slice")): _*)
      .drop("__slice")
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(outDir)
  }
}
