package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.meta.DatasetMetadata
import graft.operators.Normalize
import graft.schema.PineconeSchema

/** Read path (reference S1–S4, `dataset_fsreader.py`).
  *
  * The reference reads each parquet part sequentially into pandas and
  * concatenates (`dataset_fsreader.py:98-119`); here a single
  * `spark.read.parquet(dir)` covers the whole directory of parts with a
  * parallel `FileSourceScanExec` — one split per file chunk across
  * executors — and Catalyst pushes projection/filters into the scan.
  * Hadoop `FileSystem` handles the scheme dispatch the reference does in
  * `fs.py:56-81` (local, `s3a://`, `gs://` with the proper connector).
  *
  * Edge-case parity with `_safe_read_from_path` (`dataset_fsreader.py:74-151`):
  *   - directory missing → empty DataFrame with the declared schema + warning;
  *   - directory present but no parquet files → error.
  */
object DatasetReader extends Logging {

  final case class NoParquetFilesFound(path: String)
      extends IllegalArgumentException(
        s"No parquet files found in dataset path: $path")

  def readDocuments(spark: SparkSession, datasetPath: String): DataFrame =
    readTable(spark, s"${stripSlash(datasetPath)}/documents", PineconeSchema.documentsColumns)

  def readQueries(spark: SparkSession, datasetPath: String): DataFrame =
    readTable(spark, s"${stripSlash(datasetPath)}/queries", PineconeSchema.queriesColumns)

  /** Driver-side read of `metadata.json` (S4). Tiny file — no cluster job.
    * Cloud paths route through the [[DatasetCache]] when caching is on
    * (reference gates identically: `is_cloud_path` + `use_cache`,
    * `dataset_fsreader.py:83-107`) — local paths never cache.
    */
  def readMetadata(spark: SparkSession, datasetPath: String): DatasetMetadata = {
    val url = s"${stripSlash(datasetPath)}/metadata.json"
    val p =
      if (CloudFs.isCloudPath(url) && DatasetCache.useCache)
        new Path(DatasetCache.cacheManager().getCachedPath(
          url, spark.sparkContext.hadoopConfiguration))
      else new Path(url)
    val fs = fileSystem(spark, p)
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      DatasetMetadata.fromJson(new String(bytes, "UTF-8"))
    } finally in.close()
  }

  private[graft] def readTable(
      spark: SparkSession,
      dir: String,
      schema: Seq[PineconeSchema.ColumnSpec]): DataFrame = {
    val p = new Path(dir)
    val fs = fileSystem(spark, p)
    if (!fs.exists(p)) {
      logWarning(s"Dataset directory $dir not found; returning empty table")
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        PineconeSchema.structType(schema))
    }
    val parts = fs.globStatus(new Path(p, "*.parquet"))
    if (parts == null || parts.isEmpty) throw NoParquetFilesFound(dir)
    // No fixed read-schema here: on-disk column types vary across legacy
    // datasets (JSON columns as struct OR string, float64 vectors);
    // Normalize canonicalizes the plan, and unused on-disk columns are
    // pruned by Catalyst, not read.
    Normalize(spark.read.parquet(dir), schema, order = Normalize.PresentFirst)
  }

  private[graft] def fileSystem(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[graft] def stripSlash(s: String): String =
    if (s.endsWith("/")) s.dropRight(1) else s

  private[graft] def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    fileSystem(spark, p).exists(p)
  }
}
