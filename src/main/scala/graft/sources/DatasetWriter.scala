package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write path (reference W1–W4, `dataset_fswriter.py`).
  *
  * Composition and ordering match the reference's
  * `write_dataset` (`dataset_fswriter.py:23-32`): documents → queries →
  * metadata, with `metadata.json` written last so it acts as an informal
  * commit marker (the reference is likewise non-atomic across the three
  * steps, `tests/integration/test_error_scenarios.py:251-290`).
  *
  * Differences by design:
  *   - The reference JSON-encodes the `metadata`/`filter` columns by mutating
  *     the caller's frame and restoring in `finally`
  *     (`dataset_fswriter.py:40-55`). Spark plans are immutable, so the
  *     invariant "writing does not alter the source dataset" holds for free.
  *   - The reference always writes a single `part-0.parquet`
  *     (`dataset_fswriter.py:49`). At 100 TB a single output file is wrong;
  *     `singleFile = true` reproduces the exact layout for catalog-sized
  *     parity (coalesce(1) + driver-side rename), `false` (default) keeps
  *     the natural distributed multi-part write, which the reader accepts
  *     either way.
  */
object DatasetWriter extends Logging {

  def writeDataset(
      ds: PineconeDataset,
      datasetPath: String,
      singleFile: Boolean = false): Unit = {
    val base = DatasetReader.stripSlash(datasetPath)
    writeTable(ds.documents, s"$base/documents", singleFile)
    // isEmpty is a Spark job; head(1) bounds it to the first non-empty
    // partition rather than a full count.
    if (ds.queries.head(1).isEmpty) {
      logWarning("Queries table is empty; skipping queries write")
    } else writeTable(ds.queries, s"$base/queries", singleFile)
    writeMetadata(ds.spark, ds.metadata, base)
  }

  private[graft] def writeTable(df: DataFrame, dir: String, singleFile: Boolean): Unit = {
    if (singleFile) {
      df.coalesce(1).write.mode("overwrite").parquet(dir)
      renameSinglePart(df.sparkSession, dir)
    } else {
      df.write.mode("overwrite").parquet(dir)
    }
  }

  /** Exact-name parity with the reference's `part-0.parquet`
    * (`dataset_fswriter.py:49`): rename Spark's `part-00000-<uuid>` part.
    */
  private def renameSinglePart(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs: FileSystem = DatasetReader.fileSystem(spark, p)
    val parts = fs.globStatus(new Path(p, "part-*.parquet"))
    if (parts != null && parts.length == 1) {
      val target = new Path(p, "part-0.parquet")
      if (!parts(0).getPath.equals(target)) {
        fs.rename(parts(0).getPath, target)
      }
    }
  }

  private[graft] def writeMetadata(
      spark: SparkSession,
      meta: graft.meta.DatasetMetadata,
      base: String): Unit = {
    val p = new Path(s"$base/metadata.json")
    val fs = DatasetReader.fileSystem(spark, p)
    val out = fs.create(p, true)
    try out.write(meta.toJson.getBytes("UTF-8"))
    finally out.close()
  }
}
