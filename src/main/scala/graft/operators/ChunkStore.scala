package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted content-defined chunk store — the WRITE path of
  * storage-level dedup, completing the persisted-index family
  * ([[DedupIndex]] for near-dup admission, [[LmIndex]] for quality
  * scoring). A content-addressed store keeps each distinct chunk once;
  * when a new crawl snapshot arrives, only the chunks the store has
  * never seen cost bytes. This index persists the distinct-chunk table
  * so that per-batch admission asks exactly that question without
  * re-chunking (or even reading) the stored corpus:
  *
  * ```
  * dir/chunks/         (c, clen)    — distinct chunks + byte/char length
  * dir/metadata.json   window / divisor
  * ```
  *
  * The chunking parameters live in the metadata because admission is
  * only meaningful when the batch is chunked EXACTLY like the store
  * (same window, same divisor) — `open` restores them so call sites
  * cannot drift (the [[DedupIndex]] argument).
  *
  * `admit` is deliberately a PURE read: a chunk is "new" iff the STORE
  * lacks it — duplicates *within* the incoming batch are not netted
  * against each other, so the decision is deterministic and
  * order-independent (the store updates only at the explicit [[
  * DiskChunkStore.append]]).
  *
  * Scale shape: the batch chunks at scan speed (the O(n) codegen
  * expression); the stored side contributes only its compact distinct
  * table into one chunk-keyed join (partial-aggregated on both sides);
  * per-document admission stats partial-aggregate map-side. `append`
  * writes the batch's new distinct chunks as one additional file set —
  * no rewrite of existing files.
  */
object ChunkStore {

  private[graft] final case class Params(window: Int, divisor: Int)

  private val MetaFile = "metadata.json"

  /** Chunk `docs` and persist the distinct-chunk table at `dir`. */
  def save(
      docs: DataFrame,
      textCol: Column,
      dir: String,
      window: Int = 8,
      divisor: Int = 64): DiskChunkStore = {
    val spark = docs.sparkSession
    docs.select(explode(graft.functions.SketchFunctions.cdcChunks(
        textCol, window, divisor)).as("c"))
      .distinct()
      .select(col("c"), length(col("c")).cast("long").as("clen"))
      .write.mode("overwrite").parquet(s"$dir/chunks")
    writeMeta(spark, dir, Params(window, divisor))
    new DiskChunkStore(spark, dir, Params(window, divisor))
  }

  def open(spark: SparkSession, dir: String): DiskChunkStore =
    new DiskChunkStore(spark, dir, readMeta(spark, dir))

  private def writeMeta(spark: SparkSession, dir: String, p: Params): Unit = {
    val json = s"""{"window": ${p.window}, "divisor": ${p.divisor}}"""
    val path = new org.apache.hadoop.fs.Path(s"$dir/$MetaFile")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def readMeta(spark: SparkSession, dir: String): Params = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$MetaFile")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    val json = try {
      val len = fs.getFileStatus(path).getLen.toInt
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
    import org.json4s.jackson.JsonMethods
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val v = JsonMethods.parse(json)
    Params((v \ "window").extract[Int], (v \ "divisor").extract[Int])
  }
}

/** An opened chunk store: per-batch storage-dedup admission + append. */
final class DiskChunkStore(
    spark: SparkSession,
    val dir: String,
    private[graft] val params: ChunkStore.Params) {

  private def stored: DataFrame = spark.read.parquet(s"$dir/chunks")

  private def batchChunks(batch: DataFrame, idCol: Column, textCol: Column) =
    batch.select(idCol.as("doc_id"),
        explode(graft.functions.SketchFunctions.cdcChunks(
          textCol, params.window, params.divisor)).as("c"))
      .withColumn("clen", length(col("c")).cast("long"))

  /** Per-document storage cost of an incoming batch against the store:
    * `(doc_id, n_chunks, n_new_chunks, new_bytes, dup_bytes)` — a chunk
    * is NEW iff the store lacks it (batch-internal repeats are each
    * counted against the store, never against each other: deterministic,
    * order-free). `new_bytes` is what a content-addressed write of this
    * batch would actually store.
    */
  def admit(batch: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val known = stored.select(col("c")).distinct()
      .withColumn("known", lit(true))
    batchChunks(batch, idCol, textCol)
      .join(known, Seq("c"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_new_chunks"),
        sum(when(col("known").isNull, col("clen")).otherwise(0L)).as("new_bytes"),
        sum(when(col("known").isNotNull, col("clen")).otherwise(0L)).as("dup_bytes"))
  }

  /** Store the batch's chunks the store does not yet have — one appended
    * file set of new distinct chunks, no rewrite of existing files.
    */
  def append(batch: DataFrame, idCol: Column, textCol: Column): Unit =
    batchChunks(batch, idCol, textCol)
      .select(col("c"), col("clen")).distinct()
      .join(stored.select(col("c")), Seq("c"), "left_anti")
      .write.mode("append").parquet(s"$dir/chunks")
}
