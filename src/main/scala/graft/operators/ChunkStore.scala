package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

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
  * dir/chunks/         (h, clen, c) — xxhash64 key, byte length, chunk
  * dir/metadata.json   window / divisor / vtype
  * ```
  *
  * The chunking parameters live in the metadata because admission is
  * only meaningful when the batch is chunked EXACTLY like the store
  * (same window, same divisor) — `open` restores them so call sites
  * cannot drift (the [[DedupIndex]] argument). `vtype` records whether
  * the stored chunks are string or binary, so an admit/append with the
  * wrong column type fails with a clear message instead of an analysis
  * error (or a silent cast) inside the join.
  *
  * `admit` is deliberately a PURE read: a chunk is "new" iff the STORE
  * lacks it — duplicates *within* the incoming batch are not netted
  * against each other, so the decision is deterministic and
  * order-independent (the store updates only at the explicit [[
  * DiskChunkStore.append]]).
  *
  * Scale shape: the batch chunks at scan speed (the O(n) codegen
  * expression); admission joins on `(h, clen)` — the stored side ships
  * ~16 B per distinct chunk into the shuffle, never its text bytes (the
  * same discipline [[DedupIndex]] applies: the persisted side
  * contributes hashes, not content). A 64-bit content hash qualified by
  * exact length makes a false "known" astronomically unlikely; the
  * collision-paranoid can pass `exact = true` to also compare chunk
  * content (pricing admission at text-shuffle cost, which is exactly
  * what that mode buys). Per-document admission stats partial-aggregate
  * map-side. `append` writes the batch's new distinct chunks as one
  * additional file set — no rewrite of existing files.
  */
object ChunkStore {

  private[graft] final case class Params(window: Int, divisor: Int, vtype: String)

  private val MetaFile = "metadata.json"

  /** On-disk layout version. v2 = `(h, clen, c)` chunks table + `vtype`
    * metadata; v1 (no `format` field) stored `(c, clen)` without the hash
    * column, so opening it would not fail until an admit/append hit a
    * confusing missing-column AnalysisException on `h` — version the
    * format and fail `open` up front instead. */
  private val FormatVersion = 2

  private[graft] def valueType(df: DataFrame, c: Column): String =
    df.select(c).schema.head.dataType match {
      case StringType => "string"
      case BinaryType => "binary"
      case dt => throw new IllegalArgumentException(
        s"chunk column must be string or binary, got $dt")
    }

  /** Chunk `docs` and persist the distinct-chunk table at `dir`. */
  def save(
      docs: DataFrame,
      textCol: Column,
      dir: String,
      window: Int = 8,
      divisor: Int = 64): DiskChunkStore = {
    val spark = docs.sparkSession
    val vtype = valueType(docs, textCol)
    docs.select(explode(graft.functions.SketchFunctions.cdcChunks(
        textCol, window, divisor)).as("c"))
      .distinct()
      .select(xxhash64(col("c")).as("h"),
        octet_length(col("c")).cast("long").as("clen"), col("c"))
      .write.mode("overwrite").parquet(s"$dir/chunks")
    writeMeta(spark, dir, Params(window, divisor, vtype))
    new DiskChunkStore(spark, dir, Params(window, divisor, vtype))
  }

  def open(spark: SparkSession, dir: String): DiskChunkStore =
    new DiskChunkStore(spark, dir, readMeta(spark, dir))

  private def writeMeta(spark: SparkSession, dir: String, p: Params): Unit = {
    val json = s"""{"format": $FormatVersion, "window": ${p.window}, """ +
      s""""divisor": ${p.divisor}, "vtype": "${p.vtype}"}"""
    val path = new org.apache.hadoop.fs.Path(s"$dir/$MetaFile")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def readMeta(spark: SparkSession, dir: String): Params = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val v = LayoutMeta.parseFile(spark, dir, MetaFile, "chunk store")
    // Stores written before the `format` field existed come in BOTH layouts:
    // real v1 (no `h` column) and format-less v2 (written between the layout
    // change and the version stamp). LayoutMeta's absent→1 default would
    // reject the latter — fully compatible stores — so here an absent field
    // is resolved by sniffing the chunks schema for the layout's
    // distinguishing column instead.
    val format = (v \ "format").toOption.map(_.extract[Int]).getOrElse {
      val hasHash = spark.read.parquet(s"$dir/chunks")
        .schema.fieldNames.contains("h")
      if (hasHash) FormatVersion else 1
    }
    LayoutMeta.checkFormat(format, FormatVersion, dir, "chunk store")
    Params((v \ "window").extract[Int], (v \ "divisor").extract[Int],
      (v \ "vtype").extract[String])
  }
}

/** An opened chunk store: per-batch storage-dedup admission + append. */
final class DiskChunkStore(
    spark: SparkSession,
    val dir: String,
    private[graft] val params: ChunkStore.Params) {

  private def stored: DataFrame = spark.read.parquet(s"$dir/chunks")

  private def batchChunks(batch: DataFrame, idCol: Column, textCol: Column) = {
    val vtype = ChunkStore.valueType(batch, textCol)
    require(vtype == params.vtype,
      s"store at $dir holds ${params.vtype} chunks but the batch column is " +
        s"$vtype — chunk admission joins must compare like with like")
    batch.select(idCol.as("doc_id"),
        explode(graft.functions.SketchFunctions.cdcChunks(
          textCol, params.window, params.divisor)).as("c"))
      .select(col("doc_id"), xxhash64(col("c")).as("h"),
        octet_length(col("c")).cast("long").as("clen"), col("c"))
  }

  /** Per-document storage cost of an incoming batch against the store:
    * `(doc_id, n_chunks, n_new_chunks, new_bytes, dup_bytes)` — a chunk
    * is NEW iff the store lacks it (batch-internal repeats are each
    * counted against the store, never against each other: deterministic,
    * order-free). `new_bytes` is what a content-addressed write of this
    * batch would actually store (octet counts, so "bytes" means bytes on
    * non-ASCII text too).
    *
    * The membership join keys on `(xxhash64(chunk), byte length)` — the
    * stored side ships ~16 B per distinct chunk, not corpus text.
    * `exact = true` additionally compares chunk content on hash-matched
    * rows (shuffles stored text; only for the collision-paranoid mode).
    */
  def admit(
      batch: DataFrame,
      idCol: Column,
      textCol: Column,
      exact: Boolean = false): DataFrame = {
    val known =
      if (exact)
        stored.select(col("h"), col("clen"), col("c")).distinct()
          .withColumn("known", lit(true))
      else
        stored.select(col("h"), col("clen")).distinct()
          .withColumn("known", lit(true))
    val joinKeys = if (exact) Seq("h", "clen", "c") else Seq("h", "clen")
    batchChunks(batch, idCol, textCol)
      .join(known, joinKeys, "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_new_chunks"),
        sum(when(col("known").isNull, col("clen")).otherwise(0L)).as("new_bytes"),
        sum(when(col("known").isNotNull, col("clen")).otherwise(0L)).as("dup_bytes"))
  }

  /** Store the batch's chunks the store does not yet have — one appended
    * file set of new distinct chunks, no rewrite of existing files. The
    * anti-join keys on `(h, clen)` like [[admit]], so the stored side
    * never ships text into the shuffle.
    */
  def append(batch: DataFrame, idCol: Column, textCol: Column): Unit =
    batchChunks(batch, idCol, textCol)
      .select(col("h"), col("clen"), col("c")).distinct()
      .join(stored.select(col("h"), col("clen")), Seq("h", "clen"), "left_anti")
      .write.mode("append").parquet(s"$dir/chunks")
}
