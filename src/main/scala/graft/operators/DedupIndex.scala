package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted near-dup admission index — the dedup twin of
  * [[IvfIndex]]'s disk layout. An incremental ingest pipeline admits each
  * crawl batch against EVERYTHING already ingested; recomputing the
  * existing corpus's shingle sets and minhash signatures per batch means
  * re-reading 100 TB of text per day. This index pays that cost ONCE:
  *
  * ```
  * dir/sets/           (doc_id, sh)                  — shingle-hash sets
  * dir/bands/band_idx= (doc_id, band_hash)           — LSH band hashes
  * dir/metadata.json   threshold/shingleSize/numHashes/bands/seed
  * ```
  *
  * `admit(batch)` then computes the BATCH's shingles/bands in-flight and
  * meets the precomputed tables in the same one-shuffle bucket aggregate
  * as [[TextDedup.crossCorpusNearDup]] ([[TextDedup.crossAdmitCore]]) —
  * the existing corpus contributes compact hashes (tens of bytes per
  * band row), never text. Admitted batches are [[DiskDedupIndex.append]]ed
  * so the next batch dedups against them too; appends are one map stage
  * per table (no shuffle), and the small-file accumulation is the same
  * operational problem [[Bucketing.compactPartitioned]] already solves.
  *
  * The hashing parameters live in `metadata.json` because admission is
  * only correct when the batch is hashed EXACTLY like the stored corpus
  * (same shingle size, hash count, banding, seed) — `open` restores them
  * so call sites cannot drift.
  */
object DedupIndex {

  private[graft] final case class Params(
      threshold: Double, shingleSize: Int, numHashes: Int, bands: Int, seed: Long)

  private val MetaFile = "metadata.json"
  private[graft] val FormatVersion = 1

  /** Shingle, sign, and persist `docs` as a fresh index at `dir`.
    *
    * Two scans, neither of them twice over the raw text: the documents
    * are read once to write `sets/`, and `bands/` derives from reading
    * `sets/` BACK (the compact hash table) rather than re-shingling the
    * corpus — at build scale the second pass touches ~1% of the bytes.
    */
  def save(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      dir: String,
      threshold: Double = 0.5,
      shingleSize: Int = 2,
      numHashes: Int = 63,
      bands: Int = 21,
      seed: Long = 42L): DiskDedupIndex = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val spark = docs.sparkSession
    val p = Params(threshold, shingleSize, numHashes, bands, seed)
    TextDedup.shingleSets(docs, idCol, textCol, shingleSize)
      .write.mode("overwrite").parquet(s"$dir/sets")
    Bucketing.writePartitioned(
      TextDedup.bandHashes(spark.read.parquet(s"$dir/sets"), numHashes, bands, seed),
      s"$dir/bands", Seq("band_idx"))
    writeMeta(spark, dir, p)
    new DiskDedupIndex(spark, dir, p)
  }

  def open(spark: SparkSession, dir: String): DiskDedupIndex =
    new DiskDedupIndex(spark, dir, readMeta(spark, dir))

  // metadata is written LAST (after sets/ and bands/) — the layout's
  // completeness marker per the LayoutMeta contract
  private def writeMeta(spark: SparkSession, dir: String, p: Params): Unit =
    LayoutMeta.write(spark, dir, MetaFile, FormatVersion,
      s""""threshold": ${p.threshold}, "shingle_size": ${p.shingleSize},
         | "num_hashes": ${p.numHashes}, "bands": ${p.bands}, "seed": ${p.seed}""".stripMargin)

  private def readMeta(spark: SparkSession, dir: String): Params = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val v = LayoutMeta.read(spark, dir, MetaFile, FormatVersion, "dedup index")
    Params(
      (v \ "threshold").extract[Double],
      (v \ "shingle_size").extract[Int],
      (v \ "num_hashes").extract[Int],
      (v \ "bands").extract[Int],
      (v \ "seed").extract[Long])
  }
}

/** An opened on-disk dedup index: admit incoming batches against it,
  * append admitted batches into it.
  */
final class DiskDedupIndex(
    spark: SparkSession,
    val dir: String,
    private[graft] val params: DedupIndex.Params) {

  /** [[TextDedup.crossCorpusNearDup]]'s contract — one row per incoming
    * document, `(id, matched_id, is_new)` with `matched_id` the minimum
    * stored doc id whose shingle Jaccard clears the index's threshold —
    * with the existing side read back precomputed instead of re-shingled.
    */
  def admit(incoming: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val in = TextDedup.shingleSets(incoming, idCol, textCol, params.shingleSize)
    TextDedup.crossAdmitCore(
      incoming.select(idCol.as("id")),
      in, TextDedup.bandHashes(in, params.numHashes, params.bands, params.seed),
      spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/sets"),
      params.threshold)
  }

  /** Add `docs` to the index (the post-admission step of an ingest
    * batch). One map stage per table — the shingle pass feeds both
    * appends; no shuffle, no rewrite of existing files. Caller owns id
    * uniqueness across appends, as with [[IvfIndex]] appends.
    */
  def append(docs: DataFrame, idCol: Column, textCol: Column): Unit = {
    val sh = TextDedup.shingleSets(docs, idCol, textCol, params.shingleSize)
    sh.write.mode("append").parquet(s"$dir/sets")
    TextDedup.bandHashes(sh, params.numHashes, params.bands, params.seed)
      .write.mode("append").partitionBy("band_idx").parquet(s"$dir/bands")
  }
}
