package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted interpolated-bigram language model — the train-once /
  * score-forever lifecycle of the CCNet-style perplexity filter
  * ([[TextAnalysis.bigramLogProbScore]] is its self-trained twin). In
  * production the model trains ONCE on a reference corpus (CCNet: a
  * Wikipedia KenLM) and then scores every incoming crawl batch; retraining
  * per batch would both re-read the reference corpus and silently shift
  * the score scale between batches. This index freezes the model on disk:
  *
  * ```
  * dir/vocab/          (term, cnt)      — ≤ vocabSize heap-selected rows
  * dir/bigrams/        (w1, w2, cnt)    — ≤ bigramTable heap-selected rows
  * dir/metadata.json   vocab_size/bigram_table/lambda/oov_count/n_total
  * ```
  *
  * `n_total` is the FULL training-corpus token count (the unigram
  * denominator never shrinks with the vocab cap), captured at save time.
  * λ and the OOV fallback live in the metadata because a score is only
  * comparable across batches when every batch is scored under the exact
  * same smoothing — `open` restores them so call sites cannot drift
  * (same reasoning as [[DedupIndex]]'s hashing params).
  *
  * Scale shape: save = the two bounded-heap stats aggs written as rows
  * (both tables are broadcast-sized BY CONSTRUCTION — that is what the
  * caps are for); score = the batch's transition stream against the two
  * tables read back and collapsed to broadcast maps (≤cap-row scans, no
  * training-corpus access at all).
  */
object LmIndex {

  private[graft] final case class Params(
      vocabSize: Int, bigramTable: Int, lambda: Double, oovCount: Double,
      nTotal: Double)

  private val MetaFile = "metadata.json"
  private[graft] val FormatVersion = 1

  /** Train on `docs` and persist the frozen model at `dir`. */
  def save(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      dir: String,
      vocabSize: Int = 50000,
      bigramTable: Int = 200000,
      lambda: Double = 0.7,
      oovCount: Double = 0.5): DiskLmIndex = {
    require(vocabSize > 0 && bigramTable > 0, "table sizes must be > 0")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val spark = docs.sparkSession
    // the heap aggs themselves do the selection, so the stored rows are
    // EXACTLY the self-trained operator's tables (count desc, key asc).
    // The one-row stats frames collect to the driver (bounded by the
    // caps) and the table files are written from the collected maps —
    // ONE corpus scan per table, not one per output.
    val uniRow = TextAnalysis.lmUniStats(
      TextAnalysis.lmTokens(docs, textCol), vocabSize).collect()(0)
    val nTotal = if (uniRow.isNullAt(1)) 0.0 else uniRow.getDouble(1)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      uniRow.getMap[String, Double](0).toSeq
        .map { case (t, c) => org.apache.spark.sql.Row(t, c) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
      .write.mode("overwrite").parquet(s"$dir/vocab")
    val bgRow = TextAnalysis.lmBgStats(
      TextAnalysis.lmBigramPairs(docs, idCol, textCol), bigramTable).collect()(0)
    spark.createDataFrame(
      bgRow.getMap[String, Double](0).toSeq
        .map { case (bg, c) =>
          val i = bg.indexOf(' ')
          org.apache.spark.sql.Row(bg.substring(0, i), bg.substring(i + 1), c)
        }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w1",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("w2",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
      .write.mode("overwrite").parquet(s"$dir/bigrams")
    val p = Params(vocabSize, bigramTable, lambda, oovCount, nTotal)
    writeMeta(spark, dir, p)
    new DiskLmIndex(spark, dir, p)
  }

  /** [[save]] over a hash-deterministic SAMPLE of the training corpus —
    * the default posture at scale: an LM for perplexity filtering needs
    * distributional counts, not the whole corpus, and training on 100 TB
    * to score 100 TB doubles the pipeline for no quality gain. The
    * sample is [[Sampling.md5Sample]] on the id (a pure scan filter:
    * reproducible across engines/reruns/partitionings, and replayable by
    * the DuckDB oracle as a WHERE clause), so "train on a 1/4 sample" is
    * one argument, not a separate pipeline stage. `sampleSixteenths = 16`
    * degenerates to full-corpus [[save]].
    */
  def saveSampled(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      dir: String,
      sampleSixteenths: Int,
      vocabSize: Int = 50000,
      bigramTable: Int = 200000,
      lambda: Double = 0.7,
      oovCount: Double = 0.5): DiskLmIndex =
    save(Sampling.md5Sample(docs, idCol, sampleSixteenths), idCol, textCol,
      dir, vocabSize, bigramTable, lambda, oovCount)

  def open(spark: SparkSession, dir: String): DiskLmIndex =
    new DiskLmIndex(spark, dir, readMeta(spark, dir))

  // metadata is written LAST (after vocab/ and bigrams/) — the layout's
  // completeness marker per the LayoutMeta contract
  private def writeMeta(spark: SparkSession, dir: String, p: Params): Unit =
    LayoutMeta.write(spark, dir, MetaFile, FormatVersion,
      s""""vocab_size": ${p.vocabSize}, "bigram_table": ${p.bigramTable},
         | "lambda": ${p.lambda}, "oov_count": ${p.oovCount}, "n_total": ${p.nTotal}""".stripMargin)

  private def readMeta(spark: SparkSession, dir: String): Params = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val v = LayoutMeta.read(spark, dir, MetaFile, FormatVersion, "LM index")
    Params(
      (v \ "vocab_size").extract[Int],
      (v \ "bigram_table").extract[Int],
      (v \ "lambda").extract[Double],
      (v \ "oov_count").extract[Double],
      (v \ "n_total").extract[Double])
  }
}

/** An opened frozen LM: score any batch without touching the training
  * corpus.
  */
final class DiskLmIndex(
    spark: SparkSession,
    val dir: String,
    private[graft] val params: LmIndex.Params) {

  /** [[TextAnalysis.bigramLogProbScore]]'s contract —
    * `(doc_id, n_bigrams, logprob)`, one row per batch document with ≥2
    * tokens — under the STORED model: same maps, same smoothing, so a
    * batch scored today and a batch scored next month sit on one scale.
    */
  def score(batch: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val (uniStats, bgStats) = modelFrames()
    TextAnalysis.lmScore(
      TextAnalysis.lmBigramPairs(batch, idCol, textCol),
      uniStats, bgStats, params.lambda, params.oovCount)
  }

  /** [[score]] as a STATELESS projection: the per-document average runs as
    * a higher-order `aggregate` over the row's own transition array
    * instead of explode + groupBy, so there is no shuffle and — on a
    * streaming frame — no stateful operator and no watermark requirement.
    * This is the ingest-time quality gate: `readStream → scoreStream →
    * filter(logprob ≥ τ) → sink` scores every arriving batch under the
    * frozen model at scan speed. Works identically on batch frames
    * (same output as [[score]]: per-doc transitions are contiguous in one
    * partition, so the batch path's partial sum is the same left-to-right
    * sequential sum this lambda computes).
    */
  def scoreStream(batch: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val (uniStats, bgStats) = modelFrames()
    val toks = filter(split(lower(textCol), " "), t => length(t) > 0)
    val withTs = batch.select(idCol.as("doc_id"), toks.as("ts"))
      .crossJoin(broadcast(uniStats)).crossJoin(broadcast(bgStats))
    val m = greatest(size(col("ts")) - 1, lit(0))
    val pairs = zip_with(
      slice(col("ts"), lit(1), m), slice(col("ts"), lit(2), m),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    def term(w1: Column, w2: Column): Column = {
      val cond = least(lit(1.0),
        coalesce(element_at(col("bgmap"), concat_ws(" ", w1, w2)), lit(0.0)) /
          coalesce(element_at(col("vocab"), w1), lit(params.oovCount)))
      val puni = coalesce(element_at(col("vocab"), w2), lit(params.oovCount)) /
        col("n_total")
      log(lit(params.lambda) * cond + lit(1.0 - params.lambda) * puni)
    }
    withTs
      .select(col("doc_id"),
        transform(pairs, p => term(p.getField("w1"), p.getField("w2"))).as("lp"))
      .filter(size(col("lp")) > 0)
      .select(col("doc_id"), size(col("lp")).cast("long").as("n_bigrams"),
        (round(aggregate(col("lp"), lit(0.0), (acc, x) => acc + x) /
          size(col("lp")), 4) + lit(0.0)).as("logprob"))
  }

  private def modelFrames(): (DataFrame, DataFrame) = {
    val uniStats = spark.read.parquet(s"$dir/vocab")
      .agg(map_from_arrays(
        collect_list(col("term")), collect_list(col("cnt"))).as("vocab"))
      .withColumn("n_total", lit(params.nTotal))
    val bgStats = spark.read.parquet(s"$dir/bigrams")
      .agg(map_from_arrays(
        collect_list(concat_ws(" ", col("w1"), col("w2"))),
        collect_list(col("cnt"))).as("bgmap"))
    (uniStats, bgStats)
  }
}
