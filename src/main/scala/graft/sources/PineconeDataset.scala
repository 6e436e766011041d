package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.DatasetMetadata
import graft.operators.Normalize
import graft.schema.PineconeSchema

/** Typed row models for the two tables (SURVEY §1.1: `Dataset[DocumentRow]`
  * where type safety helps; `DataFrame` where schema is dynamic).
  */
final case class SparseValues(indices: Seq[Long], values: Seq[Float])
final case class DocumentRow(
    id: String,
    values: Seq[Float],
    sparse_values: Option[SparseValues],
    metadata: Option[String],
    blob: Option[String])
final case class QueryRow(
    vector: Seq[Float],
    sparse_vector: Option[SparseValues],
    filter: Option[String],
    top_k: Int,
    blob: Option[String])

/** A loaded dataset: a pair of tables (`documents`, `queries`) plus a
  * metadata descriptor, all lazily materialized (reference `Dataset`,
  * `dataset.py:39-195`).
  *
  * Laziness maps 1:1: the reference memoizes pandas frames on first property
  * access (`dataset.py:171-195`); here each `lazy val` memoizes a *logical
  * plan* — cheap to hold, and Spark only reads bytes when an action runs.
  * Call `.cache()` on a table yourself if you will iterate it repeatedly.
  */
final class PineconeDataset private (
    val spark: SparkSession,
    docsThunk: () => DataFrame,
    queriesThunk: () => DataFrame,
    metaThunk: () => DatasetMetadata) {

  lazy val documents: DataFrame = docsThunk()
  lazy val queries: DataFrame = queriesThunk()
  lazy val metadata: DatasetMetadata = metaThunk()

  /** Typed views (same plans, case-class encoders on top). */
  def documentsDS: org.apache.spark.sql.Dataset[DocumentRow] = {
    import spark.implicits._
    documents.as[DocumentRow]
  }
  def queriesDS: org.apache.spark.sql.Dataset[QueryRow] = {
    import spark.implicits._
    queries.as[QueryRow]
  }

  /** `ds["documents"]` / `ds["queries"]` accessor parity (`dataset.py:162-166`). */
  def apply(key: String): DataFrame = key match {
    case "documents" => documents
    case "queries" => queries
    case other =>
      throw new NoSuchElementException(
        s"Dataset does not have key '$other'; available keys: [documents, queries]")
  }

  /** First n documents (`dataset.py:238-239`). */
  def head(n: Int = 5): Array[Row] = documents.head(n)

  /** Documents row count (`dataset.py:168-169`). Distributed count. */
  def count(): Long = documents.count()

  /** Batched document iteration for upsert-style consumption
    * (`dataset.py:197-222`). Projects to the public columns (no `blob`,
    * `cfg.py:45`), drops all-null columns (the reference's
    * `dropna(axis=1, how="all")`, `dataset.py:215-217` — one cheap
    * count-aggregate job over column stats, then the projection), and
    * streams partitions to the driver with `toLocalIterator` — never a
    * full `collect()`, so this works at any scale the driver can consume.
    */
  def iterDocuments(batchSize: Int = 1, returnIndexes: Boolean = false,
      progress: Progress = Progress.Noop): Iterator[Seq[Row]] = {
    require(batchSize > 0, "batch_size must be greater than 0")
    val projected = PineconeDataset.dropAllNullColumns(
      documents.select(PineconeSchema.documentsSelectColumns.map(col): _*))
    // row-count total only when someone is listening (one count job,
    // like the reference's len(df) for its tqdm total)
    val total = if (progress eq Progress.Noop) -1L else projected.count()
    var done = 0L
    projected.toLocalIterator().asScala.grouped(batchSize).map { b =>
      done += b.size
      progress.update("Loading documents", done, total)
      b.toSeq
    }
  }

  /** Indexed variant: yields (startIndex, batch) like `return_indexes=True`. */
  def iterDocumentsIndexed(batchSize: Int): Iterator[(Long, Seq[Row])] = {
    var idx = 0L
    iterDocuments(batchSize).map { batch =>
      val out = (idx, batch); idx += batch.size; out
    }
  }

  /** Single-row query iteration (`dataset.py:224-236`), public columns only. */
  def iterQueries(): Iterator[Row] =
    queries.select(PineconeSchema.queriesSelectColumns.map(col): _*)
      .toLocalIterator().asScala

  /** Distributed consumption alternative to driver-side iteration: run the
    * sink on executors, batch-at-a-time. This is the 100 TB path the
    * reference (single-process) cannot express.
    */
  def foreachDocumentBatch(batchSize: Int)(sink: Seq[Row] => Unit): Unit = {
    require(batchSize > 0, "batch_size must be greater than 0")
    documents.select(PineconeSchema.documentsSelectColumns.map(col): _*)
      .foreachPartition { it: Iterator[Row] => it.grouped(batchSize).foreach(b => sink(b.toSeq)) }
  }

  /** Deprecation shims for API parity (reference F7, `dataset.py:241-272`):
    * the reference raises with guidance for the removed catalog/index
    * methods; same here.
    */
  @deprecated("use Catalog.loadDataset", "0.1.0")
  def toCatalog(): Nothing = throw new UnsupportedOperationException(
    "to_catalog was removed; use Catalog.saveDataset(dataset)")

  @deprecated("removed in the reference", "0.1.0")
  def toPineconeIndex(): Nothing = throw new UnsupportedOperationException(
    "to_pinecone_index was removed; iterate with iterDocuments/foreachDocumentBatch " +
      "and upsert via your index client")

  private implicit class RichJIterator[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}

object PineconeDataset {

  /** Load from a path laid out as `{path}/{documents,queries,metadata.json}`
    * (reference `Dataset.from_path`, `dataset.py:40-50,120-160`): existence
    * checked eagerly, all reads deferred.
    */
  def fromPath(spark: SparkSession, path: String): PineconeDataset = {
    if (!DatasetReader.exists(spark, path))
      throw new java.io.FileNotFoundException(s"Dataset path $path does not exist")
    new PineconeDataset(
      spark,
      () => DatasetReader.readDocuments(spark, path),
      () => DatasetReader.readQueries(spark, path),
      () => DatasetReader.readMetadata(spark, path))
  }

  /** Build from caller-provided DataFrames, normalizing both against the
    * declared schemas (reference `Dataset.from_pandas`, `dataset.py:52-85`).
    * Strict schema column order, like the reference's `from_pandas` path.
    */
  def fromDataFrames(
      documents: DataFrame,
      metadata: DatasetMetadata,
      documentsColumnMapping: Map[String, String] = Map.empty,
      queries: Option[DataFrame] = None,
      queriesColumnMapping: Map[String, String] = Map.empty): PineconeDataset = {
    val spark = documents.sparkSession
    val docs = Normalize(documents, PineconeSchema.documentsColumns, documentsColumnMapping)
    val qs = queries match {
      case Some(q) => Normalize(q, PineconeSchema.queriesColumns, queriesColumnMapping)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], PineconeSchema.queriesSchema)
    }
    new PineconeDataset(spark, () => docs, () => qs, () => metadata)
  }

  /** The reference's `df.dropna(axis=1, how="all")` (`dataset.py:215-217`):
    * data-dependent projection. One aggregate job computes per-column
    * non-null counts (map-side partial aggregation, a few bytes per
    * partition); the driver then plans the projection.
    */
  private[graft] def dropAllNullColumns(df: DataFrame): DataFrame = {
    val names = df.columns.toSeq
    if (names.isEmpty) return df
    val counts = df.select(names.map(c => count(col(c)).as(c)): _*).head()
    val kept = names.zipWithIndex.collect { case (c, i) if counts.getLong(i) > 0 => c }
    if (kept == names) df else df.select(kept.map(col): _*)
  }
}
