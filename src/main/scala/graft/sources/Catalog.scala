package graft.sources

import scala.util.{Failure, Success, Try}

import org.apache.hadoop.fs.Path
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.meta.DatasetMetadata

/** A catalog: a base directory whose children are datasets, each described
  * by a `metadata.json` (reference `catalog.py:27-97`, layout
  * `MAINTAINERS.md:80-104`).
  *
  * Listing is driver-only work over tiny files — glob
  * `{base}/∗/metadata.json`, parse each, skip-and-warn on JSON or validation
  * errors exactly like the reference (`catalog.py:50-64`). No cluster jobs.
  */
final class Catalog(val spark: SparkSession, val basePath: String) extends Logging {

  @volatile private var cached: Option[Seq[DatasetMetadata]] = None

  /** Scan the base path for datasets (reference `Catalog.load`). */
  def load(): Seq[DatasetMetadata] = {
    val base = new Path(DatasetReader.stripSlash(basePath))
    val fs = DatasetReader.fileSystem(spark, base)
    val statuses = Option(fs.globStatus(new Path(base, "*/metadata.json")))
      .getOrElse(Array.empty)
    val metas = statuses.toSeq.flatMap { st =>
      val read = Try {
        val in = fs.open(st.getPath)
        try {
          val bytes = new Array[Byte](st.getLen.toInt)
          in.readFully(bytes)
          DatasetMetadata.fromJson(new String(bytes, "UTF-8"))
        } finally in.close()
      }
      read match {
        case Success(m) => Some(m)
        case Failure(e) =>
          logWarning(s"Skipping invalid dataset metadata at ${st.getPath}: ${e.getMessage}")
          None
      }
    }
    cached = Some(metas)
    metas
  }

  private def metas: Seq[DatasetMetadata] = cached.getOrElse(load())

  /** Dataset names (reference `list_datasets(as_df=False)`, `catalog.py:70-80`). */
  def listDatasets(): Seq[String] = metas.map(_.name)

  /** Full-metadata listing as a DataFrame (reference `as_df=True` returns
    * the complete metadata records, `catalog.py:70-80`): every
    * [[DatasetMetadata]] field is a column. Nested models are flattened;
    * free-form `args` is rendered as its JSON text.
    */
  def listDatasetsDF(): DataFrame = {
    import spark.implicits._
    metas.map { m =>
      CatalogListing(
        m.name, m.created_at, m.documents, m.queries,
        m.source, m.license, m.bucket, m.task,
        m.dense_model.name, m.dense_model.tokenizer, m.dense_model.dimension,
        m.sparse_model.map(_.name), m.sparse_model.flatMap(_.tokenizer),
        m.description, m.tags,
        m.args.map(a => org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(a))))
    }.toDF()
  }

  /** `Dataset.from_path(join(base, id))` (reference `catalog.py:82-85`). */
  def loadDataset(datasetId: String): PineconeDataset =
    PineconeDataset.fromPath(spark, s"${DatasetReader.stripSlash(basePath)}/$datasetId")

  /** Write a dataset under `{base}/{metadata.name}` (reference `catalog.py:87-97`). */
  def saveDataset(ds: PineconeDataset, singleFile: Boolean = false): Unit = {
    DatasetWriter.writeDataset(
      ds, s"${DatasetReader.stripSlash(basePath)}/${ds.metadata.name}", singleFile)
    cached = None // listing is stale after a write
  }
}

/** One row of [[Catalog.listDatasetsDF]] — full [[DatasetMetadata]] parity
  * (reference `catalog.py:70-80`). */
private[sources] final case class CatalogListing(
    name: String,
    created_at: String,
    documents: Long,
    queries: Long,
    source: Option[String],
    license: Option[String],
    bucket: Option[String],
    task: Option[String],
    dense_model: String,
    dense_tokenizer: Option[String],
    dimension: Int,
    sparse_model: Option[String],
    sparse_tokenizer: Option[String],
    description: Option[String],
    tags: Option[List[String]],
    args: Option[String])

/** Module-level convenience API (reference `public.py:8-56`): a lazily
  * created default catalog whose base path comes from the
  * `DATASETS_CATALOG_BASEPATH` environment variable (reference
  * `catalog.py:31-33`; the reference's default GCS bucket makes no sense
  * offline, so here the env var is required unless a base path is given).
  */
object PineconeDatasets {
  @volatile private var defaultCatalog: Option[Catalog] = None

  def catalog(spark: SparkSession, basePath: Option[String] = None): Catalog = {
    val base = basePath
      .orElse(sys.env.get("DATASETS_CATALOG_BASEPATH"))
      .getOrElse(throw new IllegalArgumentException(
        "no catalog base path: pass one or set DATASETS_CATALOG_BASEPATH"))
    defaultCatalog match {
      case Some(c) if c.basePath == base => c
      case _ =>
        val c = new Catalog(spark, base)
        defaultCatalog = Some(c)
        c
    }
  }

  def listDatasets(spark: SparkSession): Seq[String] = catalog(spark).listDatasets()

  def loadDataset(spark: SparkSession, id: String): PineconeDataset =
    catalog(spark).loadDataset(id)
}
