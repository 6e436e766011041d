package graft.sources

import org.apache.spark.sql.SparkSession

/** Cloud-path policy (reference `fs.py:16-81`): URL-alias normalization,
  * the cloud-path predicate, and the anonymous-access rule — mapped onto
  * Hadoop filesystem configuration instead of fsspec constructors.
  *
  * Reference semantics reproduced:
  *   - `is_cloud_path` is a prefix test over `gs://`, `s3://` and the two
  *     HTTPS endpoint aliases (`fs.py:16-31`);
  *   - HTTPS aliases dispatch to the same backends as their native
  *     schemes (`fs.py:69,75`) — here rewritten to the native scheme,
  *     since Hadoop's connectors register by scheme;
  *   - anonymous access is used iff the path IS the public catalog
  *     endpoint (`fs.py:67`, endpoint default `cfg.py:7`) — everything
  *     else uses ambient credentials;
  *   - local paths pass through untouched (`fs.py:78-80`).
  *
  * The byte-resume cache the reference layers on top (`fs.py:84-107`) is
  * deliberately not ported: executors stream parquet splits directly and
  * task retry covers transience (SURVEY §2A F3).
  */
object CloudFs {

  /** The reference's public catalog endpoint (`cfg.py:7`). */
  val PublicEndpoint = "gs://pinecone-datasets-dev"

  private val GcsHttps = "https://storage.googleapis.com/"
  private val S3Https = "https://s3.amazonaws.com/"

  /** Cloud-path predicate (reference `is_cloud_path`, `fs.py:16-31`). */
  def isCloudPath(path: String): Boolean =
    path.startsWith("gs://") || path.startsWith("s3://") ||
      path.startsWith("s3a://") ||
      path.startsWith(GcsHttps) || path.startsWith(S3Https)

  /** Rewrite endpoint aliases to the scheme Hadoop's connectors register:
    * `https://storage.googleapis.com/b/p` → `gs://b/p`,
    * `https://s3.amazonaws.com/b/p` → `s3a://b/p`, and the reference's
    * `s3://` spelling → Hadoop's `s3a://`. Everything else is unchanged.
    */
  def normalizeUrl(path: String): String =
    if (path.startsWith(GcsHttps)) "gs://" + path.stripPrefix(GcsHttps)
    else if (path.startsWith(S3Https)) "s3a://" + path.stripPrefix(S3Https)
    else if (path.startsWith("s3://")) "s3a://" + path.stripPrefix("s3://")
    else path

  /** Anonymous iff the (normalized) path is the public endpoint —
    * reference `fs.py:67`: `is_anon = path == cfg.Storage.endpoint`.
    */
  def isAnonymous(path: String, endpoint: String = PublicEndpoint): Boolean =
    normalizeUrl(path) == normalizeUrl(endpoint)

  private def bucketOf(p: String): String =
    p.dropWhile(_ != '/').drop(2).takeWhile(_ != '/')

  /** Hadoop configuration for a path under this policy. Anonymous access
    * maps to the connectors' public unauthenticated modes; authenticated
    * access leaves the ambient credential chain untouched (empty map).
    * The s3a key uses the connector's per-bucket override form
    * (`fs.s3a.bucket.<bucket>.*`), so anonymizing the public bucket can
    * never affect reads of other buckets. The GCS connector has no
    * per-bucket form, so its key is global — [[configure]] compensates by
    * clearing it when a non-anonymous `gs://` path is configured.
    */
  def hadoopConfFor(path: String, endpoint: String = PublicEndpoint): Map[String, String] = {
    val p = normalizeUrl(path)
    if (!isAnonymous(p, endpoint)) Map.empty
    else if (p.startsWith("gs://"))
      Map("fs.gs.auth.type" -> "UNAUTHENTICATED")
    else if (p.startsWith("s3a://"))
      Map(s"fs.s3a.bucket.${bucketOf(p)}.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider")
    else Map.empty
  }

  /** Keys a non-anonymous configure() must restore so an earlier anonymous
    * configure() cannot leak into authenticated reads in the same session
    * (last-configure-wins, never sticky-anon).
    */
  def clearedKeysFor(path: String): Seq[String] = {
    val p = normalizeUrl(path)
    if (p.startsWith("gs://")) Seq("fs.gs.auth.type")
    else if (p.startsWith("s3a://"))
      Seq(s"fs.s3a.bucket.${bucketOf(p)}.aws.credentials.provider")
    else Seq.empty
  }

  /** Pre-anonymous values saved by configure(), keyed by (conf identity,
    * key) so distinct Configurations never cross-restore. Restoring — not
    * blindly unsetting — matters because a cluster's core-site.xml may
    * legitimately set these keys (e.g. `fs.gs.auth.type =
    * SERVICE_ACCOUNT_JSON_KEYFILE`); configure() must only ever undo what
    * configure() itself changed.
    */
  private val savedAuth =
    scala.collection.concurrent.TrieMap.empty[(Int, String), Option[String]]

  /** Apply the policy for `path` to a Hadoop configuration and return the
    * normalized URL to read from. Anonymous paths get the unauthenticated
    * override (per-bucket for s3a), saving the prior value first;
    * non-anonymous paths RESTORE any value an earlier anonymous
    * configure() displaced (set back, or unset if it was absent) —
    * otherwise a session that touched the public endpoint would silently
    * read private buckets unauthenticated forever. Keys this object never
    * touched are left exactly as the cluster configured them.
    */
  def configure(conf: org.apache.hadoop.conf.Configuration, path: String,
      endpoint: String): String = {
    val p = normalizeUrl(path)
    val anon = hadoopConfFor(p, endpoint)
    if (anon.nonEmpty) anon.foreach { case (k, v) =>
      savedAuth.putIfAbsent((System.identityHashCode(conf), k), Option(conf.get(k)))
      conf.set(k, v)
    }
    else clearedKeysFor(p).foreach { k =>
      savedAuth.remove((System.identityHashCode(conf), k)).foreach {
        case Some(prev) => conf.set(k, prev)
        case None => conf.unset(k)
      }
    }
    p
  }

  def configure(spark: SparkSession, path: String,
      endpoint: String = PublicEndpoint): String =
    configure(spark.sparkContext.hadoopConfiguration, path, endpoint)
}
