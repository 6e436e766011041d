package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

/** Driver-side download cache for remote dataset files — the user-facing
  * cache surface of the reference (`cache.py`), ported for the one place a
  * Spark engine legitimately wants it: small driver-read files
  * (metadata.json, catalog listings). Table parquet is still streamed by
  * executors (SURVEY F3's rationale stands — task retry covers transience
  * there), so nothing here ever runs on an executor.
  *
  * Parity map (reference `cache.py`):
  *   - cache key: `sha256(url)[:16] + extension` (`cache.py:34-50`)
  *   - sidecars: `<key>.partial` (in-flight bytes) + `<key>.meta` (JSON
  *     with remote_url / expected_size / downloaded_bytes / etag,
  *     `cache.py:52-58,78-103`)
  *   - validation: cached file is valid iff its SIZE equals the remote's
  *     (`cache.py:120-142` — content is not hashed; a same-size remote
  *     change serves stale bytes, faithfully mirrored)
  *   - resume: a partial download resumes from its byte length when the
  *     meta's url/size/etag still match the remote (`cache.py:144-178`,
  *     etag = modification time here, the fallback the reference uses
  *     when no ETag header exists)
  *   - lifecycle: download to `.partial`, rename into place, drop `.meta`
  *     (`cache.py:300-311`)
  *   - module API: [[DatasetCache.cacheInfo]] / [[DatasetCache.clearCache]]
  *     / [[DatasetCache.setCacheDir]] over a lazily-created global manager
  *     (`cache.py:358-430`); default dir honors the reference's public
  *     `PINECONE_DATASETS_CACHE_DIR` env (`cfg.py:10-13`), gate honors
  *     `PINECONE_DATASETS_USE_CACHE` (`cfg.py:14-16`).
  */
final class DatasetCache(val cacheDir: String) {

  Files.createDirectories(Paths.get(cacheDir))

  /** Deterministic local path for a remote URL: 16 hex chars of the URL's
    * sha256 plus the preserved extension (`cache.py:34-50`).
    */
  def cachePath(remoteUrl: String): Path = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(remoteUrl.getBytes("UTF-8"))
    val hash = digest.take(8).map(b => f"${b & 0xff}%02x").mkString
    val base = remoteUrl.substring(remoteUrl.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    val ext = if (dot > 0) base.substring(dot) else ""
    Paths.get(cacheDir, hash + ext)
  }

  private def metaPath(cp: Path): Path = Paths.get(cp.toString + ".meta")
  private def partialPath(cp: Path): Path = Paths.get(cp.toString + ".partial")

  private def remoteStatus(remoteUrl: String, conf: Configuration) = {
    val p = new HPath(remoteUrl)
    p.getFileSystem(conf).getFileStatus(p)
  }

  /** Fully cached and still size-valid against the remote (`cache.py:313`). */
  def isCached(remoteUrl: String, conf: Configuration): Boolean = {
    val cp = cachePath(remoteUrl)
    Files.exists(cp) &&
      (try Files.size(cp) == remoteStatus(remoteUrl, conf).getLen
      catch { case _: Exception => false })
  }

  private def writeMeta(
      mp: Path, remoteUrl: String, expected: Long, downloaded: Long, etag: String): Unit = {
    val json =
      s"""{"remote_url":${org.json4s.jackson.JsonMethods.compact(
        org.json4s.JString(remoteUrl))},"expected_size":$expected,""" +
        s""""downloaded_bytes":$downloaded,"etag":"$etag"}"""
    Files.write(mp, json.getBytes("UTF-8"))
  }

  private def readMeta(mp: Path): Option[Map[String, Any]] =
    try {
      import org.json4s.{JInt, JObject, JString}
      org.json4s.jackson.JsonMethods.parse(
        new String(Files.readAllBytes(mp), "UTF-8")) match {
        case JObject(fields) => Some(fields.toMap.collect {
          case (k, JString(s)) => k -> s
          case (k, JInt(i)) => k -> i.toLong
        })
        case _ => None
      }
    } catch { case _: Exception => None }

  /** Local path to the (validated) cached copy, downloading or resuming as
    * needed — the reference's main entry point (`cache.py:257-311`).
    * Driver-side only; `conf` resolves any Hadoop-supported scheme.
    */
  def getCachedPath(remoteUrl: String, conf: Configuration,
      progress: Progress = Progress.Noop): String = {
    val cp = cachePath(remoteUrl)
    val pp = partialPath(cp)
    val mp = metaPath(cp)
    val st = remoteStatus(remoteUrl, conf)
    val remoteSize = st.getLen
    val etag = st.getModificationTime.toString

    if (Files.exists(cp)) {
      if (Files.size(cp) == remoteSize) return cp.toString
      Files.delete(cp) // size drifted: invalid, re-fetch
    }
    // resume only when the sidecar metadata still describes this remote
    var start = 0L
    if (Files.exists(pp) && Files.exists(mp)) {
      val ok = readMeta(mp).exists { m =>
        m.get("remote_url").contains(remoteUrl) &&
          m.get("expected_size").contains(remoteSize) &&
          m.get("etag").forall(_ == etag)
      }
      if (ok) start = Files.size(pp)
      else { Files.deleteIfExists(pp); Files.deleteIfExists(mp) }
    }
    writeMeta(mp, remoteUrl, remoteSize, start, etag)
    val in = new HPath(remoteUrl).getFileSystem(conf).open(new HPath(remoteUrl))
    try {
      if (start > 0) in.seek(start)
      val out = new java.io.FileOutputStream(pp.toFile, start > 0)
      try {
        val buf = new Array[Byte](1024 * 1024)
        var fetched = start
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          fetched += n
          // byte-level progress, the reference's cache.py:223-230 loop
          progress.update(remoteUrl, fetched, remoteSize)
          n = in.read(buf)
        }
      } finally out.close()
    } finally in.close()
    Files.move(pp, cp, StandardCopyOption.REPLACE_EXISTING)
    Files.deleteIfExists(mp)
    cp.toString
  }

  /** Cache statistics; sidecars are excluded from size and count
    * (`cache.py:364-390`).
    */
  def cacheInfo(): DatasetCache.CacheInfo = {
    var bytes = 0L
    var count = 0
    val root = Paths.get(cacheDir)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.forEach { p =>
        val name = p.getFileName.toString
        if (Files.isRegularFile(p) && !name.endsWith(".meta") && !name.endsWith(".partial")) {
          bytes += Files.size(p)
          count += 1
        }
      } finally walk.close()
    }
    DatasetCache.CacheInfo(
      cacheDir, bytes,
      math.rint(bytes / (1024.0 * 1024.0) * 100) / 100,
      math.rint(bytes / (1024.0 * 1024.0 * 1024.0) * 100) / 100,
      count)
  }

  /** Remove cached files matching the glob `pattern` (all files when
    * None), counting removed sidecars like the reference (`cache.py:329`).
    */
  def clearCache(pattern: Option[String] = None): Int = {
    val root = Paths.get(cacheDir)
    if (!Files.exists(root)) return 0
    val matcher = pattern.map(p =>
      root.getFileSystem.getPathMatcher("glob:" + p))
    var count = 0
    val stream = Files.list(root)
    val files = try {
      val b = Vector.newBuilder[Path]
      stream.forEach(p => b += p)
      b.result()
    } finally stream.close()
    files.foreach { p =>
      if (Files.isRegularFile(p) &&
        matcher.forall(_.matches(p.getFileName))) {
        Files.delete(p)
        count += 1
        Seq(".meta", ".partial").foreach { suf =>
          val side = Paths.get(p.toString + suf)
          if (Files.exists(side)) { Files.delete(side); count += 1 }
        }
      }
    }
    count
  }
}

object DatasetCache {

  final case class CacheInfo(
      cacheDir: String,
      totalSizeBytes: Long,
      totalSizeMb: Double,
      totalSizeGb: Double,
      fileCount: Int)

  /** Reference default (`cfg.py:10-13`): env override or
    * `~/.pinecone-datasets/cache`.
    */
  def defaultCacheDir: String =
    sys.env.getOrElse("PINECONE_DATASETS_CACHE_DIR",
      System.getProperty("user.home") + "/.pinecone-datasets/cache")

  /** Reference gate (`cfg.py:14-16`): caching on unless the env says no. */
  def useCache: Boolean =
    sys.env.getOrElse("PINECONE_DATASETS_USE_CACHE", "true")
      .toLowerCase match { case "true" | "1" | "yes" => true; case _ => false }

  @volatile private var manager: Option[DatasetCache] = None

  /** The lazily-created global manager (`cache.py:362-368`). */
  def cacheManager(): DatasetCache = synchronized {
    manager match {
      case Some(m) => m
      case None =>
        val m = new DatasetCache(defaultCacheDir)
        manager = Some(m)
        m
    }
  }

  /** Replace the global manager's directory (`cache.py:409-417`). */
  def setCacheDir(dir: String): Unit = synchronized {
    manager = Some(new DatasetCache(dir))
  }

  /** Module-level statistics of the global manager (`cache.py:420-422`). */
  def cacheInfo(): CacheInfo = cacheManager().cacheInfo()

  /** Module-level clear of the global manager (`cache.py:425-430`). */
  def clearCache(pattern: Option[String] = None): Int =
    cacheManager().clearCache(pattern)
}
