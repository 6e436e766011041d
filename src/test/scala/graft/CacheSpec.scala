package graft

import java.nio.file.{Files, Paths}

import graft.sources.DatasetCache

/** Parity checks for the driver-side download cache against the reference
  * CacheManager semantics (`cache.py`): sha-keyed paths, size-only
  * validation, `.partial`/`.meta` resume, sidecar-aware clear/info, and
  * the module-level global manager.
  */
class CacheSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def newCache() = new DatasetCache(
    Files.createTempDirectory("graft-cache-").toString)

  private def writeSrc(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("cache key: deterministic sha prefix, extension preserved") {
    val c = newCache()
    val a = c.cachePath("gs://bucket/ds/metadata.json")
    val b = c.cachePath("gs://bucket/ds/metadata.json")
    assert(a == b)
    assert(a.getFileName.toString.endsWith(".json"))
    assert(a.getFileName.toString.length == 16 + ".json".length)
    assert(c.cachePath("gs://bucket/other/metadata.json") != a,
      "different URLs must key differently")
    assert(c.cachePath("gs://bucket/ds/noext").getFileName.toString.length == 16)
  }

  test("getCachedPath: downloads once, then serves the cached copy (size-validated)") {
    val c = newCache()
    val srcDir = Files.createTempDirectory("graft-cache-src-").toString
    val src = writeSrc(srcDir, "metadata.json", """{"name": "ds1"}""")
    val url = s"file:$src"

    val first = c.getCachedPath(url, conf)
    assert(new String(Files.readAllBytes(Paths.get(first)), "UTF-8") == """{"name": "ds1"}""")
    assert(c.isCached(url, conf))
    // no sidecars survive a completed download
    assert(!Files.exists(Paths.get(first + ".meta")))
    assert(!Files.exists(Paths.get(first + ".partial")))

    // SAME-SIZE remote change: the reference validates by size only, so
    // the stale copy is served — faithful parity, not a bug here
    Files.write(Paths.get(src), """{"name": "ds2"}""".getBytes("UTF-8"))
    assert(new String(Files.readAllBytes(
      Paths.get(c.getCachedPath(url, conf))), "UTF-8") == """{"name": "ds1"}""")

    // size change invalidates and re-downloads
    Files.write(Paths.get(src), """{"name": "ds2-changed"}""".getBytes("UTF-8"))
    assert(!c.isCached(url, conf))
    assert(new String(Files.readAllBytes(
      Paths.get(c.getCachedPath(url, conf))), "UTF-8") == """{"name": "ds2-changed"}""")
  }

  test("resume: a valid partial continues from its byte offset; stale meta restarts") {
    val c = newCache()
    val srcDir = Files.createTempDirectory("graft-cache-src-").toString
    val content = "0123456789" * 100
    val src = writeSrc(srcDir, "blob.parquet", content)
    val url = s"file:$src"
    val cp = c.cachePath(url)
    val etag = new org.apache.hadoop.fs.Path(url)
      .getFileSystem(conf).getFileStatus(new org.apache.hadoop.fs.Path(url))
      .getModificationTime.toString

    // plant a CORRUPTED 100-byte partial with valid meta: if the fetch
    // resumes (as it must), the corruption survives in the final bytes —
    // proof it continued from byte 100 instead of restarting
    val corrupted = "X" * 100
    Files.write(Paths.get(cp.toString + ".partial"), corrupted.getBytes("UTF-8"))
    Files.write(Paths.get(cp.toString + ".meta"),
      s"""{"remote_url":"$url","expected_size":${content.length},"downloaded_bytes":100,"etag":"$etag"}"""
        .getBytes("UTF-8"))
    val got = new String(Files.readAllBytes(Paths.get(c.getCachedPath(url, conf))), "UTF-8")
    assert(got == corrupted + content.substring(100),
      "download did not resume from the partial's offset")

    // stale meta (wrong expected_size): partial is discarded, full restart
    Files.delete(cp)
    Files.write(Paths.get(cp.toString + ".partial"), corrupted.getBytes("UTF-8"))
    Files.write(Paths.get(cp.toString + ".meta"),
      s"""{"remote_url":"$url","expected_size":1,"downloaded_bytes":100,"etag":"$etag"}"""
        .getBytes("UTF-8"))
    val fresh = new String(Files.readAllBytes(Paths.get(c.getCachedPath(url, conf))), "UTF-8")
    assert(fresh == content, "stale partial must restart from byte 0")
  }

  test("progress: download reports monotone byte updates ending at the total") {
    import graft.sources.Progress
    val c = newCache()
    val srcDir = Files.createTempDirectory("graft-cache-src-").toString
    // >1 MiB so the 1 MiB buffer loop reports more than once
    val body = "x" * (1024 * 1024 + 4096)
    val src = writeSrc(srcDir, "big.bin", body)
    val rec = new Progress.Recording
    c.getCachedPath(s"file:$src", conf, rec)
    val ev = rec.events.toSeq
    assert(ev.size >= 2, s"expected multiple buffer updates, got $ev")
    assert(ev.forall(_._3 == body.length.toLong))
    assert(ev.map(_._2) == ev.map(_._2).sorted, "byte counts must be monotone")
    assert(ev.last._2 == body.length.toLong, "final update must reach the total")
    // the default is the reference's dummy-tqdm: no listener, no cost
    val c2 = newCache()
    c2.getCachedPath(s"file:$src", conf)
  }

  test("cacheInfo excludes sidecars; clearCache counts them; pattern filters") {
    val c = newCache()
    Files.write(Paths.get(c.cacheDir, "aa11.parquet"), Array.fill(10)('x'.toByte))
    Files.write(Paths.get(c.cacheDir, "bb22.json"), Array.fill(5)('y'.toByte))
    Files.write(Paths.get(c.cacheDir, "aa11.parquet.meta"), "{}".getBytes)
    Files.write(Paths.get(c.cacheDir, "aa11.parquet.partial"), "zz".getBytes)

    val info = c.cacheInfo()
    assert(info.fileCount == 2, s"sidecars must not count: $info")
    assert(info.totalSizeBytes == 15)
    assert(info.cacheDir == c.cacheDir)

    // pattern clear: only the parquet family (+its sidecars) goes
    assert(c.clearCache(Some("*.parquet")) == 3)
    assert(Files.exists(Paths.get(c.cacheDir, "bb22.json")))
    // clear-all removes the rest
    assert(c.clearCache() == 1)
    assert(c.cacheInfo().fileCount == 0)
  }

  test("module API: setCacheDir replaces the global manager") {
    val dir = Files.createTempDirectory("graft-cache-global-").toString
    DatasetCache.setCacheDir(dir)
    assert(DatasetCache.cacheManager().cacheDir == dir)
    Files.write(Paths.get(dir, "cc33.json"), "abc".getBytes)
    assert(DatasetCache.cacheInfo().fileCount == 1)
    assert(DatasetCache.clearCache() == 1)
    assert(DatasetCache.cacheInfo().fileCount == 0)
    // env-driven default is the reference's public surface; with no env
    // set the fallback is the reference's home-dir default
    if (!sys.env.contains("PINECONE_DATASETS_CACHE_DIR"))
      assert(DatasetCache.defaultCacheDir.endsWith("/.pinecone-datasets/cache"))
    assert(DatasetCache.useCache) // default true
  }
}
