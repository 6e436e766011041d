package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** The persisted-layout discipline (LayoutMeta): every index layout's
  * metadata file doubles as a completeness marker (written last, so a
  * missing file = interrupted writer, named error) and carries a format
  * stamp (layout-shape changes are refused up front, never misread) —
  * while format-less layouts written before the stamp still open.
  */
class LayoutMetaSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def hfs = new org.apache.hadoop.fs.Path("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def delete(path: String): Unit =
    hfs.delete(new org.apache.hadoop.fs.Path(path), false)

  private def overwrite(path: String, content: String): Unit = {
    // drop the checksum sidecar — a raw overwrite bypasses Hadoop's crc
    val p = new java.io.File(path)
    new java.io.File(p.getParent, "." + p.getName + ".crc").delete()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path), content.getBytes("UTF-8"))
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "pack my box with five dozen liquor jugs for the long trip"),
    (3L, "the quick brown fox naps while the lazy dog watches closely"))
    .toDF("doc_id", "text")

  test("LmIndex: truncated layout (no metadata) fails with the completeness error; format mismatch is refused") {
    val dir = tmp("graft-meta-lm-")
    LmIndex.save(docs, col("doc_id"), col("text"), dir, vocabSize = 50, bigramTable = 50)
    delete(s"$dir/metadata.json")
    val e = intercept[IllegalArgumentException] { LmIndex.open(spark, dir) }
    assert(e.getMessage.contains("incomplete"), e.getMessage)
    overwrite(s"$dir/metadata.json",
      """{"format": 99, "vocab_size": 50, "bigram_table": 50,
        | "lambda": 0.7, "oov_count": 0.5, "n_total": 10.0}""".stripMargin)
    val f = intercept[IllegalArgumentException] { LmIndex.open(spark, dir) }
    assert(f.getMessage.contains("format 99"), f.getMessage)
  }

  test("LmIndex: a format-less (pre-stamp) metadata file still opens as format 1") {
    val dir = tmp("graft-meta-lmv1-")
    val idx = LmIndex.save(docs, col("doc_id"), col("text"), dir,
      vocabSize = 50, bigramTable = 50)
    val before = idx.score(docs, col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    overwrite(s"$dir/metadata.json",
      s"""{"vocab_size": 50, "bigram_table": 50,
         | "lambda": 0.7, "oov_count": 0.5, "n_total": ${idx.params.nTotal}}""".stripMargin)
    val reopened = LmIndex.open(spark, dir)
    val after = reopened.score(docs, col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(after == before)
  }

  test("TokenizerIndex: truncated layout fails with the completeness error, not a parquet stack") {
    val dir = tmp("graft-meta-tok-")
    TokenizerIndex.save(docs, col("text"), dir, numMerges = 4, capWords = 32)
    delete(s"$dir/metadata.json")
    val e = intercept[IllegalArgumentException] { TokenizerIndex.open(spark, dir) }
    assert(e.getMessage.contains("tokenizer") && e.getMessage.contains("incomplete"),
      e.getMessage)
  }

  test("DedupIndex: format mismatch refused; format-less metadata still opens") {
    val dir = tmp("graft-meta-dedup-")
    DedupIndex.save(docs, col("doc_id"), col("text"), dir)
    overwrite(s"$dir/metadata.json",
      """{"format": 7, "threshold": 0.5, "shingle_size": 2,
        | "num_hashes": 63, "bands": 21, "seed": 42}""".stripMargin)
    val e = intercept[IllegalArgumentException] { DedupIndex.open(spark, dir) }
    assert(e.getMessage.contains("format 7"), e.getMessage)
    overwrite(s"$dir/metadata.json",
      """{"threshold": 0.5, "shingle_size": 2,
        | "num_hashes": 63, "bands": 21, "seed": 42}""".stripMargin)
    val idx = DedupIndex.open(spark, dir)
    assert(idx.admit(docs.limit(1), col("doc_id"), col("text")).count() == 1)
  }

  private def vecs = (0L until 40L)
    .map(i => (i, Array.tabulate(4)(d => math.sin(i * 7.0 + d))))
    .toDF("nid", "nvec")

  test("DiskIvfIndex: new centroids file is format-stamped; a legacy bare-array file still loads") {
    val dir = tmp("graft-meta-ivf-")
    val idx = IvfIndex.buildTrained(vecs, nlist = 2, iters = 2)
    val disk = idx.save(spark, dir)
    idx.unpersist()
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_centroids.json")), "UTF-8")
    assert(json.contains("\"format\": 1"), json)
    // legacy layout: the bare centroid matrix (what pre-stamp builds wrote)
    val bare = disk.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    overwrite(s"$dir/_centroids.json", bare)
    assert(IvfIndex.load(spark, dir).centroids.length == disk.centroids.length)
    // missing file = incomplete layout, named error
    delete(s"$dir/_centroids.json")
    val e = intercept[IllegalArgumentException] { IvfIndex.load(spark, dir) }
    assert(e.getMessage.contains("IVF index"), e.getMessage)
  }

  test("DiskIvfPqIndex: truncated layout fails with the completeness error; format mismatch refused") {
    val dir = tmp("graft-meta-ivfpq-")
    IvfPq.buildTrained(spark, vecs, dir, dim = 4, nlist = 2, m = 2, k = 4, iters = 2)
    val path = s"$dir/_ivfpq_codebooks.json"
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    assert(json.contains("\"format\": 1"), json)
    overwrite(path, json.replace("\"format\": 1", "\"format\": 3"))
    val e = intercept[IllegalArgumentException] { IvfPq.load(spark, dir) }
    assert(e.getMessage.contains("format 3"), e.getMessage)
    delete(path)
    val f = intercept[IllegalArgumentException] { IvfPq.load(spark, dir) }
    assert(f.getMessage.contains("incomplete"), f.getMessage)
  }
}
