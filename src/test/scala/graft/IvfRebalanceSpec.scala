package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Similarity}

class IvfRebalanceSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  private def cands = emb.filter(col("vec_id") >= 10)
    .select(col("vec_id").as("nid"), col("embedding").as("nvec"))
  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def buildDisk(nlist: Int) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-rebal-").toString
    val idx = IvfIndex.buildTrained(cands, nlist = nlist, iters = 2)
    val disk = idx.save(spark, tmp)
    idx.unpersist()
    disk
  }

  private def cellFiles(dir: String, cell: Int): Set[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/cell=$cell")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(s => (s.getPath.getName, s.getModificationTime)).toSet
  }

  test("rebalance splits only overfull cells; rows preserved; cold files untouched") {
    val disk = buildDisk(nlist = 2)
    val before = spark.read.parquet(disk.dir)
      .groupBy("cell").count().collect()
      .map(r => r.getAs[Int]("cell") -> r.getLong(1)).toMap
    // threshold between the two cell sizes: exactly one cell is hot
    val sizes = before.values.toSeq.sorted
    assume(sizes.length == 2 && sizes(0) < sizes(1))
    val threshold = sizes(0)
    val coldCell = before.minBy(_._2)._1
    val hotCell = before.maxBy(_._2)._1
    val coldBefore = cellFiles(disk.dir, coldCell)

    val rebal = disk.rebalance(maxCellRows = threshold, kSplit = 2, iters = 2)

    // codebook grew by exactly one (kSplit - 1 per split cell)
    assert(rebal.centroids.length == disk.centroids.length + 1)
    // the cold cell's centroid and files are bit-identical
    assert(rebal.centroids(coldCell).toSeq == disk.centroids(coldCell).toSeq)
    assert(cellFiles(rebal.dir, coldCell) == coldBefore)
    // every row survives exactly once, under a valid cell id
    val after = spark.read.parquet(rebal.dir)
    assert(after.count() == before.values.sum)
    assert(after.select("nid").distinct().count() == before.values.sum)
    val afterCells = after.groupBy("cell").count().collect()
      .map(r => r.getAs[Int]("cell") -> r.getLong(1)).toMap
    assert(afterCells.keySet.subsetOf(rebal.centroids.indices.toSet))
    // the hot cell really was split: no remaining cell exceeds its old size
    assert(afterCells.values.forall(_ < before(hotCell)))
  }

  test("full-probe search after rebalance equals brute force (no row lost or doubled)") {
    val disk = buildDisk(nlist = 2)
    val rebal = disk.rebalance(maxCellRows = 5, kSplit = 2, iters = 2)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val brute = key(Similarity.bruteForceTopK(queries, cands, k = 8))
    val full = key(rebal.search(queries, k = 8, nprobe = rebal.centroids.length))
    assert(full == brute)
  }

  test("rebalance with a high threshold is a no-op (same index, nothing touched)") {
    val disk = buildDisk(nlist = 2)
    val filesBefore = (0 until disk.centroids.length)
      .map(c => cellFiles(disk.dir, c)).toSet
    val rebal = disk.rebalance(maxCellRows = 1000000L)
    assert(rebal eq disk)
    assert((0 until disk.centroids.length).map(c => cellFiles(disk.dir, c)).toSet
      == filesBefore)
  }

  test("PQ layout: rebalance re-encodes the split cell and full-probe refined search stays exact") {
    import graft.operators.IvfPq
    val tmp = java.nio.file.Files.createTempDirectory("graft-rebal-pq-").toString
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val pq = IvfPq.buildTrained(spark, cands, tmp, dim = dim,
      nlist = 2, m = 4, k = 16, iters = 2)
    val n = cands.count()
    val rebal = pq.rebalance(maxCellRows = 5, kSplit = 2, iters = 2)
    assert(rebal.codebooks.centroids.length > pq.codebooks.centroids.length)
    // frozen fine codebooks: only the coarse table grew
    assert(rebal.codebooks.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      pq.codebooks.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val after = spark.read.parquet(tmp)
    assert(after.count() == n && after.select("nid").distinct().count() == n)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val brute = key(Similarity.bruteForceTopKDot(queries, cands, k = 8))
    val refined = key(rebal.searchRefined(queries, k = 8,
      nprobe = rebal.codebooks.centroids.length, rerank = n.toInt))
    assert(refined == brute)
  }

  test("a layout whose every cell is hot splits every cell") {
    val disk = buildDisk(nlist = 2)
    val rebal = disk.rebalance(maxCellRows = 1, kSplit = 2, iters = 1)
    assert(rebal.centroids.length == disk.centroids.length + 2)
    assert(spark.read.parquet(rebal.dir).count() == cands.count())
  }
}
