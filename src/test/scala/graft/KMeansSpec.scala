package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, KMeans, Similarity}

class KMeansSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("train: k centroids of full dim; Lloyd iterations do not increase SSE") {
    val zero = KMeans.train(emb, col("embedding"), k = 8, iters = 0)
    assert(zero.length == 8 && zero.forall(_.length == 64))
    val one = KMeans.train(emb, col("embedding"), k = 8, iters = 1)
    val three = KMeans.train(emb, col("embedding"), k = 8, iters = 3)
    val s0 = KMeans.sse(emb, col("embedding"), zero)
    val s1 = KMeans.sse(emb, col("embedding"), one)
    val s3 = KMeans.sse(emb, col("embedding"), three)
    assert(s1 <= s0 + 1e-9, s"SSE rose after 1 iter: $s0 -> $s1")
    assert(s3 <= s1 + 1e-9, s"SSE rose after 3 iters: $s1 -> $s3")
    // deterministic: same data, same init, same result
    assert(KMeans.train(emb, col("embedding"), k = 8, iters = 3)
      .map(_.toSeq).toSeq == three.map(_.toSeq).toSeq)
  }

  test("assignCell: every vector lands in [0, k); probeCells returns nprobe distinct") {
    val cents = KMeans.train(emb, col("embedding"), k = 8, iters = 2)
    val cells = emb.select(
      KMeans.assignCell(col("embedding").cast("array<double>"), cents).as("cell"))
    val minMax = cells.agg(min("cell"), max("cell")).head()
    assert(minMax.getInt(0) >= 0 && minMax.getInt(1) < 8)
    // the codebook is actually used: more than one populated cell
    assert(cells.distinct().count() > 1)
    val probes = emb.limit(5).select(
      KMeans.probeCells(col("embedding").cast("array<double>"), cents, 3).as("p"))
      .collect().map(_.getSeq[Int](0))
    probes.foreach(p => assert(p.length == 3 && p.distinct.length == 3))
  }

  test("trained IVF search: recall@10 beats the candidate fraction scanned") {
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cands = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    val idx = IvfIndex.buildTrained(cands, nlist = 8, iters = 3)
    try {
      val approx = idx.search(qs, k = 10, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = Similarity.bruteForceTopK(qs, cands, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.count(approx.contains).toDouble / exact.size
      // probing 3/8 cells scans ~0.4 of candidates; trained cells must
      // concentrate true neighbors well above that floor
      assert(recall >= 0.6, s"recall@10 = $recall")
    } finally idx.unpersist()
  }
}
