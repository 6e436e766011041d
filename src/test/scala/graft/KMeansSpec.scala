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
  test("trainPerGroup == per-group train (one distributed pass per iteration, same centroids)") {
    import spark.implicits._
    // well-separated per-group clusters so seed ties and FP summation
    // order (the only difference between the union pass and per-group
    // passes) cannot flip an assignment
    val rows = for {
      g <- 0 until 3
      c <- 0 until 2
      i <- 0 until 12
    } yield (g, Array.tabulate(4)(d =>
      1000.0 * g + 100.0 * c + math.sin(g * 31 + c * 7 + i * 3 + d) * 0.1))
    val df = rows.toDF("g", "v")
    val grouped = KMeans.trainPerGroup(df, col("g"), col("v"), k = 2, iters = 3)
    assert(grouped.keySet == Set(0, 1, 2))
    (0 until 3).foreach { g =>
      val solo = KMeans.train(df.filter(col("g") === g), col("v"), k = 2, iters = 3)
      val got = grouped(g)
      assert(got.length == solo.length, s"group $g: ${got.length} vs ${solo.length}")
      got.zip(solo).foreach { case (a, b) =>
        a.zip(b).foreach { case (x, y) =>
          assert(math.abs(x - y) < 1e-9, s"group $g centroid drift: $x vs $y")
        }
      }
    }
    // a group with fewer than k rows keeps that many centroids
    val tiny = Seq((0, Array(1.0, 2.0, 3.0, 4.0))).toDF("g", "v")
    val one = KMeans.trainPerGroup(tiny, col("g"), col("v"), k = 4, iters = 2)
    assert(one(0).length == 1)
  }
}
