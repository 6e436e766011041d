package graft

import org.apache.spark.sql.functions._

import graft.operators.{Opq, ProductQuantization}

class OpqSpec extends SparkSpec {

  // Anisotropic corpus PQ handles badly BY CONSTRUCTION: independent
  // Gaussian dims whose variance lives entirely in the first half, so
  // PQ's axis-aligned grid overloads subspaces 0-1 (two big dims each)
  // while subspaces 2-3 quantize near-zeros with the same code budget.
  // The high-resolution 2-D distortion of a k-cell quantizer scales with
  // sqrt(λ1·λ2), so the optimal rotation pairs big dims with small ones —
  // exactly what OPQ's Procrustes alternation must discover.
  private lazy val anisotropic: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    val sd = Array(5.0, 5.0, 5.0, 5.0, 0.1, 0.1, 0.1, 0.1)
    Array.fill(512)(Array.tabulate(8)(i => rnd.nextGaussian() * sd(i)))
  }

  private lazy val realSample: Array[Array[Double]] = {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    Opq.sampleVectors(emb, col("embedding"), maxSample = 256)
  }

  test("the learned rotation is orthogonal (R'R = I to 1e-9)") {
    val model = Opq.train(anisotropic, m = 4, k = 16, pqIters = 3, opqIters = 3)
    val d = model.dim
    val maxDev = (for (i <- 0 until d; j <- 0 until d) yield {
      val dot = (0 until d).map(t => model.r(t)(i) * model.r(t)(j)).sum
      math.abs(dot - (if (i == j) 1.0 else 0.0))
    }).max
    assert(maxDev < 1e-9, s"R'R deviates from I by $maxDev")
  }

  test("OPQ cuts quantization MSE well below plain PQ on anisotropic data") {
    val plain = Opq.train(anisotropic, m = 4, k = 16, pqIters = 5, opqIters = 0)
    val opq = Opq.train(anisotropic, m = 4, k = 16, pqIters = 5, opqIters = 8)
    val msePlain = Opq.quantizationMse(anisotropic, plain.pq)
    val mseOpq = Opq.quantizationMse(anisotropic, opq.pq, Some(opq.r))
    // rotation preserves norms, so the two MSEs are directly comparable
    assert(mseOpq < 0.7 * msePlain,
      s"expected a decisive lift: opq=$mseOpq plain=$msePlain")
    // and opqIters=0 really is the identity baseline
    assert(plain.r.zipWithIndex.forall { case (row, i) =>
      row.zipWithIndex.forall { case (v, j) => v == (if (i == j) 1.0 else 0.0) } })
  }

  test("training is deterministic (same sample, same model twice)") {
    val a = Opq.train(realSample, m = 4, k = 16, pqIters = 2, opqIters = 2)
    val b = Opq.train(realSample, m = 4, k = 16, pqIters = 2, opqIters = 2)
    assert(a.r.map(_.toSeq).toSeq == b.r.map(_.toSeq).toSeq)
    assert(a.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      b.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("rotate() column equals the driver-side rotation, rounded to 9 decimals") {
    val model = Opq.train(realSample, m = 4, k = 16, pqIters = 2, opqIters = 2)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(20).select(col("vec_id"), col("embedding"))
    val got = emb
      .select(col("vec_id"), Opq.rotate(col("embedding"), model.r).as("rv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val want = emb.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      r.getLong(0) -> model.r.map(row =>
        BigDecimal(row.zip(v).map { case (a, b) => a * b }.sum)
          .setScale(Opq.RotateScale, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    got.foreach { case (id, rv) =>
      rv.zip(want(id)).foreach { case (g, w) =>
        assert(math.abs(g - w) < 2e-9, s"vec $id: $g vs $w") }
    }
  }

  test("OPQ beats plain PQ recall end-to-end on anisotropic vectors") {
    import graft.operators.{Evaluation, Similarity}
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val sd = Array(5.0, 5.0, 5.0, 5.0, 0.1, 0.1, 0.1, 0.1)
    def vec() = Array.tabulate(8)(i => rnd.nextGaussian() * sd(i))
    val cands = (0 until 512).map(i => (i.toLong, vec().toSeq))
    val qs = (1000 until 1032).map(i => (i.toLong, vec().toSeq))
    val cdf = cands.toDF("nid", "nvec")
    val qdf = qs.toDF("qid", "qvec")
    val sample = cands.map(_._2.toArray).toArray
    val plain = Opq.train(sample, m = 4, k = 16, pqIters = 5, opqIters = 0)
    val opq = Opq.train(sample, m = 4, k = 16, pqIters = 5, opqIters = 8)
    val ref = Similarity.bruteForceTopKDot(qdf, cdf, k = 10)
    def recallOf(model: Opq.OpqModel, rotated: Boolean): Double = {
      val c = if (rotated)
        cdf.select(col("nid"), Opq.rotate(col("nvec"), model.r).as("v"))
      else cdf.select(col("nid"), col("nvec").cast("array<double>").as("v"))
      val q = if (rotated)
        qdf.select(col("qid"), Opq.rotate(col("qvec"), model.r).as("qvec"))
      else qdf
      val enc = c.select(col("nid"),
        ProductQuantization.encode(col("v"), model.pq).as("codes"))
      Evaluation.recallAtK(ref, ProductQuantization.adcTopK(q, enc, model.pq, k = 10))
        .agg(avg("recall")).head().getDouble(0)
    }
    val plainR = recallOf(plain, rotated = false)
    val opqR = recallOf(opq, rotated = true)
    // a 6.5x reconstruction-error cut must show up in the end metric
    assert(opqR > plainR + 0.1, s"opq=$opqR plain=$plainR")
  }

  test("rotated ADC search returns the same schema and k rows per query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cs = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    val model = Opq.trainOnSample(cs, col("nvec"), m = 4, k = 16,
      pqIters = 2, opqIters = 2, maxSample = 256)
    val enc = cs.select(col("nid"),
      ProductQuantization.encode(
        Opq.rotate(col("nvec"), model.r), model.pq).as("codes"))
    val rq = qs.select(col("qid"), Opq.rotate(col("qvec"), model.r).as("qvec"))
    val top = ProductQuantization.adcTopK(rq, enc, model.pq, k = 7)
    val perQ = top.groupBy("qid").count().collect().map(_.getLong(1)).toSet
    assert(perQ == Set(7L))
    assert(top.columns.toSeq == Seq("qid", "nid", "score", "rnk"))
  }
}
