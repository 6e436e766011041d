package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.Quantization

class QuantizationSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codes are in [0,255]; flat vectors round-trip to qmin") {
    import spark.implicits._
    val q = Quantization.quantize(emb, col("embedding"), keepVector = true)
    val mm = q.select(explode(col("codes")).as("c")).agg(min("c"), max("c")).head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) <= 255)
    val flat = Seq((1L, Array(0.5f, 0.5f, 0.5f))).toDF("id", "v")
    val rec = Quantization.quantize(flat, col("v"))
      .select(Quantization.dequantize(col("codes"), col("qmin"), col("qmax")))
      .head().getSeq[Double](0)
    assert(rec.forall(x => math.abs(x - 0.5) < 1e-9))
  }

  test("reconstruction: cosine fidelity vs original > 0.999, max abs err <= range/255") {
    val q = Quantization.quantize(emb, col("embedding"), keepVector = true)
      .withColumn("dq", Quantization.dequantize(col("codes"), col("qmin"), col("qmax")))
    val fid = q.select(
      avg(GraftFunctions.vecCosine(col("embedding"), col("dq"))).as("f"),
      max(expr(
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), dq, (a, b) -> abs(a - b)), " +
        "CAST(0.0 AS DOUBLE), (acc, x) -> greatest(acc, x))") /
        ((col("qmax") - col("qmin")) / 255.0 * 0.5 + 1e-12)).as("relerr"))
      .head()
    assert(fid.getDouble(0) > 0.999, s"cosine fidelity ${fid.getDouble(0)}")
    assert(fid.getDouble(1) <= 1.0 + 1e-6, s"per-element error above half-step: ${fid.getDouble(1)}")
  }

  test("quantized top-k agrees with exact top-k on most neighbors") {
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cands = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    val qc = Quantization.quantize(cands, col("nvec"))
      .withColumn("nvec", Quantization.dequantize(col("codes"), col("qmin"), col("qmax")))
      .select("nid", "nvec")
    val approx = graft.operators.Similarity.bruteForceTopK(qs, qc, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.operators.Similarity.bruteForceTopK(qs, cands, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall $recall")
  }
}
