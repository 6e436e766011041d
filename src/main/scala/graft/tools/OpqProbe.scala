package graft.tools

import graft.operators.Opq

/** Prints the plain-PQ vs OPQ quantization MSE on OpqSpec's anisotropic
  * construction and on a real-embedding sample — the numbers BASELINE.md
  * records next to q141's recall arms.
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val sd = Array(5.0, 5.0, 5.0, 5.0, 0.1, 0.1, 0.1, 0.1)
    val aniso = Array.fill(512)(Array.tabulate(8)(i => rnd.nextGaussian() * sd(i)))
    val p1 = Opq.train(aniso, m = 4, k = 16, pqIters = 5, opqIters = 0)
    val o1 = Opq.train(aniso, m = 4, k = 16, pqIters = 5, opqIters = 8)
    println(s"OPQPROBE aniso plain=${Opq.quantizationMse(aniso, p1.pq)} " +
      s"opq=${Opq.quantizationMse(aniso, o1.pq, Some(o1.r))}")

    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val real = Opq.sampleVectors(emb, org.apache.spark.sql.functions.col("embedding"), 4096)
    val p2 = Opq.train(real, m = 4, k = 16, pqIters = 3, opqIters = 0)
    val o2 = Opq.train(real, m = 4, k = 16, pqIters = 3, opqIters = 3)
    println(s"OPQPROBE real plain=${Opq.quantizationMse(real, p2.pq)} " +
      s"opq=${Opq.quantizationMse(real, o2.pq, Some(o2.r))}")
    spark.stop()
  }
}
