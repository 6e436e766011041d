package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: stage timing of KMeans training at sf0.1. */
object ProfileKMeans {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    spark.range(1000000).count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("nid"), col("embedding").cast("array<double>").as("v"))
    val init = time("init")(graft.operators.KMeans.train(base, col("v"), 8, iters = 0))
    time("1 iter")(graft.operators.KMeans.train(base, col("v"), 8, iters = 1))
    time("3 iters")(graft.operators.KMeans.train(base, col("v"), 8, iters = 3))
    time("sse")(println("  sse=" + graft.operators.KMeans.sse(base, col("v"), init)))
    val idx = time("buildTrained")(graft.operators.IvfIndex.buildTrained(
      base.select(col("nid"), col("v").as("nvec")), 8, 3))
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    time("search")(idx.search(qs, 10, 3).count())
    spark.stop()
  }
}
