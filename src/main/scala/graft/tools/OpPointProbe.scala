package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of q128's `ivfpq_op` arm — attributes the arm's
  * bench cost to (opq-train | build | adc-search | refined-search) so an
  * optimization targets the stage that actually dominates. Also prints
  * the file count of the built layout (a tasks×cells small-file write
  * shows up here long before it shows up at 100 TB).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.tools.OpPointProbe`
  */
object OpPointProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[oppoint] $name%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val qs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cs = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    cs.count() // warm the scan
    val model = timed("opq_train") {
      val sample = graft.operators.Opq.sampleVectors(cs, col("nvec"), maxSample = 4096)
      graft.operators.Opq.train(sample, m = 16, k = 16, pqIters = 3, opqIters = 3)
    }
    val csRot = cs.select(col("nid"),
      graft.operators.Opq.rotate(col("nvec"), model.r).as("nvec"))
    val qsRot = qs.select(col("qid"),
      graft.operators.Opq.rotate(col("qvec"), model.r).as("qvec"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-oppoint-").toString
    val idx = timed("build") {
      graft.operators.IvfPq.buildTrained(
        spark, csRot, tmp, dim = dim, nlist = 32, m = 16, k = 16, iters = 3)
    }
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
      .filter(p => p.toString.endsWith(".parquet")).count()
    println(s"[oppoint] layout parquet files: $files")
    timed("adc_search") {
      idx.search(qsRot, k = 10, nprobe = 16).count()
    }
    timed("refined_search") {
      idx.searchRefined(qsRot, k = 10, nprobe = 16, rerank = 100).count()
    }
    timed("refined_again") {
      idx.searchRefined(qsRot, k = 10, nprobe = 16, rerank = 100).count()
    }
    spark.stop()
  }
}
