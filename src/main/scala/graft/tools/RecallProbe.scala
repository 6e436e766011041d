package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, IvfIndex, KMeans, Similarity}

/** Recall/cost sweep over the trained-IVF parameter grid — the
  * measurement that picks the serving operating point instead of
  * defaulting it. For each (nlist, nprobe) it reports mean recall@10
  * against the exact cosine reference AND the realized scan fraction
  * (probed-cell candidate rows / full brute-force rows), which is the
  * cost axis that matters at 100 TB (scanned bytes ~ scan fraction).
  *
  * Usage: `runMain graft.tools.RecallProbe [sfDir] [nQueries] [nlists]`
  * (`nlists` comma-separated, default `8,16,32`; widen to e.g.
  * `32,128,512` on larger/clustered corpora) — prints a TSV table; the
  * chosen operating point is recorded in BASELINE.md and asserted by the
  * q128 harness arms.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(10)
    val nlists = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(8, 16, 32))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cs = e.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"))
      .cache()
    val nCand = cs.count().toDouble
    val nq = qs.count().toDouble
    val ref = Similarity.bruteForceTopK(qs, cs, k = 10).cache()
    ref.count()
    println("nlist\tnprobe\tmean_recall\tscan_frac")
    for (nlist <- nlists) {
      val idx = IvfIndex.buildTrained(cs, nlist = nlist, iters = 3)
      // per-cell candidate counts, for the realized scan-fraction axis
      val cellSizes = cs
        .select(KMeans.assignCell(
          col("nvec").cast("array<double>"), idx.centroids).as("cell"))
        .groupBy("cell").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val probes =
        Seq(1, 2, 3, 4, 5, 6, 8, 12, 16, 24, 32, 48, 64).filter(_ <= nlist)
      for (np <- probes) {
        val rec = Evaluation.recallAtK(ref, idx.search(qs, k = 10, nprobe = np))
          .agg(avg(col("recall"))).head().getDouble(0)
        val scanned = qs
          .select(col("qid"),
            explode(KMeans.probeCells(
              col("qvec").cast("array<double>"), idx.centroids, np)).as("cell"))
          .collect().map(r => cellSizes.getOrElse(r.getInt(1), 0L))
          .foldLeft(0L)(_ + _).toDouble
        println(f"$nlist\t$np\t$rec%.3f\t${scanned / (nq * nCand)}%.3f")
      }
      idx.unpersist()
    }
    spark.stop()
  }
}
