package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, IvfPq, KMeans, Opq, Similarity}

/** Recall/cost grid over the IVF-PQ SERVING path — the measurement that
  * picks the PQ operating point instead of defaulting it (the same
  * discipline [[RecallProbe]] applies to plain trained-IVF).
  *
  * The PQ path is the only one whose scanned bytes survive 100 TB (codes
  * are m bytes vs dim×4 raw), so its operating point matters most — and
  * round 9 shipped only low arms (ADC 0.20 / refined 0.44 recall@10 at
  * nlist=8/nprobe=3). This grid sweeps what actually moves PQ recall:
  *
  *   - nlist × nprobe: cell recall (does the true neighbor's cell get
  *     probed at all) — the ceiling every downstream stage inherits;
  *   - m: subquantizer count (ADC rank fidelity at m bytes/vector);
  *   - rerank: exact re-rank depth (repairs ADC misranks inside the
  *     probed set; rerank=0 row = raw ADC).
  *
  * Cost axes reported per row: `scan_frac` (probed candidate rows /
  * brute-force rows — scanned code bytes scale with it) and the rerank
  * depth (raw-vector fetches per query, bounded and broadcast-sized).
  * Two OPQ-rotated arms isolate the rotation-training rule: `opq_t4`
  * learns R under the m=4 sub-decomposition, `opq_t16` under m=16 —
  * round 10's sf0.01 grid (490 candidates, 10 queries) preferred t4,
  * an artifact hypothesis this re-measures at larger samples.
  *
  * Usage: `runMain graft.tools.PqRecallProbe [sfDir] [nQueries] [replicate]
  * [nlists]` (`nlists` comma-separated, default `8,32`)
  * — prints a TSV. `nQueries` splits the embeddings table (vec_id <
  * nQueries are queries, the rest candidates); `replicate` > 1 unions
  * jittered candidate replicas (deterministic hash noise, ±1% per dim —
  * near-dup clusters around each original, the realistic crawl shape)
  * to grow the corpus without new data. The chosen point is recorded in
  * BASELINE.md and served as q128's `ivfpq_op` arm.
  */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(10)
    val replicate = args.lift(2).map(_.toInt).getOrElse(1)
    val nlists = args.lift(3).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(8, 32))
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .cache()
    val base = e.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("nid"), col("embedding").cast("array<double>").as("nvec"))
    // jittered replication: replica r of vector v sits within ~1% of v —
    // exact copies would make every query's true top-k a tie-set of
    // duplicates and distort the recall measurement
    val cs = (if (replicate <= 1) base
      else (0 until replicate).map { r =>
        if (r == 0) base
        else base.select(
          (col("nid") + lit(r * 100000000L)).as("nid"),
          transform(col("nvec"), (x, i) =>
            x + (pmod(xxhash64(col("nid"), lit(r), i), lit(1000)).cast("double")
              / 1000.0 - 0.5) * 0.02).as("nvec"))
      }.reduce(_ unionByName _)).cache()
    val nCand = cs.count().toDouble
    val nq = qs.count().toDouble
    println(s"# corpus: ${nCand.toLong} candidates, ${nq.toLong} queries, dim $dim")
    // the PQ serving path approximates the INNER PRODUCT (q128's framing:
    // measuring ADC against a cosine reference would conflate metric
    // choice with index error)
    val ref = Similarity.bruteForceTopKDot(qs, cs, k = 10).cache()
    ref.count()

    def recallOf(cand: DataFrame): Double =
      Evaluation.recallAtK(ref, cand).agg(avg(col("recall"))).head().getDouble(0)

    println("arm\tnlist\tm\tnprobe\trerank\tmean_recall\tscan_frac")
    def sweep(arm: String, cands: DataFrame, queries: DataFrame): Unit =
      for (nlist <- nlists; m <- Seq(4, 8, 16)) {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"graft-pqprobe-$arm-$nlist-$m-").toString
        val idx = IvfPq.buildTrained(
          spark, cands, tmp, dim = dim, nlist = nlist, m = m, k = 16, iters = 3)
        val cellSizes = spark.read.parquet(tmp)
          .groupBy("cell").count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val probes =
          if (nlist <= 8) Seq(2, 3, 5, 8).filter(_ <= nlist)
          else Seq(4, 8, 16, 24, 32, 48).filter(_ <= nlist)
        for (np <- probes) {
          val scanned = queries
            .select(col("qid"), explode(KMeans.probeCells(
              col("qvec").cast("array<double>"),
              idx.codebooks.centroids, np)).as("cell"))
            .collect().map(r => cellSizes.getOrElse(r.getInt(1), 0L))
            .foldLeft(0L)(_ + _).toDouble
          val frac = scanned / (nq * nCand)
          val adc = recallOf(idx.search(queries, k = 10, nprobe = np))
          println(f"$arm\t$nlist\t$m\t$np\t0\t$adc%.3f\t$frac%.3f")
          for (rr <- Seq(20, 50, 100)) {
            val rec = recallOf(
              idx.searchRefined(queries, k = 10, nprobe = np, rerank = rr))
            println(f"$arm\t$nlist\t$m\t$np\t$rr\t$rec%.3f\t$frac%.3f")
          }
        }
      }
    sweep("pq", cs, qs)
    // OPQ arms: learn the rotation on a driver sample, rotate both sides,
    // rebuild. Orthogonal R preserves inner products, so the UNrotated
    // exact reference stays valid for the rotated index's ids. Two arms
    // differ ONLY in the m the rotation was trained under.
    val sample = Opq.sampleVectors(cs, col("nvec"), maxSample = 4096)
    for ((trainM, arm) <- Seq(4 -> "opq_t4", 16 -> "opq_t16")) {
      val model = Opq.train(sample, m = trainM, k = 16, pqIters = 3, opqIters = 3)
      sweep(arm,
        cs.select(col("nid"), Opq.rotate(col("nvec"), model.r).as("nvec")),
        qs.select(col("qid"), Opq.rotate(col("qvec"), model.r).as("qvec")))
    }
    spark.stop()
  }
}
