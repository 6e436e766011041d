package graft.tools

import org.apache.spark.sql.SparkSession

/** Deterministic REALISTICALLY-CLUSTERED embedding corpus generator — the
  * tier-C measurement substrate for the ANN operating-point grids.
  *
  * Every recall number the engine shipped through round 11 was measured on
  * the driver-generated synthetic embeddings, which are near-random (recall
  * ≈ scan fraction + ~0.2 on every IVF family — BASELINE.md's documented
  * bound): the one distribution production embedding models never produce.
  * Real text/image encoders put most of their mass in a few hundred
  * anisotropic clusters (topics, languages, templates), which is exactly
  * the structure IVF exploits — the recall/scan curve steepens, and the
  * operating point picked on weak clustering may not survive. This tool
  * generates the missing distribution, deterministically:
  *
  *   - `k` cluster centers, unit-norm, from hash-seeded gaussians
  *     (pairwise near-orthogonal at dim 64 — inter-cluster cosine ~0.12);
  *   - SKEWED cluster sizes (power-law assignment u^1.7 — production
  *     topics are Zipf-ish, and skew is what stresses per-cell balance);
  *   - per-cluster noise scale in [0.45, 0.85] of the center norm and
  *     per-(cluster, dim) anisotropy in [0.3, 1.7] — intra-cluster cosine
  *     lands in ~[0.76, 0.91], the sentence-encoder regime;
  *   - every value derives from splitmix64(vec_id, stream) — no RNG
  *     state, so the corpus is identical under any partitioning and any
  *     re-run (the same replay discipline as the scale oracle).
  *
  * Output matches the testdata `embeddings.parquet` shape exactly
  * (`vec_id: long, embedding: array<float> unit-norm, label: int` 0-9),
  * so [[RecallProbe]] / [[PqRecallProbe]] / [[OpPointProbe]] run on it
  * unchanged:
  * `runMain graft.tools.ClusteredCorpus [outDir] [n] [dim] [k] [labelMode]`
  * then `runMain graft.tools.RecallProbe <outDir>` (unfiltered grids) or
  * `runMain graft.tools.FilteredRecallProbe <outDir>` (filtered/adaptive
  * grids — pass labelMode `cluster` to generate the production
  * topic-aligned-filter distribution those regimes exist for).
  */
object ClusteredCorpus {

  /** splitmix64 finalizer — the per-(id, stream) hash every draw derives
    * from. Public-domain constant mixer (Steele et al., JDK
    * SplittableRandom).
    */
  private[tools] def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in (0, 1) from a hash — never exactly 0 (Box-Muller logs it). */
  private[tools] def uniform(seed: Long): Double =
    ((mix(seed) >>> 11) + 0.5) / (1L << 53).toDouble

  /** Standard gaussian via Box-Muller over two decorrelated streams. */
  private[tools] def gauss(seed: Long): Double =
    math.sqrt(-2.0 * math.log(uniform(seed))) *
      math.cos(2.0 * math.Pi * uniform(seed + 0x632be59bd9b4e019L))

  /** The mixture parameters for `k` clusters at `dim`: (unit centers,
    * per-cluster noise norm, per-(cluster, dim) anisotropy scale).
    * Driver-sized (k × dim doubles) and broadcast to the generators.
    */
  private[tools] def mixture(k: Int, dim: Int)
      : (Array[Array[Double]], Array[Double], Array[Array[Double]]) = {
    val centers = Array.tabulate(k) { j =>
      val raw = Array.tabulate(dim)(d => gauss(j.toLong * 1000003L + d))
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val noise = Array.tabulate(k)(j => 0.45 + 0.4 * uniform(j * 7919L + 13L))
    val anis = Array.tabulate(k) { j =>
      // per-dim scales in [0.3, 1.7], renormalized so the cluster's total
      // noise energy stays exactly noise(j)² regardless of the draw
      val raw = Array.tabulate(dim)(d => 0.3 + 1.4 * uniform(j * 104729L + d))
      val energy = math.sqrt(raw.map(x => x * x).sum / dim)
      raw.map(_ / energy)
    }
    (centers, noise, anis)
  }

  /** Cluster of `id`: power-law over [0, k) — cluster 0 is ~6× the mean,
    * the tail thins toward k-1 (u^1.7 density).
    */
  private[tools] def clusterOf(id: Long, k: Int): Int = {
    val u = uniform(id * 31L + 17L)
    math.min(k - 1, (k * math.pow(u, 1.7)).toInt)
  }

  /** The vector for `id`: center + anisotropic gaussian noise, unit-norm. */
  private[tools] def vectorOf(
      id: Long, dim: Int,
      centers: Array[Array[Double]], noise: Array[Double],
      anis: Array[Array[Double]]): (Array[Float], Int) = {
    val j = clusterOf(id, centers.length)
    val sigma = noise(j) / math.sqrt(dim.toDouble)
    val v = Array.tabulate(dim)(d =>
      centers(j)(d) + sigma * anis(j)(d) * gauss(id * 131071L + d * 524287L + j))
    val n = math.sqrt(v.map(x => x * x).sum)
    (v.map(x => (x / n).toFloat), j)
  }

  /** Metadata label for `id` in cluster `j` under `labelMode`:
    *   - `uniform` (default, the original shape): hash-uniform 0-9,
    *     INDEPENDENT of cluster — filters slice every cell equally;
    *   - `cluster`: label = cluster mod 10 for ~90% of points, hash-
    *     uniform for the rest. This is the production filtered-search
    *     case — metadata (topic, language, source) CORRELATES with the
    *     embedding clusters, so a filter's survivors concentrate in a
    *     few cells and the rest go hollow. The 10% contamination keeps
    *     every (cell, label) histogram entry nonzero-able, so estimation
    *     is exercised, not just a 0/full indicator.
    */
  private[tools] def labelOf(id: Long, cluster: Int, labelMode: String): Int =
    labelMode match {
      case "uniform" => (mix(id * 13L + 7L) >>> 33).toInt % 10
      case "cluster" =>
        if (uniform(id * 53L + 29L) < 0.9) cluster % 10
        else (mix(id * 13L + 7L) >>> 33).toInt % 10
      case other => throw new IllegalArgumentException(
        s"labelMode must be uniform|cluster, got '$other'")
    }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(".tmp/tierC")
    val n = args.lift(1).map(_.toLong).getOrElse(20000L)
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val k = args.lift(3).map(_.toInt).getOrElse(128)
    val labelMode = args.lift(4).getOrElse("uniform")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val (centers, noise, anis) = mixture(k, dim)
    val bc = spark.sparkContext.broadcast((centers, noise, anis))
    // label mirrors the testdata shape (0-9) so the filtered probes
    // (q138/q145-style regimes) run on this corpus unchanged; labelMode
    // decides whether it is hash-uniform or cluster-aligned (see labelOf)
    val df = spark.range(n).map { id =>
      val (cs, nz, an) = bc.value
      val (vec, cluster) = vectorOf(id, dim, cs, nz, an)
      (id, vec, labelOf(id, cluster, labelMode), cluster)
    }.toDF("vec_id", "embedding", "label", "cluster")
    df.select($"vec_id", $"embedding", $"label")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // evidence line: realized clustering strength (what the grids cite)
    val stats = spark.read.parquet(s"$outDir/embeddings.parquet")
    println(s"# tierC written: ${stats.count()} vectors, dim $dim, $k clusters, " +
      s"labels $labelMode -> $outDir")
    spark.stop()
  }
}
