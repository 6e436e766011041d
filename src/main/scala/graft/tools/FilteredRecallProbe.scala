package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, IvfIndex, Similarity}

/** Filtered/adaptive recall-cost grid over a clustered corpus — the
  * measurement behind the FILTERED serving defaults, the way
  * [[RecallProbe]]/[[PqRecallProbe]] are behind the unfiltered ones.
  *
  * The unfiltered grids answered "how deep must a probe go for recall X".
  * Filters change the question: survivors are a SUBSET of each cell, and
  * when the filter field CORRELATES with the embedding clusters (the
  * production case — topic/language/source metadata aligns with topic
  * clusters), the survivors concentrate in a few cells and the rest go
  * hollow. Generate that distribution with
  * `ClusteredCorpus <dir> <n> <dim> <k> cluster`, then run this probe:
  * for each filter regime it reports, per arm,
  *
  *   - `recall`   mean recall@10 against the exact filtered brute force
  *                ([[Similarity.filteredTopKPerQuery]]);
  *   - `scan`     realized scan fraction: probed-cell candidate rows over
  *                (queries × corpus) — for adaptive arms the cells the
  *                widening actually kept ([[graft.operators.DiskIvfIndex
  *                .adaptiveProbeCells]]), not the nominal floor;
  *   - `cells`    mean probed cells per query.
  *
  * Regimes (filters rendered per query from its OWN label, so "aligned"
  * means the filter matches the query vector's topic):
  *   eq_aligned   {"label": {"$eq": own}} — search within my topic;
  *   eq_cross     {"label": {"$eq": own+5 mod 10}} — the anti-aligned
  *                worst case: every near cell is hollow;
  *   range        {"label": {"$lt": 3}} — ~30% survivor mass,
  *                cluster-concentrated under aligned labels;
  *   and_cross    {"label": {"$eq": own}, "bucket": {"$lte": 3}} — statted
  *                cross-field conjunction (min-over-conjuncts estimate);
  *   or_cross     {"$or": [{"label": ...}, {"bucket": {"$eq": 3}}]} —
  *                cross-field disjunction (sum estimate).
  *
  * Arms: fixed nprobe 1..32 plus the adaptive widening at floors 4 and 16
  * (targetSurvivors 50, matching q145's serving arm).
  *
  * Usage: `runMain graft.tools.FilteredRecallProbe [dir] [nQueries] [nlist]`
  * — prints a TSV; recorded grids live in bench/filteredgrid_*.tsv and the
  * conclusions in BASELINE.md.
  */
object FilteredRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(".tmp/tierC")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(50)
    val nlist = args.lift(2).map(_.toInt).getOrElse(128)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // metadata mirrors q146's shape: the (possibly cluster-aligned) label
    // plus two hash-ish fields for the cross-field regimes
    val cands = e.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"),
        to_json(struct(col("label"),
          (col("vec_id") % 7).cast("int").as("bucket"),
          (col("vec_id") % 2).cast("int").as("parity"))).as("metadata"))
      .cache()
    val nCand = cands.count().toDouble
    val qbase = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
      .cache()
    val nq = qbase.count().toDouble

    val idx = IvfIndex.buildTrained(cands, nlist = nlist, iters = 3)
    val tmp = java.nio.file.Files.createTempDirectory("graft-filtgrid-").toString
    val disk = idx.save(spark, tmp)
    idx.unpersist()
    disk.buildStats("label")
    disk.buildStats("bucket")
    val cellSizes = spark.read.parquet(disk.dir)
      .groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    def scanFrac(probes: Array[(Any, Int)]): (Double, Double) = {
      val rows = probes.map { case (_, c) => cellSizes.getOrElse(c, 0L) }.sum
      (rows.toDouble / (nq * nCand), probes.length / nq)
    }

    val regimes: Seq[(String, Column)] = Seq(
      "eq_aligned" -> concat(lit("""{"label": {"$eq": """), col("qlabel"), lit("}}")),
      "eq_cross" -> concat(lit("""{"label": {"$eq": """),
        (col("qlabel") + 5) % 10, lit("}}")),
      "range" -> lit("""{"label": {"$lt": 3}}"""),
      "and_cross" -> concat(lit("""{"label": {"$eq": """), col("qlabel"),
        lit("""}, "bucket": {"$lte": 3}}""")),
      "or_cross" -> concat(lit("""{"$or": [{"label": {"$eq": """), col("qlabel"),
        lit("""}}, {"bucket": {"$eq": 3}}]}""")))

    println("regime\tnlist\tarm\trecall\tscan\tcells")
    for ((name, filterCol) <- regimes) {
      val qs = qbase
        .withColumn("filter", filterCol)
        .withColumn("top_k", lit(10).cast("int"))
        .cache()
      val ref = Similarity.filteredTopKPerQuery(qs, cands).cache()
      ref.count()
      for (np <- Seq(1, 2, 4, 8, 16, 32).filter(_ <= nlist)) {
        val rec = Evaluation.recallAtK(ref, disk.searchFiltered(qs, nprobe = np))
          .agg(avg(col("recall"))).head().getDouble(0)
        val probes = qs
          .select(col("qid"), explode(graft.operators.KMeans.probeCells(
            col("qvec").cast("array<double>"), disk.centroids, np)).as("cell"))
          .collect().map(r => (r.get(0), r.getInt(1)))
        val (sf, cells) = scanFrac(probes)
        println(f"$name\t$nlist\tfixed_np$np\t$rec%.3f\t$sf%.3f\t$cells%.1f")
      }
      for (floor <- Seq(4, 16)) {
        val rec = Evaluation.recallAtK(ref,
            disk.searchFilteredAdaptive(qs, nprobe = floor, targetSurvivors = 50))
          .agg(avg(col("recall"))).head().getDouble(0)
        val probes = disk.adaptiveProbeCells(qs, nprobe = floor, targetSurvivors = 50)
          .collect().map(r => (r.get(0), r.getInt(1)))
        val (sf, cells) = scanFrac(probes)
        println(f"$name\t$nlist\tadaptive_f${floor}_t50\t$rec%.3f\t$sf%.3f\t$cells%.1f")
      }
      ref.unpersist(); qs.unpersist()
    }
    spark.stop()
  }
}
