package graft.tools

import org.apache.spark.sql.functions._

/** Optimization-evidence probe: PRE-DISTINCT candidate-pair emission
  * volume of the LSH band join, any-band emission (round 13) vs
  * leading-band suppression (round 14), plus the distinct pair count —
  * the row-volume claim behind `bucketPairsLeadSuppressed`.
  *
  * Usage: runMain graft.tools.PairEmitProbe <docsParquetDir>
  */
object PairEmitProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.SketchFunctions
    val r = 3
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val shingled = docs.select(col("doc_id"),
        SketchFunctions.wordNgramHashes(lower(col("text")), 2, distinct = true).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", SketchFunctions.minhashSignature(col("sh"), 63, 42L))
    val banded = shingled.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(20)),
        j => struct(
          xxhash64(slice(col("sig"), j * r + 1, lit(r))).as("bh"),
          xxhash64(slice(col("sig"), lit(1), lit(r))).as("h0"),
          xxhash64(slice(col("sig"), lit(r + 1), lit(r))).as("h1")))))
      .select(col("doc_id"), col("pos").as("band_idx"),
        col("col.bh").as("band_hash"),
        col("col.h0").as("h0"), col("col.h1").as("h1"))
      .localCheckpoint()

    def emissions(suppressed: Boolean): Long = {
      val buckets = banded.groupBy(col("band_idx"), col("band_hash"))
        .agg(array_sort(collect_list(
          struct(col("doc_id").as("id"), col("h0"), col("h1")))).as("ms"))
        .filter(size(col("ms")).between(2, 10000))
      buckets
        .select(col("band_idx"), explode(flatten(transform(col("ms"), (x, i) =>
          filter(
            transform(
              slice(col("ms"), i + 2, greatest(size(col("ms")) - i - 1, lit(0))),
              y => struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
                (if (suppressed)
                  ((col("band_idx") > 0) && (x.getField("h0") === y.getField("h0"))) ||
                    ((col("band_idx") > 1) && (x.getField("h1") === y.getField("h1")))
                else lit(false)).as("sup"))),
            s => !s.getField("sup"))))).as("p"))
        .count()
    }
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val res = body
      println(f"[emit-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      res
    }
    val pre13 = time("any-band emission count")(emissions(suppressed = false))
    val pre14 = time("lead-suppressed emission count")(emissions(suppressed = true))
    val dp = time("distinct pair count") {
      graft.operators.TextDedup.bucketPairsLeadSuppressed(banded,
        col("band_idx"), col("band_hash"), col("doc_id"),
        col("h0"), col("h1")).count()
    }
    println(s"[emit-probe] dir=$dir pre_distinct_any_band=$pre13 " +
      s"pre_distinct_lead_suppressed=$pre14 distinct_pairs=$dp " +
      f"reduction=${pre13.toDouble / math.max(pre14, 1)}%.1fx")
    spark.stop()
  }
}
