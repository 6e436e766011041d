package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch probe (kept out of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(32)
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    import graft.functions.SketchFunctions
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val shingled = docs.select(col("doc_id"),
        SketchFunctions.wordNgramHashes(lower(col("text")), 2, distinct = true).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", SketchFunctions.minhashSignature(col("sh"), 63, 42L))
    val r = 3

    // A: round-13 banded (no lead hashes) + any-band emission
    def bandedA = shingled.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(20)),
        j => xxhash64(slice(col("sig"), j * r + 1, lit(r))))))
      .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_hash"))
    // B: struct-lead banded (current construction)
    def bandedB = shingled.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(20)),
        j => struct(
          xxhash64(slice(col("sig"), j * r + 1, lit(r))).as("bh"),
          xxhash64(slice(col("sig"), lit(1), lit(r))).as("h0"),
          xxhash64(slice(col("sig"), lit(r + 1), lit(r))).as("h1")))))
      .select(col("doc_id"), col("pos").as("band_idx"),
        col("col.bh").as("band_hash"),
        col("col.h0").as("h0"), col("col.h1").as("h1"))

    for (round <- 1 to 2) {
      println(s"===== round $round =====")
      time("A cand(old banded, bucketPairs).count") {
        graft.operators.TextDedup.bucketPairs(
          bandedA, col("band_idx"), col("band_hash"), col("doc_id")).count()
      }
      time("B cand(lead banded, leadSuppressed).count") {
        graft.operators.TextDedup.bucketPairsLeadSuppressed(
          bandedB, col("band_idx"), col("band_hash"), col("doc_id"),
          col("h0"), col("h1")).count()
      }
      time("C full minhashNearDupPairs (current impl)") {
        graft.operators.TextDedup.minhashNearDupPairs(
          docs, col("doc_id"), col("text"), threshold = 0.5).count()
      }
      time("D banded B only (count)") { bandedB.count() }
      time("E banded A only (count)") { bandedA.count() }
    }
    spark.stop()
  }
}
