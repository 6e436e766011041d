package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions
import graft.operators.TextDedup

/** Dev scratch: stage-by-stage timing of the minhash pipeline at sf0.1. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    spark.range(1000000).count() // warm up

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val shingled = docs.select(col("doc_id"), TextDedup.wordShingles(col("text"), 2).as("sh"))
    time("shingles only")(shingled.select(sum(size(col("sh")))).head())
    val sig = shingled.withColumn("sig",
      SketchFunctions.minhashSignature(TextDedup.shingleHashes(col("sh")), 63, 42L))
    time("shingles+sig")(sig.select(sum(size(col("sig")))).head())
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(20)),
        j => xxhash64(slice(col("sig"), j * 3 + 1, lit(3))))))
      .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_hash"))
    time("banded count")(banded.count())
    val cand = banded.select(col("doc_id").as("id_a"), col("band_idx"), col("band_hash"))
      .join(banded.select(col("doc_id").as("id_b"), col("band_idx"), col("band_hash")),
        Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("candidates")(println("  n_cand=" + cand.count()))
    time("full pipeline")(println("  n_pairs=" + TextDedup.minhashNearDupPairs(
      docs, col("doc_id"), col("text"), 0.5).count()))
    time("full again")(println("  n_pairs=" + TextDedup.minhashNearDupPairs(
      docs, col("doc_id"), col("text"), 0.5).count()))
    spark.stop()
  }
}
