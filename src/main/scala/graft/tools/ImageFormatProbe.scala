package graft.tools

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Per-format cost attribution for the q95 image-hash family (BASELINE.md
  * round-8 note): times `averageHash` end-to-end over each fixture format
  * separately at the given SF — PNG, BMP, baseline JPEG, progressive
  * JPEG — best of 3 per format, one JSON line. This is what lets a bench
  * delta on q95/q96 be attributed to a format arm instead of read as a
  * regression.
  */
object ImageFormatProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.GraftSession.builder(32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).localCheckpoint()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(mk: => org.apache.spark.sql.Dataset[Multimodal.MediaRow]): Double = {
      Multimodal.averageHash(mk).toDF().count() // warm-up
      (1 to 3).map(_ => time(Multimodal.averageHash(mk).toDF().count())).min
    }
    val png = best(Multimodal.syntheticMedia(docs.filter(col("doc_id") % 4 === 0), "doc_id"))
    val bmp = best(Multimodal.syntheticMedia(docs.filter(col("doc_id") % 4 === 1), "doc_id"))
    val jpgBase = best(Multimodal.syntheticJpegMedia(docs.filter(col("doc_id") % 4 === 3), "doc_id"))
    val jpgProg = best(Multimodal.syntheticProgressiveJpegMedia(docs.filter(col("doc_id") % 4 === 2), "doc_id"))
    println(s"""{"sf_dir": "$sfDir", "png_sec": $png, "bmp_sec": $bmp, "jpeg_baseline_sec": $jpgBase, "jpeg_progressive_sec": $jpgProg}""")
    spark.stop()
  }
}
