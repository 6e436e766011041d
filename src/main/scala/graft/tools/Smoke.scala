package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.meta.{DatasetMetadata, DenseModelMetadata}
import graft.sources.{Catalog, PineconeDataset}

/** Dev smoke: drives the driver contract (entry) plus the library's public
  * dataset surface (from DataFrames → save → catalog list → load → iterate).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. driver smoke contract: entry rows > 0
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n")

    // 2. library surface: build a dataset from the embeddings table,
    // save via a catalog, list, reload, iterate.
    val base = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val meta = DatasetMetadata(
      name = "smoke-ds", created_at = "2026-01-01 00:00:00.000000",
      documents = 500, queries = 0,
      dense_model = DenseModelMetadata(name = "synthetic", dimension = 64))
    val ds = PineconeDataset.fromDataFrames(
      docs, meta, documentsColumnMapping = Map("vec_id" -> "id", "embedding" -> "values"))
    val cat = new Catalog(spark, base)
    cat.saveDataset(ds, singleFile = true)
    println(s"SMOKE catalog list=${cat.listDatasets()}")
    val loaded = cat.loadDataset("smoke-ds")
    println(s"SMOKE loaded meta=${loaded.metadata.name} dim=${loaded.metadata.dense_model.dimension}")
    println(s"SMOKE loaded docs=${loaded.count()} cols=${loaded.documents.columns.mkString(",")}")
    val firstBatch = loaded.iterDocuments(batchSize = 3).next()
    println(s"SMOKE first batch ids=${firstBatch.map(_.getString(0)).mkString(",")}")
    // single-file parity check
    val partFile = new java.io.File(s"$base/smoke-ds/documents/part-0.parquet")
    println(s"SMOKE part-0.parquet exists=${partFile.exists()}")
    // probe: load a nonexistent dataset
    try { cat.loadDataset("nope"); println("SMOKE missing-ds: NO ERROR (bad)") }
    catch { case e: java.io.FileNotFoundException => println(s"SMOKE missing-ds error ok: ${e.getMessage}") }
    // probe: deprecation shims raise with guidance (reference F7)
    try { (loaded: @annotation.nowarn).toPineconeIndex(); println("SMOKE shim: NO ERROR (bad)") }
    catch { case e: UnsupportedOperationException => println(s"SMOKE shim error ok: ${e.getMessage.take(40)}...") }
    // probe: invalid filter
    try { graft.operators.FilterCompiler.compile("""{"f": {"$bogus": 1}}"""); println("SMOKE bad-filter: NO ERROR (bad)") }
    catch { case e: IllegalArgumentException => println(s"SMOKE bad-filter error ok: ${e.getMessage}") }
    spark.stop()
  }
}
