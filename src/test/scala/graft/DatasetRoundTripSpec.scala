package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.meta.{DatasetMetadata, DenseModelMetadata}
import graft.schema.PineconeSchema
import graft.sources.{Catalog, DatasetReader, DatasetWriter, PineconeDataset}

/** Write→read round-trip equality is the reference's strongest correctness
  * signal (`tests/integration/test_io_local.py:49-124`).
  */
class DatasetRoundTripSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def fixtureDocs = spark.createDataFrame(
    Seq(
      Row("1", Seq(0.1f, 0.2f, 0.3f), Row(Seq(1L, 2L, 3L), Seq(0.1f, 0.2f, 0.3f)),
        """{"title":"title1","url":"url1"}""", null),
      Row("2", Seq(0.4f, 0.5f, 0.6f), Row(Seq(4L, 5L, 6L), Seq(0.4f, 0.5f, 0.6f)),
        """{"title":"títle2 — 日本語","url":"url2"}""", null)).asJava,
    PineconeSchema.documentsSchema)

  private def fixtureQueries = spark.createDataFrame(
    Seq(
      Row(Seq(0.1f, 0.2f, 0.3f), Row(Seq(1L, 2L, 3L), Seq(0.1f, 0.2f, 0.3f)),
        """{"filter1":{"$eq":"filter1"}}""", 1, null),
      Row(Seq(0.4f, 0.5f, 0.6f), null, """{"filter2":{"$eq":"filter2"}}""", 2, null)).asJava,
    PineconeSchema.queriesSchema)

  private def meta(name: String) = DatasetMetadata(
    name = name, created_at = "2021-01-01 00:00:00.000000",
    documents = 2, queries = 2,
    dense_model = DenseModelMetadata("ada", None, 3))

  test("save → load round trip preserves rows, schema, metadata, unicode") {
    val base = Files.createTempDirectory("rt").toString
    val ds = PineconeDataset.fromDataFrames(fixtureDocs, meta("rt-ds"), queries = Some(fixtureQueries))
    new Catalog(spark, base).saveDataset(ds)
    val back = PineconeDataset.fromPath(spark, s"$base/rt-ds")
    assert(back.metadata == meta("rt-ds"))
    assert(back.documents.columns.toSeq == PineconeSchema.documentsSchema.fieldNames.toSeq)
    val docs = back.documents.orderBy("id").collect()
    assert(docs.length == 2)
    assert(docs(1).getString(3).contains("日本語"))
    val qs = back.queries.orderBy("top_k").collect()
    assert(qs.length == 2 && qs(0).getInt(3) == 1)
    // queries row 2 has null sparse_vector
    assert(qs(1).isNullAt(1))
  }

  test("empty queries: write skipped with warning, read returns empty with schema") {
    val base = Files.createTempDirectory("rt-noq").toString
    val ds = PineconeDataset.fromDataFrames(fixtureDocs, meta("noq"))
    new Catalog(spark, base).saveDataset(ds)
    assert(!new java.io.File(s"$base/noq/queries").exists())
    val back = PineconeDataset.fromPath(spark, s"$base/noq")
    assert(back.queries.count() == 0)
    assert(back.queries.columns.toSeq == PineconeSchema.queriesSchema.fieldNames.toSeq)
  }

  test("missing dataset path raises FileNotFound") {
    intercept[java.io.FileNotFoundException] {
      PineconeDataset.fromPath(spark, "/tmp/definitely-not-a-dataset-xyz")
    }
  }

  test("dir exists but contains no parquet → error") {
    val base = Files.createTempDirectory("rt-empty").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$base/documents"))
    intercept[DatasetReader.NoParquetFilesFound] {
      DatasetReader.readDocuments(spark, base).collect()
    }
  }

  test("catalog: list, skip-invalid metadata with warning, load by id") {
    val base = Files.createTempDirectory("cat").toString
    val c = new Catalog(spark, base)
    c.saveDataset(PineconeDataset.fromDataFrames(fixtureDocs, meta("good-ds")))
    // invalid sibling: unparseable metadata.json
    val badDir = java.nio.file.Paths.get(s"$base/bad-ds")
    Files.createDirectories(badDir)
    Files.writeString(badDir.resolve("metadata.json"), "{not json")
    // invalid sibling: parseable but fails validation
    val bad2 = java.nio.file.Paths.get(s"$base/bad2-ds")
    Files.createDirectories(bad2)
    Files.writeString(bad2.resolve("metadata.json"), """{"name": "x"}""")
    val listed = c.load().map(_.name)
    assert(listed == Seq("good-ds"))
    assert(c.listDatasetsDF().columns.contains("dense_model"))
    assert(c.loadDataset("good-ds").count() == 2)
  }

  test("catalog listDatasetsDF carries the full metadata record (catalog.py:70-80 parity)") {
    import org.json4s.JsonDSL._
    val base = Files.createTempDirectory("cat-full").toString
    val c = new Catalog(spark, base)
    val full = meta("full-ds").copy(
      source = Some("src"), license = Some("MIT"), bucket = Some("gs://b"),
      task = Some("QA"),
      sparse_model = Some(graft.meta.SparseModelMetadata("splade", Some("tok"))),
      description = Some("desc"), tags = Some(List("t1", "t2")),
      args = Some(("alpha" -> 1) ~ ("beta" -> "x")))
    c.saveDataset(PineconeDataset.fromDataFrames(fixtureDocs, full))
    val df = c.listDatasetsDF()
    // every DatasetMetadata field is a column — nothing projected away
    assert(df.columns.toSet == Set(
      "name", "created_at", "documents", "queries", "source", "license",
      "bucket", "task", "dense_model", "dense_tokenizer", "dimension",
      "sparse_model", "sparse_tokenizer", "description", "tags", "args"))
    val r = df.head()
    assert(r.getAs[String]("license") == "MIT")
    assert(r.getAs[String]("bucket") == "gs://b")
    assert(r.getAs[String]("sparse_model") == "splade")
    assert(r.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("t1", "t2"))
    assert(r.getAs[String]("args") == """{"alpha":1,"beta":"x"}""")
  }

  test("iteration: batches, indexes, batch_size validation, blob excluded") {
    val ds = PineconeDataset.fromDataFrames(fixtureDocs, meta("it"), queries = Some(fixtureQueries))
    val batches = ds.iterDocuments(batchSize = 1).toSeq
    assert(batches.size == 2 && batches.head.size == 1)
    // public projection drops blob; all-null columns dropped too (blob is all
    // null here, but metadata is populated so 4-col projection minus none)
    assert(!batches.head.head.schema.fieldNames.contains("blob"))
    val indexed = ds.iterDocumentsIndexed(batchSize = 2).toSeq
    assert(indexed.head._1 == 0L && indexed.head._2.size == 2)
    intercept[IllegalArgumentException](ds.iterDocuments(batchSize = 0))
    assert(ds.iterQueries().size == 2)
  }

  test("iteration: progress callback reports running rows against the known total") {
    import graft.sources.Progress
    val ds = PineconeDataset.fromDataFrames(fixtureDocs, meta("pg"))
    val rec = new Progress.Recording
    ds.iterDocuments(batchSize = 1, progress = rec).foreach(_ => ())
    assert(rec.events.toSeq == Seq(
      ("Loading documents", 1L, 2L), ("Loading documents", 2L, 2L)))
  }

  test("typed views: documentsDS/queriesDS decode rows into case classes") {
    val ds = PineconeDataset.fromDataFrames(fixtureDocs, meta("ty"), queries = Some(fixtureQueries))
    val docs = ds.documentsDS.collect().sortBy(_.id)
    assert(docs.length == 2)
    assert(docs(0) == graft.sources.DocumentRow(
      "1", Seq(0.1f, 0.2f, 0.3f),
      Some(graft.sources.SparseValues(Seq(1L, 2L, 3L), Seq(0.1f, 0.2f, 0.3f))),
      Some("""{"title":"title1","url":"url1"}"""), None))
    val qs = ds.queriesDS.collect().sortBy(_.top_k)
    assert(qs(1).sparse_vector.isEmpty && qs(1).top_k == 2)
    assert(qs(0).filter.contains("""{"filter1":{"$eq":"filter1"}}"""))
  }

  test("writing does not mutate the source dataset (reference mutate-restore invariant)") {
    val base = Files.createTempDirectory("rt-imm").toString
    val ds = PineconeDataset.fromDataFrames(fixtureDocs, meta("imm"))
    val before = ds.documents.collect().toSeq
    DatasetWriter.writeDataset(ds, s"$base/imm")
    assert(ds.documents.collect().toSeq == before)
  }

  test("single-file parity: exact part-0.parquet name") {
    val base = Files.createTempDirectory("rt-sf").toString
    val ds = PineconeDataset.fromDataFrames(fixtureDocs, meta("sf"))
    DatasetWriter.writeDataset(ds, s"$base/sf", singleFile = true)
    assert(new java.io.File(s"$base/sf/documents/part-0.parquet").exists())
  }
}
