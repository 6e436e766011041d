package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Normalize
import graft.schema.PineconeSchema

class NormalizeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docsDf(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(rows.asJava, schema)

  test("happy path: full documents frame passes through in schema order") {
    val in = docsDf(
      Seq(Row("1", Seq(0.1f, 0.2f), null, """{"t":"a"}""", null)),
      StructType(Seq(
        StructField("id", StringType),
        StructField("values", ArrayType(FloatType)),
        StructField("sparse_values", PineconeSchema.sparseValuesType),
        StructField("metadata", StringType),
        StructField("blob", StringType))))
    val out = Normalize(in, PineconeSchema.documentsColumns)
    assert(out.columns.toSeq == Seq("id", "values", "sparse_values", "metadata", "blob"))
    assert(out.count() == 1)
  }

  test("missing required column raises with the missing names") {
    val in = docsDf(Seq(Row("1")), StructType(Seq(StructField("id", StringType))))
    val e = intercept[Normalize.MissingRequiredColumns] {
      Normalize(in, PineconeSchema.documentsColumns)
    }
    assert(e.missing == Seq("values"))
    assert(e.getMessage.contains("values"))
  }

  test("column mapping applies before validation") {
    val in = docsDf(
      Seq(Row(7L, Seq(1.0f))),
      StructType(Seq(
        StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)))))
    val out = Normalize(in, PineconeSchema.documentsColumns,
      columnMapping = Map("vec_id" -> "id", "embedding" -> "values"))
    val row = out.head()
    assert(row.getString(0) == "7") // long id cast to string
    assert(out.columns.toSeq == Seq("id", "values", "sparse_values", "metadata", "blob"))
  }

  test("missing optionals nulled in with declared types") {
    val in = docsDf(
      Seq(Row("1", Seq(1.0f))),
      StructType(Seq(
        StructField("id", StringType), StructField("values", ArrayType(FloatType)))))
    val out = Normalize(in, PineconeSchema.documentsColumns)
    val f = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(f("sparse_values") == PineconeSchema.sparseValuesType)
    assert(f("metadata") == StringType)
    val row = out.head()
    assert(row.isNullAt(2) && row.isNullAt(3) && row.isNullAt(4))
  }

  test("extra columns are dropped by the projection") {
    val in = docsDf(
      Seq(Row("1", Seq(1.0f), "junk")),
      StructType(Seq(
        StructField("id", StringType), StructField("values", ArrayType(FloatType)),
        StructField("extra", StringType))))
    val out = Normalize(in, PineconeSchema.documentsColumns)
    assert(!out.columns.contains("extra"))
  }

  test("legacy struct metadata is canonicalized to a JSON string") {
    val in = docsDf(
      Seq(Row("1", Seq(1.0f), Row("title1", 2017L))),
      StructType(Seq(
        StructField("id", StringType), StructField("values", ArrayType(FloatType)),
        StructField("metadata", StructType(Seq(
          StructField("title", StringType), StructField("year", LongType)))))))
    val out = Normalize(in, PineconeSchema.documentsColumns)
    val meta = out.head().getString(3)
    assert(meta == """{"title":"title1","year":2017}""")
  }

  test("PresentFirst order: present schema columns then nulled-in ones") {
    val in = docsDf(
      Seq(Row(Seq(1.0f), "1")),
      StructType(Seq(
        StructField("values", ArrayType(FloatType)), StructField("id", StringType))))
    val out = Normalize(in, PineconeSchema.documentsColumns, order = Normalize.PresentFirst)
    assert(out.columns.toSeq == Seq("id", "values", "sparse_values", "metadata", "blob"))
    val in2 = docsDf(
      Seq(Row("1", Seq(1.0f), """{"a":1}""")),
      StructType(Seq(
        StructField("id", StringType), StructField("values", ArrayType(FloatType)),
        StructField("blob", StringType))))
    val out2 = Normalize(in2, PineconeSchema.documentsColumns, order = Normalize.PresentFirst)
    // blob is present → comes before the nulled-in sparse_values/metadata
    assert(out2.columns.toSeq == Seq("id", "values", "blob", "sparse_values", "metadata"))
  }

  test("queries schema: top_k required (no phantom default)") {
    val in = docsDf(
      Seq(Row(Seq(1.0f))),
      StructType(Seq(StructField("vector", ArrayType(FloatType)))))
    val e = intercept[Normalize.MissingRequiredColumns] {
      Normalize(in, PineconeSchema.queriesColumns)
    }
    assert(e.missing == Seq("top_k"))
  }
}
