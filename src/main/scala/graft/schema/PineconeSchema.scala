package graft.schema

import org.apache.spark.sql.types._

/** Fixed table schemas for the vector-dataset data model.
  *
  * Mirrors the reference's declared column triples
  * (pinecone-datasets `cfg.py:21-36`): each column is declared as
  * (name, required, default). The canonical in-engine representation of the
  * free-form JSON columns (`metadata`, `filter`, `blob`) is a JSON
  * `StringType` column (matches the on-disk legacy format,
  * `dataset_fsreader.py:28,40`), with `from_json` / `get_json_object`
  * accessors layered on top (see [[graft.operators.FilterCompiler]]).
  */
object PineconeSchema {

  /** Sparse vector representation: parallel `indices`/`values` arrays
    * (reference `MAINTAINERS.md:97`, `tests/unit/test_schema_validation.py:15`).
    */
  val sparseValuesType: StructType = StructType(Seq(
    StructField("indices", ArrayType(LongType, containsNull = true)),
    StructField("values", ArrayType(FloatType, containsNull = true))))

  /** One schema column: name, Spark type, required?, and whether its
    * canonical form is a JSON-encoded string (dict-or-string on disk).
    */
  final case class ColumnSpec(
      name: String,
      dataType: DataType,
      required: Boolean,
      json: Boolean = false)

  /** documents table (reference `cfg.py:23-29`). */
  val documentsColumns: Seq[ColumnSpec] = Seq(
    ColumnSpec("id", StringType, required = true),
    ColumnSpec("values", ArrayType(FloatType, containsNull = true), required = true),
    ColumnSpec("sparse_values", sparseValuesType, required = false),
    ColumnSpec("metadata", StringType, required = false, json = true),
    ColumnSpec("blob", StringType, required = false, json = true))

  /** queries table (reference `cfg.py:30-36`). Note: `top_k`'s declared
    * default of 5 in the reference is dead code — the column is required and
    * both validation paths raise before a default could apply
    * (`dataset.py:112-115`, `dataset_fsreader.py:128-131`). We reproduce
    * the required-ness, not the phantom default.
    */
  val queriesColumns: Seq[ColumnSpec] = Seq(
    ColumnSpec("vector", ArrayType(FloatType, containsNull = true), required = true),
    ColumnSpec("sparse_vector", sparseValuesType, required = false),
    ColumnSpec("filter", StringType, required = false, json = true),
    ColumnSpec("top_k", IntegerType, required = true),
    ColumnSpec("blob", StringType, required = false, json = true))

  def structType(cols: Seq[ColumnSpec]): StructType =
    StructType(cols.map(c => StructField(c.name, c.dataType, nullable = !c.required)))

  val documentsSchema: StructType = structType(documentsColumns)
  val queriesSchema: StructType = structType(queriesColumns)

  /** Public iteration projections (reference `cfg.py:45,54`): `blob` is
    * excluded from batched iteration (`MAINTAINERS.md:124-126`).
    */
  val documentsSelectColumns: Seq[String] = Seq("id", "values", "sparse_values", "metadata")
  val queriesSelectColumns: Seq[String] = Seq("vector", "sparse_vector", "filter", "top_k")
}
