package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.PineconeSchema.ColumnSpec

/** Schema normalization: the P1–P4 pipeline of the reference
  * (`dataset.py:109-118`, `dataset_fsreader.py:122-141`), declaratively:
  *
  *  1. column rename (`{old -> new}` mapping applied before validation),
  *  2. required-column presence validation (error lists every missing one),
  *  3. missing-optional fill with typed nulls,
  *  4. projection to exactly the schema columns (extras dropped).
  *
  * Also folds in the reference's dual dict-or-string handling of the JSON
  * columns (`dataset_fsreader.py:56-64`): an incoming struct/map/array column
  * is canonicalized with `to_json`, an incoming string column is kept as-is,
  * and anything else is a type error. All of this is plan construction — no
  * jobs run here, and Catalyst sees a plain Project over the scan so column
  * pruning / filter pushdown still reach the source.
  */
object Normalize {

  /** Column order semantics differ between the reference's two ingestion
    * paths (SURVEY §1.2): the fs reader emits present-columns-in-schema-order
    * followed by nulled-in columns (`dataset_fsreader.py:141`), while
    * `from_pandas` emits strict schema order (`dataset.py:118`).
    */
  sealed trait ColumnOrder
  case object SchemaOrder extends ColumnOrder
  case object PresentFirst extends ColumnOrder

  final case class MissingRequiredColumns(missing: Seq[String], available: Seq[String])
      extends IllegalArgumentException(
        s"error, file is not matching Pinecone Datasets Schema: " +
          s"columns ${missing.mkString("[", ", ", "]")} not found " +
          s"(available: ${available.mkString("[", ", ", "]")})")

  def apply(
      df: DataFrame,
      schema: Seq[ColumnSpec],
      columnMapping: Map[String, String] = Map.empty,
      order: ColumnOrder = SchemaOrder): DataFrame = {

    val renamed = if (columnMapping.isEmpty) df else df.withColumnsRenamed(columnMapping)
    val present = renamed.columns.toSet

    val missingRequired = schema.filter(c => c.required && !present(c.name)).map(_.name)
    if (missingRequired.nonEmpty)
      throw MissingRequiredColumns(missingRequired, renamed.columns.toIndexedSeq)

    val (presentSpecs, absentSpecs) = schema.partition(c => present(c.name))
    val ordered = order match {
      case SchemaOrder => schema
      case PresentFirst => presentSpecs ++ absentSpecs
    }

    val fieldTypes: Map[String, DataType] =
      renamed.schema.fields.map(f => f.name -> f.dataType).toMap

    val projection: Seq[Column] = ordered.map { spec =>
      if (!present(spec.name)) {
        // P3: missing optionals nulled in with the declared type.
        lit(null).cast(spec.dataType).as(spec.name)
      } else canonicalize(col(spec.name), fieldTypes(spec.name), spec).as(spec.name)
    }
    renamed.select(projection: _*)
  }

  /** Canonicalize one column toward its declared type. JSON columns accept
    * struct/map/array (legacy "dict on disk") or string; vector columns get a
    * numeric-element cast so float64-on-disk datasets normalize to float32.
    */
  private def canonicalize(c: Column, actual: DataType, spec: ColumnSpec): Column =
    (spec.json, actual) match {
      case (true, StringType) => c
      case (true, _: StructType | _: MapType | _: ArrayType) => to_json(c)
      case (true, NullType) => c.cast(StringType)
      case (true, other) =>
        throw new IllegalArgumentException(
          s"column '${spec.name}': expected JSON string or struct, got $other")
      case (false, t) if t == spec.dataType => c
      case (false, _) => c.cast(spec.dataType)
    }
}
