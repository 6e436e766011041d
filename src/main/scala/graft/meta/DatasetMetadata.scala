package graft.meta

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Dense-model descriptor (reference `dataset_metadata.py:7-10`). */
final case class DenseModelMetadata(
    name: String,
    tokenizer: Option[String] = None,
    dimension: Int)

/** Sparse-model descriptor (reference `dataset_metadata.py:13-15` — the
  * reference class is (sic) `SparseModelMetdata`; we use the corrected
  * spelling in Scala and keep wire-compat since field names are what matter).
  */
final case class SparseModelMetadata(
    name: String,
    tokenizer: Option[String] = None)

/** Dataset descriptor stored as `metadata.json` next to the
  * `documents/` and `queries/` directories
  * (reference `dataset_metadata.py:22-48`, layout `MAINTAINERS.md:80-104`).
  *
  * `created_at` is a formatted string `"%Y-%m-%d %H:%M:%S.%f"`
  * (`dataset_metadata.py:18-19`); kept as a string for wire parity.
  * `args` is free-form JSON.
  */
final case class DatasetMetadata(
    name: String,
    created_at: String,
    documents: Long,
    queries: Long,
    source: Option[String] = None,
    license: Option[String] = None,
    bucket: Option[String] = None,
    task: Option[String] = None,
    dense_model: DenseModelMetadata,
    sparse_model: Option[SparseModelMetadata] = None,
    description: Option[String] = None,
    tags: Option[List[String]] = None,
    args: Option[JObject] = None) {

  def isEmpty: Boolean = name.isEmpty && documents == 0 && queries == 0

  def toJson: String = DatasetMetadata.render(this)
}

/** Parsing + validation. Scala has no pydantic; required-field validation is
  * explicit here so bad descriptors fail with field-level messages the way
  * the reference's pydantic models do
  * (`tests/unit/test_dataset_metadata.py:23-43`).
  */
object DatasetMetadata {

  final case class MetadataValidationError(errors: Seq[String])
      extends IllegalArgumentException(
        s"invalid dataset metadata: ${errors.mkString("; ")}")

  /** The `empty()` helper (reference `dataset_metadata.py:37-48`). */
  def empty: DatasetMetadata = DatasetMetadata(
    name = "",
    created_at = "1970-01-01 00:00:00.000000",
    documents = 0L,
    queries = 0L,
    dense_model = DenseModelMetadata(name = "", dimension = 0))

  def fromJson(json: String): DatasetMetadata = {
    val parsed = JsonMethods.parse(json) match {
      case o: JObject => o
      case other => throw MetadataValidationError(Seq(s"expected JSON object, got ${other.getClass.getSimpleName}"))
    }
    fromJValue(parsed)
  }

  def fromJValue(o: JObject): DatasetMetadata = {
    val fields = o.obj.toMap
    var errors = Vector.empty[String]

    def str(k: String): String = fields.get(k) match {
      case Some(JString(s)) => s
      case Some(other) => errors :+= s"$k: expected string, got ${typeName(other)}"; ""
      case None => errors :+= s"$k: field required"; ""
    }
    def optStr(k: String): Option[String] = fields.get(k) match {
      case Some(JString(s)) => Some(s)
      case Some(JNull) | None => None
      case Some(other) => errors :+= s"$k: expected string, got ${typeName(other)}"; None
    }
    def long(k: String): Long = fields.get(k) match {
      case Some(JInt(i)) => i.toLong
      case Some(JLong(i)) => i
      case Some(other) => errors :+= s"$k: expected integer, got ${typeName(other)}"; 0L
      case None => errors :+= s"$k: field required"; 0L
    }

    val dense = fields.get("dense_model") match {
      case Some(dm: JObject) =>
        val dmf = dm.obj.toMap
        val dname = dmf.get("name") match {
          case Some(JString(s)) => s
          case _ => errors :+= "dense_model.name: field required (string)"; ""
        }
        val dim = dmf.get("dimension") match {
          case Some(JInt(i)) => i.toInt
          case Some(JLong(i)) => i.toInt
          case _ => errors :+= "dense_model.dimension: field required (integer)"; 0
        }
        val tok = dmf.get("tokenizer") match {
          case Some(JString(s)) => Some(s)
          case _ => None
        }
        DenseModelMetadata(dname, tok, dim)
      case _ =>
        errors :+= "dense_model: field required (object)"
        DenseModelMetadata("", None, 0)
    }

    val sparse = fields.get("sparse_model") match {
      case Some(sm: JObject) =>
        val smf = sm.obj.toMap
        val sname = smf.get("name") match {
          case Some(JString(s)) => s
          case _ => errors :+= "sparse_model.name: field required (string)"; ""
        }
        val tok = smf.get("tokenizer") match {
          case Some(JString(s)) => Some(s)
          case _ => None
        }
        Some(SparseModelMetadata(sname, tok))
      case Some(JNull) | None => None
      case Some(other) =>
        errors :+= s"sparse_model: expected object, got ${typeName(other)}"; None
    }

    val tags = fields.get("tags") match {
      case Some(JArray(xs)) => Some(xs.collect { case JString(s) => s })
      case Some(JNull) | None => None
      case Some(other) => errors :+= s"tags: expected array, got ${typeName(other)}"; None
    }

    val args = fields.get("args") match {
      case Some(a: JObject) => Some(a)
      case _ => None
    }

    val meta = DatasetMetadata(
      name = str("name"),
      created_at = str("created_at"),
      documents = long("documents"),
      queries = long("queries"),
      source = optStr("source"),
      license = optStr("license"),
      bucket = optStr("bucket"),
      task = optStr("task"),
      dense_model = dense,
      sparse_model = sparse,
      description = optStr("description"),
      tags = tags,
      args = args)

    if (errors.nonEmpty) throw MetadataValidationError(errors)
    meta
  }

  def render(m: DatasetMetadata): String = {
    def opt(k: String, v: Option[String]): List[JField] =
      v.map(s => k -> (JString(s): JValue)).toList
    val dense: JValue = JObject(
      List[JField]("name" -> JString(m.dense_model.name)) ++
        m.dense_model.tokenizer.map(t => "tokenizer" -> (JString(t): JValue)).toList ++
        List[JField]("dimension" -> JInt(m.dense_model.dimension)))
    val fields: List[JField] =
      List[JField](
        "name" -> JString(m.name),
        "created_at" -> JString(m.created_at),
        "documents" -> JInt(m.documents),
        "queries" -> JInt(m.queries)) ++
        opt("source", m.source) ++ opt("license", m.license) ++
        opt("bucket", m.bucket) ++ opt("task", m.task) ++
        List[JField]("dense_model" -> dense) ++
        m.sparse_model.map { sm =>
          "sparse_model" -> (JObject(
            List[JField]("name" -> JString(sm.name)) ++
              sm.tokenizer.map(t => "tokenizer" -> (JString(t): JValue)).toList): JValue)
        }.toList ++
        opt("description", m.description) ++
        m.tags.map(ts => "tags" -> (JArray(ts.map(JString(_))): JValue)).toList ++
        m.args.map(a => "args" -> (a: JValue)).toList
    JsonMethods.compact(JsonMethods.render(JObject(fields)))
  }

  private def typeName(v: JValue): String = v match {
    case _: JString => "string"
    case _: JInt | _: JLong | _: JDecimal | _: JDouble => "number"
    case _: JObject => "object"
    case _: JArray => "array"
    case JBool(_) => "boolean"
    case JNull => "null"
    case _ => "unknown"
  }
}
