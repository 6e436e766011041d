package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Compiles Pinecone metadata-filter documents into Spark `Column`
  * predicates.
  *
  * The filter language (public Pinecone filter syntax; fixture shape at
  * reference `tests/unit/test_schema_validation.py:37,44`):
  * `$eq $ne $gt $gte $lt $lte $in $nin $exists`, combinators `$and $or`,
  * implicit AND across top-level fields, and bare values as shorthand
  * for `$eq`.
  *
  * Two compilation targets:
  *   - [[compile]] — predicates over *typed columns* (field name →
  *     `col(field)`), for datasets whose metadata has been flattened.
  *   - [[compileOverJson]] — predicates over a canonical JSON-string
  *     `metadata` column via `get_json_object` path extraction.
  *
  * Both produce ordinary Catalyst expressions, so predicate pushdown,
  * constant folding and codegen apply with no custom rule: a compiled
  * `$eq` on a parquet column lands in `PushedFilters` at the scan.
  */
object FilterCompiler {

  final case class FilterSyntaxError(msg: String)
      extends IllegalArgumentException(s"invalid filter: $msg")

  def compile(filterJson: String): Column =
    build(parse(filterJson), name => col(name), jsonMode = false)

  def compileOverJson(filterJson: String, metadataCol: Column): Column =
    build(parse(filterJson),
      name => get_json_object(metadataCol, s"$$.$name"), jsonMode = true)

  private def parse(filterJson: String): JObject =
    JsonMethods.parse(filterJson) match {
      case o: JObject => o
      case other => throw FilterSyntaxError(s"filter must be a JSON object, got $other")
    }

  private def build(obj: JObject, field: String => Column, jsonMode: Boolean): Column = {
    val preds = obj.obj.map {
      case ("$and", JArray(xs)) =>
        xs.map(x => build(asObj(x, "$and"), field, jsonMode)).reduceOption(_ && _)
          .getOrElse(lit(true))
      case ("$or", JArray(xs)) =>
        xs.map(x => build(asObj(x, "$or"), field, jsonMode)).reduceOption(_ || _)
          .getOrElse(lit(false))
      case ("$and" | "$or", other) =>
        throw FilterSyntaxError(s"$$and/$$or expect an array, got ${JsonMethods.compact(JsonMethods.render(other))}")
      case (name, cond: JObject) if cond.obj.exists(_._1.startsWith("$")) =>
        cond.obj.map { case (op, v) => predicate(field(name), op, v, jsonMode) }
          .reduce(_ && _)
      case (name, bare) => // bare value shorthand for $eq
        predicate(field(name), "$eq", bare, jsonMode)
    }
    preds.reduceOption(_ && _).getOrElse(lit(true))
  }

  private def predicate(c: Column, op: String, v: JValue, jsonMode: Boolean): Column = {
    // In JSON mode get_json_object yields strings; numeric comparisons need
    // a double cast on the extracted side, and booleans compare against
    // their JSON literals. The cast must be try_cast: a NON-numeric value
    // meeting a numeric literal casts to null and fails `$eq` but survives
    // the null-safe negations (`$ne`/`$nin`) — under ANSI a plain cast
    // would instead fail the whole query on the first such row.
    def operand(x: JValue): (Column, Any) = x match {
      case JInt(i) => (if (jsonMode) c.try_cast("double") else c, i.toLong)
      case JLong(i) => (if (jsonMode) c.try_cast("double") else c, i)
      case JDouble(d) => (if (jsonMode) c.try_cast("double") else c, d)
      case JDecimal(d) => (if (jsonMode) c.try_cast("double") else c, d.toDouble)
      case JString(s) => (c, s)
      case JBool(b) => (if (jsonMode) c else c, if (jsonMode) b.toString else b)
      case other => throw FilterSyntaxError(s"unsupported literal $other for $op")
    }
    op match {
      case "$eq" => val (cc, lv) = operand(v); cc === lit(lv)
      case "$ne" => val (cc, lv) = operand(v); !(cc <=> lit(lv))
      case "$gt" => val (cc, lv) = operand(v); cc > lit(lv)
      case "$gte" => val (cc, lv) = operand(v); cc >= lit(lv)
      case "$lt" => val (cc, lv) = operand(v); cc < lit(lv)
      case "$lte" => val (cc, lv) = operand(v); cc <= lit(lv)
      case "$in" | "$nin" =>
        val xs = v match {
          case JArray(arr) => arr
          case other => throw FilterSyntaxError(s"$op expects an array, got $other")
        }
        val vals = xs.map(operand)
        if (vals.isEmpty) { if (op == "$in") lit(false) else lit(true) }
        else {
          // In JSON mode a NUMERIC member compares through cast-to-double
          // while a string/bool member compares raw, so a MIXED-type array
          // ({"$in": ["3", 3]}) must apply each member's OWN cast — an OR
          // of per-member equalities (matching the adaptive-probe
          // estimator's per-member semantics). Homogeneous arrays keep the
          // single `isin` (one codegen'd In expression).
          val numeric = xs.map {
            case JInt(_) | JLong(_) | JDouble(_) | JDecimal(_) => true
            case _ => false
          }
          val in =
            if (jsonMode && numeric.distinct.size > 1)
              vals.map { case (cc, lv) => cc === lit(lv) }.reduce(_ || _)
            else vals.head._1.isin(vals.map(_._2): _*)
          if (op == "$in") in else !coalesce(in, lit(false))
        }
      case "$exists" => v match {
        case JBool(true) => c.isNotNull
        case JBool(false) => c.isNull
        case other => throw FilterSyntaxError(s"$$exists expects a boolean, got $other")
      }
      case other => throw FilterSyntaxError(s"unknown operator $other")
    }
  }

  private def asObj(v: JValue, ctx: String): JObject = v match {
    case o: JObject => o
    case other => throw FilterSyntaxError(s"$ctx elements must be objects, got $other")
  }
}
