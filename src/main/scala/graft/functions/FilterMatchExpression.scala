package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Runtime evaluator for *per-row* Pinecone metadata filters.
  *
  * [[graft.operators.FilterCompiler]] handles the plan-time case: one
  * literal filter compiled into Catalyst predicates (pushdown-able). This
  * is the data-dependent case the reference's query table implies — each
  * query row carries its own `filter` JSON (reference `cfg.py:33`,
  * `tests/unit/test_schema_validation.py:37,44`) that must be applied to
  * every candidate document's `metadata` during search. A filter that is
  * itself data cannot be compiled into the plan, so it is interpreted at
  * run time against small per-thread caches.
  *
  * Semantics mirror `FilterCompiler.compileOverJson` (the JSON-string
  * metadata target): numeric operands compare as double (string-typed
  * metadata numbers coerce), everything else compares by its JSON string
  * rendering, missing fields fail `$eq`/comparisons and pass
  * `$ne`/`$nin`, JSON null counts as absent for `$exists`.
  * A null or empty filter matches everything (no filter = match all);
  * null metadata is an empty document.
  *
  * Scale shape: the expression sits on the candidate side of a
  * broadcast-queries cross join, so per-row work must be O(filter). Two
  * bounded per-thread caches make it so: distinct filter strings → parsed
  * AST (query sets repeat a handful of filter templates), and the last
  * metadata string → parsed fields (each candidate row is evaluated
  * against all broadcast queries consecutively, so a 1-entry memo hits
  * #queries-1 times out of #queries).
  */
object FilterRuntime {

  sealed trait Node
  final case class AndNode(children: List[Node]) extends Node
  final case class OrNode(children: List[Node]) extends Node
  final case class PredNode(field: String, op: String, value: JValue) extends Node

  import graft.operators.FilterCompiler.FilterSyntaxError

  def compile(filterJson: String): Node =
    JsonMethods.parse(filterJson) match {
      case o: JObject => compileObj(o)
      case other => throw FilterSyntaxError(s"filter must be a JSON object, got $other")
    }

  private def compileObj(obj: JObject): Node = AndNode(obj.obj.map {
    case ("$and", JArray(xs)) => AndNode(xs.map(x => compileObj(asObj(x, "$and"))))
    case ("$or", JArray(xs)) => OrNode(xs.map(x => compileObj(asObj(x, "$or"))))
    case ("$and" | "$or", other) =>
      throw FilterSyntaxError(s"$$and/$$or expect an array, got $other")
    case (name, cond: JObject) if cond.obj.exists(_._1.startsWith("$")) =>
      AndNode(cond.obj.map { case (op, v) => mkPred(name, op, v) })
    case (name, bare) => mkPred(name, "$eq", bare)
  })

  private def mkPred(field: String, op: String, v: JValue): PredNode = {
    op match {
      case "$eq" | "$ne" | "$gt" | "$gte" | "$lt" | "$lte" => ()
      case "$in" | "$nin" => v match {
        case _: JArray => ()
        case other => throw FilterSyntaxError(s"$op expects an array, got $other")
      }
      case "$exists" => v match {
        case _: JBool => ()
        case other => throw FilterSyntaxError(s"$$exists expects a boolean, got $other")
      }
      case other => throw FilterSyntaxError(s"unknown operator $other")
    }
    PredNode(field, op, v)
  }

  private def asObj(v: JValue, ctx: String): JObject = v match {
    case o: JObject => o
    case other => throw FilterSyntaxError(s"$ctx elements must be objects, got $other")
  }

  // ---- evaluation ---------------------------------------------------------

  private def evalNode(n: Node, meta: Map[String, JValue]): Boolean = n match {
    case AndNode(cs) => cs.forall(evalNode(_, meta))
    case OrNode(cs) => cs.exists(evalNode(_, meta))
    case PredNode(field, op, v) => evalPred(meta.get(field), op, v)
  }

  /** mv is the metadata value (None = field absent; JNull behaves absent). */
  private def evalPred(mvRaw: Option[JValue], op: String, v: JValue): Boolean = {
    val mv = mvRaw.filterNot(_ == JNull)
    op match {
      case "$exists" => v == JBool(mv.isDefined)
      case "$eq" => mv.exists(compare(_, v).contains(0))
      case "$ne" => !mv.exists(compare(_, v).contains(0))
      case "$gt" => mv.exists(compare(_, v).exists(_ > 0))
      case "$gte" => mv.exists(compare(_, v).exists(_ >= 0))
      case "$lt" => mv.exists(compare(_, v).exists(_ < 0))
      case "$lte" => mv.exists(compare(_, v).exists(_ <= 0))
      case "$in" =>
        val JArray(xs) = v: @unchecked
        mv.exists(m => xs.exists(x => compare(m, x).contains(0)))
      case "$nin" =>
        val JArray(xs) = v: @unchecked
        !mv.exists(m => xs.exists(x => compare(m, x).contains(0)))
    }
  }

  /** Compare a metadata value against a filter operand; None = incomparable
    * (fails every comparison, like SQL null). Numeric operands coerce the
    * metadata side to double; string/bool operands compare the metadata
    * value's string rendering — both matching the `get_json_object` target
    * of `FilterCompiler.compileOverJson`.
    */
  private def compare(m: JValue, v: JValue): Option[Int] = v match {
    case JInt(i) => toDouble(m).map(_.compare(i.toDouble))
    case JLong(l) => toDouble(m).map(_.compare(l.toDouble))
    case JDouble(d) => toDouble(m).map(_.compare(d))
    case JDecimal(d) => toDouble(m).map(_.compare(d.toDouble))
    case JString(s) => render(m).map(_.compareTo(s))
    case JBool(b) => render(m).map(_.compareTo(b.toString))
    case other => throw FilterSyntaxError(s"unsupported literal $other")
  }

  private def toDouble(m: JValue): Option[Double] = m match {
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case JString(s) => s.toDoubleOption
    case _ => None
  }

  private def render(m: JValue): Option[String] = m match {
    case JString(s) => Some(s)
    case JInt(i) => Some(i.toString)
    case JLong(l) => Some(l.toString)
    case JDouble(d) => Some(d.toString)
    case JDecimal(d) => Some(d.toString)
    case JBool(b) => Some(b.toString)
    case _ => None
  }

  private def parseMeta(metaJson: String): Map[String, JValue] =
    JsonMethods.parseOpt(metaJson) match {
      case Some(JObject(fields)) => fields.toMap
      case _ => Map.empty
    }

  // ---- per-thread caches --------------------------------------------------

  private final class ThreadState {
    val filters = new java.util.LinkedHashMap[String, Node](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Node]): Boolean =
        size() > 1024
    }
    var lastMetaStr: String = null
    var lastMeta: Map[String, JValue] = null
  }

  private val state = ThreadLocal.withInitial[ThreadState](() => new ThreadState)

  /** Entry point called from both interpreted eval and generated code. */
  def matches(filter: UTF8String, metadata: UTF8String): Boolean = {
    if (filter == null) return true
    val fs = filter.toString
    if (fs.isEmpty) return true
    val st = state.get()
    var node = st.filters.get(fs)
    if (node == null) { node = compile(fs); st.filters.put(fs, node) }
    val meta =
      if (metadata == null) Map.empty[String, JValue]
      else {
        val ms = metadata.toString
        if (!ms.equals(st.lastMetaStr)) {
          st.lastMetaStr = ms
          st.lastMeta = parseMeta(ms)
        }
        st.lastMeta
      }
    evalNode(node, meta)
  }
}

/** `json_filter_match(filter, metadata)` — true iff the (possibly null)
  * per-row filter document admits the (possibly null) JSON metadata
  * document. Codegen emits a direct static call, so the surrounding
  * whole-stage-codegen span is preserved (no CodegenFallback iterator
  * break in the scoring scan).
  */
case class JsonFilterMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "json_filter_match"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  // Not nullIntolerant: null filter means match-all, so eval is manual.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val f = left.eval(input).asInstanceOf[UTF8String]
    val m = right.eval(input).asInstanceOf[UTF8String]
    FilterRuntime.matches(f, m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    // Scala emits a static forwarder for object methods, so generated Java
    // can call the evaluator directly.
    val call = "graft.functions.FilterRuntime.matches"
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        final boolean ${ev.value} = $call(
          ${l.isNull} ? null : ${l.value},
          ${r.isNull} ? null : ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
