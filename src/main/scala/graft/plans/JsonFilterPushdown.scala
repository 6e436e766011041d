package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._

import graft.functions.JsonFilterMatch

/** Analyzer rule: turn an interpreted per-row JSON filter match into
  * pushdown-able column predicates.
  *
  * `json_filter_match(<literal filter>, metadata)` evaluates a Pinecone
  * filter document against a JSON string per row — opaque to Catalyst, so
  * nothing reaches `PushedFilters` and every row pays a JSON parse. But
  * when the metadata column was built IN-PLAN as `to_json(struct(...))`
  * — the engine's own canonical-metadata construction — the filter is
  * really a predicate over the struct's source columns, and this rule
  * rewrites it to exactly that: `{"lang": {"$eq": "en"}}` over
  * `to_json(struct(lang, ...))` becomes `lang = 'en'`, which constant-
  * folds, prunes, and lands in the parquet scan's `PushedFilters`.
  *
  * Scope is deliberately conservative — the rewrite fires only when
  * every divergence risk is provably absent, otherwise the expression is
  * left alone (correct, just uninterpreted):
  *
  *  - only TOP-LEVEL conjuncts of a `Filter` condition: in filter
  *    context a NULL predicate result and runtime `false` (the
  *    missing-field semantics — `to_json` drops null fields) are
  *    indistinguishable; in general boolean context (`NOT`, projection)
  *    they are not, so nested occurrences stay interpreted.
  *  - only operators whose null/missing-field semantics provably match
  *    the runtime's under that equivalence: `$eq $gt $gte $lt $lte $in`
  *    (non-empty), `$and`/`$or`, and the bare-value shorthand. `$ne`,
  *    `$nin` and `$exists` match MISSING fields at runtime — their
  *    compiled forms must see the null, which filter-context rewriting
  *    cannot guarantee — so they opt the whole conjunct out.
  *  - only filter fields that name an atomic-typed (string / numeric /
  *    boolean) struct entry whose value expression references columns
  *    still visible at the Filter (`child.outputSet`) — metadata built
  *    from columns that were projected away cannot be rewritten without
  *    restructuring the child, which an analyzer rule must not do.
  *
  * Registered through [[graft.functions.GraftExtensions]]
  * (`injectResolutionRule`), so the analyzer's own fixed-point applies
  * type coercion to the substituted comparisons afterwards.
  */
object JsonFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if f.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      var changed = false
      val rewritten = conjuncts.map {
        case jm @ JsonFilterMatch(fl, meta) if fl.foldable =>
          fl.eval() match {
            case null => changed = true; Literal.TrueLiteral // null filter = match-all
            case fs: UTF8String if fs.toString.isEmpty =>
              changed = true; Literal.TrueLiteral
            case fs: UTF8String =>
              rewriteMatch(fs.toString, meta, child) match {
                case Some(pred) => changed = true; pred
                case None => jm
              }
            case _ => jm
          }
        case other => other
      }
      if (changed) Filter(rewritten.reduce(And), child) else f
  }

  private def rewriteMatch(
      filterJson: String,
      meta: Expression,
      child: LogicalPlan): Option[Expression] =
    for {
      struct <- structFor(meta, child)
      fields <- fieldMap(struct)
      if fields.values.forall(_.references.subsetOf(child.outputSet))
      parsed <- parseFilter(filterJson)
      if safeDoc(parsed, fields)
      pred <- substitute(parsed, fields)
    } yield pred

  /** The `CreateNamedStruct` behind `meta`: either written literally in
    * the condition, or an attribute whose defining `Alias` over
    * `to_json(struct(...))` (no options — options change the rendering
    * the runtime parses) appears in the child subtree. */
  private def structFor(
      e: Expression, child: LogicalPlan): Option[CreateNamedStruct] = e match {
    case StructsToJson(opts, s: CreateNamedStruct, _) if opts.isEmpty => Some(s)
    case a: AttributeReference =>
      child.collect {
        case p: Project => p.projectList.collectFirst {
          case al @ Alias(StructsToJson(opts, s: CreateNamedStruct, _), _)
              if al.exprId == a.exprId && opts.isEmpty => s
        }
      }.flatten.headOption
    case _ => None
  }

  private def fieldMap(
      s: CreateNamedStruct): Option[Map[String, Expression]] = {
    // CreateNamedStruct.names is Seq[Any]: the name literals arrive
    // already EVALUATED (UTF8String), not as Literal expressions
    val entries = s.names.zip(s.valExprs).map {
      case (n: UTF8String, v) => Some(n.toString -> v)
      case (n: String, v) => Some(n -> v)
      case _ => None
    }
    if (entries.exists(_.isEmpty)) None
    else {
      val m = entries.flatten.toMap
      if (m.values.forall(v => atomicType(v.dataType))) Some(m) else None
    }
  }

  private def atomicType(t: DataType): Boolean = t match {
    case StringType | BooleanType => true
    case _: NumericType => true
    case _ => false
  }

  private def parseFilter(filterJson: String): Option[JObject] =
    try {
      org.json4s.jackson.JsonMethods.parse(filterJson) match {
        case o: JObject => Some(o)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** A JSON literal is compatible with a field only within its type
    * class: the runtime compares a JSON string against a JSON number as
    * UNEQUAL (strict), while Catalyst coercion would CAST and possibly
    * match — so a cross-class comparison must not be rewritten. */
  private def compatVal(v: JValue, t: DataType): Boolean = (v, t) match {
    case (_: JString, StringType) => true
    case (_: JInt | _: JLong | _: JDouble | _: JDecimal, _: NumericType) => true
    case (_: JBool, BooleanType) => true
    case _ => false
  }

  private val safeOps = Set("$eq", "$gt", "$gte", "$lt", "$lte")

  private def safeDoc(o: JObject, fields: Map[String, Expression]): Boolean =
    o.obj.forall {
      case ("$and" | "$or", JArray(xs)) =>
        xs.forall { case x: JObject => safeDoc(x, fields); case _ => false }
      case (name, cond: JObject) if cond.obj.exists(_._1.startsWith("$")) =>
        fields.contains(name) && cond.obj.forall {
          case (op, v) if safeOps(op) => compatVal(v, fields(name).dataType)
          case ("$in", JArray(xs)) =>
            xs.nonEmpty && xs.forall(compatVal(_, fields(name).dataType))
          case _ => false
        }
      case (name, bare) =>
        fields.contains(name) && compatVal(bare, fields(name).dataType)
    }

  /** Build the Catalyst predicate directly over the struct's value
    * expressions — the same semantics as
    * [[graft.operators.FilterCompiler]]'s typed-column target restricted
    * to the safe operators (the Column
    * API is unusable here: a Spark 4 `Column` wraps a lazily-resolved
    * `ColumnNode`, not a Catalyst tree an analyzer rule may splice in).
    * Runs AFTER [[safeDoc]], so every field lookup is total and every
    * op/value shape is known-good; analyzer type coercion then aligns
    * the comparison types in the surrounding fixed-point. */
  private def substitute(
      parsed: JObject,
      fields: Map[String, Expression]): Option[Expression] =
    try Some(buildDoc(parsed, fields))
    catch { case scala.util.control.NonFatal(_) => None }

  private def buildDoc(
      o: JObject, fields: Map[String, Expression]): Expression = {
    val preds = o.obj.map {
      case ("$and", JArray(xs)) =>
        xs.map(x => buildDoc(x.asInstanceOf[JObject], fields))
          .reduceOption(And).getOrElse(Literal.TrueLiteral)
      case ("$or", JArray(xs)) =>
        xs.map(x => buildDoc(x.asInstanceOf[JObject], fields))
          .reduceOption(Or).getOrElse(Literal.FalseLiteral)
      case (name, cond: JObject) if cond.obj.exists(_._1.startsWith("$")) =>
        cond.obj.map { case (op, v) => pred(fields(name), op, v) }
          .reduce(And)
      case (name, bare) => pred(fields(name), "$eq", bare)
    }
    preds.reduceOption(And).getOrElse(Literal.TrueLiteral)
  }

  private def jlit(v: JValue): Literal = v match {
    case JString(s) => Literal(UTF8String.fromString(s), StringType)
    case JInt(i) => Literal(i.toLong)
    case JLong(i) => Literal(i)
    case JDouble(d) => Literal(d)
    case JDecimal(d) => Literal(d.toDouble)
    case JBool(b) => Literal(b)
    case other => throw new IllegalStateException(s"non-atomic $other")
  }

  private def pred(c: Expression, op: String, v: JValue): Expression =
    op match {
      case "$eq" => EqualTo(c, jlit(v))
      case "$gt" => GreaterThan(c, jlit(v))
      case "$gte" => GreaterThanOrEqual(c, jlit(v))
      case "$lt" => LessThan(c, jlit(v))
      case "$lte" => LessThanOrEqual(c, jlit(v))
      case "$in" =>
        val JArray(xs) = v: @unchecked
        In(c, xs.map(jlit))
      case other => throw new IllegalStateException(s"unsafe op $other")
    }
}
