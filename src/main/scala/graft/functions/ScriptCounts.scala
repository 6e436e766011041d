package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-codepoint range classification table: `(lo, hi, bucket)` triples,
  * sorted by `lo`, non-overlapping. Built once per expression instance
  * (rides the plan as one reference object) and probed by binary search —
  * the scan kernel for [[CodepointRangeCounts]].
  */
final class CodepointRangeTable(triples: Array[Array[Int]], val numBuckets: Int)
    extends Serializable {
  private val los = triples.map(_(0))
  private val his = triples.map(_(1))
  private val buckets = triples.map(_(2))

  /** Bucket of `cp`, or -1 when no range contains it. */
  def bucketOf(cp: Int): Int = {
    var lo = 0
    var hi = los.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (cp < los(mid)) hi = mid - 1
      else if (cp > his(mid)) lo = mid + 1
      else return buckets(mid)
    }
    -1
  }

  /** One pass over the string's codepoints → per-bucket counts. */
  def countsOf(s: UTF8String): GenericArrayData = {
    val counts = new Array[Int](numBuckets)
    val str = s.toString
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      val b = bucketOf(cp)
      if (b >= 0) counts(b) += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(counts)
  }
}

/** `codepoint_range_counts(text)` — ONE pass over the string's codepoints
  * producing an `array<int>` of per-bucket counts (bucket = unicode-script
  * range group). Replaces the N-regex-strips formulation of script
  * detection (`length(t) - length(regexp_replace(t, "[range]", ""))` per
  * script) with a single scan: same integer results by construction —
  * membership in the same codepoint ranges — so the DuckDB oracle keeps
  * replaying the regex form while the engine pays one pass instead of N.
  * Codegen emits a single table-probe call, so the projection stays inside
  * whole-stage codegen.
  */
case class CodepointRangeCounts(child: Expression, table: CodepointRangeTable)
    extends UnaryExpression {

  override def prettyName: String = "codepoint_range_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    table.countsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("cpRangeTable", table,
      classOf[CodepointRangeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $tableRef.countsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
