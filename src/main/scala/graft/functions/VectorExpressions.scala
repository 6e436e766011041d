package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

private[functions] object VectorExprUtil {
  def isVector(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
}

/** Native Catalyst expressions for dense-vector math.
  *
  * Why custom expressions and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions (`ZipWith`, `ArrayAggregate`) are
  * `CodegenFallback` — every row pays interpreted-lambda overhead, and the
  * surrounding WholeStageCodegen span is broken. These expressions generate
  * a tight primitive loop over the two `ArrayData`s instead, so a 100 TB
  * scoring scan stays fully inside whole-stage codegen. (The reference has
  * no scoring engine at all — `top_k` is data handed to an external index,
  * reference `dataset.py:136-140` — so this is the §2B extension surface.)
  *
  * Both expressions accept `array<float>` or `array<double>` inputs and
  * accumulate in double. Null elements contribute nothing; mismatched
  * lengths score over the common prefix (vectors in one dataset share a
  * dimension, so this is a guard, not a semantic).
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => VectorExprUtil.isVector(e.dataType))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def elemIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  /** Java expr reading element i of an ArrayData as double. */
  protected def readElem(arr: String, i: String, isDouble: Boolean): String =
    if (isDouble) s"$arr.getDouble($i)" else s"(double) $arr.getFloat($i)"

  protected def getElem(arr: ArrayData, i: Int, isDouble: Boolean): Double =
    if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
}

/** `vec_dot(a, b)` — dense dot product, whole-stage-codegen friendly. */
case class VectorDotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val ld = elemIsDouble(left); val rd = elemIsDouble(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += getElem(x, i, ld) * getElem(y, i, rd)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ld = elemIsDouble(left); val rd = elemIsDouble(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${readElem(a, i, ld)} * ${readElem(b, i, rd)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotProduct =
    copy(left = newLeft, right = newRight)
}

/** `vec_cosine(a, b)` — cosine similarity in a single fused pass
  * (dot, |a|², |b|² accumulated together; one loop, no temporaries).
  * Returns null when either norm is zero.
  */
case class VectorCosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "vec_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val ld = elemIsDouble(left); val rd = elemIsDouble(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = getElem(x, i, ld); val yv = getElem(y, i, rd)
        dot += xv * yv; na += xv * xv; nb += yv * yv
      }
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ld = elemIsDouble(left); val rd = elemIsDouble(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $xv = ${readElem(a, i, ld)};
         |    double $yv = ${readElem(b, i, rd)};
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorCosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `vec_norm(a)` — L2 norm. Useful for pre-normalizing embeddings once so
  * repeated cosine scoring reduces to the cheaper dot product.
  */
case class VectorL2Norm(child: Expression)
    extends UnaryExpression {

  override def prettyName: String = "vec_norm"
  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprUtil.isVector(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double>, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = isDouble
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = if (d) x.getDouble(i) else x.getFloat(i).toDouble
        acc += v * v
      }
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = isDouble
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      val read = if (d) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) { double $v = $read; $acc += $v * $v; }
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VectorL2Norm =
    copy(child = newChild)
}

/** `sparse_dot(indicesA, valuesA, indicesB, valuesB)` — dot product of two
  * sparse vectors in the dataset's parallel-arrays representation
  * (reference `MAINTAINERS.md:97`). Merge-join over the index arrays;
  * assumes each vector's indices are sorted ascending (the format's
  * convention), falling back gracefully (missed matches) if not.
  */
case class SparseDotProduct(
    indicesA: Expression, valuesA: Expression,
    indicesB: Expression, valuesB: Expression)
    extends QuaternaryExpression {

  override def prettyName: String = "sparse_dot"
  override def first: Expression = indicesA
  override def second: Expression = valuesA
  override def third: Expression = indicesB
  override def fourth: Expression = valuesB

  override def checkInputDataTypes(): TypeCheckResult = {
    def isIdx(t: DataType): Boolean = t match {
      case ArrayType(LongType | IntegerType, _) => true
      case _ => false
    }
    val ok = isIdx(indicesA.dataType) && isIdx(indicesB.dataType) &&
      VectorExprUtil.isVector(valuesA.dataType) && VectorExprUtil.isVector(valuesB.dataType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<long>, array<float|double>) index/value pairs")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def vIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  private def idxIsInt(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == IntegerType
  private def readIdx(arr: ArrayData, i: Int, isInt: Boolean): Long =
    if (isInt) arr.getInt(i).toLong else arr.getLong(i)

  override def nullSafeEval(ia: Any, va: Any, ib: Any, vb: Any): Any = {
    val xi = ia.asInstanceOf[ArrayData]; val xv = va.asInstanceOf[ArrayData]
    val yi = ib.asInstanceOf[ArrayData]; val yv = vb.asInstanceOf[ArrayData]
    val ad = vIsDouble(valuesA); val bd = vIsDouble(valuesB)
    val ai = idxIsInt(indicesA); val bi = idxIsInt(indicesB)
    val na = math.min(xi.numElements(), xv.numElements())
    val nb = math.min(yi.numElements(), yv.numElements())
    var i = 0; var j = 0; var acc = 0.0
    while (i < na && j < nb) {
      val a = readIdx(xi, i, ai); val b = readIdx(yi, j, bi)
      if (a == b) {
        acc += (if (ad) xv.getDouble(i) else xv.getFloat(i).toDouble) *
          (if (bd) yv.getDouble(j) else yv.getFloat(j).toDouble)
        i += 1; j += 1
      } else if (a < b) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ad = vIsDouble(valuesA); val bd = vIsDouble(valuesB)
    val ai = idxIsInt(indicesA); val bi = idxIsInt(indicesB)
    nullSafeCodeGen(ctx, ev, (xi, xv, yi, yv) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      val readA = if (ad) s"$xv.getDouble($i)" else s"(double) $xv.getFloat($i)"
      val readB = if (bd) s"$yv.getDouble($j)" else s"(double) $yv.getFloat($j)"
      val readIdxA = if (ai) s"(long) $xi.getInt($i)" else s"$xi.getLong($i)"
      val readIdxB = if (bi) s"(long) $yi.getInt($j)" else s"$yi.getLong($j)"
      s"""
         |int $na = java.lang.Math.min($xi.numElements(), $xv.numElements());
         |int $nb = java.lang.Math.min($yi.numElements(), $yv.numElements());
         |int $i = 0; int $j = 0; double $acc = 0.0;
         |while ($i < $na && $j < $nb) {
         |  long $a = $readIdxA; long $b = $readIdxB;
         |  if ($a == $b) { $acc += $readA * $readB; $i++; $j++; }
         |  else if ($a < $b) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression,
      third: Expression, fourth: Expression): SparseDotProduct =
    copy(indicesA = first, valuesA = second, indicesB = third, valuesB = fourth)
}
