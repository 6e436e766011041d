package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._

/** Codebook-aware expressions for k-means / IVF.
  *
  * Why these exist: folding a k × dim codebook into the plan as `typedlit`
  * literals (k dot-product subtrees + a `least(struct...)` argmin, or a
  * dim-wide `sum(element_at)` aggregate) makes the expression tree —
  * and therefore Catalyst optimization, codegen, and janino compilation —
  * scale with k × dim. At k=8, dim=64 that is seconds of *data-independent*
  * plan overhead per k-means iteration. Here the codebook rides along as a
  * single `double[][]` reference object and the argmin is one tight loop,
  * so plans stay O(1) regardless of codebook size and whole-stage codegen
  * survives.
  */
object CentroidOps {

  /** Squared-L2 affinity ranking: argpartition of -2x·c + |c|² (the |x|²
    * term is per-row constant). Returns the `nprobe` best cell ids,
    * closest first.
    */
  def nearest(vec: ArrayData, elemIsDouble: Boolean,
      codebook: Array[Array[Double]], sqNorms: Array[Double], nprobe: Int): ArrayData = {
    val n = math.min(nprobe, codebook.length)
    val bestD = new Array[Double](n)
    val bestJ = new Array[Int](n)
    java.util.Arrays.fill(bestD, Double.MaxValue)
    java.util.Arrays.fill(bestJ, Int.MaxValue)
    var j = 0
    while (j < codebook.length) {
      val c = codebook(j)
      val m = math.min(vec.numElements(), c.length)
      var dot = 0.0
      var i = 0
      while (i < m) {
        val x = if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
        dot += x * c(i)
        i += 1
      }
      val d = sqNorms(j) - 2.0 * dot
      // insertion into the sorted top-n (ties broken by smaller cell id)
      if (d < bestD(n - 1) || (d == bestD(n - 1) && j < bestJ(n - 1))) {
        var p = n - 1
        while (p > 0 && (d < bestD(p - 1) || (d == bestD(p - 1) && j < bestJ(p - 1)))) {
          bestD(p) = bestD(p - 1); bestJ(p) = bestJ(p - 1); p -= 1
        }
        bestD(p) = d; bestJ(p) = j
      }
      j += 1
    }
    new GenericArrayData(bestJ)
  }

  /** True min squared L2 distance to any centroid (for SSE/convergence). */
  def minSqDist(vec: ArrayData, elemIsDouble: Boolean,
      codebook: Array[Array[Double]], sqNorms: Array[Double]): Double = {
    var xx = 0.0
    var i = 0
    val nv = vec.numElements()
    while (i < nv) {
      val x = if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      xx += x * x
      i += 1
    }
    var best = Double.MaxValue
    var j = 0
    while (j < codebook.length) {
      val c = codebook(j)
      val m = math.min(nv, c.length)
      var dot = 0.0
      i = 0
      while (i < m) {
        val x = if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
        dot += x * c(i)
        i += 1
      }
      val d = xx - 2.0 * dot + sqNorms(j)
      if (d < best) best = d
      j += 1
    }
    best
  }

  def sqNorms(codebook: Array[Array[Double]]): Array[Double] =
    codebook.map(c => c.map(x => x * x).sum)
}

private[functions] trait CentroidExpression extends UnaryExpression {
  def codebook: Array[Array[Double]]

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprUtil.isVector(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${child.dataType.simpleString}")

  override def nullIntolerant: Boolean = true

  @transient protected lazy val norms: Array[Double] = CentroidOps.sqNorms(codebook)
  protected def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
}

/** `nearest_centroids(vec)` → the `nprobe` nearest codebook cells, closest
  * first, as `array<int>`. The codebook is a plan reference object, not a
  * literal tree.
  */
case class NearestCentroids(
    child: Expression,
    codebook: Array[Array[Double]],
    nprobe: Int)
    extends CentroidExpression {

  require(nprobe > 0, "nprobe must be > 0")

  override def prettyName: String = "nearest_centroids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    CentroidOps.nearest(v.asInstanceOf[ArrayData], elemIsDouble, codebook, norms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "double[][]")
    val nmRef = ctx.addReferenceObj("sqNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.CentroidOps.nearest(" +
        s"$in, $elemIsDouble, $cbRef, $nmRef, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `nearest_centroid_dist(vec)` → min squared L2 distance to the codebook
  * (the quantity Lloyd minimizes), as double.
  */
case class NearestCentroidDist(
    child: Expression,
    codebook: Array[Array[Double]])
    extends CentroidExpression {

  override def prettyName: String = "nearest_centroid_dist"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any =
    CentroidOps.minSqDist(v.asInstanceOf[ArrayData], elemIsDouble, codebook, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "double[][]")
    val nmRef = ctx.addReferenceObj("sqNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.CentroidOps.minSqDist(" +
        s"$in, $elemIsDouble, $cbRef, $nmRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `vec_sum(vec)` — elementwise sum of array vectors as a
  * `TypedImperativeAggregate`. One expression node replaces a dim-wide
  * `array(sum(element_at(v,1)), ..., sum(element_at(v,dim)))` tree: plans
  * stay O(1) in dim, and partial aggregation ships one double[dim] per
  * map task. The centroid-update workhorse; generally useful for mean
  * pooling of embeddings.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprUtil.isVector(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<float|double>, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  private lazy val isDouble =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = if (buffer.length >= n) buffer else java.util.Arrays.copyOf(buffer, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        buf(i) += (if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble)
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Double], input: Array[Double]): Array[Double] = {
    if (input.length == 0) return buffer
    val buf = if (buffer.length >= input.length) buffer
      else java.util.Arrays.copyOf(buffer, input.length)
    var i = 0
    while (i < input.length) { buf(i) += input(i); i += 1 }
    buf
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    var i = 0
    while (i < buffer.length) { out.writeDouble(buffer(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "vec_sum"
}

object CentroidFunctions {

  def nearestCentroids(vec: Column, codebook: Array[Array[Double]], nprobe: Int): Column =
    GraftSqlBridge.column(NearestCentroids(GraftSqlBridge.expression(vec), codebook, nprobe))

  def nearestCentroidDist(vec: Column, codebook: Array[Array[Double]]): Column =
    GraftSqlBridge.column(NearestCentroidDist(GraftSqlBridge.expression(vec), codebook))

  def vecSum(vec: Column): Column =
    GraftSqlBridge.column(VectorSumAgg(GraftSqlBridge.expression(vec)).toAggregateExpression())
}
