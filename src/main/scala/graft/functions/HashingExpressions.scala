package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._

/** Codegen'd sketch primitives for near-duplicate detection.
  *
  * Both take a pre-hashed token/shingle array (`xxhash64`-ed strings —
  * built-in and codegen'd), so the per-row loop is pure 64-bit arithmetic:
  * no string handling, no interpreted lambdas (Spark's higher-order
  * functions are `CodegenFallback` — a k×n minhash via
  * `transform`/`aggregate` would interpret k×n closures per row; this is
  * one fused native loop).
  */
object HashingExpressions {

  /** Deterministic per-seed affine coefficients: h_i(x) = a_i·x + b_i with
    * odd a_i — wrap-around multiplication by an odd constant is a bijection
    * on 64-bit ints, so unsigned-min over a shingle set is a proper minhash
    * without any modulo.
    */
  private[functions] def coefficients(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val a = Array.fill(k)(rnd.nextLong() | 1L)
    val b = Array.fill(k)(rnd.nextLong())
    (a, b)
  }
}

/** `minhash_signature(hashes)` → `array<long>` of k unsigned-min affine
  * hashes — the MinHash signature of the (pre-hashed) shingle set.
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  require(k > 0, "k must be > 0")

  override def prettyName: String = "minhash_signature"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<long>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val (coefA, coefB) = HashingExpressions.coefficients(k, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, -1L) // unsigned max
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        var j = 0
        while (j < k) {
          val h = coefA(j) * x + coefB(j)
          if (java.lang.Long.compareUnsigned(h, sig(j)) < 0) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("coefA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("coefB", coefB, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val sig = ctx.freshName("sig")
      val x = ctx.freshName("x"); val h = ctx.freshName("h")
      s"""
         |int $n = $in.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, -1L);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$in.isNullAt($i)) {
         |    long $x = $in.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = $aRef[$j] * $x + $bRef[$j];
         |      if (java.lang.Long.compareUnsigned($h, $sig[$j]) < 0) $sig[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `simhash64(hashes)` → 64-bit SimHash of the (pre-hashed) token multiset:
  * bit b of the result is the majority vote of bit b across token hashes.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<long>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((x >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val counts = ctx.freshName("counts")
      val x = ctx.freshName("x"); val out = ctx.freshName("out")
      s"""
         |int $n = $in.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$in.isNullAt($i)) {
         |    long $x = $in.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($x >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SketchFunctions {
  def minhashSignature(hashes: Column, k: Int, seed: Long = 42L): Column =
    GraftSqlBridge.column(MinHashSignature(GraftSqlBridge.expression(hashes), k, seed))

  def simhash64(hashes: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(hashes)))

  def wordNgramHashes(text: Column, n: Int, distinct: Boolean): Column =
    GraftSqlBridge.column(WordNgramHashes(GraftSqlBridge.expression(text), n, distinct))

  def cdcChunks(text: Column, window: Int = 8, divisor: Int = 64): Column =
    GraftSqlBridge.column(CdcChunks(GraftSqlBridge.expression(text), window, divisor))
}
