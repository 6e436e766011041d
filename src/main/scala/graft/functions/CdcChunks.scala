package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_chunks(text)` → `array<string>`: content-defined chunking (the
  * LBFS/FastCDC family) of a string by a Rabin-style rolling hash — the
  * storage-dedup primitive that makes chunk boundaries depend on CONTENT,
  * not offsets, so an insertion early in a document shifts only the chunk
  * it lands in and every later chunk still dedups against the previous
  * version. (Fixed-size chunking loses all alignment after one edit.)
  *
  * Semantics (deliberately modulus-free so an independent SQL engine
  * replays it with plain 64-bit integer arithmetic):
  *   - positions are Unicode code points; `H(j) = Σ_{i=0..w-1}
  *     cp(c[j-i]) · 31^i` over the trailing `window`-code-point slice
  *     (Horner oldest-first; max magnitude ~3.2e16 for w=8, exact in any
  *     64-bit integer — no modulus, no overflow);
  *   - `j` (≥ window−1) is a boundary iff `H(j) % divisor == 0`; the
  *     chunk ends at `j` inclusive and the window keeps rolling across
  *     the cut (standard CDC — boundaries stay content-local);
  *   - expected chunk length ≈ `divisor` code points; a doc shorter than
  *     `window` is one whole-doc chunk; empty text chunks to an empty
  *     array.
  *
  * One O(n) pass per row via the classic rolling update
  * `H(j+1) = (H(j) − cp(c[j−w+1])·31^(w−1))·31 + cp(c[j+1])` — the
  * per-position O(w) re-evaluation a HOF formulation would pay (and the
  * oracle deliberately does pay, as an independent formulation) never
  * runs on the engine side.
  */
case class CdcChunks(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  require(window >= 2, s"window must be >= 2, got $window")
  require(divisor >= 2, s"divisor must be >= 2, got $divisor")

  override def prettyName: String = "cdc_chunks"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects string or binary, got ${other.simpleString}")
  }
  private def isBinary: Boolean = child.dataType == BinaryType
  override def dataType: DataType =
    ArrayType(if (isBinary) BinaryType else StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => compute(s)
    case b: Array[Byte] => computeBytes(b)
  }

  /** BinaryType arm: identical boundary rule over UNSIGNED BYTES instead
    * of code points — the storage-dedup form for opaque blobs (media,
    * model shards). Chunks are byte slices of the input.
    */
  def computeBytes(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n < window) {
      out += bytes.clone()
      return new GenericArrayData(out.toArray)
    }
    var topPow = 1L
    var k = 1
    while (k < window) { topPow *= 31L; k += 1 }
    var h = 0L
    k = 0
    while (k < window) { h = h * 31L + (bytes(k) & 0xff); k += 1 }
    var from = 0
    var j = window - 1
    while (j < n) {
      if (h % divisor == 0) {
        out += java.util.Arrays.copyOfRange(bytes, from, j + 1)
        from = j + 1
      }
      if (j + 1 < n) h = (h - (bytes(j - window + 1) & 0xff) * topPow) * 31L +
        (bytes(j + 1) & 0xff)
      j += 1
    }
    if (from < n) out += java.util.Arrays.copyOfRange(bytes, from, n)
    new GenericArrayData(out.toArray)
  }

  /** Public so generated code calls it directly (one virtual call per row
    * keeps the surrounding WholeStageCodegen stage intact).
    */
  def compute(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n < window) {
      out += UTF8String.fromString(new String(cps, 0, n))
      return new GenericArrayData(out.toArray)
    }
    var topPow = 1L // 31^(window-1)
    var k = 1
    while (k < window) { topPow *= 31L; k += 1 }
    // H(window-1): Horner, oldest code point first
    var h = 0L
    k = 0
    while (k < window) { h = h * 31L + cps(k); k += 1 }
    var from = 0
    var j = window - 1
    while (j < n) {
      if (h % divisor == 0) {
        out += UTF8String.fromString(new String(cps, from, j + 1 - from))
        from = j + 1
      }
      if (j + 1 < n) h = (h - cps(j - window + 1) * topPow) * 31L + cps(j + 1)
      j += 1
    }
    if (from < n) out += UTF8String.fromString(new String(cps, from, n - from))
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdc", this, classOf[CdcChunks].getName)
    val call = if (isBinary) "computeBytes" else "compute"
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.$call($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
