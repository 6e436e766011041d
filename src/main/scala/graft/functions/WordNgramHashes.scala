package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngram_hashes(text)` → `array<long>`: 64-bit hashes of the word
  * n-grams of a string, computed in ONE pass over the raw UTF-8 bytes.
  *
  * Semantics match `transform(shingles(split(text,' '),n), s=>xxhash64(s))`:
  * tokens split on single spaces (empty tokens included, like `split`), and
  * each n-gram hash covers the exact byte range of the space-joined window
  * — but with none of the intermediate costs: no token array, no shingle
  * strings, no interpreted higher-order-function lambdas (profiling showed
  * the HOF chain dominating the minhash pipeline at 3 scans × interpreted
  * cost). With `distinct=true` output hashes are sorted-unique (set
  * semantics for Jaccard); `false` keeps the multiset (SimHash weighting).
  */
case class WordNgramHashes(child: Expression, n: Int, distinct: Boolean, seed: Long = 42L)
    extends UnaryExpression {

  require(n >= 1, "n must be >= 1")

  override def prettyName: String = "word_ngram_hashes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hashes expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it directly (one virtual call per
    * row keeps the surrounding WholeStageCodegen stage intact).
    */
  def compute(s: UTF8String): ArrayData = {
    val numBytes = s.numBytes()
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    // token start offsets (a token starts at 0 and after every space)
    var tokenCount = 1
    var i = 0
    while (i < numBytes) {
      if (org.apache.spark.unsafe.Platform.getByte(base, offset + i) == ' '.toByte) tokenCount += 1
      i += 1
    }
    val starts = new Array[Int](tokenCount + 1)
    var t = 1
    i = 0
    while (i < numBytes) {
      if (org.apache.spark.unsafe.Platform.getByte(base, offset + i) == ' '.toByte) {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    starts(tokenCount) = numBytes + 1 // sentinel: "start of one-past-last token"
    val nGrams = tokenCount - n + 1
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      val from = starts(g)
      val until = starts(g + n) - 1 // end of token g+n-1 (strip trailing sep)
      out(g) = XXH64.hashUnsafeBytes(base, offset + from, until - from, seed)
      g += 1
    }
    if (!distinct) return new GenericArrayData(out)
    java.util.Arrays.sort(out)
    var uniq = 0
    var j = 0
    while (j < nGrams) {
      if (j == 0 || out(j) != out(j - 1)) { out(uniq) = out(j); uniq += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wngh", this, classOf[WordNgramHashes].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.compute($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
}
