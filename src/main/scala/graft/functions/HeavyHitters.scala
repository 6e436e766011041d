package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary: at most `k` counters tracking the
  * most frequent items of a stream. The guarantee (the reason this is THE
  * mergeable frequent-items sketch): after observing `n` items, every
  * item with true frequency `> n/(k+1)` is present, and every reported
  * estimate undercounts by at most `n/(k+1)`. The candidate SET can vary
  * with observation order (as with any MG implementation) — the
  * guarantee, not the set, is the contract, which is why this lives with
  * the sketches (spec-tested, deliberately outside the DuckDB gate).
  */
final class MgSummary(val k: Int) {
  val counts = new scala.collection.mutable.HashMap[UTF8String, Long]

  def offer(item: UTF8String, w: Long): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + w)
      case None =>
        // copy: the incoming UTF8String may alias a reused row buffer
        counts.update(item.clone(), w)
        if (counts.size > k) shrink()
    }
  }

  def mergeFrom(other: MgSummary): Unit = {
    other.counts.foreach { case (item, w) =>
      counts.update(item, counts.getOrElse(item, 0L) + w)
    }
    if (counts.size > k) shrink()
  }

  /** Subtract the (k+1)-th largest count from everyone and drop the
    * non-positive — the standard MG reduction: one pass brings the
    * summary back to ≤ k counters while preserving the error bound. */
  private def shrink(): Unit = {
    val vs = counts.values.toArray
    java.util.Arrays.sort(vs)
    val cut = vs(vs.length - (k + 1)) // (k+1)-th largest
    counts.filterInPlace { case (_, c) => c > cut }
    if (cut > 0) counts.mapValuesInPlace { case (_, c) => c - cut }
  }

  /** (item, estimate) sorted by estimate desc, item asc — deterministic
    * rendering of whatever candidate set survived. */
  def sorted: Array[(UTF8String, Long)] =
    counts.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      c1 > c2 || (c1 == c2 && i1.compareTo(i2) < 0)
    }
}

/** `heavy_hitters(item, k)` — grouped Misra–Gries. Map-side partial
  * aggregation keeps ≤ k counters per group per task and merges
  * summaries sketch-wise, so the shuffle carries O(k) per group
  * regardless of stream length — the frequent-items companion to
  * `hll_sketch_agg`/`percentile_approx` in [[graft.operators.Sketches]].
  */
case class HeavyHittersAgg(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary] {

  require(k > 0, "k must be > 0")

  override def children: Seq[Expression] = Seq(item)

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters expects a string item, got ${item.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgSummary = new MgSummary(k)

  override def update(buffer: MgSummary, input: InternalRow): MgSummary = {
    val v = item.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[UTF8String], 1L)
    buffer
  }

  override def merge(buffer: MgSummary, input: MgSummary): MgSummary = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: MgSummary): Any =
    new GenericArrayData(buffer.sorted.map { case (i, c) =>
      InternalRow(i, c)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (i, c) =>
      val b = i.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new MgSummary(k)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.counts.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(item = newChildren(0))

  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersAgg {
  /** Column-API entry:
    * `df.groupBy("src").agg(HeavyHittersAgg.heavyHitters($"term", 8))`. */
  def heavyHitters(item: Column, k: Int): Column =
    GraftSqlBridge.column(
      HeavyHittersAgg(GraftSqlBridge.expression(item), k)
        .toAggregateExpression())
}
