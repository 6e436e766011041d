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

/** The one total order both heaps rank by: `ORDER BY score DESC, id ASC`
  * with `java.lang.Double.compare` semantics — NaN sorts as the LARGEST
  * score and -0.0 below 0.0, exactly matching Spark's double sort order,
  * so heap selection and a `row_number()` Window agree even on NaN-scored
  * rows. (A naive `<` comparator deadlocks the heap on NaN: every
  * comparison against a NaN root is false, so nothing can evict it.)
  */
private[functions] object HeapOrdering {
  /** true if (s1,i1) is worse than (s2,i2) — i.e. ranks lower. */
  @inline def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }
}

/** Bounded max-heap state: keeps the k best (score, id) pairs, "best" =
  * highest score, ties broken by smaller id (matching
  * `ORDER BY score DESC, id ASC`). Backed by a size-k binary min-heap on
  * that ordering so every update is O(log k) with zero allocation.
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size: Int = 0

  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    HeapOrdering.worse(s1, i1, s2, i2)

  def insert(s: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      // sift up (root = worst of the kept set)
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score, id) pairs best-first. */
  def sortedDesc: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => HeapOrdering.worse(b._1, b._2, a._1, a._2))
}

/** `top_k_by_score(score, id, k)` — a `TypedImperativeAggregate` that keeps
  * only the k best rows per group in a fixed-size heap.
  *
  * Why it exists: the Window formulation of per-query top-k
  * (`row_number() over (partition by qid order by score desc)`) shuffles
  * and *sorts every scored candidate*. At 100 TB of candidates that sort is
  * the bottleneck. This aggregate is algebraic in the Spark sense — it has
  * partial aggregation, so each map task reduces its candidates to k rows
  * before the shuffle; the shuffle then moves only `k × #queries × #tasks`
  * rows instead of the full cross product, and no global sort happens.
  *
  * Returns `array<struct<score double, id long>>` best-first; pair with
  * `posexplode` to recover (rnk, score, id) rows.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, "k must be > 0")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType &&
      (id.dataType == LongType || id.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score expects (double, long) inputs, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  private lazy val idIsInt = id.dataType == IntegerType

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val idv = if (idIsInt) i.asInstanceOf[Int].toLong else i.asInstanceOf[Long]
      buffer.insert(s.asInstanceOf[Double], idv)
    }
    buffer
  }

  override def merge(buffer: TopKHeap, input: TopKHeap): TopKHeap = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedDesc.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      out.writeDouble(buffer.scores(i)); out.writeLong(buffer.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.insert(in.readDouble(), in.readLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  /** Column-API entry: `df.groupBy("qid").agg(TopKByScore.topK($"s", $"id", 10))`. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByScore(
        GraftSqlBridge.expression(score),
        GraftSqlBridge.expression(id), k).toAggregateExpression())
}

/** [[TopKHeap]] with an opaque payload riding along each (score, id) pair.
  * Ordering is identical (score desc, id asc); the payload never
  * participates in comparisons — it is whatever the caller wants back
  * without a join (a vector, a string, a struct).
  */
final class TopKPayloadHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  val payloads = new Array[Any](k)
  var size: Int = 0

  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    HeapOrdering.worse(s1, i1, s2, i2)

  def insert(s: Double, id: Long, payload: Any): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; payloads(i) = payload; size += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id; payloads(0) = payload
      siftDown(0)
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    val tp = payloads(a); payloads(a) = payloads(b); payloads(b) = tp
  }

  def mergeFrom(other: TopKPayloadHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i), other.payloads(i)); i += 1 }
  }

  /** (score, id, payload) triples best-first. */
  def sortedDesc: Array[(Double, Long, Any)] =
    (0 until size).map(i => (scores(i), ids(i), payloads(i))).toArray
      .sortWith((a, b) => HeapOrdering.worse(b._1, b._2, a._1, a._2))
}

/** `top_k_rows_by_score(score, id, payload, k)` — [[TopKByScore]] that also
  * CARRIES a payload column through the heap, so per-group selection needs
  * no join-back to recover the selected rows' data. Same partial-agg
  * contract: every map task reduces to ≤k rows per group before the
  * shuffle, and the shuffled bytes are k × (16 + payload) per group per
  * task. Payloads cross the partial/final boundary as UnsafeRow bytes.
  *
  * Returns `array<struct<score double, id long, payload <payloadType>>>`
  * best-first.
  */
case class TopKRowsByScore(
    score: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPayloadHeap] {

  require(k > 0, "k must be > 0")

  override def children: Seq[Expression] = Seq(score, id, payload)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType &&
      (id.dataType == LongType || id.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_rows_by_score expects (double, long, any) inputs, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("payload", payload.dataType, nullable = payload.nullable))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKPayloadHeap = new TopKPayloadHeap(k)

  private lazy val idIsInt = id.dataType == IntegerType

  override def update(buffer: TopKPayloadHeap, input: InternalRow): TopKPayloadHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val idv = if (idIsInt) i.asInstanceOf[Int].toLong else i.asInstanceOf[Long]
      // copy: eval may return a value backed by a reused mutable buffer row
      val p = InternalRow.copyValue(payload.eval(input))
      buffer.insert(s.asInstanceOf[Double], idv, p)
    }
    buffer
  }

  override def merge(buffer: TopKPayloadHeap, input: TopKPayloadHeap): TopKPayloadHeap = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: TopKPayloadHeap): Any =
    new GenericArrayData(buffer.sortedDesc.map { case (s, i, p) =>
      InternalRow(s, i, p)
    }.asInstanceOf[Array[Any]])

  @transient private lazy val payloadProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      Array(payload.dataType))
  @transient private lazy val payloadHolder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(buffer: TopKPayloadHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      out.writeDouble(buffer.scores(i)); out.writeLong(buffer.ids(i))
      payloadHolder.update(0, buffer.payloads(i))
      val bytes = payloadProj(payloadHolder).getBytes
      out.writeInt(bytes.length); out.write(bytes)
      i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPayloadHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new TopKPayloadHeap(k)
    val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
    var i = 0
    while (i < n) {
      val s = in.readDouble(); val id = in.readLong()
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      row.pointTo(buf, len)
      h.insert(s, id, InternalRow.copyValue(row.get(0, payload.dataType)))
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsByScore =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren(2))

  override def prettyName: String = "top_k_rows_by_score"
}

object TopKRowsByScore {
  /** Column-API entry: selection that carries the payload back join-free. */
  def topKRows(score: Column, id: Column, payload: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKRowsByScore(
        GraftSqlBridge.expression(score),
        GraftSqlBridge.expression(id),
        GraftSqlBridge.expression(payload), k).toAggregateExpression())
}

/** Bounded heap keyed by a STRING id: `ORDER BY score DESC, id ASC` where
  * the tie-break is UTF8String binary order (= Spark's and DuckDB's string
  * sort order for the UTF-8 code-point sequence). Same NaN discipline as
  * [[HeapOrdering]].
  */
final class TopKStrHeap(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  val scores = new Array[Double](k)
  val ids = new Array[UTF8String](k)
  var size: Int = 0

  @inline private def worse(s1: Double, i1: UTF8String, s2: Double, i2: UTF8String): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1.compareTo(i2) > 0)
  }

  def insert(s: Double, id: UTF8String): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def mergeFrom(other: TopKStrHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score, id) pairs best-first. */
  def sortedDesc: Array[(Double, UTF8String)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => {
        val c = java.lang.Double.compare(b._1, a._1)
        c < 0 || (c == 0 && b._2.compareTo(a._2) > 0)
      })
}

/** `top_k_by_score_str(score, id, k)` — [[TopKByScore]] for string-keyed
  * items (terms, tokens, urls): keeps the k best (score, string-id) pairs
  * per group with `ORDER BY score DESC, id ASC` tie-breaking, as a
  * partial-aggregable bounded heap. The map side reduces every task to ≤k
  * entries per group BEFORE the shuffle — the selection shape that
  * replaces a per-group Window sort.
  *
  * Returns `array<struct<score double, id string>>` best-first.
  */
case class TopKByStrKey(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKStrHeap] {
  import org.apache.spark.unsafe.types.UTF8String

  require(k > 0, "k must be > 0")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score_str expects (double, string) inputs, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", StringType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKStrHeap = new TopKStrHeap(k)

  override def update(buffer: TopKStrHeap, input: InternalRow): TopKStrHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      // clone: eval may return a UTF8String view over a reused row buffer
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[UTF8String].clone())
    buffer
  }

  override def merge(buffer: TopKStrHeap, input: TopKStrHeap): TopKStrHeap = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: TopKStrHeap): Any =
    new GenericArrayData(buffer.sortedDesc.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKStrHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      out.writeDouble(buffer.scores(i))
      val bytes = buffer.ids(i).getBytes
      out.writeInt(bytes.length); out.write(bytes)
      i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKStrHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new TopKStrHeap(k)
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      h.insert(s, UTF8String.fromBytes(buf))
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByStrKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByStrKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByStrKey =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_by_score_str"
}

object TopKByStrKey {
  /** Column-API entry: per-group top-k of string-keyed scored items. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByStrKey(
        GraftSqlBridge.expression(score),
        GraftSqlBridge.expression(id), k).toAggregateExpression())
}
