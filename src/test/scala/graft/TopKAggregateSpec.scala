package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TopKByScore, TopKByStrKey, TopKHeap, TopKPayloadHeap, TopKRowsByScore}

class TopKAggregateSpec extends SparkSpec {

  test("heap keeps the k best with deterministic tie-breaks") {
    val h = new TopKHeap(3)
    h.insert(1.0, 10); h.insert(5.0, 20); h.insert(3.0, 30)
    h.insert(4.0, 40); h.insert(5.0, 5); h.insert(0.5, 50)
    // best: (5.0,5), (5.0,20), (4.0,40) — ties broken by smaller id
    assert(h.sortedDesc.toSeq == Seq((5.0, 5L), (5.0, 20L), (4.0, 40L)))
  }

  test("heap ranks NaN as the largest score (Spark's double sort order) and never deadlocks on it") {
    val h = new TopKHeap(3)
    h.insert(Double.NaN, 5L); h.insert(0.9, 1L); h.insert(1.0, 2L); h.insert(0.5, 3L)
    assert(h.sortedDesc.toSeq.map(_._2) == Seq(5L, 2L, 1L))
    // a NaN root must still be comparable: better rows evict worse ones
    val g = new TopKHeap(2)
    g.insert(0.1, 1L); g.insert(0.2, 2L); g.insert(Double.NaN, 3L)
    assert(g.sortedDesc.toSeq.map(_._2) == Seq(3L, 2L), "NaN should evict the worst row")
    val p = new TopKPayloadHeap(2)
    p.insert(0.1, 1L, "a"); p.insert(Double.NaN, 2L, "b"); p.insert(0.9, 3L, "c")
    assert(p.sortedDesc.toSeq.map(t => (t._2, t._3)) == Seq((2L, "b"), (3L, "c")))
  }

  test("heap merge equals bulk insert") {
    val a = new TopKHeap(4); val b = new TopKHeap(4)
    val xs = Seq((1.0, 1L), (9.0, 2L), (3.0, 3L), (7.0, 4L))
    val ys = Seq((8.0, 5L), (2.0, 6L), (6.0, 7L), (9.0, 0L))
    xs.foreach { case (s, i) => a.insert(s, i) }
    ys.foreach { case (s, i) => b.insert(s, i) }
    a.mergeFrom(b)
    val all = new TopKHeap(4)
    (xs ++ ys).foreach { case (s, i) => all.insert(s, i) }
    assert(a.sortedDesc.toSeq == all.sortedDesc.toSeq)
  }

  test("aggregate matches the window formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 2000).map { i =>
      (i % 13, rnd.nextDouble(), i.toLong)
    }.toDF("grp", "score", "id").repartition(8).cache()

    val viaWindow = df.withColumn("rnk",
        row_number().over(Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)))
      .filter(col("rnk") <= 5)
      .select("grp", "id", "rnk")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet

    val viaHeap = df.groupBy("grp")
      .agg(TopKByScore.topK(col("score"), col("id"), 5).as("tk"))
      .select(col("grp"), posexplode(col("tk")))
      .select(col("grp"), col("col.id"), (col("pos") + 1).as("rnk"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet

    assert(viaHeap == viaWindow)
    df.unpersist()
  }

  test("partial aggregation appears in the plan (map-side top-k)") {
    import spark.implicits._
    val df = Seq((1, 1.0, 1L)).toDF("grp", "score", "id")
    val plan = df.groupBy("grp")
      .agg(TopKByScore.topK(col("score"), col("id"), 5))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs twice: partial before the exchange, final after
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("partial_top_k_by_score".r.findAllIn(plan).nonEmpty, plan)
  }

  test("payload variant matches window + join-back, payloads survive the shuffle") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // string AND array payloads — both cross the partial/final boundary as
    // UnsafeRow bytes, the cases a naive Java-serialized buffer would get
    // wrong or slow
    val df = (1 to 1500).map { i =>
      (i % 7, rnd.nextDouble(), i.toLong, s"payload-$i", Seq(i.toDouble, i * 2.0))
    }.toDF("grp", "score", "id", "tag", "vec").repartition(8).cache()

    val viaWindow = df.withColumn("rnk",
        row_number().over(Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)))
      .filter(col("rnk") <= 4)
      .select("grp", "id", "tag", "vec")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getSeq[Double](3)))
      .toSet

    val viaHeap = df.groupBy("grp")
      .agg(TopKRowsByScore.topKRows(col("score"), col("id"),
        struct(col("tag"), col("vec")), 4).as("tk"))
      .select(col("grp"), explode(col("tk")).as("e"))
      .select(col("grp"), col("e.id"), col("e.payload.tag"), col("e.payload.vec"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getSeq[Double](3)))
      .toSet

    assert(viaHeap == viaWindow)

    // same partial-agg discipline as the id-only variant
    val plan = df.groupBy("grp")
      .agg(TopKRowsByScore.topKRows(col("score"), col("id"), col("tag"), 4))
      .queryExecution.executedPlan.toString
    assert("partial_top_k_rows_by_score".r.findAllIn(plan).nonEmpty, plan)
    df.unpersist()
  }

  test("string-keyed variant matches the window formulation, ties on term asc") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(5), words(rnd.nextInt(words.length)) + rnd.nextInt(30),
        // coarse scores force real score ties across distinct strings
        rnd.nextInt(4).toDouble)
    } ++ Seq((0, "nan-case", Double.NaN)) // NaN ranks largest, must not deadlock
    val df = rows.toDF("grp", "term", "score").repartition(7).cache()

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("term").asc)
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(3))).toSet

    val viaHeap = df.groupBy("grp")
      .agg(TopKByStrKey.topK(col("score"), col("term"), 3).as("tk"))
      .select(col("grp"), posexplode(col("tk")))
      .select(col("grp"), col("col.id"), (col("pos") + 1).cast("int"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet

    assert(viaHeap == viaWindow)

    // partial-agg discipline: map-side heap before the shuffle
    val plan = df.groupBy("grp")
      .agg(TopKByStrKey.topK(col("score"), col("term"), 3))
      .queryExecution.executedPlan.toString
    assert("partial_top_k_by_score_str".r.findAllIn(plan).nonEmpty, plan)
    df.unpersist()
  }
}
