package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  private lazy val li = spark.read
    .parquet("/root/testdata/sf0.01/lineitem.parquet").cache()

  test("approx distinct within rsd bound of exact") {
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinct(li, col("l_orderkey"), Seq(col("l_returnflag")), rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx=$a exact=$e")
    }
  }

  test("approx quantiles within tight accuracy of exact") {
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5, 0.95), 0.0)
    val approx = Sketches.approxQuantiles(
      li.withColumn("g", lit(1)), col("l_extendedprice"), Seq(col("g")),
      Seq(0.5, 0.95)).head().getSeq[Double](1)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.02, s"approx=$a exact=$e")
    }
  }

  test("hll sketches merge across partitions to a consistent estimate") {
    // two disjoint halves sketched separately, then unioned
    val a = Sketches.hllSketch(
      li.filter(col("l_orderkey") % 2 === 0).withColumn("g", lit(1)),
      col("l_orderkey"), Seq(col("g")))
    val b = Sketches.hllSketch(
      li.filter(col("l_orderkey") % 2 === 1).withColumn("g", lit(1)),
      col("l_orderkey"), Seq(col("g")))
    val est = Sketches.hllUnionEstimate(
      a.unionByName(b), col("hll_sketch"), Seq(col("g"))).head().getLong(1)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }

  test("sketch aggregates keep map-side partial aggregation") {
    val plan = Sketches.approxDistinct(li, col("l_orderkey"), Seq(col("l_returnflag")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"), plan)
  }

  test("heavy hitters: exact when distinct items fit the counters") {
    import spark.implicits._
    val df = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val got = Sketches.heavyHitters(
        df.toDF("t").withColumn("g", lit(1)).repartition(7),
        col("t"), Seq(col("g")), k = 8)
      .head().getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got == Seq("a" -> 5L, "b" -> 3L, "c" -> 2L))
  }

  test("heavy hitters: MG guarantee holds under partitioned merge") {
    import spark.implicits._
    // skewed stream: "hot" is 40% of n; 60 distinct cold items share
    // the rest; k=9 -> threshold n/(k+1) = n/10 < 40% so "hot" MUST
    // survive any merge order, with estimate >= true - n/10
    val n = 1000
    val items = (0 until n).map { i =>
      if (i % 5 < 2) "hot" else s"cold${i % 60}"
    }
    val k = 9
    val got = Sketches.heavyHitters(
        items.toDF("t").withColumn("g", lit(1)).repartition(13),
        col("t"), Seq(col("g")), k = k)
      .head().getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val trueHot = items.count(_ == "hot").toLong
    assert(got.contains("hot"), s"hot item evicted: $got")
    assert(got("hot") <= trueHot, "MG must never overcount")
    assert(got("hot") >= trueHot - n / (k + 1),
      s"undercount beyond n/(k+1): ${got("hot")} vs $trueHot")
    assert(got.size <= k)
  }

  test("heavy hitters: per-group summaries are independent") {
    import spark.implicits._
    val df = (Seq.fill(4)(("g1", "x")) ++ Seq.fill(2)(("g1", "y")) ++
      Seq.fill(3)(("g2", "z"))).toDF("g", "t")
    val got = Sketches.heavyHitters(df, col("t"), Seq(col("g")), k = 4)
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => x.getString(0) -> x.getLong(1))).toMap
    assert(got("g1") == Seq("x" -> 4L, "y" -> 2L))
    assert(got("g2") == Seq("z" -> 3L))
  }
}
