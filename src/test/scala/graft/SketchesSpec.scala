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
}
