package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      Bucketing.writeBucketed(orders, "orders_b", Seq("o_custkey"), 4)
      Bucketing.writeBucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", Seq("o_custkey"), 4)

      val joined = Bucketing.table(spark, "orders_b")
        .join(Bucketing.table(spark, "customer_b"), "o_custkey")
      joined.count() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      // and the same join on plain tables DOES shuffle (the control)
      val plain = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      plain.count()
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))

      // results identical
      assert(joined.count() ==
        orders.join(customer, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
