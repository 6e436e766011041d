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

  test("partitioned layout: filter on partition column prunes directories") {
    val dir = "/tmp/graft-part-layout"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Bucketing.writePartitioned(docs, dir, Seq("lang"))

    val scan = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"partition filter not pushed to scan:\n$plan")

    // only the lang=en directory's files are read (scan metric)
    scan.collect()
    val numFilesRead = scan.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.getOrElse(-1L)
    val enFiles = new java.io.File(s"$dir/lang=en").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val allFiles = spark.read.parquet(dir).inputFiles.length
    assert(numFilesRead == enFiles && numFilesRead < allFiles,
      s"expected $enFiles pruned files of $allFiles, scan read $numFilesRead")

    // correctness: partitioned round trip preserves the rows
    assert(scan.count() == docs.filter(col("lang") === "en").count())
  }
}
