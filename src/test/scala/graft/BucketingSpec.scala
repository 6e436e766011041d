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

  test("compactPartitioned: appended small files collapse per dir-size; rows survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-in-").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out-").toString
    // simulate streaming-append debris: 8 tiny appends, skewed keys
    // (cell 0 gets 8x the rows of cell 1)
    for (b <- 0 until 8) {
      val rows = (0 until 80).map(i => (b * 1000L + i, s"payload_${b}_$i", if (i < 72) 0 else 1))
      rows.toDF("id", "v", "cell")
        .repartition(2) // two files per append per cell
        .write.mode("append").partitionBy("cell").parquet(dir)
    }
    def fileCount(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before0 = fileCount(s"$dir/cell=0")
    assert(before0 >= 8, s"debris expected, got $before0")

    // target sized so cell=0 needs a few files and cell=1 exactly one
    val cell0Bytes = new java.io.File(s"$dir/cell=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    Bucketing.compactPartitioned(spark, dir, out, Seq("cell"),
      targetFileBytes = cell0Bytes / 3)
    val after0 = fileCount(s"$out/cell=0")
    val after1 = fileCount(s"$out/cell=1")
    assert(after0 < before0 && after0 <= 4, s"cell=0: $before0 -> $after0")
    assert(after1 == 1, s"small partition must collapse to one file, got $after1")
    // byte-for-byte data equality
    val a = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("compactPartitioned: refuses in-place or nested output directories") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-guard-").toString
    Seq((1L, "x", 0)).toDF("id", "v", "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    for (bad <- Seq(dir, s"$dir/", s"$dir/nested", s"file:$dir")) {
      intercept[IllegalArgumentException] {
        Bucketing.compactPartitioned(spark, dir, bad, Seq("cell"))
      }
    }
    // and a dir nested the other way round (overwrite would delete the source)
    intercept[IllegalArgumentException] {
      Bucketing.compactPartitioned(
        spark, s"$dir/nested", dir, Seq("cell"))
    }
  }

  test("compactPartitioned: hive-escaped and null partition values still compact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-esc-in-").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-esc-out-").toString
    // "a/b" escapes to a%2Fb in the dir name; null becomes
    // __HIVE_DEFAULT_PARTITION__; "01" is type-inferred back as 1 —
    // all three used to miss the slice-map key and fall back to 1 slice
    // silently; now the _metadata.file_path key matches the listing.
    for (_ <- 0 until 4) {
      Seq((1L, "p", "a/b"), (2L, "q", null: String), (3L, "r", "01"))
        .toDF("id", "v", "lang")
        .coalesce(1).write.mode("append").partitionBy("lang").parquet(dir)
    }
    Bucketing.compactPartitioned(spark, dir, out, Seq("lang"))
    def fileCount(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    for (sub <- Seq("lang=a%2Fb", "lang=__HIVE_DEFAULT_PARTITION__"))
      assert(fileCount(s"$out/$sub") == 1, s"$sub did not collapse to one file")
    val a = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
