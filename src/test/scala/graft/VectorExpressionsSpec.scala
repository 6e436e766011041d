package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

class VectorExpressionsSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (2, Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (3, Seq(2.0f, 0.0f), Seq(2.0f, 0.0f)))
      .toDF("id", "a", "b")
  }

  test("vec_dot computes the dot product (codegen path)") {
    val rows = df.select(col("id"), GraftFunctions.vecDot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) == 32.0)
    assert(rows(1).getDouble(1) == 0.0)
    assert(rows(2).getDouble(1) == 4.0)
  }

  test("vec_cosine: orthogonal→0, identical→1, null norm→null") {
    import spark.implicits._
    val rows = df.select(col("id"), GraftFunctions.vecCosine(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(math.abs(rows(1).getDouble(1)) < 1e-12)
    assert(math.abs(rows(2).getDouble(1) - 1.0) < 1e-12)
    val z = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
      .select(GraftFunctions.vecCosine(col("a"), col("b"))).head()
    assert(z.isNullAt(0))
  }

  test("vec_norm") {
    import spark.implicits._
    val n = Seq(Tuple1(Seq(3.0f, 4.0f))).toDF("a")
      .select(GraftFunctions.vecNorm(col("a"))).head().getDouble(0)
    assert(n == 5.0)
  }

  test("double-array inputs work too") {
    import spark.implicits._
    val d = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(GraftFunctions.vecDot(col("a"), col("b"))).head().getDouble(0)
    assert(d == 11.0)
  }

  test("null input rows yield null (nullIntolerant)") {
    import spark.implicits._
    val r = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .select(GraftFunctions.vecDot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("sparse_dot merges on sorted indices") {
    import spark.implicits._
    val r = Seq((
      Seq(1L, 3L, 5L), Seq(1.0f, 2.0f, 3.0f),
      Seq(3L, 5L, 7L), Seq(10.0f, 20.0f, 30.0f)))
      .toDF("ia", "va", "ib", "vb")
      .select(GraftFunctions.sparseDot(col("ia"), col("va"), col("ib"), col("vb")))
      .head().getDouble(0)
    assert(r == 2.0 * 10.0 + 3.0 * 20.0)
  }

  test("SQL registration: vec_cosine usable from spark.sql") {
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("vt")
    val r = spark.sql("SELECT vec_cosine(a, b) FROM vt WHERE id = 3").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("SQL registration: sketch functions usable from spark.sql") {
    GraftFunctions.register(spark)
    val sig = spark.sql(
      "SELECT minhash_signature(word_ngram_hashes('a b c d', 2, 1), 8)").head().getSeq[Long](0)
    assert(sig.length == 8)
    val sh = spark.sql("SELECT simhash64(word_ngram_hashes('a b c d', 1, 0))").head().getLong(0)
    val shAgain = spark.sql("SELECT simhash64(word_ngram_hashes('a b c d', 1, 0))").head().getLong(0)
    assert(sh == shAgain)
  }

  test("type mismatch is an analysis error") {
    import spark.implicits._
    val bad = Seq((1, "x")).toDF("a", "b")
    intercept[Exception] {
      bad.select(GraftFunctions.vecDot(col("a"), col("b"))).head()
    }
  }

  test("expressions stay inside whole-stage codegen") {
    val dir = java.nio.file.Files.createTempDirectory("vec-cg").toString
    df.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .select(GraftFunctions.vecCosine(col("a"), col("b")).as("c"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_cosine"), s"no codegen span in:\n$plan")
    // and the result is still right through the codegen path
    assert(q.count() == 3)
  }
}
