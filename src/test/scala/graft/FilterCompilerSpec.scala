package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.FilterCompiler

class FilterCompilerSpec extends SparkSpec {

  private lazy val df: DataFrame = {
    import spark.implicits._
    Seq(
      (1, "red", 10.0, true, """{"color":"red","size":10,"deleted":false}"""),
      (2, "blue", 20.0, false, """{"color":"blue","size":20,"deleted":true}"""),
      (3, "red", 30.0, true, """{"color":"red","size":30}"""),
      (4, "green", 40.0, false, """{"size":40}"""))
      .toDF("id", "color", "size", "flag", "meta")
  }

  private def idsTyped(filter: String): Seq[Int] =
    df.filter(FilterCompiler.compile(filter)).select("id")
      .collect().map(_.getInt(0)).sorted.toSeq

  private def idsJson(filter: String): Seq[Int] =
    df.filter(FilterCompiler.compileOverJson(filter, col("meta"))).select("id")
      .collect().map(_.getInt(0)).sorted.toSeq

  test("$eq and bare-value shorthand") {
    assert(idsTyped("""{"color": {"$eq": "red"}}""") == Seq(1, 3))
    assert(idsTyped("""{"color": "red"}""") == Seq(1, 3))
    assert(idsJson("""{"color": "red"}""") == Seq(1, 3))
  }

  test("$ne (null-safe: missing values count as not-equal)") {
    assert(idsTyped("""{"color": {"$ne": "red"}}""") == Seq(2, 4))
    assert(idsJson("""{"color": {"$ne": "red"}}""") == Seq(2, 4))
  }

  test("numeric comparisons") {
    assert(idsTyped("""{"size": {"$gt": 15}}""") == Seq(2, 3, 4))
    assert(idsTyped("""{"size": {"$gte": 20, "$lt": 40}}""") == Seq(2, 3))
    assert(idsJson("""{"size": {"$lte": 20}}""") == Seq(1, 2))
  }

  test("$in / $nin") {
    assert(idsTyped("""{"color": {"$in": ["red", "green"]}}""") == Seq(1, 3, 4))
    assert(idsTyped("""{"color": {"$nin": ["red", "green"]}}""") == Seq(2))
    assert(idsJson("""{"color": {"$in": ["blue"]}}""") == Seq(2))
  }

  test("mixed-type $in over json applies each member's own cast") {
    // the numeric member must match through the double cast (json renders
    // size 20 as "20", which 20.0 only equals numerically) even when the
    // FIRST member is a string — a single first-member cast compares
    // "20.0" against "20" and loses the match
    assert(idsJson("""{"size": {"$in": ["nope", 20.0]}}""") == Seq(2))
    assert(idsJson("""{"size": {"$in": [10, "nope"]}}""") == Seq(1))
    assert(idsJson("""{"color": {"$in": ["blue", 999]}}""") == Seq(2))
    // $nin stays the null-safe negation: row 4 (no color) survives
    assert(idsJson("""{"color": {"$nin": ["blue", 999]}}""") == Seq(1, 3, 4))
  }

  test("$exists over json paths") {
    assert(idsJson("""{"color": {"$exists": true}}""") == Seq(1, 2, 3))
    assert(idsJson("""{"color": {"$exists": false}}""") == Seq(4))
  }

  test("implicit AND across fields; $and/$or combinators") {
    assert(idsTyped("""{"color": "red", "size": {"$gt": 15}}""") == Seq(3))
    assert(idsTyped("""{"$or": [{"color": "blue"}, {"size": {"$gte": 40}}]}""") == Seq(2, 4))
    assert(idsTyped("""{"$and": [{"flag": true}, {"size": {"$lt": 20}}]}""") == Seq(1))
  }

  test("boolean over json compares json literals") {
    assert(idsJson("""{"deleted": false}""") == Seq(1))
    assert(idsJson("""{"deleted": true}""") == Seq(2))
  }

  test("errors: unknown operator, bad $in, non-object") {
    intercept[IllegalArgumentException](FilterCompiler.compile("""{"f": {"$bogus": 1}}"""))
    intercept[IllegalArgumentException](FilterCompiler.compile("""{"f": {"$in": 3}}"""))
    intercept[IllegalArgumentException](FilterCompiler.compile("""[1]"""))
    intercept[IllegalArgumentException](FilterCompiler.compile("""{"$and": 3}"""))
  }

  test("compiled typed predicate pushes down to parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("fc-pushdown").toString
    df.write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
      .filter(FilterCompiler.compile("""{"color": "red", "size": {"$gt": 15}}"""))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(color,red)") && plan.contains("GreaterThan(size,15"),
      s"expected pushed filters in:\n$plan")
  }
}
