package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{FilterRuntime, GraftFunctions}
import graft.operators.{FilterCompiler, Similarity}

class FilterMatchSpec extends SparkSpec {

  private def matches(filter: String, meta: String): Boolean =
    FilterRuntime.matches(
      if (filter == null) null else UTF8String.fromString(filter),
      if (meta == null) null else UTF8String.fromString(meta))

  private val metas = Seq(
    """{"color":"red","size":10,"deleted":false}""",
    """{"color":"blue","size":20,"deleted":true}""",
    """{"color":"red","size":30}""",
    """{"size":40}""",
    """{"color":null,"size":"15"}""",
    """{}""")

  private val filters = Seq(
    """{"color": {"$eq": "red"}}""",
    """{"color": "red"}""",
    """{"color": {"$ne": "red"}}""",
    """{"size": {"$gt": 15}}""",
    """{"size": {"$gte": 20, "$lt": 40}}""",
    """{"size": {"$lte": 20}}""",
    """{"color": {"$in": ["red", "green"]}}""",
    """{"color": {"$nin": ["red", "green"]}}""",
    """{"color": {"$exists": true}}""",
    """{"color": {"$exists": false}}""",
    """{"deleted": true}""",
    """{"deleted": false}""",
    """{"color": "red", "size": {"$gt": 15}}""",
    """{"$or": [{"color": "blue"}, {"size": {"$gte": 40}}]}""",
    """{"$and": [{"deleted": false}, {"size": {"$lt": 20}}]}""")

  test("runtime evaluator agrees with compileOverJson on the filter x metadata grid") {
    import spark.implicits._
    val df = metas.zipWithIndex.map { case (m, i) => (i, m) }.toDF("id", "meta")
    for (f <- filters) {
      val compiled = df.filter(FilterCompiler.compileOverJson(f, col("meta")))
        .select("id").collect().map(_.getInt(0)).toSet
      val runtime = metas.indices.filter(i => matches(f, metas(i))).toSet
      assert(runtime == compiled, s"filter $f: runtime=$runtime compiled=$compiled")
    }
  }

  test("null/empty filter matches everything; null metadata is empty doc") {
    assert(matches(null, """{"a":1}"""))
    assert(matches("", """{"a":1}"""))
    assert(matches("{}", null))
    assert(matches("""{"a": {"$exists": false}}""", null))
    assert(!matches("""{"a": {"$eq": 1}}""", null))
    assert(matches("""{"a": {"$ne": 1}}""", null))
  }

  test("numeric coercion: string-typed metadata numbers compare as numbers") {
    assert(matches("""{"size": {"$gt": 12}}""", """{"size":"15"}"""))
    assert(!matches("""{"size": {"$gt": 20}}""", """{"size":"15"}"""))
  }

  test("errors surface as FilterSyntaxError; expression eval inside codegen") {
    intercept[IllegalArgumentException](matches("""{"f": {"$bogus": 1}}""", "{}"))
    // range-based input so the filter cannot be constant-folded into a
    // LocalTableScan — forces a real WholeStageCodegen evaluation path
    val df = spark.range(300).selectExpr(
      "CASE WHEN id % 3 = 2 THEN CAST(NULL AS STRING) " +
        "ELSE '{\"color\": \"red\"}' END AS filter",
      "CASE WHEN id % 3 = 0 THEN '{\"color\":\"red\"}' " +
        "ELSE '{\"color\":\"blue\"}' END AS meta")
    val filtered = df.filter(GraftFunctions.jsonFilterMatch(col("filter"), col("meta")))
    assert(filtered.count() == 200) // match + null-filter rows
    // stays inside whole-stage codegen (no CodegenFallback iterator break)
    // "*(1) Filter json_filter_match(...)" = the filter runs inside
    // whole-stage-codegen span 1 (the * prefix marks codegen'd operators)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter json_filter_match"),
      s"expected codegen'd filter in:\n$plan")
  }

  private def mkQueries(n: Int, filter: java.lang.String): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, Array.fill(8)((i % 5 - 2).toFloat / 3 + 0.1f), filter))
      .toDF("qid", "qvec", "filter")
  }

  private lazy val cands: DataFrame = {
    import spark.implicits._
    (100 until 400).map { i =>
      val lang = Seq("en", "de", "fr")(i % 3)
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat),
        s"""{"lang":"$lang","n":${i % 50}}""")
    }.toDF("nid", "nvec", "metadata")
  }

  test("filteredTopK with null filter equals unfiltered heap top-k") {
    val qs = mkQueries(4, null)
    val got = Similarity.filteredTopK(qs, cands, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val want = Similarity.bruteForceTopKHeap(
      qs.select("qid", "qvec"), cands.select("nid", "nvec"), k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("filteredTopK restricts candidates per query's own filter") {
    import spark.implicits._
    val qs = Seq(
      (0L, Array.fill(8)(0.5f), """{"lang": {"$eq": "en"}}"""),
      (1L, Array.fill(8)(0.5f), """{"lang": {"$in": ["de", "fr"]}}"""),
      (2L, Array.fill(8)(0.5f), """{"n": {"$lt": 10}}"""))
      .toDF("qid", "qvec", "filter")
    val out = Similarity.filteredTopK(qs, cands, k = 300).collect()
    val byQ = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(byQ(0L) == (100 until 400).filter(_ % 3 == 0).map(_.toLong).toSet) // en ids
    assert(byQ(1L) == (100 until 400).filter(_ % 3 != 0).map(_.toLong).toSet)
    assert(byQ(2L) == (100 until 400).filter(_ % 50 < 10).map(_.toLong).toSet)
    // disjoint filters → per-query candidate sets differ
    assert(byQ(0L).intersect(byQ(1L)).isEmpty)
  }
}
