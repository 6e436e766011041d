package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{GraftExtensions, GraftFunctions, JsonFilterMatch}

class JsonFilterPushdownSpec extends SparkSpec {

  /** A sibling session on the same SparkContext with GraftExtensions
    * installed (the shared test session is built without extensions, as
    * Verify/Bench sessions are). Active/default sessions are restored
    * so the other suites are unaffected. */
  private def withExtSession[A](f: SparkSession => A): A = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try f(s2)
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def hasJsonFilterMatch(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan
      .expressions.exists(_.exists(_.isInstanceOf[JsonFilterMatch])) ||
      df.queryExecution.optimizedPlan.children.exists(
        _.expressions.exists(_.exists(_.isInstanceOf[JsonFilterMatch])))

  private val filterDoc =
    """{"lang": {"$eq": "en"}, "n_chars": {"$gt": 300}}"""

  private def parquetDir(s: SparkSession): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jfp-").toString
    Seq(
      (1L, "en", Some(400L)), (2L, "en", Some(200L)), (3L, "de", Some(500L)),
      (4L, "en", Some(301L)), (5L, "en", None) // null n_chars: to_json drops it
    ).toDF("id", "lang", "n_chars").write.mode("overwrite").parquet(dir)
    dir
  }

  private def query(s: SparkSession, dir: String,
      doc: String): org.apache.spark.sql.DataFrame =
    s.read.parquet(dir).filter(GraftFunctions.jsonFilterMatch(
      lit(doc), to_json(struct(col("lang"), col("n_chars")))))

  test("literal filter over in-plan to_json rewrites to pushed predicates") {
    val dir = parquetDir(spark)
    val interpreted = query(spark, dir, filterDoc)
    assert(hasJsonFilterMatch(interpreted),
      "control: without extensions the match must stay interpreted")
    val baseIds = interpreted.select("id").collect().map(_.getLong(0)).toSet
    withExtSession { s2 =>
      val rewritten = query(s2, dir, filterDoc)
      assert(!hasJsonFilterMatch(rewritten),
        rewritten.queryExecution.optimizedPlan.toString)
      val physical = rewritten.queryExecution.executedPlan.toString
      assert(physical.contains("PushedFilters: [") &&
        physical.contains("EqualTo(lang,en)"), physical)
      val ids = rewritten.select("id").collect().map(_.getLong(0)).toSet
      // identical rows — including the null-n_chars row, dropped by both
      // paths (missing field at runtime, null predicate when compiled)
      assert(ids == baseIds && ids == Set(1L, 4L))
    }
  }

  test("unsafe operators and per-row filters stay interpreted") {
    val dir = parquetDir(spark)
    withExtSession { s2 =>
      // $ne matches missing fields at runtime — excluded from rewriting
      val ne = query(s2, dir, """{"lang": {"$ne": "de"}}""")
      assert(hasJsonFilterMatch(ne))
      assert(ne.select("id").collect().map(_.getLong(0)).toSet ==
        Set(1L, 2L, 4L, 5L))
      // cross-type-class literal: the runtime compares a string operand
      // against the metadata value's JSON RENDERING ("1.0" != "1",
      // ordering is lexicographic), while Catalyst coercion would compare
      // numerically — divergent in general, so it must stay interpreted
      // (here the rendering happens to match: "400" == render(400))
      val crossType = query(s2, dir, """{"n_chars": {"$eq": "400"}}""")
      assert(hasJsonFilterMatch(crossType))
      assert(crossType.select("id").collect().map(_.getLong(0)).toSet ==
        Set(1L))
      // a non-literal (per-row) filter can never be rewritten
      val perRow = s2.read.parquet(dir).filter(GraftFunctions.jsonFilterMatch(
        concat(lit("{\"n_chars\": {\"$gt\": "), col("id").cast("string"),
          lit("}}")),
        to_json(struct(col("lang"), col("n_chars")))))
      assert(hasJsonFilterMatch(perRow))
    }
  }

  test("metadata from projected-away columns is left alone but still correct") {
    val dir = parquetDir(spark)
    withExtSession { s2 =>
      val df = s2.read.parquet(dir)
        .select(col("id"),
          to_json(struct(col("lang"), col("n_chars"))).as("metadata"))
        .filter(GraftFunctions.jsonFilterMatch(lit(filterDoc), col("metadata")))
      // lang/n_chars are gone above the projection: the visibility gate
      // must refuse — but note Spark may collapse the projection into
      // the filter first, making the sources visible again; either way
      // the RESULT must be exact
      assert(df.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    }
  }

  test("alias-defined metadata attribute is traced through the child project") {
    val dir = parquetDir(spark)
    withExtSession { s2 =>
      val df = s2.read.parquet(dir)
        .withColumn("metadata", to_json(struct(col("lang"), col("n_chars"))))
        .filter(GraftFunctions.jsonFilterMatch(lit(filterDoc), col("metadata")))
      // withColumn keeps the source columns visible, so this MUST rewrite
      assert(!hasJsonFilterMatch(df),
        df.queryExecution.optimizedPlan.toString)
      assert(df.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    }
  }
}
