package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/** Column-API and SQL-registration surface for the graft vector functions.
  *
  * DataFrame use: `df.select(GraftFunctions.vecCosine($"a", $"b"))`.
  * SQL use after `GraftFunctions.register(spark)`:
  * `SELECT vec_cosine(a, b) FROM t`.
  */
object GraftFunctions {

  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(VectorDotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def vecCosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(VectorCosineSimilarity(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def vecNorm(a: Column): Column =
    GraftSqlBridge.column(VectorL2Norm(GraftSqlBridge.expression(a)))

  def codepointRangeCounts(text: Column, table: CodepointRangeTable): Column =
    GraftSqlBridge.column(CodepointRangeCounts(
      GraftSqlBridge.expression(text), table))

  def sparseDot(ia: Column, va: Column, ib: Column, vb: Column): Column =
    GraftSqlBridge.column(SparseDotProduct(
      GraftSqlBridge.expression(ia), GraftSqlBridge.expression(va),
      GraftSqlBridge.expression(ib), GraftSqlBridge.expression(vb)))

  def jsonFilterMatch(filter: Column, metadata: Column): Column =
    GraftSqlBridge.column(JsonFilterMatch(
      GraftSqlBridge.expression(filter), GraftSqlBridge.expression(metadata)))

  private def lit(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { args => VectorDotProduct(args(0), args(1)) },
    "vec_cosine" -> { args => VectorCosineSimilarity(args(0), args(1)) },
    "vec_norm" -> { args => VectorL2Norm(args(0)) },
    "sparse_dot" -> { args => SparseDotProduct(args(0), args(1), args(2), args(3)) },
    // sketch functions: word_ngram_hashes(text, n, distinct-as-0/1),
    // minhash_signature(hashes, k), simhash64(hashes)
    "word_ngram_hashes" -> { args =>
      WordNgramHashes(args(0), lit(args(1)), lit(args(2)) != 0) },
    "minhash_signature" -> { args => MinHashSignature(args(0), lit(args(1)), 42L) },
    "simhash64" -> { args => SimHash64(args(0)) },
    "json_filter_match" -> { args => JsonFilterMatch(args(0), args(1)) })

  /** Idempotent per-session SQL registration. Runtime registration keeps
    * Verify/Bench sessions (built without extensions) working; the same
    * builders are also exposed through [[GraftExtensions]] for
    * `spark.sql.extensions`-configured clusters.
    */
  def register(spark: SparkSession): Unit = synchronized {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder)
    }
  }
}

/** `SparkSessionExtensions` hook: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` to get the
  * functions in every session on a cluster.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo("graft.functions.GraftFunctions", "vec_dot"),
      (args: Seq[Expression]) => VectorDotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo("graft.functions.GraftFunctions", "vec_cosine"),
      (args: Seq[Expression]) => VectorCosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo("graft.functions.GraftFunctions", "vec_norm"),
      (args: Seq[Expression]) => VectorL2Norm(args(0))))
    ext.injectFunction((
      FunctionIdentifier("sparse_dot"),
      new ExpressionInfo("graft.functions.GraftFunctions", "sparse_dot"),
      (args: Seq[Expression]) => SparseDotProduct(args(0), args(1), args(2), args(3))))
    // literal json_filter_match over in-plan to_json(struct(...)) →
    // compiled column predicates (parquet-pushable); see the rule's
    // scaladoc for its deliberately conservative firing conditions
    ext.injectResolutionRule(_ => graft.plans.JsonFilterPushdown)
  }
}
