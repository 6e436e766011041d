package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev knob (same contract as Bench): SPARK_GRAFT_ONLY=q90 dumps a
    // comma-separated subset. The driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val failed = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      }
    }.toSet
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // In subset mode only the subset's oracles are dumped (and checked):
    // a data-dependent oracle for a query that did not run this pass has
    // no captured context, by design.
    val oracle = SparkEntry.oracleSql
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    // Fail loudly on inconsistent state: a query that ran successfully must
    // never ship the degenerate placeholder oracle — that would record a
    // false result for the round instead of surfacing the bug. (A FAILED
    // query's placeholder is fine: its parquet dump is already missing, so
    // the driver records the error either way.)
    val degenerate = oracle.collect {
      case (k, sql) if sql == SparkEntry.unavailableOracle && !failed(k) => k
    }
    if (degenerate.nonEmpty)
      throw new IllegalStateException(
        s"data-dependent oracle(s) missing their captured run context " +
          s"despite the query succeeding: ${degenerate.mkString(", ")}")
    val json = oracle
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
