package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `.explain("formatted")` for a subset of SparkEntry
  * queries to files — the optimization-round evidence format
  * (`plans/rNN/<query>_before.txt` / `_after.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [suffix]
  * with SPARK_GRAFT_ONLY selecting the queries (default: all).
  *
  * Each query is EXECUTED first (count) so AQE finalizes the plan; the
  * dump then carries the final adaptive plan, not the initial estimate.
  * Session config matches Bench (same core count via SPARK_GRAFT_CPUS)
  * so the captured plans are the plans the bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/r13"
    val suffix = if (args.length > 2) args(2) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          df.count() // force execution: AQE final plan
          val formatted = df.queryExecution.explainString(
            ExplainMode.fromString("formatted"))
          val sig = PlanAudit.signature(df.queryExecution.executedPlan.toString)
          val txt = s"== $name ($suffix, $sfDir) ==\n== signature: $sig ==\n\n" +
            formatted
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            txt.getBytes("UTF-8"))
          println(s"[plandump] $name -> $outDir/${name}_$suffix.txt ($sig)")
        } catch { case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
