package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the executed plan of every SparkEntry query and flag
  * scale smells — missing pushdown, missing broadcast where expected,
  * interpreted (non-codegen) projections in hot paths.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
        val bcast = plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop")
        val smj = plan.contains("SortMergeJoin")
        val cgStages = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1).toInt).toSet.size
        val exch = "Exchange ".r.findAllIn(plan).size
        println(s"== $name: codegenStages=$cgStages exchanges=$exch " +
          s"pushedFilters=$pushed broadcast=$bcast sortMergeJoin=$smj")
        if (sys.env.get("PLAN_AUDIT_FULL").contains("1")) println(plan)
      } catch {
        case e: Throwable => println(s"== $name: PLAN FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
