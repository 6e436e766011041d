package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: execute every SparkEntry query and report the FINAL (post-AQE)
  * physical plan's scale signals — codegen stages, exchanges, pushdown,
  * join strategies, partial aggregation. Run with PLAN_AUDIT_FULL=1 to dump
  * whole plans.
  */
object PlanAudit {

  /** Compact, diff-stable signature of a physical plan string: the scale
    * signals (codegen span count, exchanges, pushdown, join strategies,
    * partial agg, sorts, windows) without ids/addresses. Shared by the
    * interactive audit below and Verify's snapshot diff — a plan-shape
    * regression (new Exchange, lost pushdown, SMJ where a broadcast was)
    * changes this string and fails the snapshot compare loudly, instead
    * of surfacing rounds later as an ambiguous bench delta.
    */
  def signature(plan: String): String = {
    val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
    val partFilters = "PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    val bnl = "BroadcastNestedLoop".r.findAllIn(plan).size
    val smj = "SortMergeJoin".r.findAllIn(plan).size
    val shj = "ShuffledHashJoin".r.findAllIn(plan).size
    val cgStages = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1).toInt).toSet.size
    val exch = "Exchange ".r.findAllIn(plan).size
    val partialAgg = plan.contains("partial_") || plan.contains("Partial")
    val sorts = "(?m)^\\s*[+:]?-? ?\\*?\\(?\\d*\\)? ?Sort ".r.findAllIn(plan).size
    val windows = "(?m)Window ".r.findAllIn(plan).size
    s"codegen=$cgStages exch=$exch pushdown=$pushed partFilters=$partFilters " +
      s"bhj=$bhj bnl=$bnl smj=$smj shj=$shj partialAgg=$partialAgg " +
      s"sorts=$sorts window=$windows"
  }

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
        df.count() // force execution so AQE finalizes the plan
        val plan = df.queryExecution.executedPlan.toString
        val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
        val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
        val bnl = "BroadcastNestedLoop".r.findAllIn(plan).size
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        val cgStages = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1).toInt).toSet.size
        val exch = "Exchange ".r.findAllIn(plan).size
        val partialAgg = plan.contains("partial_") || plan.contains("Partial")
        val sorts = "(?m)^\\s*[+:]?-? ?\\*?\\(?\\d*\\)? ?Sort ".r.findAllIn(plan).size
        println(s"== $name: codegen=$cgStages exch=$exch pushdown=$pushed " +
          s"bhj=$bhj bnl=$bnl smj=$smj partialAgg=$partialAgg sorts=$sorts")
        if (sys.env.get("PLAN_AUDIT_FULL").contains("1")) println(plan)
      } catch {
        case e: Throwable => println(s"== $name: PLAN FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
