package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan inspector for the near-dup PAIR pipelines: prints the
  * PRE-execution physical plan (AQE initial plan — i.e. the PLANNING-time
  * join elections) of `minhashNearDupPairs` over a corpus dir, without
  * running anything. Diagnosis tool for broadcast-election-at-scale bugs:
  * a BroadcastHashJoin here whose build side is the candidate-pair stream
  * is the `spark.driver.maxResultSize` abort waiting to happen at 100×.
  *
  * Usage: `runMain graft.tools.PairPlanPeek [corpusDir]`
  */
object PairPlanPeek {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(8)
      .master("local[8]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = graft.operators.TextDedup.minhashNearDupPairs(
      docs, col("doc_id"), col("text"), threshold = 0.5)
    val plan = pairs.queryExecution.executedPlan.toString
    println("== minhashNearDupPairs initial physical plan ==")
    println(plan)
    println("== signature: " + PlanAudit.signature(plan))
  }
}
