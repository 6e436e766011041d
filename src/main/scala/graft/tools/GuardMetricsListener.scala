package graft.tools

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Surfaces capacity-guard drops recorded via `Dataset.observe`.
  *
  * Operators that bound worst-case work by dropping degenerate inputs
  * (e.g. [[graft.operators.TextDedup.bucketPairs]]'s oversized-bucket cap)
  * attach an observation named `bucket_pairs_guard*` counting what they
  * dropped. Observation is free — the metrics ride the query's own
  * aggregation, no extra job — but someone has to read them: this listener
  * logs a WARN whenever a completed query dropped anything, so a recall
  * loss at scale is a log line, not a silent number change.
  *
  * Register with
  * `spark.sql.queryExecutionListeners=graft.tools.GuardMetricsListener`
  * (done by [[graft.GraftSession]]).
  */
final class GuardMetricsListener extends QueryExecutionListener {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    qe.observedMetrics.foreach { case (name, row) =>
      if (name.startsWith("bucket_pairs_guard")) {
        val dropped = row.getAs[Long]("dropped_buckets")
        if (dropped > 0)
          log.warn(s"bucketPairs: dropped $dropped oversized bucket(s) " +
            s"(largest=${row.getAs[Int]("max_bucket_size")} ids, " +
            s"cap=${row.getAs[Int]("max_allowed")}) — recall loss; " +
            "rebalance band/bucket parameters if unexpected")
      } else if (name.startsWith("cosine_block_guard")) {
        val dropped = row.getAs[Long]("dropped_blocks")
        if (dropped > 0)
          log.warn(s"cosineNearDupPairs: dropped $dropped oversized block(s) " +
            s"(largest=${row.getAs[Long]("max_block_size")} rows, " +
            s"cap=${row.getAs[Int]("max_allowed")}; " +
            s"keys: ${row.getAs[Seq[String]]("sample_keys").mkString(", ")}) " +
            "— recall loss; rebalance the blocking key")
      }
    }
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
}
