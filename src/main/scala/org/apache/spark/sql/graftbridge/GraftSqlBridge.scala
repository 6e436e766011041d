package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` wrap a `ColumnNode` instead of a Catalyst
  * `Expression`; the classic-session conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * This one-liner, placed inside the `org.apache.spark.sql` package tree,
  * is the supported-shape escape hatch for libraries that define their own
  * Catalyst expressions (same pattern Spark's own connectors use).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The RDD backing a checkpoint-snapshot Dataset (one produced by
    * `checkpoint()`/`localCheckpoint()`, whose analyzed plan is a
    * `LogicalRDD`), if any. Lets iterative operators explicitly
    * `unpersist` a superseded local-checkpoint snapshot instead of waiting
    * on driver GC + ContextCleaner — on a memory-constrained cluster a
    * long loop must bound live snapshots deterministically, not
    * nondeterministically.
    */
  def snapshotRdd(ds: org.apache.spark.sql.Dataset[_])
      : Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]] =
    ds.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
