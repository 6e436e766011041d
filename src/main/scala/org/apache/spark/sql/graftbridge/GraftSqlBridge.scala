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

  /** Reliable (storage-backed) LAZY snapshot with SINGLE compute.
    *
    * `Dataset.checkpoint(reliableCheckpoint = true)` marks the
    * materialized RDD for checkpointing WITHOUT persisting it, so the
    * checkpoint-file write job (which Spark launches at the end of the
    * first job that computes the RDD) recomputes the whole plan a second
    * time — the cost the RDD docs' persist-before-checkpoint pattern
    * exists to avoid. Persisting at the DATASET level instead routes the
    * plan through an InMemoryRelation columnar cache, whose array
    * encode/decode is interpreted and measured several times the cost of
    * the plan itself for array-typed payloads (shingle sets, vectors).
    * This helper applies the pattern at the RDD level — raw InternalRows,
    * no columnar encode — mirroring exactly what `Dataset.checkpoint`
    * builds, plus the persist.
    *
    * The caller's next action on the returned frame materializes blocks
    * and checkpoint files together; call the returned release AFTER that
    * action to drop the transient blocks (the files remain the snapshot).
    */
  def reliableSnapshotLazy(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    val classic =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val internalRdd =
      classic.queryExecution.executedPlan.execute().map(_.copy())
    internalRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    internalRdd.checkpoint()
    val out = org.apache.spark.sql.classic.Dataset.ofRows(classic.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        internalRdd, classic, classic.isStreaming))
    (out, () => { internalRdd.unpersist(blocking = false); () })
  }

  /** [[reliableSnapshotLazy]] materialized here and now (one compute job
    * + one cache-read file write), transient blocks already released. */
  def reliableSnapshotEager(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (snap, release) = reliableSnapshotLazy(df)
    snap.count()
    release()
    snap
  }
}
