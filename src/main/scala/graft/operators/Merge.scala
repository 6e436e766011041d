package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Id-keyed dataset maintenance: upsert / delete / latest-version
  * compaction. The reference's datasets are immutable snapshots, but its
  * serving-side contract is upsert-by-id (vectors are replaced when an id
  * recurs); these operators express that as batch merges so a Spark
  * pipeline can maintain a dataset across ingestion rounds.
  *
  * Scale shape: one equi-shuffle on the key per merge (the anti-join and
  * the union are key-partitioned together under AQE); when the update
  * batch is small relative to the base — the common case — wrap it in
  * `broadcast()` and the base table never shuffles at all.
  */
object Merge {

  /** Latest-wins upsert: rows of `updates` replace base rows sharing the
    * same key; new keys are appended. Schemas must match by name.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    base.join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates)

  /** Delete-by-key: remove every base row whose key appears in `deletes`. */
  def delete(base: DataFrame, deletes: DataFrame, key: String): DataFrame =
    base.join(deletes.select(key).distinct(), Seq(key), "left_anti")

  /** Compact a change log to its latest version per key: the row with the
    * highest `versionCol` (ties broken arbitrarily-but-deterministically by
    * taking the max struct) wins. Implemented as `max_by` aggregation, so
    * partial aggregation reduces each map task to one row per key before
    * the shuffle — no windowed sort of the full log.
    */
  def latestByVersion(log: DataFrame, key: String, versionCol: String): DataFrame = {
    val others = log.columns.filterNot(_ == key)
    val payload = struct(col(versionCol).as("__v") +: others.map(col): _*)
    log.groupBy(col(key))
      .agg(max(payload).as("p"))
      .select(col(key) +: others.map(c => col(s"p.$c").as(c)): _*)
  }

  /** Window formulation of [[latestByVersion]] — same result, kept for the
    * oracle cross-check; prefer the aggregate form at scale.
    */
  def latestByVersionWindow(log: DataFrame, key: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(versionCol).desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
