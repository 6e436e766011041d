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

  /** Snapshot diff: classify every key across two dataset versions as
    * `added` (new only), `removed` (old only), `changed` (both, any
    * non-key column differs) or `unchanged` — the audit that makes
    * incremental dataset maintenance reviewable (what did this ingestion
    * round actually do?) and feeds incremental downstream recompute (only
    * `added`/`changed` need re-embedding, re-indexing, re-scoring).
    *
    * Comparison is null-safe per column (`<=>` over packed structs), so a
    * null→null column is `unchanged` and null→value is `changed` —
    * matching SQL `IS NOT DISTINCT FROM` semantics, which is how an
    * independent engine replays it.
    *
    * Scale shape: ONE key-partitioned full-outer join — both versions
    * shuffle once on the key (or zero times if stored bucketed by it);
    * the struct pack/compare is a codegen projection. Nothing else moves.
    *
    * Returns `(key, change)` for every key in either version.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"schemas must match by name: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val cols = newDf.columns.filterNot(_ == key).sorted
    def packed(df: DataFrame, as: String) =
      df.select(col(key), struct(cols.map(col): _*).as(as))
    packed(oldDf, "__old").join(packed(newDf, "__new"), Seq(key), "full_outer")
      .select(col(key),
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(col("__old") <=> col("__new"), lit("unchanged"))
          .otherwise(lit("changed")).as("change"))
  }
}
