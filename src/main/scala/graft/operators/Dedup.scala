package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale posture: every variant reduces to hash-partitioned aggregation or
  * an equi-join on a *small* derived key (digest, band hash, block id) —
  * never on the document body — so the shuffled bytes per row are tens of
  * bytes regardless of document size, and the plans hold at 100 TB.
  */
object Dedup {

  /** Exact content dedup: group by a 128-bit content digest, keep the
    * minimum id as the canonical representative. One shuffle on the digest;
    * map-side partial aggregation collapses local duplicates first.
    */
  def exactByContent(df: DataFrame, contentCol: Column, idCol: Column): DataFrame =
    df.groupBy(md5(contentCol).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup keeping one full row per distinct key (drop-duplicates). */
  def dropDuplicatesByKey(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicates(keyCols)

  /** Embedding-cosine near-duplicate pairs, blocked by a caller-provided
    * blocking key (cluster id, LSH bucket, shard...). The block key turns
    * the quadratic all-pairs problem into per-block quadratic work — choose
    * blocks so the largest block fits a task. Scores are computed by the
    * codegen'd [[graft.functions.VectorCosineSimilarity]] in double
    * precision and only pairs above `threshold` survive.
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      blockCol: Column,
      threshold: Double): DataFrame = {
    val a = df.select(idCol.as("id_a"), vecCol.cast("array<double>").as("va"), blockCol.as("blk"))
    val b = df.select(idCol.as("id_b"), vecCol.cast("array<double>").as("vb"), blockCol.as("blk_r"))
    a.join(b, col("blk") === col("blk_r") && col("id_a") < col("id_b"))
      .withColumn("score_raw", GraftFunctions.vecCosine(col("va"), col("vb")))
      .filter(col("score_raw") > threshold)
      .select(col("id_a"), col("id_b"), round(col("score_raw"), 4).as("score"))
  }
}
