package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TopKByScore, TopKRowsByScore}

/** Per-group top-k selection for curation: "keep the best N documents per
  * language / domain / source" — the selection step after quality scoring.
  *
  * Same scale discipline as search selection ([[Similarity]]): the
  * bounded-heap [[TopKByScore]] aggregate reduces every map task to ≤k
  * rows per group BEFORE the shuffle, so cost is O(#groups × k × #tasks)
  * and no sort of the scored corpus ever appears in the plan — a Window
  * would sort each group's full row set.
  */
object Ranking {

  /** Top-`k` ids per group by score (ties broken toward the smaller id).
    * Returns `(group, id, score, rnk)` with `score` rounded to 4 decimals.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCol: Column,
      idCol: Column,
      scoreCol: Column,
      k: Int): DataFrame =
    df.select(groupCol.as("group"), idCol.as("id"),
        scoreCol.cast("double").as("score_raw"))
      .groupBy("group")
      .agg(TopKByScore.topK(col("score_raw"), col("id"), k).as("tk"))
      .select(col("group"), posexplode(col("tk")))
      .select(col("group"), col("col.id").as("id"),
        round(col("col.score"), 4).as("score"), (col("pos") + 1).as("rnk"))

  /** Payload-carrying per-group top-k: like [[topKPerGroup]], but the
    * selected rows' data (`payload` — typically a struct of the columns
    * the caller wants) comes back WITH the selection, eliminating the
    * join-back stage a bare-id selection needs. The payload never enters
    * the heap comparisons; shuffle bytes grow only by the payload size of
    * the ≤k kept rows per group per task.
    */
  def topKRowsPerGroup(
      df: DataFrame,
      groupCol: Column,
      idCol: Column,
      scoreCol: Column,
      payload: Column,
      k: Int): DataFrame =
    df.select(groupCol.as("group"), idCol.as("id"),
        scoreCol.cast("double").as("score_raw"), payload.as("payload"))
      .groupBy("group")
      .agg(TopKRowsByScore.topKRows(
        col("score_raw"), col("id"), col("payload"), k).as("tk"))
      .select(col("group"), posexplode(col("tk")))
      .select(col("group"), col("col.id").as("id"),
        round(col("col.score"), 4).as("score"),
        col("col.payload").as("payload"), (col("pos") + 1).as("rnk"))

  /** Reciprocal-rank fusion of per-query rankings — the standard combiner
    * for hybrid retrieval (dense ∪ sparse ∪ keyword): each ranking
    * contributes `1/(c + rank)` per (query, candidate) and the fused lists
    * are re-ranked on the summed score. Rank-based, so modalities with
    * incomparable score scales fuse without calibration — the property
    * that makes RRF the default in production hybrid search.
    *
    * Scale shape: inputs are already bounded (≤k rows per query from the
    * heap selectors), so the union + `groupBy(qid, nid)` aggregate touches
    * O(#queries × k × #rankings) rows regardless of corpus size, and the
    * final selection is the same bounded heap. Expects rankings shaped
    * `(qid, nid, rnk)`; returns `(qid, nid, score, rnk)`.
    */
  def reciprocalRankFusionPerQuery(
      rankings: Seq[DataFrame],
      k: Int,
      c: Int = 60): DataFrame = {
    require(rankings.size >= 2, "fusion needs at least two rankings")
    val contribs = rankings.map(_.select(col("qid"), col("nid"),
        (lit(1.0) / (lit(c.toDouble) + col("rnk").cast("double"))).as("contrib")))
      .reduce(_ unionByName _)
    val fused = contribs.groupBy("qid", "nid")
      .agg(sum("contrib").as("score_raw"))
    Similarity.heapSelect(fused, k)
  }

  /** Global dense row numbering WITHOUT the single-partition Window — the
    * scale-safe form of `row_number() OVER (ORDER BY ...)`, which Spark
    * executes by moving the ENTIRE dataset into one task (the classic
    * 100 TB killer: an unpartitioned Window is a 1-executor sort).
    *
    * Shape (the TeraSort decomposition):
    *   1. `repartitionByRange(sort)` — Spark's own distributed range
    *      split (one shuffle, sampled boundaries);
    *   2. local row numbers via a Window partitioned by
    *      `spark_partition_id()` — every partition sorts and ranks
    *      itself in parallel (the only sorts in the plan are
    *      partition-local);
    *   3. per-partition counts (≤ numPartitions rows) prefix-summed into
    *      offsets on the tiny side and broadcast back: global row number
    *      = offset + local.
    * Both consumers of the range shuffle dedupe to one ReusedExchange —
    * the corpus is shuffled once, and nothing corpus-sized ever ends up
    * in a single task.
    *
    * `sort` must be a TOTAL order (include a unique tiebreak column) for
    * the numbering to be deterministic. Emits the input columns plus
    * `rankName`.
    */
  def globalRowNumber(
      df: DataFrame,
      sort: Seq[Column],
      rankName: String = "rnk",
      numPartitions: Int = 0): DataFrame = {
    require(sort.nonEmpty, "globalRowNumber needs at least one sort column")
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // no explicit sortWithinPartitions: the rank Window's own local sort
    // on (_pid, sort) orders each partition exactly once
    val ranged = df.repartitionByRange(n, sort: _*)
      .withColumn("_pid", spark_partition_id())
    val local = ranged.withColumn("_local_rn",
      row_number().over(Window.partitionBy(col("_pid")).orderBy(sort: _*)))
    // ≤ n rows: the unpartitioned window over partition COUNTS is fine
    val offsets = ranged.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset", coalesce(
        sum(col("_cnt")).over(
          Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_offset"))
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn(rankName, col("_offset") + col("_local_rn"))
      .drop("_pid", "_local_rn", "_offset")
  }

  /** CCNet-style quantile partitioning: bucket every row by its global
    * rank fraction under `sort` (e.g. perplexity or quality order) into
    * named slices — `("head", 0.1), ("middle", 0.4), ("tail", 0.5)` puts
    * the best 10% in `head`, the next 40% in `middle`, the rest in
    * `tail`. Thresholds are EXACT (rank-based, `ceil(cumFrac · total)`),
    * not approximate-percentile estimates, yet nothing corpus-sized is
    * ever sorted in one task: this is [[globalRowNumber]] plus a scalar
    * total broadcast-joined in (the total rides the same ≤ numPartitions
    * count aggregate — no extra corpus pass).
    *
    * Emits the input columns plus `rnk` and `bucket`.
    */
  def quantileBuckets(
      df: DataFrame,
      sort: Seq[Column],
      buckets: Seq[(String, Double)],
      numPartitions: Int = 0): DataFrame = {
    require(buckets.nonEmpty && math.abs(buckets.map(_._2).sum - 1.0) < 1e-9,
      s"bucket fractions must sum to 1, got $buckets")
    val ranked = globalRowNumber(df, sort, "rnk", numPartitions)
    // total from the un-ranked source: one cheap count scan instead of
    // re-evaluating the ranked plan's shuffle a second time
    val total = df.agg(count(lit(1)).as("_total"))
    val cum = buckets.scanLeft(0.0)(_ + _._2).tail
    val bucketExpr = buckets.init.zip(cum.init).foldRight(
        lit(buckets.last._1)) { case (((name, _), cumFrac), elseExpr) =>
      when(col("rnk") <= ceil(lit(cumFrac) * col("_total")), lit(name))
        .otherwise(elseExpr)
    }
    ranked.join(broadcast(total))
      .withColumn("bucket", bucketExpr)
      .drop("_total")
  }

  /** Deterministic epoch-shuffle ordering: assign every row a shard and a
    * pseudo-random rank within it — the reproducible "shuffled" read
    * order a training run consumes (and can REPLAY: same seed ⇒ the same
    * permutation on any cluster, any partitioning, any engine; a new
    * epoch is just a new seed). The shuffle key is the first 12 md5 hex
    * digits of `(seed, id)` — the repo's cross-engine-portable 48-bit
    * rank (same construction as [[Sampling.balancedSample]]'s rank).
    *
    * Scale shape: shard assignment is a codegen projection; the
    * within-shard ordering is a Window partitioned BY SHARD, so the sort
    * unit is corpus/`shards` rows — `shards` is the parallelism lever
    * (pick it so a shard sorts in memory; a training-data export wants
    * fixed-size output shards anyway). No global sort, no single-task
    * Window.
    *
    * Returns the input plus `(shard, rnk)` with `rnk` 1-based within the
    * shard.
    */
  def epochShuffle(
      df: DataFrame,
      idCol: Column,
      shards: Int,
      seed: Long): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    // shard/rnk are the operator's reserved output columns — overwriting
    // an input column of the same name would silently drop user data
    Seq("shard", "rnk").foreach { r =>
      require(!df.columns.contains(r),
        s"epochShuffle reserves output column '$r' but the input already has it")
    }
    // disjoint digit ranges: shard from hex digits 1-3, within-shard rank
    // from digits 4-15 — shard membership never skews the rank order
    val h = md5(concat(lit(seed.toString), lit(":"), idCol.cast("string")))
    val shard = pmod(conv(substring(h, 1, 3), 16, 10).cast("long"),
      lit(shards.toLong))
    val kCol = "__graft_es_k"
    val idC = "__graft_es_id"
    val w = Window.partitionBy(col("shard")).orderBy(col(kCol), col(idC))
    df.withColumn(kCol, substring(h, 4, 12))
      .withColumn(idC, idCol)
      .withColumn("shard", shard)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .drop(kCol, idC)
  }
}
