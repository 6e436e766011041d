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

  private val guardSeq = new java.util.concurrent.atomic.AtomicLong()

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
    *
    * `maxBlockSize` guards the degenerate block: a hot key (bad blocking
    * choice, heavy skew) would make its self-join quadratic — 10⁶ rows in
    * one block is 10¹² pairs in one task. Oversized blocks are dropped,
    * mirroring [[TextDedup.bucketPairs]]; the size pre-pass is one partial
    * aggregation on the (tiny) key column, so the guard costs one cheap
    * scan, never a shuffle of the vectors.
    *
    * Dropping trades recall for boundedness, so it is never silent: an
    * `observe` aggregation rides the oversized pre-pass (it executes with
    * the query — no extra job, and the guard sees the SAME snapshot the
    * anti-join uses) recording the dropped-block count, the largest block,
    * and a capped sample of the dropped keys;
    * [[graft.tools.GuardMetricsListener]] logs a WARN when a run dropped
    * anything, so the caller knows to rebalance the blocking key.
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      blockCol: Column,
      threshold: Double,
      maxBlockSize: Int = 10000): DataFrame = {
    val keyed = df.select(idCol.as("id"), vecCol.cast("array<double>").as("v"), blockCol.as("blk"))
    val oversized = keyed.groupBy("blk")
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBlockSize)
      .observe(s"cosine_block_guard_${guardSeq.incrementAndGet()}",
        coalesce(count(lit(1)), lit(0L)).as("dropped_blocks"),
        coalesce(max(col("n")), lit(0L)).as("max_block_size"),
        lit(maxBlockSize).as("max_allowed"),
        slice(sort_array(collect_list(col("blk").cast("string"))), 1, 20)
          .as("sample_keys"))
      .select("blk")
    val kept = keyed.join(broadcast(oversized), Seq("blk"), "left_anti")
    val a = kept.select(col("id").as("id_a"), col("v").as("va"), col("blk"))
    val b = kept.select(col("id").as("id_b"), col("v").as("vb"), col("blk").as("blk_r"))
    a.join(b, col("blk") === col("blk_r") && col("id_a") < col("id_b"))
      .withColumn("score_raw", GraftFunctions.vecCosine(col("va"), col("vb")))
      .filter(col("score_raw") > threshold)
      .select(col("id_a"), col("id_b"), round(col("score_raw"), 4).as("score"))
  }

  /** Self-blocking cosine near-dup: the blocking key is LEARNED from the
    * data (a Lloyd-trained coarse codebook, [[KMeans.train]]) instead of
    * supplied by the caller — the missing piece that makes embedding
    * near-dup self-contained at scale. Every vector lands in its `nprobe`
    * nearest cells, candidate pairs are ids co-occurring in a cell
    * (grouped, capped — [[TextDedup.bucketPairs]]), and candidates are
    * verified with the exact codegen cosine.
    *
    * Recall: near-duplicates are nearly coincident vectors, so they share
    * a nearest cell unless they straddle a boundary — which `nprobe > 1`
    * covers. Cost: corpus × nprobe rows through one bucket shuffle; no
    * quadratic block unless the data collapses onto one cell, and the
    * `maxBlockSize` cap bounds even that.
    *
    * Returns the trained centroids alongside the pairs so callers (and the
    * correctness oracle) can replicate the blocking deterministically.
    */
  def cosineNearDupAuto(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      threshold: Double,
      nlist: Int = 16,
      nprobe: Int = 2,
      iters: Int = 3,
      maxBlockSize: Int = 10000,
      reliable: Boolean = false): (DataFrame, Array[Array[Double]]) = {
    val base = df.select(idCol.as("id"), vecCol.cast("array<double>").as("v"))
    val centroids = KMeans.train(base, col("v"), nlist, iters)
    val probed = base.select(col("id"),
      explode(KMeans.probeCells(col("v"), centroids, nprobe)).as("cell"))
    // constant first key (bucketPairs groups on a key pair); an int literal
    // would be read as a GROUP BY ordinal, so use a string
    val cand = TextDedup.bucketPairs(probed, lit("all"), col("cell"), col("id"), maxBlockSize)
    // Verify-join strategy from MEASURED pair cardinality — same
    // discipline as TextDedup.lshVerifiedPairs (the pair stream is
    // multiplicity-quadratic but estimate-shrunk; a planning-time
    // broadcast election of it is the 100×-tier abort class — see
    // [[MeasuredJoin.attachPairPayloads]]).
    val vecs = base.select(col("id").as("doc_id"), col("v"))
    val pairs = MeasuredJoin.attachPairPayloads(cand, "id_a", "id_b",
        vecs, vecs, "v", "va", "vb", reliable = reliable)
      .withColumn("score_raw", GraftFunctions.vecCosine(col("va"), col("vb")))
      .filter(col("score_raw") > threshold)
      .select(col("id_a"), col("id_b"), round(col("score_raw"), 4).as("score"))
    (pairs, centroids)
  }

  /** Group-first SemDeDup: embedding near-dup CLUSTERS without ever
    * materializing member-level pairs — the
    * [[TextDedup.minhashNearDupGroups]] discipline applied to the
    * embedding family. A crawl corpus at scale is full of verbatim
    * duplicates whose embeddings are bit-identical, and the pair form is
    * quadratic in that multiplicity; this form keeps every intermediate
    * linear in it:
    *
    *   1. EXACT-VECTOR COLLAPSE — identical vectors are cosine-1 near-dups
    *      by definition, so each distinct vector elects its minimum id as
    *      representative in one partial-aggregated `groupBy(xxhash64(v))`
    *      (the 2⁻⁶⁴ hash-collision odds are the same accepted-risk class
    *      as the group operators' set hash). A million-copy page
    *      contributes ONE row to everything downstream.
    *   2. TRAIN + BLOCK + VERIFY OVER REPRESENTATIVES ONLY
    *      ([[cosineNearDupAuto]]: Lloyd-trained cells, co-occurrence
    *      candidates, exact codegen cosine) — cosine depends only on the
    *      vectors, so a rep-level edge stands for every member-level edge
    *      exactly, and cell sizes are bounded by DISTINCT vectors, not
    *      duplicate multiplicity.
    *   3. CC OVER PAIRED REPS ONLY, then one left join + coalesce
    *      re-attaches exact-dup members and singletons (the rep IS the
    *      exact-dup class minimum, so `coalesce(component, rep)` is the
    *      group minimum in every case).
    *
    * Returns `((id, component, is_canonical) — one row per input row,
    * component = the group's minimum id — , trained centroids)`; the
    * centroids let the correctness oracle replay the blocking.
    *
    * The collapse always happens SEMANTICALLY — block sizes and the
    * `maxBlockSize` oversize guard must count DISTINCT vectors, never
    * duplicate multiplicity, or a block whose row count exceeds the cap
    * only because of exact copies would be dropped (losing pairs the
    * collapse merges unconditionally). What is data-dependent is the PLAN
    * SHAPE that builds the identical rep table, decided by one cheap
    * `approx_count_distinct / count` probe (its ~5% error can only flip
    * this plan knob, never the result):
    *
    *   - NEAR-DISTINCT corpus (ratio above `collapseSkipRatio`): a
    *     hash-only `groupBy(k).count` finds the duplicate classes first
    *     (8-byte rows through the shuffle), vectors collapse ONLY for the
    *     `count > 1` classes, and the untouched distinct rows union in as
    *     their own representatives — so a corpus with zero duplicates
    *     never ships a vector payload through a shuffle here (the
    *     round-10 q81 regression was exactly that corpus-wide shuffle);
    *   - DUPLICATE-HEAVY corpus: the single groupBy-collapse shuffle
    *     genuinely shrinks the frame (a 10×-replicated corpus measured
    *     1.12× intermediates vs 6–7× for the pair form) and the shrunken
    *     rep table is `localCheckpoint`ed for the Lloyd passes and
    *     verify joins that re-read it.
    */
  def semDeDupGroups(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      threshold: Double,
      nlist: Int = 16,
      nprobe: Int = 2,
      iters: Int = 3,
      maxBlockSize: Int = 10000,
      pointerHalving: Boolean = false,
      reliable: Boolean = false,
      collapseSkipRatio: Double = 0.95): (DataFrame, Array[Array[Double]]) = {
    val base = df.select(idCol.as("id"), vecCol.cast("array<double>").as("v"))
    val keyed = base.withColumn("k", xxhash64(col("v")))
    // distinct-ratio probe: one partial-aggregated scan of (id, hash) —
    // never the vector payloads — deciding the PLAN SHAPE below. Its ~5%
    // error can only flip a caching/shuffle knob, never the result: both
    // shapes elect the identical (k, rep, v) table.
    val probe = keyed.agg(
      count(lit(1)).as("n"), approx_count_distinct(col("k")).as("nd")).head()
    val distinctRatio =
      if (probe.getLong(0) == 0L) 1.0
      else probe.getLong(1).toDouble / probe.getLong(0).toDouble
    val reps =
      if (distinctRatio > collapseSkipRatio) {
        // NEAR-DISTINCT corpus (the common crawl-after-exact-dedup case):
        // an unconditional groupBy-collapse would ship EVERY vector
        // through a shuffle to collapse almost nothing. Instead find the
        // duplicate hash classes with a hash-only aggregate (8-byte rows),
        // collapse vectors ONLY for those (usually tiny — AQE broadcasts
        // the checkpointed key set into both joins, so the distinct rows
        // never shuffle), and pass the untouched distinct rows through as
        // their own representatives (a singleton class's min id IS its id).
        val dupKeys = keyed.groupBy("k")
          .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
          .select("k").localCheckpoint()
        val dupReps = keyed.join(dupKeys, Seq("k"), "left_semi")
          .groupBy("k")
          .agg(min(col("id")).as("rep"), min_by(col("v"), col("id")).as("v"))
        val singletonReps = keyed.join(dupKeys, Seq("k"), "left_anti")
          .select(col("k"), col("id").as("rep"), col("v"))
        dupReps.unionByName(singletonReps)
      } else {
        // DUPLICATE-HEAVY corpus: the collapse genuinely shrinks the frame,
        // so one partial-aggregated groupBy electing the representative AND
        // carrying its vector (min_by picks the min-id row's v — identical
        // within a hash class) is the right single-shuffle plan, and
        // localCheckpoint (the CC lineage-cut precedent) materializes the
        // shrunken rep table every Lloyd pass, probe/verify join, and the
        // attach re-read.
        keyed.groupBy("k")
          .agg(min(col("id")).as("rep"), min_by(col("v"), col("id")).as("v"))
          .localCheckpoint()
      }
    val repRows = reps.select(col("rep").as("id"), col("v"))
    val (pairs, centroids) = cosineNearDupAuto(
      repRows, col("id"), col("v"), threshold, nlist, nprobe, iters,
      maxBlockSize, reliable)
    val repComp = ConnectedComponents.runEdgeVertices(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
      pointerHalving = pointerHalving, reliable = reliable)
    // repComp holds PAIRED reps only (bounded by near-dup groups, usually
    // tiny), so it folds into the rep table BEFORE the single
    // member-level shuffle join on the hash key — strategy picked from
    // its EXACT materialized count ([[MeasuredJoin]]), not LogicalRDD
    // estimates.
    val repsWithComp = reps.select(col("k"), col("rep"))
      .join(MeasuredJoin.measuredSide(
          repComp.select(col("id").as("rid"), col("component"))),
        col("rep") === col("rid"), "left")
      .select(col("k"), coalesce(col("component"), col("rep")).as("component"))
    val attached = keyed.select("id", "k")
      .join(repsWithComp, Seq("k"))
      .select(col("id"), col("component"))
      .withColumn("is_canonical", col("id") === col("component"))
    (attached, centroids)
  }

  /** Fuzzy (edit-distance) pair join — entity resolution over short
    * strings (names, titles, product labels): pairs within the same
    * caller-provided block whose Levenshtein distance is at most
    * `maxDist`. The candidate join is an EQUI-join on
    * `(block, length-band)` — never a cross join — verified by the
    * codegen `levenshtein` only on candidates.
    *
    * Length banding is lossless: `|len(a) − len(b)| ≤ lev(a,b) ≤ maxDist`
    * and the band width is `maxDist + 1`, so any qualifying pair's bands
    * differ by at most 1 — the probe side explodes each row into its own
    * band ± 1 (3 rows), and every qualifying pair meets on the index
    * side's unique band exactly once (`id_a < id_b` keeps one direction).
    * The result is therefore IDENTICAL to the naive quadratic
    * within-block join, at equi-join cost: 3× one side's rows through a
    * hash shuffle on a tiny key, per-key quadratic work bounded by the
    * block choice and the `maxBlockSize` guard (same non-silent `observe`
    * drop-metrics contract as [[cosineNearDupPairs]]).
    *
    * Returns `(id_a, id_b, dist)` with `id_a < id_b`.
    */
  def fuzzyPairs(
      df: DataFrame,
      idCol: Column,
      strCol: Column,
      blockCol: Column,
      maxDist: Int,
      maxBlockSize: Int = 10000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val w = maxDist + 1
    val keyed = df.select(idCol.as("id"), strCol.as("s"), blockCol.as("blk"))
      .withColumn("band", floor(length(col("s")) / w))
    val oversized = keyed.groupBy("blk", "band")
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBlockSize)
      .observe(s"fuzzy_block_guard_${guardSeq.incrementAndGet()}",
        coalesce(count(lit(1)), lit(0L)).as("dropped_blocks"),
        coalesce(max(col("n")), lit(0L)).as("max_block_size"),
        lit(maxBlockSize).as("max_allowed"),
        slice(sort_array(collect_list(concat_ws("/", col("blk").cast("string"),
          col("band").cast("string")))), 1, 20).as("sample_keys"))
      .select("blk", "band")
    val kept = keyed.join(broadcast(oversized), Seq("blk", "band"), "left_anti")
    val probe = kept.select(col("id").as("id_a"), col("s").as("sa"), col("blk"),
      explode(sequence(col("band") - 1, col("band") + 1)).as("pband"))
    val index = kept.select(col("id").as("id_b"), col("s").as("sb"),
      col("blk").as("blk_r"), col("band").as("bband"))
    probe.join(index,
        col("blk") === col("blk_r") && col("pband") === col("bband") &&
          col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
