package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/** Join-strategy selection from MEASURED cardinalities, not planner
  * estimates.
  *
  * Round 12's scale tier proved the failure mode this object exists for:
  * the candidate-pair stream of a near-dup pipeline is quadratic in
  * duplicate multiplicity, but its planning-time size estimate — coming
  * out of a groupBy + array-explode chain — SHRINKS with the aggregate, so
  * the planner broadcast-elected a ~25M-pair (~1 GiB) build side at the
  * 100× tier and the broadcast collect aborted on
  * `spark.driver.maxResultSize`; no shuffle precedes the election, so AQE
  * never corrects it. The round-12 fix MERGE-pinned every such join, which
  * is safe at every scale but pays two extra exchanges + two sorts per
  * join at the scales where the broadcast was both safe and 2× faster
  * (the sf0.1 bench measured the clustering family at ~2× post-pin:
  * q81 6.5→13.5 s, q96 4.8→8.1 s, q99 3.7→4.4 s).
  *
  * The resolution: decide per run from an EXACT row count of a
  * materialized (checkpointed) frame — information the optimizer does not
  * have. A side that measures under the gate is *provably* bounded for
  * this run, so broadcasting it can never reproduce the estimate-driven
  * abort; a side over the gate gets the MERGE pin that survived the 100×
  * tier. Gates are conf-tunable (`spark.graft.join.broadcastRowGate`,
  * `spark.graft.join.broadcastByteGate`) with defaults sized so the
  * broadcast build stays tens of MB — far under the driver/executor
  * budgets at either end of the scale range.
  */
object MeasuredJoin {

  /** Max exact rows for a narrow (ids/labels only) broadcast side.
    * 1M rows of (long, long) UnsafeRows ≈ 64 MB hash relation. */
  def rowGate(spark: SparkSession): Long =
    spark.conf.get("spark.graft.join.broadcastRowGate", "1000000").toLong

  /** Max measured bytes for a payload-carrying broadcast side. */
  def byteGate(spark: SparkSession): Long =
    spark.conf.get("spark.graft.join.broadcastByteGate", (64L << 20).toString).toLong

  /** Exact materialized size (memory + disk blocks) of a checkpoint
    * snapshot — the number the planner's estimate got wrong. None when
    * the frame is not a tracked snapshot (caller must then assume big).
    */
  def snapshotBytes(df: DataFrame): Option[Long] =
    GraftSqlBridge.snapshotRdd(df).flatMap { rdd =>
      df.sparkSession.sparkContext.getRDDStorageInfo
        .find(_.id == rdd.id)
        .map(i => i.memSize + i.diskSize)
    }

  /** A join side wrapped with the strategy its MEASURED cardinality
    * justifies: broadcast when provably bounded, MERGE-pin otherwise.
    */
  def sizedSide(df: DataFrame, measuredRows: Long, gate: Long): DataFrame =
    if (measuredRows <= gate) broadcast(df) else df.hint("merge")

  /** Attach a per-id payload column to both endpoints of a candidate-pair
    * stream — the near-dup verify-join shape shared by MinHash LSH
    * (shingle sets), SimHash/phash Hamming (64-bit prints), blocked
    * cosine (vectors) and the cross-corpus admission join.
    *
    * The pair stream is materialized (`localCheckpoint`) — it is consumed
    * in full by the joins anyway, so the snapshot adds storage linear in
    * pair volume, not a new pass — and the DISTINCT ENDPOINT IDS are
    * materialized and counted exactly. The id count, not the pair count,
    * is what gates the plan: pairs are NEVER a build side in any regime
    * (the 100×-tier abort was precisely a pair-stream broadcast), while
    * the id list and the id-filtered payload are the candidates for
    * broadcasting, so their measured sizes are the relevant bounds. A
    * blocked self-join family routinely emits ~10⁶ pairs over ~10³
    * distinct ids — gating on pairs would push exactly the workloads
    * that benefit most into the merge fallback. Three measured regimes:
    *
    *   1. ids under the row gate: the payload table is semi-joined down
    *      to candidate ids FIRST (one pass over the corpus payload
    *      instead of the two the plain two-join chain pays — for
    *      decode/shingle-priced payloads that pass is the workload),
    *      snapshotted, and byte-measured. Under the byte gate both
    *      verify joins take the filtered payload as a BROADCAST build —
    *      zero payload shuffles (measured 10× over the merge chain on
    *      the blocked-cosine family at sf0.1: 0.8 s vs 8.0 s).
    *   2. ids small but filtered payload over the byte gate: MERGE
    *      joins against the FILTERED payload — still strictly less than
    *      the corpus-sized shuffle the blanket pin paid.
    *   3. ids over the row gate (the 100×-tier regime): the exact
    *      MERGE-pinned chain that survived the scale tier (measured at
    *      sf0.1: joining from the pair snapshot = joining from the live
    *      pair plan, 7.99 s vs 7.97 s — the snapshot costs nothing).
    *
    * `payloadA`/`payloadB` are `(doc_id, <pcol>)` frames; pass the same
    * object twice for self-join families (one shared semi-filter) or two
    * different frames for cross-corpus admission (per-role filters).
    */
  private[graft] def attachPairPayloads(
      candRaw: DataFrame,
      keyA: String,
      keyB: String,
      payloadA: DataFrame,
      payloadB: DataFrame,
      pcol: String,
      outA: String,
      outB: String): DataFrame = {
    val spark = candRaw.sparkSession
    val cand = candRaw.localCheckpoint()
    def side(src: DataFrame, key: String, out: String): DataFrame =
      src.select(col("doc_id").as(key), col(pcol).as(out))
    def joinChain(pA: DataFrame, pB: DataFrame, bounded: Boolean): DataFrame =
      if (bounded)
        cand.join(broadcast(side(pA, keyA, outA)), keyA)
          .join(broadcast(side(pB, keyB, outB)), keyB)
      else
        cand.hint("merge").join(side(pA, keyA, outA), keyA)
          .hint("merge").join(side(pB, keyB, outB), keyB)
    val bg = byteGate(spark)
    val rg = rowGate(spark)
    if (payloadA eq payloadB) {
      val ids = cand
        .select(explode(array(col(keyA), col(keyB))).as("doc_id")).distinct()
        .localCheckpoint()
      if (ids.count() <= rg) {
        val filtered = payloadA
          .join(broadcast(ids), Seq("doc_id"), "left_semi").localCheckpoint()
        joinChain(filtered, filtered, snapshotBytes(filtered).exists(_ <= bg))
      } else joinChain(payloadA, payloadB, bounded = false)
    } else {
      // cross-corpus case: ONE union-role id list and ONE tagged
      // union-payload semi-filter (2 measurement jobs, not 4 — in
      // degraded host windows each extra job costs real dispatch time).
      // Semi-filtering a side by the UNION of both roles' ids can only
      // keep extra rows (overlapping id spaces), which then simply find
      // no match in the role-keyed equi-join — never a correctness
      // change.
      val ids = cand
        .select(explode(array(col(keyA), col(keyB))).as("doc_id")).distinct()
        .localCheckpoint()
      if (ids.count() <= rg) {
        val tagged = payloadA.select(col("doc_id"), col(pcol), lit("a").as("_role"))
          .unionByName(payloadB.select(col("doc_id"), col(pcol), lit("b").as("_role")))
          .join(broadcast(ids), Seq("doc_id"), "left_semi").localCheckpoint()
        val fA = tagged.filter(col("_role") === "a").drop("_role")
        val fB = tagged.filter(col("_role") === "b").drop("_role")
        joinChain(fA, fB, snapshotBytes(tagged).exists(_ <= bg))
      } else joinChain(payloadA, payloadB, bounded = false)
    }
  }
}
