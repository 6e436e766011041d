package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._

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
  * join at the scales where the broadcast was both safe and 2× faster.
  *
  * The resolution: decide per run from an EXACT measurement of a
  * materialized (checkpointed) frame — information the optimizer does not
  * have. A side that measures under the gates is *provably* bounded for
  * this run, so broadcasting it can never reproduce the estimate-driven
  * abort; a side over a gate gets the MERGE pin that survived the 100×
  * tier. Gates are conf-tunable (`spark.graft.join.broadcastRowGate`,
  * `spark.graft.join.broadcastByteGate`) with defaults sized so the
  * broadcast build stays tens of MB — far under the driver/executor
  * budgets at either end of the scale range.
  *
  * Measurement-job budget (the round-13 regression this file answers):
  * each measurement is an eager job, and on a busy host each job dispatch
  * costs 0.1–0.5 s — round 13 paid 3–4 of them per pair query, which for
  * sub-second queries exceeded the query itself (q104 0.52 → 1.82 s). The
  * round-14 contract is AT MOST TWO measurement jobs per verify join
  * (one when the id count alone decides): materializing the pair snapshot
  * is fused with the distinct-endpoint count, and materializing the
  * filtered payload is fused with its exact byte measurement.
  */
object MeasuredJoin {

  /** Max exact rows for a narrow (ids/labels only) broadcast side.
    * 1M rows of (long, long) UnsafeRows ≈ 64 MB hash relation. */
  def rowGate(spark: SparkSession): Long =
    spark.conf.get("spark.graft.join.broadcastRowGate", "1000000").toLong

  /** Max measured DATA bytes for a payload-carrying broadcast side.
    * Note the budget it protects — the driver-side collect plus the
    * in-heap HashedRelation — carries per-row JVM overhead above the raw
    * data bytes (larger for array payloads like shingle sets or vectors);
    * the 64 MB default leaves that margin deliberately: even at a
    * pessimistic 4× expansion the build stays far under the 8 GB /
    * 512M-row broadcast cap and any sane driver budget. */
  def byteGate(spark: SparkSession): Long =
    spark.conf.get("spark.graft.join.broadcastByteGate", (64L << 20).toString).toLong

  /** Exact per-row data bytes as a codegen expression (UnsafeRow
    * accounting: 8 B null-tracking header, 8 B per fixed-width slot,
    * length-prefixed variable parts), for frames of fixed-width atomics,
    * strings/binary, and arrays of fixed-width atomics — every verify-join
    * payload shape in the engine (shingle-hash sets, 64-bit prints,
    * embedding vectors, id+role tags). None when any field's type is
    * outside that set: the caller must then assume the side is big.
    * Unlike reading cached-block sizes off storage info, this works for
    * RELIABLE (file-backed) snapshots too, whose RDDs never appear in
    * `getRDDStorageInfo`.
    */
  private[graft] def rowBytes(df: DataFrame): Option[Column] = {
    def fixed(dt: DataType): Option[Long] = dt match {
      case LongType | DoubleType | IntegerType | FloatType | ShortType |
           ByteType | BooleanType | DateType | TimestampType => Some(8L)
      case _ => None
    }
    val fields = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      f.dataType match {
        case dt if fixed(dt).isDefined => Some(lit(fixed(dt).get))
        case StringType | BinaryType =>
          Some(lit(8L) + coalesce(octet_length(c).cast("long"), lit(0L)))
        case ArrayType(et, _) if fixed(et).isDefined =>
          Some(lit(24L) +
            coalesce(size(c).cast("long"), lit(0L)) * lit(fixed(et).get))
        case _ => None
      }
    }
    if (fields.exists(_.isEmpty)) None
    else Some(fields.flatten.reduceLeft(_ + _) + lit(8L))
  }

  /** A LAZY snapshot plus its deferred release action. The snapshot is
    * materialized by the caller's next action on it (fusing the
    * materialization with whatever that action measures — never a
    * dedicated job); call the release AFTER that action has run.
    *
    *   - local (default): `localCheckpoint(eager = false)` — executor
    *     memory/disk blocks, lineage truncated. Release is a no-op: the
    *     blocks ARE the snapshot and live until the query's plan is done
    *     with them (reclaimed by driver GC + ContextCleaner afterward —
    *     retention linear in snapshot volume for the session, the
    *     documented cost of the measured-join design).
    *   - reliable: storage-backed checkpoint files for executor-loss
    *     survival (same flag [[ConnectedComponents]] honors), via
    *     [[GraftSqlBridge.reliableSnapshotLazy]] — the RDD-level
    *     persist-before-checkpoint pattern, so the file write re-reads
    *     blocks instead of recomputing the pipeline. Release drops the
    *     transient blocks; the files remain the snapshot.
    */
  private def snapLazy(df: DataFrame, reliable: Boolean): (DataFrame, () => Unit) =
    if (!reliable) (df.localCheckpoint(eager = false), () => ())
    else GraftSqlBridge.reliableSnapshotLazy(df)

  /** ONE action that materializes a (lazy) snapshot and measures it
    * exactly: (rows, data bytes). Bytes are None when [[rowBytes]] cannot
    * account the schema — callers must treat that side as unbounded.
    */
  private[graft] def materializeAndMeasure(snap: DataFrame): (Long, Option[Long]) =
    rowBytes(snap) match {
      case Some(b) =>
        val r = snap.agg(count(lit(1)), sum(b)).head()
        (r.getLong(0), Some(if (r.isNullAt(1)) 0L else r.getLong(1)))
      case None => (snap.count(), None)
    }

  /** An already-materialized attach side wrapped with the strategy its
    * MEASURED size justifies: broadcast when rows AND bytes are provably
    * bounded, the scale-proven MERGE pin otherwise. One job (the exact
    * count callers previously paid anyway, now also byte-accounted — a
    * 1M-row gate assumes two long columns, which wide string ids would
    * silently blow without the byte check).
    */
  private[graft] def measuredSide(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val (n, bytes) = materializeAndMeasure(df)
    if (n <= rowGate(spark) && bytes.exists(_ <= byteGate(spark))) broadcast(df)
    else df.hint("merge")
  }

  /** Attach a per-id payload column to both endpoints of a candidate-pair
    * stream — the near-dup verify-join shape shared by MinHash LSH
    * (shingle sets), SimHash/phash Hamming (64-bit prints), blocked
    * cosine (vectors) and the cross-corpus admission join.
    *
    * The pair stream is snapshotted lazily and materialized BY the
    * distinct-endpoint-id count (one job for both; the stream is consumed
    * in full by the joins anyway, so the snapshot adds storage linear in
    * pair volume, not a new pass). The ID count, not the pair count, is
    * what gates the plan: pairs are NEVER a build side in any regime
    * (the 100×-tier abort was precisely a pair-stream broadcast), while
    * the id-filtered payload is the broadcast candidate, so its measured
    * size is the relevant bound. A blocked self-join family routinely
    * emits ~10⁶ pairs over ~10³ distinct ids — gating on pairs would push
    * exactly the workloads that benefit most into the merge fallback.
    * Three measured regimes:
    *
    *   1. ids under the row gate: the payload table is semi-joined down
    *      to candidate ids FIRST (one pass over the corpus payload
    *      instead of the two the plain two-join chain pays — for
    *      decode/shingle-priced payloads that pass is the workload),
    *      snapshotted, and byte-measured in the SAME job that
    *      materializes it. Under the byte gate both verify joins take the
    *      filtered payload as a BROADCAST build — zero payload shuffles
    *      (measured 10× over the merge chain on the blocked-cosine family
    *      at sf0.1: 0.8 s vs 8.0 s).
    *   2. ids small but filtered payload over the byte gate: MERGE joins
    *      against the FILTERED payload — still strictly less than the
    *      corpus-sized shuffle the blanket pin paid.
    *   3. ids over the row gate (the 100×-tier regime): the exact
    *      MERGE-pinned chain that survived the scale tier, with NO
    *      byte-measure job (the id count alone already decided).
    *
    * `payloadA`/`payloadB` are `(doc_id, <pcol>)` frames; pass the same
    * object twice for self-join families (one shared semi-filter) or two
    * different frames for cross-corpus admission (one union-role filter).
    *
    * `reliable = true` mirrors [[ConnectedComponents]]: every snapshot
    * (pairs, filtered payload) goes to the SparkContext checkpoint dir on
    * fault-tolerant storage instead of executor-local blocks, so an
    * executor loss mid-verify stays recoverable on a real cluster.
    */
  private[graft] def attachPairPayloads(
      candRaw: DataFrame,
      keyA: String,
      keyB: String,
      payloadA: DataFrame,
      payloadB: DataFrame,
      pcol: String,
      outA: String,
      outB: String,
      reliable: Boolean = false): DataFrame = {
    val spark = candRaw.sparkSession
    require(!reliable || spark.sparkContext.getCheckpointDir.isDefined,
      "reliable verify-join snapshots need SparkContext.setCheckpointDir " +
        "to point at fault-tolerant storage (HDFS/S3/shared FS)")
    val (cand, candRelease) = snapLazy(candRaw, reliable)
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
    val idsPlan = cand
      .select(explode(array(col(keyA), col(keyB))).as("doc_id")).distinct()
    // In the local (default) mode the id list is a LAZY local snapshot in
    // the same lineage as the pair snapshot, so measurement job 1 below
    // materializes BOTH in one pass — the fused form of round 13's
    // separate cand-checkpoint, ids-checkpoint and ids-count jobs — and
    // the broadcast semi-join build then reads the pinned id blocks
    // instead of re-running the explode+distinct (a measured 0.3–0.5 s
    // shuffle-job recompute per query on a busy host). In RELIABLE mode
    // the id list stays a plain plan over the file-backed pair snapshot:
    // a lineage-truncated local id snapshot would be unrecoverable on
    // executor loss — exactly the guarantee the flag buys — so the
    // broadcast build re-derives it from the reliable files (a flat
    // scan + small shuffle, fully recoverable).
    val ids =
      if (reliable) idsPlan else idsPlan.localCheckpoint(eager = false)
    // measurement job 1 (often the only one): computing the exact
    // distinct-endpoint count materializes the pair snapshot (and, in
    // local mode, the id snapshot) as a side effect.
    val nIds = ids.count()
    candRelease()
    if (nIds > rg) joinChain(payloadA, payloadB, bounded = false)
    else if (payloadA eq payloadB) {
      val (filtered, filteredRelease) = snapLazy(
        payloadA.join(broadcast(ids), Seq("doc_id"), "left_semi"), reliable)
      // measurement job 2: materializes the semi-filtered payload AND
      // measures its exact data bytes in the same action
      val (_, bytes) = materializeAndMeasure(filtered)
      filteredRelease()
      joinChain(filtered, filtered, bytes.exists(_ <= bg))
    } else {
      // cross-corpus case: ONE tagged union-payload semi-filter.
      // Semi-filtering a side by the UNION of both roles' ids can only
      // keep extra rows (overlapping id spaces), which then simply find
      // no match in the role-keyed equi-join — never a correctness
      // change.
      val (tagged, taggedRelease) = snapLazy(
        payloadA.select(col("doc_id"), col(pcol), lit("a").as("_role"))
          .unionByName(
            payloadB.select(col("doc_id"), col(pcol), lit("b").as("_role")))
          .join(broadcast(ids), Seq("doc_id"), "left_semi"), reliable)
      val (_, bytes) = materializeAndMeasure(tagged)
      taggedRelease()
      val fA = tagged.filter(col("_role") === "a").drop("_role")
      val fB = tagged.filter(col("_role") === "b").drop("_role")
      joinChain(fA, fB, bytes.exists(_ <= bg))
    }
  }
}
