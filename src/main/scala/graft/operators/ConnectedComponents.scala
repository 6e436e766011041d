package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/** Connected components over an undirected edge list — the clustering step
  * that turns pairwise near-duplicate hits (MinHash / SimHash / cosine
  * pairs) into dedup GROUPS: transitive closure assigns every document the
  * minimum reachable id as its cluster, so "keep one per cluster" becomes a
  * trivial filter. The reference stops at pairwise loading; this is the
  * operator a 100 TB dedup pipeline actually ends with.
  *
  * Algorithm: iterated min-label propagation, with OPTIONAL pointer
  * halving. Each round every vertex takes the minimum component label
  * among itself and its neighbors; with `pointerHalving` it then follows
  * its label one hop (component := component's component — labels always
  * point at vertex ids, so the hop is an id-keyed self-join). Neighbor-min
  * alone converges in diameter rounds — right for the dense local cliques
  * threshold near-dup joins emit (diameter 1–3), hopeless for chain-shaped
  * graphs (a semantic-similarity graph at a loose threshold IS
  * chain-shaped); the shortcut doubles how far label information reaches
  * per round, giving O(log diameter) rounds for one extra two-long-column
  * join per round. The loop stops when a round changes no label, and
  * `maxIters` reports non-convergence instead of looping forever.
  *
  * Lineage & storage discipline: the symmetrized edge list is checkpointed
  * once (it usually IS a near-dup pipeline — re-running it per round would
  * multiply the expensive part by the round count), and EVERY round's
  * labels are checkpointed, not merely persisted. Persist caches the data
  * but leaves the logical plan nesting round over round, and
  * plan-proportional driver work (optimization, per-action explain
  * instrumentation) goes super-linear with depth — a long-diameter graph
  * hangs the DRIVER while executors sit idle. The checkpoint cuts each
  * round's plan to a flat scan of the previous snapshot, so driver cost
  * per round is constant. Superseded snapshots are unpersisted EXPLICITLY
  * as soon as the round's convergence count materializes the new one, so
  * live storage is bounded to two snapshots regardless of round count
  * (driver GC + ContextCleaner would get there eventually, but
  * nondeterministically).
  *
  * Fault tolerance: `reliable = false` (default) uses `localCheckpoint`,
  * whose snapshots live in executor memory/disk — fastest, but one
  * executor loss mid-loop makes a snapshot unrecoverable and fails the
  * job. `reliable = true` uses storage-backed `checkpoint()` (requires
  * `SparkContext.setCheckpointDir` pointing at fault-tolerant storage,
  * e.g. HDFS/S3), which survives executor loss — the right setting for a
  * long clustering loop on a real cluster. Checkpoint FILES of a reliable
  * run are reclaimed by the ContextCleaner when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, or by
  * deleting the checkpoint dir after the job.
  *
  * Join-strategy discipline: the strategy of every join in the loop (and
  * the singleton re-attach in [[clusterPairs]]) is decided from a
  * MEASURED cardinality, never a planner estimate ([[MeasuredJoin]]).
  * Estimates cannot be trusted here: checkpointed frames propagate the
  * pre-checkpoint plan's ESTIMATED stats into their `LogicalRDD`, so a
  * pair pipeline the optimizer underestimates makes its O(E) snapshot
  * look broadcastable at planning time (no shuffle runs before the join,
  * so AQE never sees the real size either). Exactly that killed a
  * 100×-scale run: the ~50M-row symmetrized snapshot was
  * broadcast-elected and the build-side collect aborted on
  * `spark.driver.maxResultSize` (1 GiB). The loop instead counts the
  * label snapshot ONCE (exact, one cheap job on materialized data) —
  * every label-sized side holds at most that many rows, so under the row
  * gate the label side broadcasts (provably bounded for THIS run, and
  * ~2× cheaper per round at bench scale than the blanket merge pin
  * round 12 measured), while over the gate every join keeps the
  * sort-merge + AQE-skew-split plan that survived the 100× tier. The
  * EDGE snapshot is never a build side at any size.
  */
object ConnectedComponents {

  /** Cluster assignment for every vertex of `vertices(id)` given undirected
    * `edges(src, dst)`. Returns `(id, component)` where `component` is the
    * minimum id reachable from `id` (singletons map to themselves).
    *
    * @param pointerHalving follow each label one extra hop per round
    *        (component := component's component), converging in
    *        O(log diameter) rounds instead of O(diameter) at the cost of
    *        one extra two-long-column join per round. Turn ON for graphs
    *        with long chains (semantic-similarity edges at loose
    *        thresholds); leave OFF for the dense local cliques threshold
    *        near-dup joins emit, where diameters are 1–3 and the extra
    *        per-round stages outweigh the saved rounds.
    * @param reliable checkpoint label snapshots to the SparkContext
    *        checkpoint dir (fault-tolerant storage) instead of executor
    *        memory/disk — survives executor loss mid-loop; see class doc.
    * @throws IllegalStateException if `maxIters` rounds do not converge —
    *         a truncated closure would silently merge or split clusters.
    * @throws IllegalArgumentException if `reliable` and no checkpoint dir
    *         has been set on the SparkContext.
    */
  def run(
      edges: DataFrame,
      vertices: DataFrame,
      maxIters: Int = 25,
      pointerHalving: Boolean = false,
      reliable: Boolean = false): DataFrame =
    runImpl(edges, Some(vertices), maxIters, pointerHalving, reliable)

  /** [[run]] with the vertex set derived FROM the edge list (every edge
    * endpoint, exactly once). This is the right entry point when the
    * caller's vertex set IS the endpoints: deriving it from the caller's
    * un-materialized edge plan would re-execute the (typically expensive)
    * pair pipeline a second time, while here it is one distinct over the
    * already-checkpointed symmetrized snapshot.
    */
  def runEdgeVertices(
      edges: DataFrame,
      maxIters: Int = 25,
      pointerHalving: Boolean = false,
      reliable: Boolean = false): DataFrame =
    runImpl(edges, None, maxIters, pointerHalving, reliable)

  private def runImpl(
      edges: DataFrame,
      verticesOpt: Option[DataFrame],
      maxIters: Int,
      pointerHalving: Boolean,
      reliable: Boolean): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    require(!reliable || sc.getCheckpointDir.isDefined,
      "reliable checkpointing needs SparkContext.setCheckpointDir to point " +
        "at fault-tolerant storage (HDFS/S3/shared FS)")
    // Reliable snapshots go through GraftSqlBridge.reliableSnapshot*: the
    // RDD-level persist-before-checkpoint pattern, so the checkpoint-file
    // write (the second job Spark runs after the materializing action)
    // re-reads blocks instead of recomputing the round's whole plan —
    // plain Dataset.checkpoint pays every reliable round's union+agg+join
    // TWICE (at the 100× tier that is the difference between one 12M-row
    // pass per round and two). Lazy snaps park their transient-block
    // release in `pendingRelease` until the round's convergence count has
    // materialized the snapshot.
    var pendingRelease: Option[() => Unit] = None
    def releasePending(): Unit = {
      pendingRelease.foreach(_.apply())
      pendingRelease = None
    }
    def snap(df: DataFrame, eager: Boolean): DataFrame =
      if (!reliable) df.localCheckpoint(eager = eager)
      else if (eager) GraftSqlBridge.reliableSnapshotEager(df)
      else {
        val (s, release) = GraftSqlBridge.reliableSnapshotLazy(df)
        pendingRelease = Some(release)
        s
      }
    def unpersistSnap(rdd: RDD[InternalRow]): Unit =
      // local snapshots hold executor memory/disk blocks — free them NOW;
      // a reliable snapshot's RDD is file-backed (unpersist is a no-op)
      if (!reliable) rdd.unpersist(blocking = false)

    // checkpoint the symmetrized edge list ONCE: `edges` is typically the
    // output of a near-dup pipeline (minhash + verify joins), and every
    // propagation round joins against it — without materialization each
    // round would re-execute the whole upstream pipeline
    val sym = snap(edges
      .select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v"))),
      eager = true)
    // derived vertices read the flat symmetrized SNAPSHOT (one distinct),
    // never the caller's live edge plan — see runEdgeVertices
    val vertices = verticesOpt.getOrElse(sym.select(col("u").as("id")).distinct())
    // LAZY checkpoint, materialized by the measurement below — one job
    // where round 13 paid two (eager snap + count)
    var labels = snap(vertices.select(col("id"), col("id").as("component")),
      eager = false)
    // EXACT measurement off the materialized snapshot (one job, fused
    // with the materialization) — every label-sized frame in the loop
    // (labels, mins, next) holds at most nV rows, so one measurement
    // decides the strategy for every round's label-side join:
    // provably-bounded broadcast when BOTH the row count and the data
    // bytes are under the gates (the 1M-row gate assumes two long
    // columns; wide string ids would silently blow it without the byte
    // check — component labels are id-typed, so per-round frames stay
    // within ~2× the measured initial snapshot), the scale-proven MERGE
    // pin otherwise. The EDGE snapshot is never a build side at any
    // size — that broadcast election (off propagated pre-checkpoint
    // estimates) is what aborted the 100× tier on
    // spark.driver.maxResultSize.
    val (nV, labelBytes) = MeasuredJoin.materializeAndMeasure(labels)
    releasePending()
    val labelBounded = nV <= MeasuredJoin.rowGate(edges.sparkSession) &&
      labelBytes.exists(_ <= MeasuredJoin.byteGate(edges.sparkSession))
    def labelSide(df: DataFrame): DataFrame =
      if (labelBounded) broadcast(df) else df.hint("merge")
    // the storage-holding RDD behind the round's snapshot, for explicit
    // reclamation once superseded (None only if a Spark version change
    // stopped surfacing LogicalRDD — then we fall back to GC reaping)
    var liveSnap: Option[RDD[InternalRow]] = GraftSqlBridge.snapshotRdd(labels)

    var converged = false
    var iter = 0
    try {
      while (!converged && iter < maxIters) {
        // neighbor messages: every edge u<-v forwards v's current component
        // (label side strategy measured once above; edge side never builds)
        val msgs = sym.join(labelSide(labels), sym("v") === labels("id"))
          .select(sym("u").as("id"), col("component"))
        // LAZY checkpoint: the round's one action (the convergence count
        // below) materializes it as a side effect, and from then on the
        // plan reads a flat snapshot — the lineage cut that keeps per-round
        // driver cost constant (persist leaves the plan nesting round over
        // round, and plan-proportional driver work goes super-linear with
        // depth). The cut also makes the shortcut below a self-join of a
        // snapshot — self-joining the live union+agg plan trips analyzer
        // constraint rewriting.
        val mins = snap(labels.unionByName(msgs)
          .groupBy("id").agg(min("component").as("component")),
          eager = false)
        // pointer halving (optional): labels always point AT vertex ids, so
        // following the pointer one hop doubles how far label information
        // reaches per round — see the `pointerHalving` param doc.
        val next =
          if (!pointerHalving) mins
          else mins
            .join(labelSide(
              mins.select(col("id").as("rid"), col("component").as("rcomp"))),
              col("component") === col("rid"))
            .select(col("id"), col("rcomp").as("component"))
        // convergence test over two flat snapshots: a vertex whose label
        // shrank means another round is needed
        val changed = next.as("n")
          .join(labelSide(labels.as("p")), "id")
          .filter(col("n.component") =!= col("p.component"))
          .limit(1).count()
        // the count materialized `mins`; release its transient
        // persist-before-checkpoint cache (reliable mode), and the
        // previous snapshot is now unreferenced by any future plan —
        // reclaim it explicitly so live storage stays bounded to two
        // snapshots however many rounds run
        releasePending()
        liveSnap.foreach(unpersistSnap)
        liveSnap = GraftSqlBridge.snapshotRdd(mins)
        labels = next
        converged = changed == 0
        iter += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIters rounds — " +
            "component diameter exceeds the bound; raise maxIters")
      if (!pointerHalving) {
        // labels at loop exit IS the last round's materialized snapshot
        // (next = mins, already checkpointed and flat) — hand it to the
        // caller as-is instead of paying a redundant re-checkpoint job.
        // Ownership transfers: clearing liveSnap excludes it from the
        // release below (callers hold one O(paired-vertices) snapshot, as
        // before).
        liveSnap = None
        labels
      } else
        // pointer halving leaves `labels` as a live join over the last
        // snapshot — materialize a flat frame for the caller, THEN the
        // finally releases the loop's working snapshots
        snap(labels, eager = true)
    } finally {
      // BOTH paths — success and non-convergence/job failure — release the
      // working snapshots (last live label snapshot + symmetrized edge
      // list + any transient reliable-mode cache); without this the error
      // path would leak executor storage blocks until GC/ContextCleaner
      // got to them, the nondeterministic reclamation the explicit
      // tracking exists to avoid
      releasePending()
      liveSnap.foreach(unpersistSnap)
      GraftSqlBridge.snapshotRdd(sym).foreach(unpersistSnap)
    }
  }

  /** Convenience: cluster a near-dup pair list `(id_a, id_b, ...)` over the
    * full corpus id set, returning every corpus id with its cluster and
    * whether it is the cluster's canonical representative (the minimum id).
    *
    * The propagation loop runs over the PAIR ENDPOINTS only — a vertex
    * with no edge can never change its label, so feeding the whole corpus
    * through every round's union+agg+join just multiplies each round by
    * |corpus| / |paired docs| (a big factor: duplicates are the minority
    * of a deduped-enough corpus). Singletons re-attach AFTER convergence
    * with one left join + coalesce-to-self — MERGE-pinned like the loop's
    * joins (the label side is O(paired docs): workload-dependent and
    * estimated from propagated pre-checkpoint stats, so a broadcast
    * election here is a planning-time guess, not a measurement).
    */
  def clusterPairs(
      pairs: DataFrame,
      allIds: DataFrame,
      idCol: Column,
      pointerHalving: Boolean = false,
      reliable: Boolean = false): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = runEdgeVertices(edges,
      pointerHalving = pointerHalving, reliable = reliable)
    // comp is a materialized snapshot — measure it exactly (one cheap
    // job, rows AND bytes) and let the measurement pick the attach
    // strategy (broadcast when provably bounded, the scale-proven MERGE
    // pin otherwise)
    allIds.select(idCol.as("id"))
      .join(MeasuredJoin.measuredSide(comp.withColumnRenamed("component", "c")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("c"), col("id")).as("component"))
      .withColumn("is_canonical", col("id") === col("component"))
  }
}
