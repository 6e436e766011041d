package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * that turns pairwise near-duplicate hits (MinHash / SimHash / cosine
  * pairs) into dedup GROUPS: transitive closure assigns every document the
  * minimum reachable id as its cluster, so "keep one per cluster" becomes a
  * trivial filter. The reference stops at pairwise loading; this is the
  * operator a 100 TB dedup pipeline actually ends with.
  *
  * Algorithm: iterated min-label propagation. Each round every vertex
  * takes the minimum component label among itself and its neighbors; the
  * loop stops when a round changes no label. Each round is ONE shuffle
  * (edge–label equi-join + min-aggregate on vertex id) over rows of two
  * longs — never the document bodies — and rounds are bounded by the
  * component diameter. Near-dup graphs are dense local cliques (threshold
  * joins emit most pairs of a group directly), so diameters are tiny in
  * practice; for adversarial long-chain graphs the same loop accepts a
  * `maxIters` bound and reports non-convergence instead of looping forever.
  * (The O(log n)-round large-star/small-star variant trades ~2× work per
  * round for that guarantee; min-propagation is the better default for
  * dedup-shaped graphs.)
  *
  * Lineage & storage discipline: the symmetrized edge list is checkpointed
  * once (it usually IS a near-dup pipeline — re-running it per round would
  * multiply the expensive part by the round count); each round's labels
  * are persisted and the previous round's explicitly unpersisted, so the
  * loop holds at most TWO label snapshots plus the edges at any moment;
  * and the RETURNED frame is local-checkpointed so callers get a flat
  * plan, not one nesting every round (a 25-round loop would otherwise
  * plan ~100 exchanges and replay them all on recompute). On a cluster
  * where executor loss must survive the loop, swap `localCheckpoint` for
  * reliable `checkpoint()` — same shape, storage-backed.
  */
object ConnectedComponents {

  /** Cluster assignment for every vertex of `vertices(id)` given undirected
    * `edges(src, dst)`. Returns `(id, component)` where `component` is the
    * minimum id reachable from `id` (singletons map to themselves).
    *
    * @throws IllegalStateException if `maxIters` rounds do not converge —
    *         a truncated closure would silently merge or split clusters.
    */
  def run(edges: DataFrame, vertices: DataFrame, maxIters: Int = 25): DataFrame = {
    // checkpoint the symmetrized edge list ONCE: `edges` is typically the
    // output of a near-dup pipeline (minhash + verify joins), and every
    // propagation round joins against it — without materialization each
    // round would re-execute the whole upstream pipeline
    val sym = edges
      .select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint()
    var labels = vertices.select(col("id"), col("id").as("component")).persist()
    labels.count() // materialize so round 1 reads a snapshot, not a plan

    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // neighbor messages: every edge u<-v forwards v's current component
      val msgs = sym.join(labels, sym("v") === labels("id"))
        .select(sym("u").as("id"), col("component"))
      val next = labels.unionByName(msgs)
        .groupBy("id").agg(min("component").as("component"))
        .persist()
      // one action materializes the round AND answers the convergence
      // test: a vertex whose label shrank means another round is needed
      val changed = next.as("n")
        .join(labels.as("p"), "id")
        .filter(col("n.component") =!= col("p.component"))
        .limit(1).count()
      labels.unpersist() // bound loop storage to two snapshots
      labels = next
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds — " +
          "component diameter exceeds the bound; raise maxIters")
    // hand the caller a flat-lineage frame, then release the loop snapshot
    val result = labels.localCheckpoint()
    labels.unpersist()
    result
  }

  /** Convenience: cluster a near-dup pair list `(id_a, id_b, ...)` over the
    * full corpus id set, returning every corpus id with its cluster and
    * whether it is the cluster's canonical representative (the minimum id).
    */
  def clusterPairs(pairs: DataFrame, allIds: DataFrame, idCol: Column): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val vertices = allIds.select(idCol.as("id"))
    run(edges, vertices)
      .withColumn("is_canonical", col("id") === col("component"))
  }
}
