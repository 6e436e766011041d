package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over derived relationship tables (near-dup pairs,
  * co-occurrence edges). [[ConnectedComponents]] answers "which rows are
  * the same thing"; triangle counting answers the next question a
  * similarity graph raises — how CLIQUEY each neighborhood is. A vertex
  * with many neighbors but few triangles sits in a hub-spoke (template
  * contamination, one boilerplate page linking everything); dense
  * triangles mark genuinely cohesive duplicate clusters. Local
  * clustering coefficient = triangles / C(degree, 2).
  */
object Graph {

  /** Per-vertex triangle participation via the degree-ordered
    * node-iterator — the MapReduce-classic O(E^1.5) decomposition:
    *
    *  1. dedup/canonicalize the undirected edge list;
    *  2. orient every edge along the TOTAL order `(degree, id)` — each
    *     triangle then has exactly one source vertex with two outgoing
    *     edges, so it is found exactly once, and wedge fan-out is bounded
    *     by out-degree under the orientation, which the degree ordering
    *     caps at O(√E) (the hub's edges all point AWAY from it — a
    *     million-follower vertex generates no million² wedge explosion);
    *  3. wedges (two out-edges of one source, ordered) equi-join the
    *     closing edge — which the orientation guarantees runs from the
    *     smaller-ordered to the larger-ordered endpoint, so the closing
    *     probe is ONE directed lookup, no symmetric union.
    *
    * Everything is equi-joins and partial-aggregated counts; nothing is
    * ever collected. Returns `(id, n_tri)` for vertices in ≥1 triangle —
    * the orientation is an internal detail, so the result matches any
    * engine's plain a<b<c triple enumeration.
    */
  def triangleCounts(edges: DataFrame): DataFrame =
    triangleCore(canonicalSnapshot(edges))

  /** Canonicalized undirected edge snapshot shared by the graph
    * operators. localCheckpoint (the ConnectedComponents lineage-cut
    * precedent): the canonical edge list feeds the degree agg, the
    * orientation, and — via o1/o2/closing — three sides of the wedge
    * machinery; without the cut every branch re-runs the caller's
    * EDGE-BUILDING plan (typically a scored similarity self-join, the
    * expensive part). The materialized artifact is the edge list
    * itself — O(E), the operator's own input size.
    */
  private def canonicalSnapshot(edges: DataFrame): DataFrame = edges
    .select(least(col("u"), col("v")).as("a"),
      greatest(col("u"), col("v")).as("b"))
    .filter(col("a") =!= col("b"))
    .distinct()
    .localCheckpoint()

  /** Vertex degrees `(n, d)` over a canonical snapshot — one
    * partial-aggregated explode. Identical plan wherever it appears in
    * one query, so the exchange is planned once and REUSED by every
    * consumer (orientation build sides, coefficient join).
    */
  private def degrees(und: DataFrame): DataFrame = und
    .select(explode(array(col("a"), col("b"))).as("n"))
    .groupBy("n").agg(count(lit(1)).as("d"))

  /** The wedge machinery over a canonical snapshot: per-vertex triangle
    * counts `(id, n_tri)`. Shared by [[triangleCounts]] and
    * [[clusteringCoefficients]] — the latter previously re-derived the
    * snapshot (a second distinct exchange over O(E)) and a second
    * incompatible degree aggregate by calling the public operator on its
    * own canonical output.
    */
  private def triangleCore(und: DataFrame): DataFrame = {
    val deg = degrees(und)
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    // orient along (degree, id); carry the destination's order key for
    // the wedge comparison
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("src"), col("b").as("dst"),
          struct(col("db").as("od"), col("b").as("oid")).as("dord")))
        .otherwise(
          struct(col("b").as("src"), col("a").as("dst"),
            struct(col("da").as("od"), col("a").as("oid")).as("dord")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.dord").as("dord"))
      .localCheckpoint() // three consumers (o1/o2/closing), one compute
    val o1 = oriented.select(col("src"), col("dst").as("y"),
      col("dord").as("yord"))
    val o2 = oriented.select(col("src"), col("dst").as("z"),
      col("dord").as("zord"))
    val wedges = o1.join(o2, Seq("src"))
      .filter(col("yord") < col("zord"))
    val closing = oriented.select(col("src").as("y"), col("dst").as("z"))
    val tris = wedges.join(closing, Seq("y", "z"))
      .select(col("src").as("x"), col("y"), col("z"))
    tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }

  /** Fixed-point integer PageRank — centrality over the similarity /
    * co-occurrence graph (which near-dup cluster REPRESENTATIVE to keep,
    * which boilerplate hub dominates a crawl) with every arithmetic step
    * engine-exact by construction:
    *
    * Ranks live in integer fixed-point units (`scale = 1e12`), each
    * vertex divides its rank among neighbors by INTEGER division, and
    * the damping blend is integer too
    * (`r' = (15·(scale div n)) div 100 + (85·Σ contrib) div 100`).
    * Integer addition is exactly associative, so the result is
    * independent of partitioning and summation order — the property that
    * lets an independent SQL engine replay all `iters` rounds to the
    * exact unit (a float formulation would be FP-summation-order
    * dependent, unverifiable across engines). The floor losses bleed a
    * bounded ~`n·iters` units of probability mass (relative error
    * ~1e-9 here) — the standard fixed-point trade.
    *
    * Scale shape: each round is one partial-aggregated contribution
    * shuffle + a vertex-cardinality join, `localCheckpoint`ed (the
    * [[ConnectedComponents]] lineage-cut precedent: without it round k
    * replays rounds 1..k−1 and the driver's plan work goes
    * super-linear). Edges are undirected (both directions contribute).
    * Isolated vertices never appear in an edge list; dangling vertices
    * cannot exist in an undirected graph, so no dangling-mass term.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int = 5,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters > 0, s"iters must be positive, got $iters")
    val und = edges
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val dir = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val deg = dir.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val dirDeg = dir.join(deg, Seq("src")).localCheckpoint()
    val n = deg.count()
    // an empty edge list has no vertices to rank (and no base share to
    // divide); return the empty frame instead of dividing by zero
    if (n == 0)
      return deg.select(col("src").as("id"), lit(0L).as("rank_fp"))
    val base = lit(scale / n)
    var ranks = deg.select(col("src").as("id"), base.as("r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = dirDeg
        .join(ranks, dirDeg("src") === ranks("id"))
        .select(col("dst").as("id"),
          call_function("div", col("r"), col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("cs"))
      ranks = contrib
        .select(col("id"),
          (call_function("div", lit(15L) * base, lit(100L)) +
            call_function("div", lit(85L) * col("cs"), lit(100L))).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("id"), col("r").as("rank_fp"))
  }

  /** Local clustering coefficient per vertex:
    * `n_tri / C(degree, 2)` — the fraction of a vertex's neighbor pairs
    * that are themselves connected. Near 1 = cohesive clique (a true
    * duplicate cluster); near 0 at high degree = hub-spoke (the
    * template/boilerplate signature). Degree-1 vertices have no neighbor
    * pair and are reported with coefficient 0.
    *
    * Shape: ONE canonical snapshot and ONE degree aggregate feed both
    * the triangle core and the coefficient join — the degree subplans
    * are identical, so the planner reuses one exchange for all three
    * consumers (round 13 paid a second distinct over O(E) and a second
    * degree aggregate because this operator called the public
    * [[triangleCounts]] on its own canonical output). Returns
    * `(id, degree, n_tri, coeff)`, coefficient rounded to 6dp.
    */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val und = canonicalSnapshot(edges)
    val deg = degrees(und)
    deg.select(col("n").as("id"), col("d").as("degree"))
      .join(triangleCore(und), Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        (round(
          coalesce(col("n_tri"), lit(0L)).cast("double") /
            greatest(call_function("div",
              col("degree") * (col("degree") - 1L), lit(2L)), lit(1L))
              .cast("double"),
          6) + lit(0.0)).as("coeff"))
  }
}
