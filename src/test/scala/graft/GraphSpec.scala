package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap

  test("K4: four triangles, every vertex in three") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(tri(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("paths and stars are triangle-free; hub-spoke is the point") {
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // a hub with 5 spokes: high degree, zero triangles — the template-
    // contamination signature triangle counting exists to expose
    assert(tri((2L to 6L).map(s => (1L, s))).isEmpty)
  }

  test("duplicate, reversed, and self edges are canonicalized away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    assert(tri(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge count the shared vertices twice") {
    // {1,2,3} and {2,3,4}: vertices 2,3 in both
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(tri(g) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("clustering coefficients: clique 1.0, hub 0.0, degree-1 reported") {
    // triangle {1,2,3} plus a pendant 4-1: 1 has degree 3 (C(3,2)=3,
    // one triangle -> 1/3); 2,3 are clique-perfect; 4 has no pair
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    val got = Graph.clusteringCoefficients(g.toDF("u", "v"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 1L, 0.333333)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((2L, 1L, 1.0)))
    assert(got(4L) == ((1L, 0L, 0.0)))
  }

  test("fixed-point pagerank: symmetric graphs get equal ranks, hubs rank higher") {
    // two-node graph: perfectly symmetric ranks, mass ~ scale
    val pair = Graph.pageRank(Seq((1L, 2L)).toDF("u", "v"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(pair(1L) == pair(2L))
    assert(math.abs(pair.values.sum - 1000000000000L) < 100L)
    // star: the hub accumulates every spoke's full rank each round
    val star = Graph.pageRank((2L to 5L).map(s => (1L, s)).toDF("u", "v"),
      iters = 5).as[(Long, Long)].collect().toMap
    assert(star(1L) > star(2L))
    assert(star(2L) == star(3L) && star(3L) == star(4L) && star(4L) == star(5L))
  }

  test("pagerank on an empty or self-loop-only edge list is empty") {
    assert(Graph.pageRank(Seq.empty[(Long, Long)].toDF("u", "v")).count() == 0L)
    assert(Graph.pageRank(Seq((3L, 3L)).toDF("u", "v")).count() == 0L)
  }

  test("fixed-point pagerank matches a hand-rolled integer reference") {
    // triangle {1,2,3} plus pendant 4-1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    val got = Graph.pageRank(edges.toDF("u", "v"), iters = 4)
      .as[(Long, Long)].collect().toMap
    val adj = Map(1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L, 2L), 4L -> Seq(1L))
    val scale = 1000000000000L
    val base = scale / 4
    var r = adj.keys.map(_ -> base).toMap
    for (_ <- 1 to 4) {
      r = adj.keys.map { i =>
        val cs = adj.toSeq.collect {
          case (j, ns) if ns.contains(i) => r(j) / ns.size
        }.sum
        i -> ((15L * base) / 100L + (85L * cs) / 100L)
      }.toMap
    }
    assert(got == r)
  }

  test("exhaustive small-domain equivalence with triple enumeration") {
    // every graph on 6 vertices from a deterministic edge subset
    val all = for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)
    // pick a pseudo-random but fixed subset via a hash parity
    val edges = all.filter { case (a, b) => (a * 7 + b * 13) % 3 != 0 }
    val got = tri(edges)
    val es = edges.toSet
    def has(a: Long, b: Long) = es.contains((a min b, a max b))
    val ref = scala.collection.mutable.Map.empty[Long, Long]
    for (a <- 1L to 6L; b <- (a + 1) to 6L; c <- (b + 1) to 6L
         if has(a, b) && has(b, c) && has(a, c); v <- Seq(a, b, c))
      ref(v) = ref.getOrElse(v, 0L) + 1L
    assert(got == ref.toMap)
  }
}
