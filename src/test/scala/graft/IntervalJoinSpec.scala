package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pii(points: Seq[(Long, String, Long)],
      ivs: Seq[(Long, String, Long, Long)], w: Long): Set[(Long, Long)] = {
    val p = points.toDF("pid", "k", "t")
    val iv = ivs.toDF("iid", "k", "s", "e")
    IntervalJoin.pointInInterval(
        p, col("pid"), col("k"), col("t"),
        iv, col("iid"), col("k"), col("s"), col("e"), w)
      .as[(Long, Long)].collect().toSet
  }

  test("point-in-interval: inclusive bounds, band edges, key isolation") {
    val got = pii(
      points = Seq((1L, "a", 4L), (2L, "a", 5L), (3L, "a", 25L),
        (4L, "a", 26L), (5L, "b", 10L)),
      ivs = Seq((100L, "a", 5L, 25L)), w = 10L)
    // 4 is before start; 26 after end; key b never matches; 5 and 25
    // are the inclusive endpoints (25 sits on a band edge)
    assert(got == Set((100L, 2L), (100L, 3L)))
  }

  test("point-in-interval: negative timestamps floor to the right band") {
    val got = pii(
      points = Seq((1L, "a", -5L), (2L, "a", -16L), (3L, "a", -1L)),
      ivs = Seq((7L, "a", -15L, -5L)), w = 10L)
    // floor(-5/10) = -1, floor(-15/10) = -2: truncating division would
    // band -5 and -15 as 0 and -1 and lose both matches
    assert(got == Set((7L, 1L)))
  }

  test("point-in-interval: end < start intervals are empty") {
    assert(pii(Seq((1L, "a", 10L)), Seq((9L, "a", 20L, 5L)), 10L).isEmpty)
  }

  test("pathological interval is dropped by the band cap, not exploded") {
    val p = Seq((1L, "a", 50L), (2L, "a", 15L)).toDF("pid", "k", "t")
    // [0, 1e9] would cover 1e8 bands at w=10; [10, 19] is fine
    val iv = Seq((7L, "a", 0L, 1000000000L), (8L, "a", 10L, 19L))
      .toDF("iid", "k", "s", "e")
    val got = IntervalJoin.pointInInterval(
        p, col("pid"), col("k"), col("t"),
        iv, col("iid"), col("k"), col("s"), col("e"),
        bandWidth = 10L, maxBands = 100)
      .as[(Long, Long)].collect().toSet
    // the oversized window contributes nothing; the sane one still joins
    assert(got == Set((8L, 2L)))
  }

  test("point never double-matches an interval spanning many bands") {
    val got = pii(
      points = Seq((1L, "a", 50L)),
      ivs = Seq((3L, "a", 0L, 99L)), w = 10L)
    assert(got.toSeq == Seq((3L, 1L)))
  }

  private def ovl(ls: Seq[(Long, String, Long, Long)],
      rs: Seq[(Long, String, Long, Long)], w: Long): Seq[(Long, Long)] = {
    val l = ls.toDF("lid", "k", "s", "e")
    val r = rs.toDF("rid", "k", "s", "e")
    IntervalJoin.intervalOverlap(
        l, col("lid"), col("k"), col("s"), col("e"),
        r, col("rid"), col("k"), col("s"), col("e"), w)
      .as[(Long, Long)].collect().toSeq
  }

  test("overlap: emitted exactly once despite many shared bands") {
    // both intervals span bands 0..9; a naive band join yields 10 copies
    val got = ovl(Seq((1L, "a", 0L, 99L)), Seq((2L, "a", 5L, 95L)), 10L)
    assert(got == Seq((1L, 2L)))
  }

  test("overlap: touching endpoints count, disjoint do not") {
    val got = ovl(
      Seq((1L, "a", 0L, 10L), (2L, "a", 50L, 60L)),
      Seq((3L, "a", 10L, 20L), (4L, "a", 61L, 70L)), 10L)
    // [0,10] touches [10,20] at 10 (inclusive); [50,60] vs [61,70] gap
    assert(got.toSet == Set((1L, 3L)))
  }

  test("overlap: exhaustive small-domain equivalence with the theta join") {
    // all intervals over a small domain, compared against the O(n^2)
    // reference predicate — catches any attribution-band edge case
    val ivs = for {
      s <- 0L to 12L by 3L; len <- Seq(0L, 4L, 9L)
    } yield (s * 100 + len, "k", s, s + len)
    val banded = ovl(ivs, ivs, 5L).toSet
    val ref = (for {
      (li, _, ls, le) <- ivs; (ri, _, rs, re) <- ivs
      if math.max(ls, rs) <= math.min(le, re)
    } yield (li, ri)).toSet
    assert(banded == ref)
  }
}
