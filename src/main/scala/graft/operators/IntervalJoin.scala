package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval joins — the scalable plan for "point in window" and
  * "window overlaps window" predicates (sessions × events, incident
  * windows × clicks, experiment assignments × exposures).
  *
  * Spark has no native range-join strategy: a raw
  * `a.join(b, pt >= s && pt <= e)` theta-join plans as
  * BroadcastNestedLoopJoin — O(|A|·|B|) comparisons and a broadcast of a
  * whole side, the classic 100 TB cliff. The banded decomposition turns
  * it into an EQUI-join Catalyst can shuffle/broadcast like any other:
  * quantize time into fixed `bandWidth` bands, explode each interval
  * onto the bands it covers, and join on `(key, band)` — a point meets
  * exactly the intervals sharing its band, so the exact predicate only
  * re-checks the short candidate list. Work is
  * O(|A| + |B|·(len/W + 1) + candidates), and the join is an ordinary
  * shuffled/broadcast hash join (AQE handles hot `(key, band)` skew).
  *
  * Band arithmetic is exact integer floor division
  * (`(t − pmod(t, W)) / W`) — NOT a double cast, which silently loses
  * ulps above 2^53 (nanosecond epochs are ~1.7e18): a point on a band
  * edge one ulp off would land in the wrong band and miss its candidate
  * list entirely.
  *
  * `bandWidth` trades explode amplification (`len/W + 1` rows per
  * interval) against candidate precision (a wide band pairs more
  * non-matches for the filter to discard). Set it near the TYPICAL
  * interval length; amplification is then ~2 rows per interval.
  */
object IntervalJoin {

  private val guardSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Exact integer floor(t / w) for any sign of `t`. `t - pmod(t, w)` is
    * exactly `w * floor(t/w)`, so the integral divide (`div`, exact on
    * longs — never a double, whose 53-bit mantissa corrupts nanosecond
    * epochs) recovers the floor with no truncation ambiguity. */
  private def bandOf(t: Column, w: Long): Column =
    call_function("div", t - pmod(t, lit(w)), lit(w))

  /** All bands `[floor(s/w) .. floor(e/w)]` an interval covers. Callers
    * guarantee `s <= e` (enforced by the public entry points — a
    * descending `sequence` would silently generate the WRONG bands). */
  private def bandsOf(s: Column, e: Column, w: Long): Column =
    sequence(bandOf(s, w), bandOf(e, w))

  /** The repo's cap discipline for the explode side: an interval covering
    * more than `maxBands` bands (pathological length vs the chosen
    * `bandWidth` — at 15-min bands, 4096 ≈ 42 days — almost always a data
    * error, and the row that would OOM the generate) is DROPPED and
    * counted on a named observe metric, never silently amplified. The
    * frame must already carry `${p}s`/`${p}e`. */
  private def capBands(df: org.apache.spark.sql.DataFrame, p: String,
      w: Long, maxBands: Int): org.apache.spark.sql.DataFrame = {
    val nb = bandOf(col(s"${p}e"), w) - bandOf(col(s"${p}s"), w) + lit(1L)
    df.observe(s"interval_bands_guard_${guardSeq.incrementAndGet()}",
        coalesce(sum(when(nb > maxBands, 1L).otherwise(0L)), lit(0L))
          .as("dropped_intervals"),
        lit(maxBands).as("max_allowed"))
      .filter(nb <= maxBands)
  }

  /** Point-in-interval join: every `(interval, point)` pair with the
    * same key and `start <= pt <= end`, as `(iv_id, pt_id)` — payloads
    * join back by id at pair cardinality. A point has exactly ONE band,
    * so each qualifying pair surfaces from exactly one `(key, band)`
    * bucket: no dedup pass, no double counting. Intervals with
    * `end < start` are dropped (empty by definition).
    */
  def pointInInterval(
      points: DataFrame,
      ptId: Column,
      ptKey: Column,
      pt: Column,
      intervals: DataFrame,
      ivId: Column,
      ivKey: Column,
      ivStart: Column,
      ivEnd: Column,
      bandWidth: Long,
      maxBands: Int = 4096): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    require(maxBands > 0, s"maxBands must be positive, got $maxBands")
    val p = points.select(
      ptId.cast("long").as("__ij_pid"), ptKey.as("__ij_k"),
      pt.cast("long").as("__ij_t"),
      bandOf(pt.cast("long"), bandWidth).as("__ij_b"))
    val iv0 = intervals
      .select(ivId.cast("long").as("__ij_iid"), ivKey.as("__ij_ik"),
        ivStart.cast("long").as("__ij_s"), ivEnd.cast("long").as("__ij_e"))
      .filter(col("__ij_e") >= col("__ij_s"))
    val iv = capBands(iv0, "__ij_", bandWidth, maxBands)
      .select(col("__ij_iid"), col("__ij_ik"), col("__ij_s"), col("__ij_e"),
        explode(bandsOf(col("__ij_s"), col("__ij_e"), bandWidth)).as("__ij_b"))
    p.join(iv,
        p("__ij_k") === iv("__ij_ik") && p("__ij_b") === iv("__ij_b"))
      .filter(col("__ij_t") >= col("__ij_s") && col("__ij_t") <= col("__ij_e"))
      .select(col("__ij_iid").as("iv_id"), col("__ij_pid").as("pt_id"))
  }

  /** Interval-overlap join: every same-key `(left, right)` pair with
    * `max(starts) <= min(ends)`, as `(l_id, r_id)`. Both sides explode,
    * which would surface a pair once per SHARED band — the dedup is
    * avoided by the attribution trick: a pair is emitted only from the
    * band containing `greatest(l.start, r.start)`. That band lies inside
    * both intervals' ranges exactly when they overlap, and a value has
    * exactly one band, so each qualifying pair surfaces exactly once —
    * no distinct, no post-aggregation.
    */
  def intervalOverlap(
      left: DataFrame,
      lId: Column,
      lKey: Column,
      lStart: Column,
      lEnd: Column,
      right: DataFrame,
      rId: Column,
      rKey: Column,
      rStart: Column,
      rEnd: Column,
      bandWidth: Long,
      maxBands: Int = 4096): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    require(maxBands > 0, s"maxBands must be positive, got $maxBands")
    def side(df: DataFrame, id: Column, k: Column, s: Column, e: Column,
        p: String): DataFrame =
      capBands(
          df.select(id.cast("long").as(s"${p}id"), k.as(s"${p}k"),
              s.cast("long").as(s"${p}s"), e.cast("long").as(s"${p}e"))
            .filter(col(s"${p}e") >= col(s"${p}s")),
          p, bandWidth, maxBands)
        .select(col(s"${p}id"), col(s"${p}k"), col(s"${p}s"), col(s"${p}e"),
          explode(bandsOf(col(s"${p}s"), col(s"${p}e"), bandWidth))
            .as(s"${p}b"))
    val l = side(left, lId, lKey, lStart, lEnd, "__il_")
    val r = side(right, rId, rKey, rStart, rEnd, "__ir_")
    l.join(r,
        col("__il_k") === col("__ir_k") && col("__il_b") === col("__ir_b"))
      .filter(
        greatest(col("__il_s"), col("__ir_s")) <=
          least(col("__il_e"), col("__ir_e")) &&
        col("__il_b") ===
          bandOf(greatest(col("__il_s"), col("__ir_s")), bandWidth))
      .select(col("__il_id").as("l_id"), col("__ir_id").as("r_id"))
  }
}
