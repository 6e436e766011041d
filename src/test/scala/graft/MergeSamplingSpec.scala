package graft

import org.apache.spark.sql.functions._

import graft.operators.{Merge, Sampling}

class MergeSamplingSpec extends SparkSpec {

  private lazy val base = {
    import spark.implicits._
    Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)).toDF("id", "v", "ver")
  }

  test("upsert replaces matching keys and appends new ones") {
    import spark.implicits._
    val updates = Seq((2L, "B2", 2), (9L, "new", 2)).toDF("id", "v", "ver")
    val got = Merge.upsert(base, updates, "id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "new")))
  }

  test("delete removes keys; missing keys are no-ops") {
    import spark.implicits._
    val got = Merge.delete(base, Seq(2L, 99L).toDF("id"), "id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("latestByVersion: aggregate form equals window form, keeps max version") {
    import spark.implicits._
    val log = Seq(
      (1L, "v1", 1), (1L, "v3", 3), (1L, "v2", 2),
      (2L, "x1", 1), (3L, "y5", 5))
      .toDF("id", "v", "ver")
    val agg = Merge.latestByVersion(log, "id", "ver")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val win = Merge.latestByVersionWindow(log, "id", "ver")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(agg == Set((1L, "v3", 3), (2L, "x1", 1), (3L, "y5", 5)))
    assert(agg == win)
    // partial aggregation shape: max_by form must not plan a Window sort
    val plan = Merge.latestByVersion(log, "id", "ver")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window sort in:\n$plan")
  }

  test("hash splits are deterministic, disjoint-complete, and ~proportional") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val a = Sampling.md5Sample(docs, col("doc_id"), 4)
    val b = docs.exceptAll(a)
    assert(a.count() + b.count() == n)
    // deterministic: same rows on re-evaluation
    assert(a.collect().map(_.getLong(0)).toSet ==
      Sampling.md5Sample(docs, col("doc_id"), 4).collect().map(_.getLong(0)).toSet)
    val frac = a.count().toDouble / n
    assert(frac > 0.12 && frac < 0.38, s"4/16 split landed at $frac")
    // xxhash variant: keep/buckets proportionality
    val h = Sampling.hashSample(docs, col("doc_id"), keep = 30, buckets = 100).count()
    assert(h.toDouble / n > 0.18 && h.toDouble / n < 0.45)
    // stratified: every stratum is represented at roughly its keep rate
    val strata = Sampling.stratifiedHashSample(docs, col("doc_id"), col("lang"), 50)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, cnt) =>
      val kept = strata.getOrElse(lang, 0L).toDouble / cnt
      assert(kept > 0.2 && kept < 0.8, s"stratum $lang kept $kept")
    }
  }

  test("weightedMix keeps ~weight per source, drops unknown and zero-weight sources") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mixed = Sampling.weightedMix(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.5, "de" -> 1.0, "es" -> 0.0))
    val kept = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse("de", 0L) == full("de"), "weight 1.0 keeps everything")
    assert(!kept.contains("es"), "weight 0 drops the source")
    assert(!kept.contains("fr") && !kept.contains("zh"),
      "sources absent from the weight map are dropped")
    val enFrac = kept.getOrElse("en", 0L).toDouble / full("en")
    assert(enFrac > 0.3 && enFrac < 0.7, s"en kept $enFrac, want ~0.5")
    // deterministic across evaluations
    assert(mixed.count() == Sampling.weightedMix(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.5, "de" -> 1.0, "es" -> 0.0)).count())
  }

  test("balancedSample: exactly min(n, stratum size) per stratum, hash-deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.balancedSample(docs, col("doc_id"), col("lang"), n = 40)
    val perLang = got.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, cnt) =>
      assert(perLang(lang) == math.min(40L, cnt), s"$lang: ${perLang(lang)}")
    }
    // deterministic: identical id sets across evaluations
    val ids1 = got.collect().map(_.getLong(1)).toSet
    val ids2 = Sampling.balancedSample(docs, col("doc_id"), col("lang"), 40)
      .collect().map(_.getLong(1)).toSet
    assert(ids1 == ids2)
    // ranks within each stratum are 1..kept with no gaps
    val ranks = got.collect().map(r => (r.getString(0), r.getInt(2))).groupBy(_._1)
    ranks.foreach { case (lang, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq, s"$lang ranks")
    }
  }

  test("groupSplit: whole groups land in one split, fractions track over many groups") {
    import spark.implicits._
    // 400 groups × 3 rows — enough groups for the hash split to converge
    val rows = (0 until 1200).map(i => (i.toLong, s"grp${i % 400}"))
      .toDF("id", "grp")
    val got = Sampling.groupSplit(rows, col("grp"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // leakage-free: every group maps to exactly one split
    val perGroup = got.groupBy("grp").agg(countDistinct(col("split")).as("n"))
      .collect().map(_.getLong(1))
    assert(perGroup.forall(_ == 1L))
    // fractions realized at group granularity (loose: binomial over 400)
    val bySplit = got.select("grp", "split").distinct()
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == 400)
    assert(bySplit("train") > 280 && bySplit("train") < 360, s"$bySplit")
    assert(bySplit("val") > 15 && bySplit("val") < 70, s"$bySplit")
    // no shuffle: pure projection
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"groupSplit must not shuffle:\n$plan")
    // degenerate fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.groupSplit(rows, col("grp"), Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("temperatureMix: flattening favors small sources; τ=1 is the natural rate; clamp keeps all") {
    import spark.implicits._
    // source masses 9:1 (900 vs 100 unit-weight rows)
    val rows = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small"))).toDF("id", "src")
    def kept(tau: Double, budget: Double): Map[String, Long] =
      Sampling.temperatureMix(rows, col("id"), col("src"), lit(1L), tau, budget)
        .groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    // τ=1: rates equal across sources (budget/total) — natural distribution
    val nat = kept(1.0, 500.0)
    val rBig = nat("big") / 900.0
    val rSmall = nat("small") / 100.0
    assert(math.abs(rBig - rSmall) < 0.15, s"natural rates: $rBig vs $rSmall")
    // τ=0.5: the small source keeps a ~3× larger fraction (sqrt(9) flatten)
    val flat = kept(0.5, 500.0)
    val fBig = flat("big") / 900.0
    val fSmall = flat("small") / 100.0
    assert(fSmall > 2.0 * fBig, s"flattened rates: $fBig vs $fSmall")
    // budget >= total mass: every row survives (rate clamps at 1 → 'g')
    assert(kept(0.5, 10000.0).values.sum == 1000L)
    // deterministic across evaluations
    assert(kept(0.5, 500.0) == kept(0.5, 500.0))
  }

  test("epochReplicate: rate>1 replicates, rate<1 matches the temperatureMix filter") {
    import spark.implicits._
    // masses 9:1 → at τ=0.5, budget=1000: big rate 0.833 (filter),
    // small rate 2.5 (2 full epochs + 0.5 fractional)
    val rows = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small"))).toDF("id", "src")
    val got = Sampling.epochReplicate(rows, col("id"), col("src"), lit(1L),
      temperature = 0.5, budget = 1000.0)
    val perRow = got.groupBy("id", "src").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val big = perRow.filter(_._2 == "big")
    val small = perRow.filter(_._2 == "small")
    // big: kept rows appear exactly once (epoch 0 only)
    assert(big.forall(_._3 == 1L))
    assert(big.length > 680 && big.length < 820, s"big kept ${big.length}")
    // small: EVERY row appears, 2 or 3 times (2 full + fractional epoch)
    assert(small.length == 100)
    assert(small.forall(r => r._3 == 2L || r._3 == 3L))
    val smallCopies = small.map(_._3).sum
    assert(smallCopies > 215 && smallCopies < 285, s"small copies $smallCopies")
    // small full epochs are 0 and 1; the fractional epoch is 2
    val epochs = got.filter(col("src") === "small").groupBy("epoch").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(epochs(0L) == 100 && epochs(1L) == 100)
    assert(epochs(2L) > 15 && epochs(2L) < 85, s"$epochs")
    // rate<1 leg replays the clamped temperatureMix selection exactly
    val mixBig = Sampling.temperatureMix(rows, col("id"), col("src"), lit(1L),
      0.5, 1000.0).filter(col("src") === "big").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(big.map(_._1).toSet == mixBig)
    // corpus side never shuffle-joins: thresholds come by broadcast
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"epochReplicate must broadcast thresholds:\n$plan")
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe compare, one key join") {
    import spark.implicits._
    val old = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Some("d"), 40.0))
      .toDF("id", "v", "p")
    val neu = Seq(
      (1L, Some("a"), 10.0),              // unchanged
      (2L, Some("B"), 20.0),              // changed (v)
      (3L, None: Option[String], 30.0),   // unchanged (null <=> null)
      (5L, Some("e"), 50.0))              // added; 4 removed
      .toDF("id", "v", "p")
    val got = Merge.snapshotDiff(old, neu, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"))
    // null -> value flips to changed (null-safe, not null-poisoned)
    val neu2 = Seq((3L, Some("x"), 30.0)).toDF("id", "v", "p")
    val got2 = Merge.snapshotDiff(old.filter($"id" === 3L), neu2, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 == Map(3L -> "changed"))
    // one full-outer equi-join on the key is the whole plan
    val plan = Merge.snapshotDiff(old, neu, "id").queryExecution.executedPlan.toString
    assert("FullOuter".r.findAllIn(plan).nonEmpty, s"plan:\n$plan")
  }

  test("importanceResample: target-like docs outrank the rest; bounded-heap top-n plan") {
    import spark.implicits._
    // two disjoint vocabularies; the target exemplars use vocabulary B
    val aDocs = (1L to 40L).map(i => (i, s"alpha beta gamma delta epsilon tok$i"))
    val bDocs = (101L to 110L).map(i => (i, s"zink quark wurst brezel strudel tok$i"))
    val raw = (aDocs ++ bDocs).toDF("doc_id", "text")
    val target = Seq((900L, "zink quark wurst brezel strudel kraut"))
      .toDF("doc_id", "text")

    val got = Sampling.importanceResample(raw, target, col("doc_id"), col("text"), n = 10)
    val picked = got.collect().map(r => (r.getLong(0), r.getDouble(1)))
    // exactly the 10 vocabulary-B docs win (their grams are likelier
    // under the target distribution; absolute weights can still be
    // negative — Laplace smoothing over 4096 buckets dominates a
    // few-gram exemplar corpus)
    assert(picked.map(_._1).toSet == (101L to 110L).toSet, picked.mkString(","))
    // result comes back in rank order: weights descending, id tie-break
    assert(picked.map(_._2).toSeq == picked.map(_._2).sortBy(-_).toSeq)
    // weights are a pure function of content: identical text => identical
    // weight (the per-doc tok$i differs, so weights differ only via it)
    val rerun = Sampling.importanceResample(raw, target, col("doc_id"), col("text"), n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(picked.toSeq == rerun.toSeq)
    // selection is TakeOrderedAndProject (per-partition bounded heap +
    // O(n) driver merge), never a global Sort
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-n must plan as TakeOrderedAndProject:\n$plan")
  }

  test("importanceResample: single-token docs and equal-length ranking behave") {
    import spark.implicits._
    // equal token counts, so the raw log-likelihood-ratio sum (which is
    // length-sensitive by design — it is a whole-doc likelihood ratio)
    // ranks purely on vocabulary match
    val raw = Seq((1L, "solo"), (2L, "dup dup dup dup"), (3L, "aa bb cc dd"))
      .toDF("doc_id", "text")
    val target = Seq((9L, "dup dup")).toDF("doc_id", "text")
    val got = Sampling.importanceResample(raw, target, col("doc_id"), col("text"), n = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // single-token doc (no bigrams) scores without error; among the two
    // 4-token docs the target-vocabulary one ranks higher
    assert(got.length == 3)
    val byId = got.toMap
    assert(byId(2L) > byId(3L), got.mkString(","))
  }

  test("selectUnderBudget: greedy prefix selection equals a window-cumsum oracle") {
    import spark.implicits._
    // quantized scores with ties; weights chosen so the boundary value is
    // only partially kept
    val rows = Seq(
      (1L, 9.0, 30L), (2L, 9.0, 30L),          // q=9: 60 total
      (3L, 5.0, 25L), (4L, 5.0, 25L), (5L, 5.0, 25L), // q=5: 75 total
      (6L, 1.0, 10L))                           // q=1
      .toDF("id", "score", "toks")
    def run(b: Long) = Sampling.selectUnderBudget(
        rows, col("id"), col("score"), col("toks"), b)
      .collect().map(_.getLong(0)).toSet
    // 110: q=9 whole (60), then q=5 rows by id until 50 spent -> ids 3,4
    assert(run(110L) == Set(1L, 2L, 3L, 4L))
    // exact fit keeps the full boundary value, then continues below
    assert(run(135L) == Set(1L, 2L, 3L, 4L, 5L))
    assert(run(145L) == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // budget below the first row -> empty
    assert(run(20L) == Set.empty[Long])
    // window-cumsum oracle on a randomized corpus
    val rng = new scala.util.Random(7)
    val rand = (1L to 300L).map(i =>
      (i, rng.nextInt(20).toDouble, (rng.nextInt(40) + 1).toLong))
    val randDf = rand.toDF("id", "score", "toks")
    val budget = 1500L
    val got = Sampling.selectUnderBudget(
        randDf, col("id"), col("score"), col("toks"), budget)
      .collect().map(_.getLong(0)).toSet
    val expected = rand.sortBy { case (i, q, _) => (-q, i) }
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (i, _, w)) => (i, w, cum + w) }
      .drop(1).takeWhile(_._3 <= budget).map(_._1).toSet
    assert(got == expected)
  }

  test("waterfillAllocation: hand-computed waterline, caps, and edge budgets") {
    import spark.implicits._
    val docs = Seq(
      ("a", 10L), ("b", 20L), ("c", 30L), ("d", 100L)
    ).flatMap { case (s, w) => Seq((s, w)) }.toDF("src", "w")
    def run(b: Long) = Sampling.waterfillAllocation(
        docs, col("src"), col("w"), b)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getBoolean(3), Option(r.get(4))))).toMap
    // budget 90: a,b,c fully served (10+20+30=60), d capped at 30
    val g90 = run(90L)
    assert(g90("a") == ((10.0, false, Some(30.0))))
    assert(g90("c") == ((30.0, false, Some(30.0))))
    assert(g90("d") == ((30.0, true, Some(30.0))))
    assert(g90.values.map(_._1).sum == 90.0)
    // budget covers the total: everyone full, no waterline
    val gAll = run(200L)
    assert(gAll.values.forall { case (_, sat, wl) => !sat && wl.isEmpty })
    assert(gAll("d")._1 == 100.0)
    // zero budget: waterline 0, everyone saturated
    val g0 = run(0L)
    assert(g0.values.forall { case (al, sat, wl) =>
      al == 0.0 && sat && wl.contains(0.0) })
  }

  test("stratifiedExactSample: Hamilton allocation, exact total, determinism") {
    import spark.implicits._
    // groups: a=5, b=3, c=2 rows; S=6 -> quotas 3.0/1.8/1.2 ->
    // base 3/1/1, leftover 1 goes to b (largest remainder 8/10)
    val df = ((1 to 5).map(i => (i.toLong, "a")) ++
      (6 to 8).map(i => (i.toLong, "b")) ++
      (9 to 10).map(i => (i.toLong, "c"))).toDF("id", "g")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedExactSample(d, col("id"), col("g"), 6L)
        .as[(Long, String)].collect().toSet
    val got = run(df)
    val byGroup = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byGroup == Map("a" -> 3, "b" -> 2, "c" -> 1))
    assert(got.size == 6)
    // pure function of keys: any partitioning selects the same rows
    assert(run(df.repartition(7)) == got)
    // degenerate budgets
    assert(Sampling.stratifiedExactSample(df, col("id"), col("g"), 0L)
      .count() == 0L)
    assert(Sampling.stratifiedExactSample(df, col("id"), col("g"), 10L)
      .count() == 10L)
  }

  test("waterfillAllocation: fractional waterline splits remaining budget") {
    import spark.implicits._
    val docs = Seq(("a", 3L), ("b", 7L), ("c", 7L)).toDF("src", "w")
    // budget 10: a full (3), waterline (10-3)/2 = 3.5 for b and c
    val got = Sampling.waterfillAllocation(docs, col("src"), col("w"), 10L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("a" -> 3.0, "b" -> 3.5, "c" -> 3.5))
  }
}
