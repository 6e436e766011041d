package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of picks the most recent right row at-or-before") {
    val trades = Seq(
      (1L, 100L, "t1"),
      (1L, 205L, "t2"),
      (2L, 50L, "t3")
    ).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 90L, 10L, 1.0),
      (1L, 100L, 11L, 2.0), // equal-ts: inclusive, wins for t1
      (1L, 200L, 12L, 3.0),
      (2L, 60L, 13L, 9.0)   // after t3: no match for k=2
    ).toDF("k", "ts", "qid", "px")

    val out = AsOfJoin.backward(trades, quotes, "k", "ts", "ts", "qid",
        Seq("qid", "px"))
      .select($"trade", $"asof.qid".as("qid"), $"asof.px".as("px"))
      .collect().map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2)))))
      .toMap

    assert(out("t1") == (Some(11L), Some(2.0)))
    assert(out("t2") == (Some(12L), Some(3.0)))
    assert(out("t3") == (None, None))
  }

  test("forward as-of picks the earliest right row at-or-after") {
    val trades = Seq(
      (1L, 100L, "t1"),
      (1L, 205L, "t2"),
      (2L, 70L, "t3")
    ).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 100L, 11L, 2.0), // equal-ts: inclusive, wins for t1
      (1L, 200L, 12L, 3.0), // before t2: no match for t2
      (1L, 90L, 10L, 1.0),
      (2L, 60L, 13L, 9.0)   // before t3: no match for k=2
    ).toDF("k", "ts", "qid", "px")

    val out = AsOfJoin.forward(trades, quotes, "k", "ts", "ts", "qid",
        Seq("qid", "px"))
      .select($"trade", $"asof.qid".as("qid"), $"asof.px".as("px"))
      .collect().map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2)))))
      .toMap

    assert(out("t1") == (Some(11L), Some(2.0)))
    assert(out("t2") == (None, None))
    assert(out("t3") == (None, None))
  }

  test("forward equal-timestamp right rows: smallest tiebreaker id wins") {
    val l = Seq((1L, 100L, "x")).toDF("k", "ts", "name")
    val r = Seq((1L, 100L, 7L, "a"), (1L, 100L, 1L, "b"), (1L, 100L, 3L, "c"))
      .toDF("k", "ts", "rid", "v")
    val got = AsOfJoin.forward(l, r, "k", "ts", "ts", "rid", Seq("rid", "v"))
      .select($"asof.rid", $"asof.v").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "b")))
  }

  test("equal-timestamp right rows: greatest tiebreaker id wins") {
    val l = Seq((1L, 100L, "x")).toDF("k", "ts", "name")
    val r = Seq((1L, 100L, 1L, "a"), (1L, 100L, 7L, "b"), (1L, 100L, 3L, "c"))
      .toDF("k", "ts", "rid", "v")
    val got = AsOfJoin.backward(l, r, "k", "ts", "ts", "rid", Seq("rid", "v"))
      .select($"asof.rid", $"asof.v").as[(Long, String)].collect()
    assert(got.toSeq == Seq((7L, "b")))
  }

  test("one shuffle on the key: single Exchange below the window") {
    val l = Seq((1L, 100L, "x")).toDF("k", "ts", "name")
    val r = Seq((1L, 90L, 1L, "a")).toDF("k", "ts", "rid", "v")
    val plan = AsOfJoin.backward(l, r, "k", "ts", "ts", "rid", Seq("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one key shuffle, plan:\n$plan")
  }

  test("matches a per-row lookup oracle on events-shaped data") {
    // normalize ts to (timestamp, long nanos) whatever the file's
    // physical type (same as the SparkEntry events helper)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.sources.Events.normalize(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts_ns".as("click_ns"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts_ns")

    val got = AsOfJoin.backward(purchases, clicks, "user_id", "ts_ns",
        "click_ns", "click_id", Seq("click_id"))
      .select($"purchase_id", $"asof.click_id".as("click_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    val cs = clicks.collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
    val expected = purchases.collect().map { p =>
      val (uid, ts) = (p.getLong(1), p.getLong(2))
      val best = cs.filter(c => c._1 == uid && c._2 <= ts)
        .sortBy(c => (-c._2, -c._3)).headOption.map(_._3)
      p.getLong(0) -> best
    }.toMap
    assert(got == expected)
  }

  test("a left frame already carrying 'asof' is rejected, not silently duplicated") {
    val l = Seq((1L, 100L, "pre-existing")).toDF("k", "ts", "asof")
    val r = Seq((1L, 90L, 1L, "a")).toDF("k", "ts", "rid", "v")
    val eb = intercept[IllegalArgumentException](
      AsOfJoin.backward(l, r, "k", "ts", "ts", "rid", Seq("v")))
    assert(eb.getMessage.contains("asof"))
    val ef = intercept[IllegalArgumentException](
      AsOfJoin.forward(l, r, "k", "ts", "ts", "rid", Seq("v")))
    assert(ef.getMessage.contains("asof"))
    // internal names are prefixed: a user column named like the old
    // internals (_k/_ts/...) must pass through untouched
    val lOdd = Seq((1L, 100L, "x")).toDF("k", "ts", "_k")
    val out = AsOfJoin.backward(lOdd, r, "k", "ts", "ts", "rid", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "ts", "_k", "asof"))
    assert(out.head().getString(2) == "x")
  }
}
