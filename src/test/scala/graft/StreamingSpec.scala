package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{RawEvent, SessionOut}

class StreamingSpec extends SparkSpec {

  test("streaming hourly counts equal the batch plan on sf0.001 events") {
    val streamed = StreamingOps.hourlyEventCountsStreaming(
      spark, "/root/testdata/sf0.001/{events}.parquet")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = graft.sources.Events.normalize(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"), col("event_type"),
        col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming hourly drift equals the batch plan on sf0.001 events") {
    val streamed = StreamingOps.hourlyDriftStreaming(
      spark, "/root/testdata/sf0.001/{events}.parquet")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = graft.operators.Profiling.hourlyCategoryDrift(
        graft.sources.Events.normalize(
          spark.read.parquet("/root/testdata/sf0.001/events.parquet")),
        col("ts"), col("event_type"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // every emitted hour matches the batch value exactly; only the
    // trailing hours inside the 2h watermark horizon may still be open
    // when the bounded replay ends (that is the live-stream semantic)
    assert(streamed.nonEmpty)
    streamed.foreach { case (h, tv) =>
      assert(batch.get(h).contains(tv), s"hour $h: streamed $tv vs batch ${batch.get(h)}")
    }
    val missing = batch.keySet -- streamed.keySet
    assert(missing.size <= 3,
      s"stream must cover all but the watermark-open tail, missing: $missing")
  }

  test("sessionizeStream: state carries across micro-batches, sessions close on gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val minutes = 60L * 1000000000L

    val q = StreamingOps.sessionizeStream(mem.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 two events 5 min apart (one open session)
      mem.addData(
        RawEvent(1, 0 * minutes, 1, "a", 0.0),
        RawEvent(2, 5 * minutes, 1, "a", 0.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // session still open

      // batch 2: 40-min gap closes session 1; new session opens
      mem.addData(RawEvent(3, 45 * minutes, 1, "a", 0.0))
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[SessionOut].collect()
      assert(closed.length == 1)
      assert(closed(0) == SessionOut(1, 0, 5 * minutes, 2))

      // batch 3: different user, immediate gap-close of two single events
      mem.addData(
        RawEvent(4, 0 * minutes, 2, "b", 0.0),
        RawEvent(5, 100 * minutes, 2, "b", 0.0))
      q.processAllAvailable()
      val all = spark.table("sess_out").as[SessionOut].collect()
      assert(all.length == 2)
      assert(all.exists(s => s.user_id == 2 && s.n_events == 1))
    } finally q.stop()
  }

  test("dedupStream drops duplicate keys across micro-batches within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RawEvent]
    val hour = 3600L * 1000000000L
    val deduped = StreamingOps.dedupStream(
      mem.toDS().toDF().withColumn("ts",
        expr("timestamp_micros(ts_ns div 1000)")),
      keyCols = Seq("event_id"), eventTimeCol = "ts", watermark = "2 hours")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        RawEvent(1, 1 * hour, 1, "a", 0.0),
        RawEvent(1, 1 * hour, 1, "a", 0.0), // dup within batch
        RawEvent(2, 1 * hour, 1, "a", 0.0))
      q.processAllAvailable()
      mem.addData(RawEvent(2, 2 * hour, 1, "a", 0.0)) // dup across batches
      mem.addData(RawEvent(3, 2 * hour, 1, "a", 0.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("watermark timeout closes idle sessions without new events from that user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.StampedEvent]
    // offset from epoch: an event AT the initial (epoch) watermark is late
    def ev(id: Long, uid: Long, minute: Long) = {
      val sec = 86400L + minute * 60L
      StreamingOps.StampedEvent(id, uid, new java.sql.Timestamp(sec * 1000L), sec * 1000000000L)
    }

    val q = StreamingOps.sessionizeStreamWithTimeout(
      mem.toDS().withWatermark("ts", "10 minutes").as[StreamingOps.StampedEvent])
      .writeStream.format("memory").queryName("sess_to")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events close together; session stays open
      mem.addData(ev(1, 1, 0), ev(2, 1, 5))
      q.processAllAvailable()
      assert(spark.table("sess_to").count() == 0)
      // OTHER user's much-later event advances the watermark past
      // user 1's last + 30min gap → user 1's session closes on timeout
      mem.addData(ev(3, 2, 120))
      q.processAllAvailable()
      mem.addData(ev(4, 2, 121)) // one more batch so timeouts fire post-watermark
      q.processAllAvailable()
      val out = spark.table("sess_to").as[StreamingOps.SessionOut].collect()
      assert(out.exists(s => s.user_id == 1 && s.n_events == 2),
        s"expected user 1 session closed by watermark, got ${out.mkString(",")}")
    } finally q.stop()
  }

  test("an event gap-behind the watermark cannot fail the query (late-row drop + timeout clamp)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.StampedEvent]
    def ev(id: Long, uid: Long, minute: Long) = {
      val sec = 86400L + minute * 60L
      StreamingOps.StampedEvent(id, uid, new java.sql.Timestamp(sec * 1000L), sec * 1000000000L)
    }
    val q = StreamingOps.sessionizeStreamWithTimeout(
      mem.toDS().withWatermark("ts", "10 minutes").as[StreamingOps.StampedEvent])
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append).start()
    try {
      // advance the watermark to ~minute 110 with user 2
      mem.addData(ev(1, 2, 120))
      q.processAllAvailable()
      // user 3 arrives ONLY with an event from minute 0 — far gap-behind
      // the watermark. On this Spark version the exec drops the late row
      // before the state function (verified: no session ever forms); the
      // setTimeoutTimestamp clamp to watermark+1 is the second line of
      // defense for paths/versions where a late row DOES reach the
      // function and last+gap would land before the watermark (Spark
      // rejects such a timeout by failing the whole query).
      mem.addData(ev(2, 3, 0))
      q.processAllAvailable()
      mem.addData(ev(3, 2, 121))
      q.processAllAvailable()
      mem.addData(ev(4, 2, 122))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query failed: ${q.exception}")
      val out = spark.table("sess_late").as[StreamingOps.SessionOut].collect()
      assert(!out.exists(_.user_id == 3),
        s"the late row must have been dropped, got ${out.mkString(",")}")
    } finally q.stop()
  }

  test("stream-stream interval join: purchases attributed to in-horizon clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[StreamingOps.StampedEvent]
    val purchases = MemoryStream[StreamingOps.StampedEvent]
    def ev(id: Long, uid: Long, minute: Long) = {
      val sec = 86400L + minute * 60L
      StreamingOps.StampedEvent(id, uid, new java.sql.Timestamp(sec * 1000L), sec * 1000000000L)
    }
    val joined = StreamingOps.clickAttributionStream(
      clicks.toDS().toDF(), purchases.toDS().toDF(),
      horizon = "1 hour", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(ev(101, 1, 0), ev(102, 1, 30), ev(103, 2, 35))
      purchases.addData(ev(201, 1, 40))
      q.processAllAvailable()
      clicks.addData(ev(104, 1, 50)) // after the purchase → must not match
      purchases.addData(ev(202, 2, 200)) // user 2's click is out of horizon
      q.processAllAvailable()
      val got = spark.table("attr_out").select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((201L, 101L), (201L, 102L)))
    } finally q.stop()
  }

  test("foreachBatch + Merge.upsert maintains a dataset from a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // base snapshot
    var state = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val in = MemoryStream[(Long, String)]
    val q = in.toDS().toDF("id", "v").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // latest-wins within the micro-batch, then upsert into the snapshot
        val compacted = graft.operators.Merge.latestByVersion(
          batch.withColumn("ver", monotonically_increasing_id()), "id", "ver")
          .drop("ver")
        state = graft.operators.Merge.upsert(state, compacted, "id")
          .localCheckpoint() // cut lineage growth across micro-batches
      }
      .start()
    try {
      in.addData((2L, "B2"), (3L, "c"))
      q.processAllAvailable()
      in.addData((3L, "C3"), (4L, "d"))
      q.processAllAvailable()
      val got = state.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "B2"), (3L, "C3"), (4L, "d")))
    } finally q.stop()
  }

  test("streaming ingest appends into the disk IVF layout; searchable without rebuild") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch-train a tiny layout, persist it to disk
    val base = Seq(
      (10L, Array(1.0, 0.0, 0.0, 0.0)),
      (11L, Array(0.9, 0.1, 0.0, 0.0)),
      (12L, Array(0.0, 1.0, 0.0, 0.0)),
      (13L, Array(0.0, 0.9, 0.1, 0.0))).toDF("nid", "nvec")
    val idx = graft.operators.IvfIndex.buildTrained(base, nlist = 2, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ivf-").toString
    val disk = idx.save(spark, dir)
    idx.unpersist()
    // stream vectors in: each micro-batch is ONE map stage appended under
    // the existing cell=<id> partitions — never a corpus reshuffle
    val in = MemoryStream[(Long, Array[Double])]
    val q = in.toDS().toDF("nid", "nvec").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        disk.append(batch)
      }
      .start()
    try {
      in.addData((100L, Array(0.95, 0.05, 0.0, 0.0)))
      q.processAllAvailable()
      in.addData((101L, Array(0.05, 0.95, 0.0, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    // reopen the layout cold: appended vectors surface with no rebuild
    val reopened = graft.operators.IvfIndex.load(spark, dir)
    val got = reopened.search(
      Seq((1L, Array(1.0, 0.0, 0.0, 0.0))).toDF("qid", "qvec"), k = 3, nprobe = 2)
      .orderBy("rnk").collect().map(r => r.getLong(1)).toSeq
    // cosine against [1,0,0,0]: 10 = 1.0, appended 100 ≈ 0.9987, 11 ≈ 0.9939
    assert(got == Seq(10L, 100L, 11L))
  }

  test("streaming ingest: per-batch admission against the disk dedup index, appends gate later batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val existing = Seq(
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (4L, "spark query engines love columnar parquet scans with pushdown filters")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dedup-").toString
    graft.operators.DedupIndex.save(existing, col("doc_id"), col("text"), dir,
      threshold = 0.5)
    val idx = graft.operators.DedupIndex.open(spark, dir)

    var decisions = Map.empty[Long, (Long, Boolean)]
    val in = MemoryStream[(Long, String)]
    val q = in.toDS().toDF("doc_id", "text").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        decisions ++= graft.streaming.StreamingOps
          .dedupIngestBatch(idx, batch, col("doc_id"), col("text"))
          .collect()
          .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(2))))
      }
      .start()
    try {
      // batch 1: near-dup of stored corpus rejected; novel doc admitted+appended
      in.addData(
        (11L, "the quick brown fox jumps over the lazy dog near the river bend"),
        (13L, "watermarks bound streaming state across session gaps and late events"))
      q.processAllAvailable()
      assert(decisions(11L) == ((2L, false)), s"11: ${decisions(11L)}")
      assert(decisions(13L) == ((-1L, true)), s"13: ${decisions(13L)}")
      // batch 2: near-dup of the doc ADMITTED in batch 1 must now be
      // rejected — proves the append feeds subsequent admissions
      in.addData(
        (21L, "watermarks bound streaming state across session gaps and late arrival"),
        (23L, "a wholly unrelated document about broadcast joins and bloom filters"))
      q.processAllAvailable()
      assert(decisions(21L) == ((13L, false)), s"21: ${decisions(21L)}")
      assert(decisions(23L) == ((-1L, true)), s"23: ${decisions(23L)}")
    } finally q.stop()
    // the index on disk now holds both corpora: a cold reopen sees them
    val cold = graft.operators.DedupIndex.open(spark, dir)
    val replay = cold.admit(
      Seq((31L, "watermarks bound streaming state across session gaps and late events"))
        .toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replay(31L) == 13L, s"cold reopen missed appended doc: $replay")
  }

  test("nearDupGateStream admits firsts, drops near-dups across batches, evicts on TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.SketchedDoc]
    def doc(id: Long, sim: Long, minute: Long) =
      StreamingOps.SketchedDoc(id, sim, new java.sql.Timestamp(86400000L + minute * 60000L))
    // same top-16-bit bucket, near (1 bit apart) vs far (8 bits apart)
    val base = 0x1234500000000000L
    val near = base ^ 1L
    val far = base ^ 0xFFL
    val otherBucket = 0x7777000000000000L

    val q = StreamingOps.nearDupGateStream(
      mem.toDS().withWatermark("ts", "10 minutes"),
      prefixBits = 16, maxDist = 3, ttlMs = 30L * 60000L)
      .writeStream.format("memory").queryName("gate_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: first doc admitted; in-batch near-dup dropped; far admitted
      mem.addData(doc(1, base, 0), doc(2, near, 1), doc(3, far, 2))
      q.processAllAvailable()
      assert(spark.table("gate_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
      // batch 2: near-dup ACROSS batches dropped; other bucket admitted
      mem.addData(doc(4, near, 3), doc(5, otherBucket, 3))
      q.processAllAvailable()
      assert(spark.table("gate_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
      // advance the watermark far past ttl: bucket state evicts, so the
      // same sketch is admitted again
      mem.addData(doc(6, otherBucket ^ 0xFF00L, 120))
      q.processAllAvailable()
      mem.addData(doc(7, near, 119))
      q.processAllAvailable()
      assert(spark.table("gate_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L, 6L, 7L),
        "post-TTL sketch must be re-admitted")
      // HOT-bucket prune: doc 6 kept the otherBucket alive past doc 5's
      // TTL, so doc 5's sketch must have been pruned on update (not by
      // whole-bucket timeout) — its near-dup is admitted while doc 6's
      // own sketch (9 bits away) doesn't block it
      mem.addData(doc(8, otherBucket ^ 1L, 121))
      q.processAllAvailable()
      assert(spark.table("gate_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L, 6L, 7L, 8L),
        "aged-out sketch in a live bucket must not block admission")
    } finally q.stop()
  }

  test("chunking runs unchanged as a stateless streaming stage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    // the batch operator IS the streaming operator: a stateless
    // Project+Generate stage needs no watermark and no state store
    val chunks = graft.operators.Chunking.chunkByChars(
      in.toDS().toDF("doc_id", "text"), col("doc_id"), col("text"),
      chunkSize = 4, overlap = 2)
    val q = chunks.writeStream.format("memory").queryName("chunks_sink")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, "abcdefghij"))
      q.processAllAvailable()
      val got = spark.table("chunks_sink").orderBy("chunk_idx")
        .collect().map(_.getString(3)).toSeq
      assert(got == Seq("abcd", "cdef", "efgh", "ghij", "ij"))
    } finally q.stop()
  }

  test("frozen-LM quality gate scores an ingest stream statelessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // freeze a model on a reference corpus
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "mat on cat the sat zz")).toDF("id", "t")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-lm-").toString
    graft.operators.LmIndex.save(ref, col("id"), col("t"), dir)
    val idx = graft.operators.LmIndex.open(spark, dir)
    // stream a batch through the stateless scorer (per-row HOF average:
    // no explode+groupBy, so no state store and no watermark needed)
    val in = MemoryStream[(Long, String)]
    val q = idx.scoreStream(in.toDS().toDF("id", "t"), col("id"), col("t"))
      .writeStream.format("memory").queryName("lm_sink")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((10L, "the cat sat on the mat"), (11L, "qq ww ee"), (12L, "solo"))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "scoreStream must run without a stateful operator")
      val streamed = spark.table("lm_sink")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      // identical rows to the batch path under the same frozen model
      val batch = idx.score(
          Seq((10L, "the cat sat on the mat"), (11L, "qq ww ee"), (12L, "solo"))
            .toDF("id", "t"), col("id"), col("t"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(streamed == batch, s"$streamed\nvs\n$batch")
      assert(streamed.contains(10L) && streamed.contains(11L) && !streamed.contains(12L))
      // fluent in-vocabulary text outscores the unseen-vocabulary doc
      assert(streamed(10L)._2 > streamed(11L)._2)
    } finally q.stop()
  }

  test("frozen tokenizer encodes an ingest stream statelessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // freeze a merge table on a reference corpus
    val ref = Seq(
      (1L, "low low low lower newest"),
      (2L, "newest newest widest low")).toDF("id", "t")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-bpe-").toString
    graft.operators.TokenizerIndex.save(ref, col("t"), dir,
      numMerges = 6, capWords = 100)
    val tok = graft.operators.TokenizerIndex.open(spark, dir)
    // encodeDocs is a pure projection chain — no shuffle, no state store,
    // no watermark: the ingest-time token-accounting gate at scan speed
    val in = MemoryStream[(Long, String)]
    val q = tok.encodeDocs(in.toDS().toDF("id", "t"), col("id"), col("t"))
      .writeStream.format("memory").queryName("bpe_sink")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((10L, "low lower lowest"), (11L, "unseen words here"))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "encodeDocs must run without a stateful operator")
      val streamed = spark.table("bpe_sink")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      val batch = tok.encodeDocs(
          Seq((10L, "low lower lowest"), (11L, "unseen words here"))
            .toDF("id", "t"), col("id"), col("t"))
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(streamed == batch, s"$streamed\nvs\n$batch")
      // in-vocabulary words compress below character count
      assert(streamed(10L)._1 < streamed(10L)._2)
    } finally q.stop()
  }

  test("banded interval join attributes a live point stream to static windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // frozen incident windows (static side) — live points (stream side):
    // the banded plan is a plain stream-static equi-join, so attribution
    // runs stateless at ingest, no watermark, no state store
    val windows = Seq(
      (100L, "u1", 0L, 25L),
      (200L, "u1", 40L, 60L),
      (300L, "u2", 0L, 99L)).toDF("iid", "k", "s", "e")
    val in = MemoryStream[(Long, String, Long)]
    val joined = graft.operators.IntervalJoin.pointInInterval(
      in.toDS().toDF("pid", "k", "t"), col("pid"), col("k"), col("t"),
      windows, col("iid"), col("k"), col("s"), col("e"), bandWidth = 10L)
    val q = joined.writeStream.format("memory").queryName("ij_sink")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, "u1", 10L), (2L, "u1", 30L), (3L, "u2", 50L))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static banded join must be stateless")
      val got = spark.table("ij_sink").as[(Long, Long)].collect().toSet
      // 10 in [0,25]; 30 in no u1 window; 50 in u2's [0,99]
      assert(got == Set((100L, 1L), (300L, 3L)))
      // a later micro-batch joins against the same frozen windows
      in.addData((4L, "u1", 41L))
      q.processAllAvailable()
      val got2 = spark.table("ij_sink").as[(Long, Long)].collect().toSet
      assert(got2 == Set((100L, 1L), (300L, 3L), (200L, 4L)))
    } finally q.stop()
  }

  test("frozen robust-outlier gate scores a stream statelessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // reference-window stats frozen batch-side: med=10, mad=2 for key A
    val stats = Seq(("A", 10.0, 2.0), ("B", 0.0, 1.0)).toDF("key", "med", "mad")
    val in = MemoryStream[(String, Double)]
    val gated = graft.streaming.StreamingOps.robustOutlierGateStream(
      in.toDS().toDF("k", "v"), stats, col("k"), col("v"))
    val q = gated.writeStream.format("memory").queryName("ro_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // |0.6745*(v-10)/2| > 3.5  <=>  |v-10| > 10.378...
      in.addData(("A", 10.5), ("A", 30.0), ("B", -6.0))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static gate must be stateless")
      val got = spark.table("ro_sink")
        .select("k", "v", "is_outlier")
        .as[(String, Double, Boolean)].collect().toSet
      assert(got == Set(("A", 10.5, false), ("A", 30.0, true),
        ("B", -6.0, true)))
      // identical to the batch path under the same frozen stats
      val batch = graft.streaming.StreamingOps.robustOutlierGateStream(
          Seq(("A", 10.5), ("A", 30.0), ("B", -6.0)).toDF("k", "v"),
          stats, col("k"), col("v"))
        .select("k", "v", "is_outlier")
        .as[(String, Double, Boolean)].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming chunk ingest: later batches dedup against earlier appends") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-chunks-").toString
    graft.operators.ChunkStore.save(
      Seq(Tuple1("seed corpus content for the store baseline")).toDF("t"),
      col("t"), dir, window = 8, divisor = 32)
    val store = graft.operators.ChunkStore.open(spark, dir)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val in = MemoryStream[(Long, String)]
    val q = in.toDS().toDF("id", "t").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.chunkIngestBatch(store, batch, col("id"), col("t"))
          .collect().foreach(r => seen.synchronized {
            seen += ((r.getLong(0), r.getLong(2), r.getLong(4)))
          })
      }
      .start()
    try {
      val page = "a brand new page with chunks the store has never seen before"
      in.addData((1L, page))
      q.processAllAvailable()
      in.addData((2L, page)) // verbatim re-crawl in the NEXT batch
      q.processAllAvailable()
      val byId = seen.toSeq.map(t => t._1 -> ((t._2, t._3))).toMap
      // batch 1: new chunks appended; batch 2: the same page is all-dup
      assert(byId(1L)._1 > 0L, s"first sight must price as new: $byId")
      assert(byId(2L)._1 == 0L && byId(2L)._2 == page.length.toLong,
        s"re-crawl must dedup against the appended chunks: $byId")
    } finally q.stop()
  }

  test("typed sessionization matches the window/lag SQL formulation") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.sources.Events.normalize(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val typed = StreamingOps.sessionCountsTyped(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_ns").asc, col("event_id").asc)
    val sql = events
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > 1800L * 1000000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("brk")).as("n_sessions"), count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(typed == sql && typed.nonEmpty)
  }

  test("deglob unwraps single-alternative braces only") {
    // single-alternative braces exist solely to make readStream accept a
    // one-file source; a real alternation glob must reach the batch
    // reader intact
    assert(graft.sources.Events.deglob("dir/{events}.parquet") == "dir/events.parquet")
    assert(graft.sources.Events.deglob("dir/{a,b}.parquet") == "dir/{a,b}.parquet")
    assert(graft.sources.Events.deglob("d/{x}/{y,z}/{w}.pq") == "d/x/{y,z}/w.pq")
  }
}
