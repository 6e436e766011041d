package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Round-2 selection guarantees: every search path selects via the
  * bounded-heap aggregate (no Window/Sort of the scored stream in any
  * physical plan), per-row `top_k` is honored, the sparse struct surface
  * searches end-to-end, and the cosine near-dup block guard holds.
  */
class SearchSelectionSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private def cands = emb.filter(col("vec_id") >= 5)
    .select(col("vec_id").as("nid"), col("embedding").as("nvec"))

  private def assertNoWindowSort(df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"Window survives in plan:\n$plan")
    assert(!plan.contains("row_number"), s"row_number survives in plan:\n$plan")
  }

  test("all four IVF search paths select by heap: no Window in any physical plan") {
    assertNoWindowSort(Similarity.ivfTopK(queries, cands, k = 5))
    assertNoWindowSort(Similarity.ivfTopKMultiProbe(queries, cands, k = 5))
    val idx = graft.operators.IvfIndex.build(cands)
    try assertNoWindowSort(idx.search(queries, k = 5))
    finally idx.unpersist()
    val trained = graft.operators.IvfIndex.buildTrained(cands, nlist = 4, iters = 2)
    try assertNoWindowSort(trained.search(queries, k = 5, nprobe = 2))
    finally trained.unpersist()
  }

  test("heap-selected IVF equals the Window cross-check formulation") {
    import org.apache.spark.sql.expressions.Window
    // reference formulation: same cell pruning, Window selection
    def cellOf(vec: String) =
      (0 until 4).map { i =>
        when(element_at(col(vec), i + 1) >= 0, 1 << i).otherwise(0)
      }.reduce(_ + _)
    val q = queries.select(col("qid"), col("qvec").cast("array<double>").as("qv"))
      .withColumn("cell", cellOf("qv"))
    val c = cands.select(col("nid"), col("nvec").cast("array<double>").as("v"))
      .withColumn("cell", cellOf("v"))
    val w = Window.partitionBy("qid").orderBy(col("score_raw").desc, col("nid").asc)
    val viaWindow = c.join(q, "cell")
      .withColumn("score_raw",
        graft.functions.GraftFunctions.vecCosine(col("qv"), col("v")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("nid"), round(col("score_raw"), 4).as("score"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val viaHeap = Similarity.ivfTopK(queries, cands, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaHeap == viaWindow)
  }

  test("per-row top_k: each query gets exactly its own k rows") {
    val qs = emb.filter(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .withColumn("filter", lit(null).cast("string")) // match-all
      .withColumn("top_k", (col("qid") % 3 + 1).cast("int")) // 1, 2 or 3
    val cmeta = cands.withColumn("metadata", lit("""{}"""))
    val out = Similarity.filteredTopKPerQuery(qs, cmeta)
      .groupBy("qid").agg(count(lit(1)).as("n"), max("rnk").as("max_rnk"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    out.foreach { case (qid, (n, maxRnk)) =>
      val expected = (qid % 3 + 1).toInt
      assert(n == expected && maxRnk == expected,
        s"qid=$qid expected $expected rows, got $n (max rnk $maxRnk)")
    }
  }

  test("sparse struct top-k scores only index-overlapping pairs, ranks correctly") {
    import spark.implicits._
    // hand-built sparse vectors with known dot products
    val qs = Seq(
      (0L, Array(1L, 3L, 5L), Array(1.0f, 2.0f, 3.0f), 2)
    ).toDF("qid", "indices", "values", "top_k")
      .select(col("qid"),
        struct(col("indices"), col("values")).as("sparse_vector"), col("top_k"))
    val cs = Seq(
      (10L, Array(1L, 5L), Array(1.0f, 1.0f)),   // dot = 1 + 3 = 4
      (11L, Array(3L), Array(10.0f)),            // dot = 20
      (12L, Array(2L, 4L), Array(9.0f, 9.0f)),   // no overlap → dropped
      (13L, Array(5L), Array(0.5f))              // dot = 1.5
    ).toDF("nid", "indices", "values")
      .select(col("nid"),
        struct(col("indices"), col("values")).as("sparse_values"))
    val out = Similarity.sparseTopKPerQuery(qs, cs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.toSeq.sortBy(_._4) == Seq(
      (0L, 11L, 20.0, 1), (0L, 10L, 4.0, 2))) // top_k=2 trims 13L
  }

  test("sparse top-k plans a posting-list equi-join and matches the merge-join cross-check") {
    import org.apache.spark.sql.expressions.Window
    def sparse(of: org.apache.spark.sql.Column) = struct(
      transform(
        filter(sequence(lit(0), size(of) - 1),
          i => element_at(of, i + 1) > 0.1),
        i => i.cast("long")).as("indices"),
      filter(of, x => x > 0.1).as("values"))
    val qs = emb.filter(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), sparse(col("embedding")).as("sparse_vector"),
        (col("vec_id") % 3 + 3).cast("int").as("top_k"))
    val cs = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("nid"), sparse(col("embedding")).as("sparse_values"))
    val df = Similarity.sparseTopKPerQuery(qs, cs)
    // the plan is an inverted-index equi-join on the shared index — the
    // corpus×batch nested-loop scoring pass must be gone
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"sparse retrieval still plans a nested-loop scoring pass:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast hash join on the posting index:\n$plan")
    assertNoWindowSort(df)
    // independent cross-check: the scored-cross-join formulation this
    // replaced (merge-join sparse dot over every pair, Window selection)
    val q = qs.select(col("qid"),
      col("sparse_vector.indices").cast("array<long>").as("qi"),
      col("sparse_vector.values").cast("array<double>").as("qw"),
      col("top_k"))
    val w = Window.partitionBy("qid").orderBy(col("score_raw").desc, col("nid").asc)
    val expected = cs.select(col("nid"),
        col("sparse_values.indices").cast("array<long>").as("ni"),
        col("sparse_values.values").cast("array<double>").as("nw"))
      .crossJoin(broadcast(q))
      .select(col("qid"), col("top_k"), col("nid"),
        graft.functions.GraftFunctions.sparseDot(
          col("qi"), col("qw"), col("ni"), col("nw")).as("score_raw"))
      .filter(col("score_raw") > 0.0)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= col("top_k"))
      .select(col("qid"), col("nid"), round(col("score_raw"), 4).as("score"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected)
  }

  test("disk IVF layout: partition-pruned search equals the in-memory index") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf-layout").toString
    val trained = graft.operators.IvfIndex.buildTrained(cands, nlist = 8, iters = 2)
    try {
      val expected = trained.search(queries, k = 5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      trained.save(spark, tmp)
      // reopen cold, as a fresh session/job would
      val disk = graft.operators.IvfIndex.load(spark, tmp)
      assert(disk.centroids.map(_.toSeq).toSeq == trained.centroids.map(_.toSeq).toSeq)
      val df = disk.search(queries, k = 5, nprobe = 2)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(got == expected)
      // probed-cell pruning reaches the scan as a non-empty PartitionFilters
      val plan = df.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined, plan)
      // and the layout is one directory per cell
      val cellDirs = new java.io.File(tmp).listFiles().count(_.getName.startsWith("cell="))
      assert(cellDirs > 1)
    } finally trained.unpersist()
  }

  test("hybrid search: alpha=1 degenerates to dense filtered top-k") {
    def sparse(of: org.apache.spark.sql.Column) = struct(
      transform(
        filter(sequence(lit(0), size(of) - 1),
          i => element_at(of, i + 1) > 0.1),
        i => i.cast("long")).as("indices"),
      filter(of, x => x > 0.1).as("values"))
    val qs = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        sparse(col("embedding")).as("sparse_vector"))
      .withColumn("filter", lit(null).cast("string"))
      .withColumn("top_k", lit(3))
    val cs = cands
      .withColumn("sparse_values", sparse(col("nvec")))
      .withColumn("metadata", lit("{}"))
    val hybrid = Similarity.hybridTopKPerQuery(qs, cs, alpha = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val dense = Similarity.filteredTopKPerQuery(
      qs.select("qid", "qvec", "filter", "top_k"), cs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(hybrid == dense && hybrid.size == 12)
  }

  test("auto-blocked near-dup: exact-verified subset with bounded recall loss") {
    val (auto, cb) = Dedup.cosineNearDupAuto(emb, col("vec_id"), col("embedding"),
      threshold = 0.3, nlist = 8, nprobe = 2, iters = 3)
    val got = auto.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.cosineNearDupPairs(emb, col("vec_id"), col("embedding"),
      lit("all"), threshold = 0.3, maxBlockSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cb.length == 8 && got.nonEmpty)
    // candidates are exact-cosine verified → no false positives ever
    assert(got.subsetOf(exact))
    // blocking recall: even at this weak threshold (no pair in the corpus
    // exceeds 0.5 cosine), 2-probe cell blocking keeps most pairs
    assert(got.size.toDouble / exact.size >= 0.7,
      s"recall ${got.size}/${exact.size}")
  }

  test("sparse filtered: posting-list plan equals brute-force filter+dot replay") {
    import graft.functions.GraftFunctions
    val sparse = (c: org.apache.spark.sql.Column) => struct(
      filter(sequence(lit(0), size(c) - 1),
        i => element_at(c, i + 1) > 0.1).cast("array<long>").as("indices"),
      filter(c, x => x > 0.1).cast("array<double>").as("values"))
    val qs = queries
      .select(col("qid"), sparse(col("qvec")).as("sparse_vector"))
      .withColumn("filter",
        when(col("qid") % 2 === 0, lit("""{"grp": {"$eq": "a"}}"""))
          .otherwise(lit("""{"grp": {"$in": ["b", "c"]}}""")))
      .withColumn("top_k", lit(3))
    val cs = cands
      .select(col("nid"), sparse(col("nvec")).as("sparse_values"),
        to_json(struct(
          element_at(array(lit("a"), lit("b"), lit("c")),
            (col("nid") % 3 + 1).cast("int")).as("grp"))).as("metadata"))
    val got = Similarity.sparseFilteredTopKPerQuery(qs, cs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // brute replay: every (query, candidate) pair, filter first, merge-join
    // dot, positive scores only, Window selection
    val replay = cs.crossJoin(broadcast(qs))
      .filter(GraftFunctions.jsonFilterMatch(col("filter"), col("metadata")))
      .select(col("qid"), col("nid"),
        GraftFunctions.sparseDot(
          col("sparse_vector.indices"), col("sparse_vector.values"),
          col("sparse_values.indices"), col("sparse_values.values")).as("s"))
      .filter(col("s") > 0.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("s").desc, col("nid").asc)
    val want = replay.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("nid"), round(col("s"), 4).as("score"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == want && got.nonEmpty)
    // and the plan stays heap-selected (no Window over the scored stream)
    assertNoWindowSort(Similarity.sparseFilteredTopKPerQuery(qs, cs))
  }

  test("semDeDupGroups: pair-form parity on distinct vectors; exact-dup collapse algebra") {
    import graft.operators.ConnectedComponents
    // (1) no exact duplicates -> collapse is a no-op and group-first must
    // equal the pair-form clusters exactly (same centroids, same edges)
    val (groups, cb) = Dedup.semDeDupGroups(emb, col("vec_id"), col("embedding"),
      threshold = 0.3, nlist = 8, nprobe = 2, iters = 3, pointerHalving = true)
    val (pairs, cbPair) = Dedup.cosineNearDupAuto(emb, col("vec_id"), col("embedding"),
      threshold = 0.3, nlist = 8, nprobe = 2, iters = 3)
    assert(cb.flatten.toSeq == cbPair.flatten.toSeq,
      "reps == corpus here, so training must see identical data")
    val viaPairs = ConnectedComponents.clusterPairs(
        pairs, emb, col("vec_id"), pointerHalving = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val viaGroups = groups
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(viaGroups == viaPairs)
    // (2) replicate the corpus 3x under shifted ids (planted exact dups):
    // canonical rows must be REPLICATION-INVARIANT (every replica attaches
    // to the replica-0 component; the canonical set is unchanged)
    val shift = 1000000L
    val rep3 = (0L until 3L).map(r =>
      emb.select((col("vec_id") + lit(r * shift)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val (g3, cb3) = Dedup.semDeDupGroups(rep3, col("vec_id"), col("embedding"),
      threshold = 0.3, nlist = 8, nprobe = 2, iters = 3, pointerHalving = true)
    assert(cb3.flatten.toSeq == cb.flatten.toSeq,
      "reps of the replicated corpus are the base vectors -> same training")
    val canon3 = g3.filter(col("is_canonical"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val canonBase = viaGroups.filter(_._3).map(t => (t._1, t._2))
    assert(canon3 == canonBase, "canonical set must be replication-invariant")
    // every replica member lands in its base twin's component
    val comp3 = g3.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val compBase = viaGroups.map(t => t._1 -> t._2).toMap
    assert(compBase.forall { case (id, c) =>
      (0L until 3L).forall(r => comp3(id + r * shift) == c) })
  }

  test("semDeDupGroups: the distinct-ratio probe skips the collapse without changing results") {
    // emb is all-distinct, so the default ratio (0.95) takes the skip path;
    // collapseSkipRatio = 2.0 forces the collapse. Same corpus, same
    // clusters, same captured centroids — the skip is a pure cost cut.
    val (skipped, cbSkip) = Dedup.semDeDupGroups(emb, col("vec_id"), col("embedding"),
      threshold = 0.3, nlist = 8, nprobe = 2, iters = 3, pointerHalving = true)
    val (collapsed, cbColl) = Dedup.semDeDupGroups(emb, col("vec_id"), col("embedding"),
      threshold = 0.3, nlist = 8, nprobe = 2, iters = 3, pointerHalving = true,
      collapseSkipRatio = 2.0)
    assert(cbSkip.flatten.toSeq == cbColl.flatten.toSeq,
      "reps == corpus on distinct vectors, so both paths train identically")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(rows(skipped) == rows(collapsed))
    // the skip path's plan has no member-collapse aggregate: exactly one
    // xxhash64 site (the ratio probe), not the groupBy(k) + re-attach join
    val skipPlan = skipped.queryExecution.optimizedPlan.toString
    assert(!skipPlan.contains("min_by"),
      s"skip path must not elect representatives:\n$skipPlan")
  }

  test("semDeDupGroups: split and collapse plan shapes are equivalent on a mixed corpus") {
    // MIXED corpus: every base vector present once, HALF of them planted
    // with two extra exact copies under shifted ids. The two plan shapes —
    // split (hash-count first, collapse only count>1 classes, union the
    // untouched distinct rows) and collapse (one groupBy over everything) —
    // must elect identical representatives, train identical centroids, and
    // emit identical components. collapseSkipRatio = 0.0 forces the split
    // shape (any ratio exceeds it); 2.0 forces the collapse shape.
    val shift = 1000000L
    val base = emb.select(col("vec_id"), col("embedding"))
    val dupTwice = base.filter(col("vec_id") % 2 === 0)
    val mixed = base
      .unionByName(dupTwice.select((col("vec_id") + shift).as("vec_id"), col("embedding")))
      .unionByName(dupTwice.select((col("vec_id") + 2 * shift).as("vec_id"), col("embedding")))
    val (split, cbSplit) = Dedup.semDeDupGroups(mixed, col("vec_id"), col("embedding"),
      threshold = 0.3, nlist = 8, nprobe = 2, iters = 3, pointerHalving = true,
      collapseSkipRatio = 0.0)
    val (coll, cbColl) = Dedup.semDeDupGroups(mixed, col("vec_id"), col("embedding"),
      threshold = 0.3, nlist = 8, nprobe = 2, iters = 3, pointerHalving = true,
      collapseSkipRatio = 2.0)
    assert(cbSplit.flatten.toSeq == cbColl.flatten.toSeq,
      "both shapes must hand cosineNearDupAuto the same rep vectors")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val s = rows(split)
    assert(s == rows(coll))
    // replicas attach to their base twin's component in BOTH shapes
    assert(s.nonEmpty && dupTwice.collect().forall { r =>
      val id = r.getLong(0)
      val c = s.find(_._1 == id).get._2
      s.contains((id + shift, c, false)) && s.contains((id + 2 * shift, c, false))
    })
  }

  test("cosine near-dup block guard drops oversized blocks, keeps the rest") {
    import spark.implicits._
    val vecs = (0 until 30).map { i =>
      // block 0 is degenerate (identical vectors); block 1 is small
      val blk = if (i < 25) 0 else 1
      (i.toLong, Array(1.0f, 2.0f, 3.0f), blk)
    }.toDF("id", "vec", "blk")
    val capped = Dedup.cosineNearDupPairs(
      vecs, col("id"), col("vec"), col("blk"), threshold = 0.9, maxBlockSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // block 0 (25 rows > cap) contributes nothing; block 1 (5 rows) pairs fully
    assert(capped.nonEmpty && capped.forall { case (a, b) => a >= 25 && b >= 25 })
    assert(capped.length == 5 * 4 / 2)
    // default cap leaves the sf0.001 q16-shaped result unchanged
    val unconstrained = Dedup.cosineNearDupPairs(
      emb, col("vec_id"), col("embedding"), col("label"), threshold = 0.3)
    val legacy = Dedup.cosineNearDupPairs(
      emb, col("vec_id"), col("embedding"), col("label"), threshold = 0.3,
      maxBlockSize = Int.MaxValue)
    assert(unconstrained.collect().toSet == legacy.collect().toSet)
  }

  test("fuzzyPairs equals the naive within-block quadratic join, across length bands") {
    import spark.implicits._
    val rows = Seq(
      (1L, "kitten", 0), (2L, "sitten", 0), (3L, "sittin", 0), // 1-edit chain
      (4L, "kittn", 0), // len 5 vs 6: bands 1 vs 2 at w=3 — boundary-crossing
      (5L, "cat", 0), (6L, "dog", 1), (7L, "dot", 1), (8L, "kitten", 1))
      .toDF("id", "s", "blk")
    val got = Dedup.fuzzyPairs(rows, col("id"), col("s"), col("blk"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: the naive quadratic within-block join the banded equi-join
    // is provably identical to
    val a = rows.select(col("id").as("ia"), col("s").as("sa"), col("blk").as("ba"))
    val b = rows.select(col("id").as("ib"), col("s").as("sb"), col("blk").as("bb"))
    val naive = a.join(b, col("ba") === col("bb") && col("ia") < col("ib"))
      .select(col("ia"), col("ib"), levenshtein(col("sa"), col("sb")).as("d"))
      .filter(col("d") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == naive)
    assert(got.contains((1L, 4L, 1)), "pair straddling a length-band boundary must be found")
    assert(!got.exists { case (x, y, _) => x <= 5 && y >= 6 }, "blocks never mix")
  }

  test("fuzzy block guard drops oversized bands, keeps the rest") {
    import spark.implicits._
    val rows = (0 until 30).map(i => (i.toLong, f"n$i%03d", if (i < 25) 0 else 1))
      .toDF("id", "s", "blk") // fixed-width names: one length band per block
    val capped = Dedup.fuzzyPairs(rows, col("id"), col("s"), col("blk"),
      maxDist = 2, maxBlockSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // block 0's single band (25 rows > cap) contributes nothing; block 1
    // ("n025".."n029", pairwise distance 1-2) pairs fully
    assert(capped.nonEmpty && capped.forall { case (x, y) => x >= 25 && y >= 25 })
    assert(capped.length == 5 * 4 / 2)
  }

  test("block-guard drops are observed: metrics reach a QueryExecutionListener") {
    import spark.implicits._
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, org.apache.spark.sql.Row)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        qe.observedMetrics.foreach { case (n, r) => seen.add((n, r)) }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val vecs = (0 until 30).map { i =>
        (i.toLong, Array(1.0f, 2.0f, 3.0f), if (i < 25) 0 else 1)
      }.toDF("id", "vec", "blk")
      Dedup.cosineNearDupPairs(
        vecs, col("id"), col("vec"), col("blk"), threshold = 0.9, maxBlockSize = 10)
        .collect()
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      var guard: Option[org.apache.spark.sql.Row] = None
      while (guard.isEmpty && System.nanoTime() < deadline) {
        guard = seen.toArray(Array.empty[(String, org.apache.spark.sql.Row)])
          .collectFirst { case (n, r) if n.startsWith("cosine_block_guard") => r }
        if (guard.isEmpty) Thread.sleep(100)
      }
      assert(guard.isDefined, "cosine_block_guard observation never reached the listener")
      val row = guard.get
      assert(row.getAs[Long]("dropped_blocks") == 1L)
      assert(row.getAs[Long]("max_block_size") == 25L)
      assert(row.getAs[Seq[String]]("sample_keys") == Seq("0"),
        "the dropped block's key should be sampled")
    } finally spark.listenerManager.unregister(listener)
  }
}
