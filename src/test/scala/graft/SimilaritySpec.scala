package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private def cands = emb.filter(col("vec_id") >= 5)
    .select(col("vec_id").as("nid"), col("embedding").as("nvec"))

  test("heap-aggregate top-k equals window top-k exactly") {
    val w = Similarity.bruteForceTopK(queries, cands, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val h = Similarity.bruteForceTopKHeap(queries, cands, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(w == h && w.size == 35)
  }

  test("top-1 of a query vector present in candidates is itself") {
    val self = emb.limit(1)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val all = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    val top = Similarity.bruteForceTopK(self, all, k = 1).head()
    assert(top.getLong(0) == top.getLong(1)) // nearest neighbor is itself
    assert(math.abs(top.getDouble(2) - 1.0) < 1e-9)
  }

  test("matryoshka truncation: full-width is the identity; truncated equals sliced window form") {
    // dims = full width: exactly bruteForceTopKHeap (the slice is a no-op)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    assert(rows(Similarity.matryoshkaTopK(queries, cands, k = 5, dims = dim)) ==
      rows(Similarity.bruteForceTopKHeap(queries, cands, k = 5)))
    // truncated form == the window formulation over hand-sliced inputs
    // (renormalization is implicit in cosine, so no extra scaling step)
    val qs16 = queries.withColumn("qvec", slice(col("qvec"), 1, 16))
    val cs16 = cands.withColumn("nvec", slice(col("nvec"), 1, 16))
    assert(rows(Similarity.matryoshkaTopK(queries, cands, k = 5, dims = 16)) ==
      rows(Similarity.bruteForceTopK(qs16, cs16, k = 5)))
    // the truncated space is a different geometry: scores differ from
    // full-dim (sanity that the slice actually bound)
    assert(rows(Similarity.matryoshkaTopK(queries, cands, k = 5, dims = 16)) !=
      rows(Similarity.bruteForceTopKHeap(queries, cands, k = 5)))
  }

  test("matryoshka refine: rerank=all equals exact full-dim search; scores are full-dim") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val nCands = cands.count().toInt
    // when every candidate survives the coarse pass, refine IS exact search
    assert(rows(Similarity.matryoshkaTopKRefined(queries, cands,
        k = 5, dims = 8, rerank = nCands)) ==
      rows(Similarity.bruteForceTopKHeap(queries, cands, k = 5)))
    // narrow rerank: results carry FULL-dim scores for surviving pairs —
    // every (qid, nid, score) appears in the exact full-dim scoring of
    // the whole corpus with the same score
    val refined = Similarity.matryoshkaTopKRefined(queries, cands,
      k = 5, dims = 8, rerank = 12)
    val exactAll = rows(Similarity.bruteForceTopKHeap(queries, cands, k = nCands))
      .map(t => (t._1, t._2, t._3))
    assert(rows(refined).map(t => (t._1, t._2, t._3)).subsetOf(exactAll))
    assert(refined.count() == 5 * queries.count())
    intercept[IllegalArgumentException](
      Similarity.matryoshkaTopKRefined(queries, cands, k = 5, dims = 8, rerank = 3))
  }

  test("multi-probe ivf scores a superset of single-probe candidates, better-or-equal recall") {
    val single = Similarity.ivfTopK(queries, cands, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.ivfTopKMultiProbe(queries, cands, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.subsetOf(multi))
    assert(multi.size > single.size) // neighbor cells contribute candidates
    // recall vs brute force at k=5 must not be worse than single-probe
    val bf5 = Similarity.bruteForceTopK(queries, cands, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(s: Set[(Long, Long)]) = (s & bf5).size.toDouble / bf5.size
    val r1 = recall(Similarity.ivfTopK(queries, cands, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val rm = recall(Similarity.ivfTopKMultiProbe(queries, cands, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(rm >= r1)
  }

  test("IvfIndex build-once/search-many equals the one-shot operators") {
    val idx = graft.operators.IvfIndex.build(cands)
    try {
      val viaIndexSingle = idx.search(queries, k = 5, multiProbe = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val oneShotSingle = Similarity.ivfTopK(queries, cands, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(viaIndexSingle == oneShotSingle)
      val viaIndexMulti = idx.search(queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val oneShotMulti = Similarity.ivfTopKMultiProbe(queries, cands, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(viaIndexMulti == oneShotMulti)
      // a second search reuses the persisted layout (no rebuild)
      assert(idx.search(queries.limit(2), k = 3).count() > 0)
    } finally idx.unpersist()
  }

  test("ivf results are a subset of brute-force scores, rank-consistent per query") {
    val bf = Similarity.bruteForceTopK(queries, cands, k = 1000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = Similarity.ivfTopK(queries, cands, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(ivf.nonEmpty)
    ivf.foreach { case (qid, nid, score, _) =>
      assert(bf.contains((qid, nid)) && math.abs(bf((qid, nid)) - score) < 1e-9)
    }
    // ranks are dense per query starting at 1
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length).toSeq)
    }
  }

  test("disk IVF filtered search: filter runs in-scan between prune and scoring; full-probe equals brute force") {
    val meta = cands.withColumn("metadata",
      to_json(struct((col("nid") % 3).cast("int").as("grp"), (col("nid") * 7).as("sz"))))
    val idx = graft.operators.IvfIndex.buildTrained(meta, nlist = 4, iters = 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-fivf").toString
    val disk = idx.save(spark, tmp)
    idx.unpersist()
    val qs = queries
      .withColumn("filter",
        when(col("qid") % 2 === 0, lit("""{"grp": {"$eq": 1}}"""))
          .otherwise(lit("""{"sz": {"$gt": 100}}""")))
      .withColumn("top_k", (col("qid") % 2 + 3).cast("int"))

    // full probe (nprobe = nlist) = exact filtered search: must equal the
    // brute-force filtered operator row for row
    val full = disk.searchFiltered(qs, nprobe = 4)
    val brute = Similarity.filteredTopKPerQuery(qs, meta)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(rows(full) == rows(brute), "full-probe filtered IVF must equal brute force")

    // plan: probed cells as PartitionFilters, the JSON filter interpreted
    // in-scan BEFORE the cosine kernel (json_filter_match in a Filter node,
    // no Window anywhere)
    val narrowed = disk.searchFiltered(qs, nprobe = 2)
    val plan = narrowed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"probed cells did not reach the scan as PartitionFilters:\n$plan")
    assert(plan.contains("json_filter_match"),
      s"per-query filter must be interpreted in the scan stage:\n$plan")
    assert(!plan.contains("Window"), s"Window survives in plan:\n$plan")

    // narrowed probes: every hit is a real (filter-surviving) pair
    val sub = rows(narrowed).map(t => (t._1, t._2)).toSet
    assert(sub.nonEmpty)
    val bruteAll = rows(Similarity.filteredTopKPerQuery(
      qs.withColumn("top_k", lit(1000)), meta)).map(t => (t._1, t._2))
    assert(sub.subsetOf(bruteAll), "narrowed probe returned a filtered-out candidate")
  }

  test("disk-index probe collect fails loudly above the configured cap") {
    val idx = graft.operators.IvfIndex.buildTrained(cands, nlist = 4, iters = 2)
    val tmp = java.nio.file.Files.createTempDirectory("graft-capivf").toString
    val disk = idx.save(spark, tmp)
    idx.unpersist()
    spark.conf.set(Similarity.MaxProbeRowsConf, "3")
    try {
      // 5 queries × nprobe 2 = 10 probed rows > cap 3: must fail with the
      // guard's message, never OOM-collect silently
      val e = intercept[IllegalArgumentException] {
        disk.search(queries, k = 3, nprobe = 2).collect()
      }
      assert(e.getMessage.contains("graft.search.maxProbeRows"))
    } finally spark.conf.unset(Similarity.MaxProbeRowsConf)
    // below the cap: identical results with or without a (large) cap set
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val unguarded = rows(disk.search(queries, k = 3, nprobe = 2))
    spark.conf.set(Similarity.MaxProbeRowsConf, "100")
    try assert(rows(disk.search(queries, k = 3, nprobe = 2)) == unguarded)
    finally spark.conf.unset(Similarity.MaxProbeRowsConf)
  }

  test("recallAtK: duplicate rows in either input cannot inflate the figure") {
    import spark.implicits._
    val ref = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L)).toDF("qid", "nid")
    val cand = Seq((1L, 10L), (1L, 99L), (2L, 20L)).toDF("qid", "nid")
    def recalls(r: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      graft.operators.Evaluation.recallAtK(r, c)
        .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getDouble(3))))
        .toMap
    val clean = recalls(ref, cand)
    assert(clean(1L) == ((3L, 1L, 0.3333)) && clean(2L) == ((1L, 1L, 1.0)))
    // a duplicate-emitting candidate (the ANN bug class this harness
    // exists to catch) must not multiply the hit join: same figures
    assert(recalls(ref, cand.unionAll(cand)) == clean)
    // and a duplicated reference must not double n_ref
    assert(recalls(ref.unionAll(ref), cand) == clean)
  }
}
