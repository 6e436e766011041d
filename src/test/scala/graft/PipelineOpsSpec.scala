package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunking, ConnectedComponents, ProductQuantization, Profiling, RandomProjection, Ranking, TextAnalysis}

/** Training-pipeline operators added in round 3: dedup clustering
  * (connected components), document chunking, TF-IDF keyword extraction,
  * and product quantization.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- connected components

  test("connected components: chain + clique + singleton") {
    // chain 1-2-3-4, clique {10,11,12}, singleton 20
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("src", "dst")
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val got = ConnectedComponents.run(edges, vertices)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("connected components: pointer halving matches plain propagation, in far fewer rounds") {
    // 40-link chain: diameter-bound propagation needs ~40 rounds; with
    // halving the same graph converges inside 10
    val edges = (1L to 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val vertices = (1L to 41L).toDF("id")
    val got = ConnectedComponents.run(edges, vertices, maxIters = 10, pointerHalving = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 41L).map(_ -> 1L).toMap)
    // without halving the same budget must refuse rather than mis-answer
    intercept[IllegalStateException] {
      ConnectedComponents.run(edges, vertices, maxIters = 10)
    }
    // clique + singleton agree across both modes
    val mixE = Seq((10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val mixV = Seq(10L, 11L, 12L, 20L).toDF("id")
    val a = ConnectedComponents.run(mixE, mixV).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = ConnectedComponents.run(mixE, mixV, pointerHalving = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("connected components: non-convergence is an error, not a wrong answer") {
    // a 6-chain needs >1 min-propagation round; maxIters=1 must throw
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val vertices = (1L to 6L).toDF("id")
    intercept[IllegalStateException] {
      ConnectedComponents.run(edges, vertices, maxIters = 1)
    }
  }

  test("connected components: reliable checkpointing — storage-backed snapshots, identical labels") {
    val edges = (1L to 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val vertices = (1L to 21L).toDF("id")
    // without a checkpoint dir the reliable mode must refuse loudly, not
    // fall back to executor-local snapshots
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      intercept[IllegalArgumentException] {
        ConnectedComponents.run(edges, vertices, pointerHalving = true, reliable = true)
      }
    }
    // NOTE: setCheckpointDir persists on the shared SparkContext for the
    // rest of the JVM (there is no unset API) — the intercept above guards
    // on emptiness so it stays order-independent, and later tests are
    // unaffected beyond having a checkpoint dir available.
    val ckPath = java.nio.file.Files.createTempDirectory("cc-reliable")
    try {
      spark.sparkContext.setCheckpointDir(ckPath.toString)
      val got = ConnectedComponents.run(edges, vertices, maxIters = 10,
          pointerHalving = true, reliable = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (1L to 21L).map(_ -> 1L).toMap)
      // the label snapshots really went through fault-tolerant storage
      val walk = java.nio.file.Files.walk(ckPath)
      val written = try walk.filter(p => java.nio.file.Files.isRegularFile(p)).count()
                    finally walk.close()
      assert(written > 0, s"reliable run left no checkpoint files under $ckPath")
      // and the reliable path agrees with the local-checkpoint path
      val local = ConnectedComponents.run(edges, vertices, maxIters = 10,
          pointerHalving = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == local)
    } finally {
      val walk = java.nio.file.Files.walk(ckPath)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("clusterPairs marks the minimum id canonical") {
    val pairs = Seq((5L, 3L, 0.9), (3L, 8L, 0.8)).toDF("id_a", "id_b", "jac")
    val ids = Seq(1L, 3L, 5L, 8L).toDF("doc_id")
    val got = ConnectedComponents.clusterPairs(pairs, ids, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 1L, true), (3L, 3L, true), (5L, 3L, false), (8L, 3L, false)))
  }

  // ------------------------------------------------------------- chunking

  test("chunkByChars: windows, overlap, tail, empty doc") {
    val docs = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    // chunkSize=4, overlap=2 → step=2; len 10 → 5 chunks
    val got = Chunking.chunkByChars(docs, col("doc_id"), col("text"), 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    val doc1 = got.filter(_._1 == 1L).map(t => (t._3, t._4))
    assert(doc1.toSeq == Seq((0L, "abcd"), (2L, "cdef"), (4L, "efgh"),
      (6L, "ghij"), (8L, "ij")))
    assert(got.filter(_._1 == 2L).map(_._4).toSeq == Seq("xy"))
    assert(got.filter(_._1 == 3L).map(_._4).toSeq == Seq(""),
      "empty doc still emits its single empty chunk")
  }

  test("chunkByTokens: token windows with counts") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    // chunkSize=3, overlap=1 → step=2; 5 tokens → ceil(5/2)=3 chunks
    val got = Chunking.chunkByTokens(docs, col("doc_id"), col("text"), 3, 1)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(("a b c", 3L), ("c d e", 3L), ("e", 1L)))
  }

  test("chunkByChars rejects degenerate overlap") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunkByChars(docs, col("doc_id"), col("text"), 4, 4)
    }
  }

  test("packSequences: straddling doc splits at the bin boundary, shards pack independently") {
    val docs = Seq(
      (1L, "a", "t1 t2 t3"),    // shard a: 3 tokens, bin 0 offsets 0-2
      (2L, "a", "u1 u2 u3 u4"), // starts at stream pos 3 → straddles bins 0/1
      (3L, "b", "v1 v2"))       // own shard: restarts at bin 0
      .toDF("doc_id", "lang", "text")
    val got = Chunking.packSequences(docs, col("doc_id"), col("text"), col("lang"), 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))).toSet
    assert(got == Set(
      ("a", 0L, 1L, 0L, 3L, 0L, "t1 t2 t3"),
      ("a", 0L, 2L, 0L, 1L, 3L, "u1"),
      ("a", 1L, 2L, 1L, 3L, 0L, "u2 u3 u4"),
      ("b", 0L, 3L, 0L, 2L, 0L, "v1 v2")))
  }

  test("packSequences: bins fill to exactly capacity, documents reconstruct, one shuffle") {
    val docs = (1L to 9L).map { i =>
      (i, "s", (1L to i).map(j => s"w$i-$j").mkString(" ")) // 45 tokens total
    }.toDF("doc_id", "lang", "text")
    val plan = Chunking.packSequences(docs, col("doc_id"), col("text"), col("lang"), 7)
    val rows = plan.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6)))
    // every bin except the shard's last holds exactly `capacity` tokens,
    // laid contiguously from offset 0
    val byBin = rows.groupBy(_._2)
    val lastBin = byBin.keys.max
    byBin.foreach { case (bin, segs) =>
      val expected = if (bin == lastBin) 45 - 7 * lastBin else 7
      assert(segs.map(_._5).sum == expected, s"bin $bin token count")
      val covered = segs.sortBy(_._6).foldLeft(0L) { case (at, seg) =>
        assert(seg._6 == at, s"bin $bin gap at offset $at"); at + seg._5
      }
      assert(covered == expected)
    }
    // concatenating each document's segments in bin order restores it
    (1L to 9L).foreach { i =>
      val restored = rows.filter(_._3 == i).sortBy(_._4).map(_._7).mkString(" ")
      assert(restored == (1L to i).map(j => s"w$i-$j").mkString(" "), s"doc $i")
    }
    // the per-shard window sort is the plan's ONLY exchange
    // AdaptiveSparkPlan prints final + initial plans; count the final only
    val exec = plan.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(exec).size == 1,
      s"expected exactly one shuffle:\n$exec")
  }

  test("packSequences: empty document still occupies one (empty) token slot") {
    val docs = Seq((1L, "s", ""), (2L, "s", "a b")).toDF("doc_id", "lang", "text")
    val got = Chunking.packSequences(docs, col("doc_id"), col("text"), col("lang"), 8)
      .collect().map(r => (r.getLong(2), r.getLong(4), r.getLong(5), r.getString(6)))
      .sortBy(_._3)
    // split("", " ") = [""] — one empty token, so doc 2 starts at offset 1
    assert(got.toSeq == Seq((1L, 1L, 0L, ""), (2L, 2L, 1L, "a b")))
  }

  // --------------------------------------------------------------- tf-idf

  test("tfidf: corpus-wide terms rank below distinctive ones") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana date date")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, col("doc_id"), col("text"), topN = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "banana" appears in every doc (df=3) — never the top term
    assert(got == Map(1L -> "apple", 2L -> "cherry", 3L -> "date"))
    // value check: doc 1 "apple": tf=2, df=1, N=3 → 2 * 4/2 = 4.0
    val v = TextAnalysis.tfidfTopTerms(docs, col("doc_id"), col("text"), topN = 1)
      .filter(col("doc_id") === 1L).head().getDouble(2)
    assert(v == 4.0)
    // equal-score terms break toward the lexicographically smaller term,
    // matching ORDER BY tfidf DESC, term ASC
    val ties = Seq((1L, "zeta alpha mid")).toDF("doc_id", "text")
    val top2 = TextAnalysis.tfidfTopTerms(ties, col("doc_id"), col("text"), topN = 2)
      .orderBy("rnk").collect().map(_.getString(1)).toSeq
    assert(top2 == Seq("alpha", "mid"))
    // plan discipline: per-doc selection goes through the string-keyed
    // bounded heap — no Window sort of the scored term stream
    val plan = TextAnalysis.tfidfTopTerms(docs, col("doc_id"), col("text"), topN = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "tfidf top-terms must not plan a Window")
    assert(plan.contains("top_k_by_score_str"), "expected the string-keyed heap aggregate")
  }

  // --------------------------------------------------- quality/repetition

  test("gopherQualityStats: each rule gates independently, zero shuffles") {
    val docs = Seq(
      // 50 alpha words incl. stopwords, mean len in range → passes
      (1L, (Seq.fill(12)("the quick brown fox").mkString(" ") + " it jumps")),
      (2L, "too few words here"), // n_words < 50
      (3L, Seq.fill(60)("x").mkString(" ")), // mean_word_len 1.0 < 3.0
      (4L, Seq.fill(60)("12345").mkString(" "))). // no alpha, no stopwords
      toDF("doc_id", "text")
    val got = TextAnalysis.gopherQualityStats(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got(1L)._1 == 50 && got(1L)._5, s"doc1: ${got(1L)}")
    assert(got(2L)._1 == 4 && !got(2L)._5)
    assert(got(3L)._2 == 1.0 && !got(3L)._5)
    assert(got(4L)._3 == 0.0 && got(4L)._4 == 0L && !got(4L)._5)
    val plan = TextAnalysis.gopherQualityStats(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "quality gate must not shuffle")
  }

  test("repetitionStats: bigram repetition and top-term share with deterministic ties") {
    val docs = Seq(
      (1L, "a b a b a b"), // bigrams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "all words differ here now"), // no repetition; tie on cnt=1 → 'all'
      (3L, "z z z z")).toDF("doc_id", "text") // one token dominates
    val got = TextAnalysis.repetitionStats(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4), r.getDouble(5)))).toMap
    assert(got(1L) == ((6L, 5L, 0.6, "a", 0.5)))
    assert(got(2L) == ((5L, 4L, 0.0, "all", 0.2)))
    assert(got(3L) == ((4L, 3L, 0.6667, "z", 1.0)))
  }

  // ------------------------------------------------- histogram/projection

  test("histogram: fixed-width buckets, max clamps into the last, nulls drop") {
    val df = Seq[java.lang.Double](0.0, 1.0, 4.9, 5.0, 9.9, 10.0, null)
      .toDF("x")
    val got = Profiling.histogram(df, "x", nBuckets = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    // range [0,10], width 5: bucket0 = [0,5) → {0,1,4.9}; bucket1 = [5,10] → {5,9.9,10}
    assert(got == Map(0L -> ((0.0, 5.0, 3L)), 1L -> ((5.0, 10.0, 3L))))
    // constant column: single bucket 0, zero width
    val const = Seq(7.0, 7.0).toDF("x")
    val g2 = Profiling.histogram(const, "x", 4).collect()
    assert(g2.length == 1 && g2(0).getLong(0) == 0L && g2(0).getLong(3) == 2L)
    // all-null input refuses loudly
    intercept[IllegalArgumentException] {
      Profiling.histogram(Seq[java.lang.Double](null, null).toDF("x"), "x", 4)
    }
  }

  test("randomProjection: deterministic sign matrix, scan-speed projection, JL sanity") {
    val m = RandomProjection.matrix(42L, 4, 8)
    assert(m.length == 4 && m.forall(_.length == 8))
    assert(m.flatten.forall(v => math.abs(v) == 0.5)) // ±1/√4
    assert(RandomProjection.matrix(42L, 4, 8).flatten.toSeq == m.flatten.toSeq) // reproducible
    assert(RandomProjection.matrix(43L, 4, 8).flatten.toSeq != m.flatten.toSeq) // seed matters

    val vecs = Seq(
      (1L, Array(1.0, 0.0, 2.0, 0.0, 0.0, 1.0, 0.0, 0.0)),
      (2L, Array(0.0, 3.0, 0.0, 0.0, 1.0, 0.0, 0.0, 2.0))).toDF("vec_id", "v")
    val got = RandomProjection.project(vecs, col("vec_id"), col("v"), 8, 4, 42L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // matches the driver-side matrix multiply exactly
    val in = Map(1L -> Array(1.0, 0.0, 2.0, 0.0, 0.0, 1.0, 0.0, 0.0),
      2L -> Array(0.0, 3.0, 0.0, 0.0, 1.0, 0.0, 0.0, 2.0))
    in.foreach { case (id, x) =>
      val expect = m.map(row => row.zip(x).map { case (a, b) => a * b }
        .foldLeft(0.0)(_ + _))
      assert(got(id) == expect.toSeq, s"vec $id")
    }
    // zero shuffles: literals fold into one projection
    val plan = RandomProjection.project(vecs, col("vec_id"), col("v"), 8, 4, 42L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "projection must not shuffle")
  }

  test("unigramLogProbScore: smoothed OOV, vocab tie-break, broadcast join") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // counts: a=3, b=1, c=1; N=5; top-2 vocab = a, b (tie c/b -> b)
    val got = TextAnalysis.unigramLogProbScore(
      docs, col("doc_id"), col("text"), vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, r4((2 * math.log(0.6) + math.log(0.2)) / 3))))
    assert(got(2L) == ((2L, r4((math.log(0.6) + math.log(0.5 / 5)) / 2))))
    val plan = TextAnalysis.unigramLogProbScore(
      docs, col("doc_id"), col("text"), vocabSize = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), "the one-row vocab/total stats must broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "token stream must never shuffle into a join")
  }

  // --------------------------------------------------------------- pii

  test("stripHtml: blocks drop whole, tags strip, entities decode, whitespace collapses") {
    import spark.implicits._
    val html = Seq(
      (1L, "<html><body><h1>Title</h1><p>Hello <b>bold</b> world</p>" +
        "<script>if (1 < 2) alert('x');</script>tail</body></html>"),
      (2L, "<style>a{x:1}</style>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"),
      (3L, "plain   text\n\nwith   gaps"),
      (4L, ""),
      // double-escaped entities: &amp; decodes LAST, so &amp;lt; yields
      // the literal text "&lt;" — never a "<" that reads as markup
      (5L, "code: &amp;lt;div&amp;gt; and &amp;amp; stay escaped")).toDF("id", "h")
    val got = html.select(col("id"),
        graft.operators.TextAnalysis.stripHtml(col("h")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "Title Hello bold world tail",
      s"got '${got(1L)}'") // script body (with its stray <) gone wholesale
    assert(got(2L) == "A & B <tag> \"q\" 's' end", s"got '${got(2L)}'")
    assert(got(3L) == "plain text with gaps")
    assert(got(4L) == "")
    assert(got(5L) == "code: &lt;div&gt; and &amp; stay escaped", s"got '${got(5L)}'")
    // zero shuffles: one codegen projection
    val plan = html.select(graft.operators.TextAnalysis.stripHtml(col("h")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stripHtml must not shuffle:\n$plan")
  }

  test("cleanLines: C4 line gates — words, punctuation, boilerplate, code, trim") {
    val docs = Seq(
      (1L, "this line is fine.\nshort.\nno punct here at all\n" +
        "please accept Cookies now.\nint f() { return 1; }\n" +
        "another good line stays here!"),
      (2L, "   padded line also stays here?   \nJavaScript required to view"),
      (3L, "")).toDF("id", "t")
    val got = graft.operators.TextAnalysis.cleanLines(docs, col("id"), col("t"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1: 6 lines; keeps the 4-word "." line and the "!" line; drops
    // the 1-worder, the unterminated line, the cookie banner (case-
    // insensitive), and the braced code line
    assert(got(1L) == ((2L, 4L,
      "this line is fine.\nanother good line stays here!")), s"got ${got(1L)}")
    // doc 2: rules run on the TRIMMED line, output is emitted trimmed;
    // the javascript line dies to the blacklist (and no terminal punct)
    assert(got(2L) == ((1L, 1L, "padded line also stays here?")), s"got ${got(2L)}")
    // empty text: one empty line, dropped
    assert(got(3L) == ((0L, 1L, "")), s"got ${got(3L)}")
    // zero shuffles: one codegen HOF projection
    val plan = graft.operators.TextAnalysis.cleanLines(docs, col("id"), col("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"cleanLines must not shuffle:\n$plan")
  }

  test("distributionDrift: zero on identical slices, positive and symmetric on disjoint ones") {
    val a = Seq("aa aa bb", "cc aa").toDF("t")
    val b = Seq("dd ee", "dd dd ff").toDF("t")
    // identical corpora: every bucket has pa == pb exactly → all-zero drift
    val same = graft.operators.Profiling.distributionDrift(a, a, col("t")).collect()(0)
    assert(same.getLong(0) == 5L && same.getLong(1) == 5L)
    assert(same.getDouble(2) == 0.0 && same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0)
    // disjoint vocabularies: strictly positive, bounded drift
    val diff = graft.operators.Profiling.distributionDrift(a, b, col("t")).collect()(0)
    assert(diff.getLong(0) == 5L && diff.getLong(1) == 5L)
    val (tv, he, js) = (diff.getDouble(2), diff.getDouble(3), diff.getDouble(4))
    assert(tv > 0.0 && tv <= 1.0, s"tv=$tv")
    assert(he > 0.0 && he <= 1.0, s"hellinger=$he")
    assert(js > 0.0 && js <= math.log(2) + 1e-9, s"js=$js")
    // symmetry: all three divergences are symmetric in (A, B)
    val rev = graft.operators.Profiling.distributionDrift(b, a, col("t")).collect()(0)
    assert(rev.getDouble(2) == tv && rev.getDouble(3) == he && rev.getDouble(4) == js)
  }

  test("overlapMatrix: exact pairwise shingle Jaccard incl. zero-overlap cells") {
    val docs = Seq(
      ("g1", "a b c"), ("g1", "b c d"), // g1 bigrams {a b, b c, c d}
      ("g2", "a b x"),                  // g2 bigrams {a b, b x}
      ("g3", "zz yy")                   // g3 bigrams {zz yy}
    ).toDF("src", "t")
    val got = graft.operators.Profiling.overlapMatrix(docs, col("src"), col("t"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // full matrix: every unordered pair appears, zero-overlap included
    assert(got.size == 3)
    assert(got(("g1", "g2")) == ((3L, 2L, 1L, 0.25)), s"got ${got(("g1", "g2"))}")
    assert(got(("g1", "g3")) == ((3L, 1L, 0L, 0.0)))
    assert(got(("g2", "g3")) == ((2L, 1L, 0L, 0.0)))
    // never a shingle-stream self-join: the only product is the broadcast
    // groups-x-groups matrix frame, not a CartesianProduct of shingles
    val plan = graft.operators.Profiling.overlapMatrix(docs, col("src"), col("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"overlapMatrix must not cartesian the shingle stream:\n$plan")
  }

  test("bigramLogProbScore: fluent text outscores token salad, exact interpolated values") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "mat on cat the sat zz"), // same-ish vocabulary, shuffled = no phrase fluency
      (4L, "solo")                   // <2 tokens: no bigram positions, no output row
    ).toDF("id", "t")
    val got = graft.operators.TextAnalysis.bigramLogProbScore(
        docs, col("id"), col("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // hand-computed against the documented model (uncapped tables here):
    // P(w2|w1) = 0.7*c(w1w2)/c(w1) + (1-0.7)*c(w2)/16, avg ln, 4dp
    assert(got.size == 3, s"1-token docs emit no row: $got")
    assert(got(1L) == ((5L, -1.052)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, -0.7746)), s"got ${got(2L)}")
    assert(got(3L) == ((5L, -1.1735)), s"got ${got(3L)}")
    // the phrase-fluency ordering a unigram model cannot see: doc 3 uses
    // (almost) the same words as doc 1 but scores strictly lower
    assert(got(3L)._2 < got(1L)._2 && got(1L)._2 < got(2L)._2)
    // binding caps stay deterministic (heap tie-break = count desc, term asc)
    val capped = graft.operators.TextAnalysis.bigramLogProbScore(
        docs, col("id"), col("t"), vocabSize = 2, bigramTable = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val capped2 = graft.operators.TextAnalysis.bigramLogProbScore(
        docs, col("id"), col("t"), vocabSize = 2, bigramTable = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(capped == capped2 && capped.size == 3)
  }

  test("LmIndex: save->open->score equals the self-trained model; OOV floor on new data") {
    import graft.operators.LmIndex
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "mat on cat the sat zz")).toDF("id", "t")
    val dir = java.nio.file.Files.createTempDirectory("graft-lmidx").toString
    LmIndex.save(docs, col("id"), col("t"), dir)
    val idx = LmIndex.open(spark, dir)
    // identical corpus scored under the persisted model == the
    // self-trained operator, row for row (same maps, same smoothing)
    val viaIndex = idx.score(docs, col("id"), col("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val selfTrained = graft.operators.TextAnalysis.bigramLogProbScore(
        docs, col("id"), col("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(viaIndex == selfTrained, s"$viaIndex\nvs\n$selfTrained")
    // a batch of entirely unseen vocabulary hits the pure smoothed floor:
    // every transition scores (1-lambda) * oov/N with N = 15 stored tokens
    val nov = idx.score(Seq((9L, "qq ww ee")).toDF("id", "t"), col("id"), col("t"))
      .collect()(0)
    val floor = BigDecimal(math.log((1.0 - 0.7) * (0.5 / 15.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(nov.getLong(1) == 2L && nov.getDouble(2) == floor,
      s"got $nov, want logprob=$floor")
    // params survive the metadata round-trip
    assert(idx.params == LmIndex.open(spark, dir).params)
  }

  test("LmIndex.saveSampled: frozen scores identical to training on the equivalent explicit sample") {
    import graft.operators.{LmIndex, Sampling}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dirS = java.nio.file.Files.createTempDirectory("graft-lms").toString
    val dirE = java.nio.file.Files.createTempDirectory("graft-lme").toString
    LmIndex.saveSampled(docs, col("doc_id"), col("text"), dirS,
      sampleSixteenths = 4, vocabSize = 30, bigramTable = 200)
    LmIndex.save(Sampling.md5Sample(docs, col("doc_id"), 4),
      col("doc_id"), col("text"), dirE, vocabSize = 30, bigramTable = 200)
    assert(LmIndex.open(spark, dirS).params == LmIndex.open(spark, dirE).params)
    def scores(d: String) = LmIndex.open(spark, d)
      .score(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val s = scores(dirS)
    assert(s == scores(dirE) && s.nonEmpty)
    // the sample genuinely bound: a full-corpus model scores differently
    val dirF = java.nio.file.Files.createTempDirectory("graft-lmf").toString
    LmIndex.save(docs, col("doc_id"), col("text"), dirF,
      vocabSize = 30, bigramTable = 200)
    assert(scores(dirF) != s)
    // sixteenths = 16 degenerates to full-corpus training
    val dir16 = java.nio.file.Files.createTempDirectory("graft-lm16").toString
    LmIndex.saveSampled(docs, col("doc_id"), col("text"), dir16,
      sampleSixteenths = 16, vocabSize = 30, bigramTable = 200)
    assert(scores(dir16) == scores(dirF))
  }

  test("hourlyCategoryDrift: exact TV between consecutive hours, gaps and first hour excluded") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-03-01 $h%02d:$m%02d:00")
    val ev = Seq(
      // 10:00 — {x:2, y:2}
      (ts(10, 1), "x"), (ts(10, 2), "x"), (ts(10, 3), "y"), (ts(10, 4), "y"),
      // 11:00 — {x:1, y:3}: TV vs 10:00 = (|.25-.5|+|.75-.5|)/2 = 0.25
      (ts(11, 1), "x"), (ts(11, 2), "y"), (ts(11, 3), "y"), (ts(11, 4), "y"),
      // 12:00 — {z:4}: disjoint support, TV = 1.0
      (ts(12, 1), "z"), (ts(12, 2), "z"), (ts(12, 3), "z"), (ts(12, 4), "z"),
      // 14:00 — follows a GAP (no 13:00): excluded, no predecessor
      (ts(14, 1), "x")).toDF("t", "cat")
    val got = graft.operators.Profiling.hourlyCategoryDrift(ev, col("t"), col("cat"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map(
      "2026-03-01 11:00" -> 0.25,
      "2026-03-01 12:00" -> 1.0), s"got $got")
  }

  test("epochShuffle: reproducible permutation, seed-sensitive, shard-partitioned window") {
    import graft.operators.Ranking
    val docs = (0L until 200L).map(i => (i, s"doc$i")).toDF("id", "t")
    def perm(seed: Long) = Ranking.epochShuffle(docs, col("id"), shards = 4, seed = seed)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val a = perm(7L)
    // every row present; ranks within each shard are exactly 1..size
    assert(a.size == 200)
    a.groupBy(_._2._1).foreach { case (_, rows) =>
      assert(rows.values.map(_._2).toSeq.sorted == (1L to rows.size).toSeq)
    }
    // deterministic: same seed twice is the identical permutation
    assert(perm(7L) == a)
    // a new epoch (seed) is a different permutation
    assert(perm(8L) != a)
    // plan discipline: every row_number window partitions by shard —
    // nothing corpus-sized ever sorts in one task
    val plan = Ranking.epochShuffle(docs, col("id"), 4, 7L)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty)
    assert(windows.filter(_.contains("row_number")).forall(_.contains("shard#")),
      s"epoch-shuffle window not partitioned by shard:\n$plan")
  }

  test("ChunkStore: admission prices new vs stored bytes; append makes chunks known") {
    import graft.operators.ChunkStore
    val fox = "the quick brown fox jumps over the lazy dog again and again the quick brown fox"
    val dir = java.nio.file.Files.createTempDirectory("graft-chunkstore").toString
    ChunkStore.save(Seq(Tuple1(fox)).toDF("t"), col("t"), dir, window = 8, divisor = 32)
    val store = ChunkStore.open(spark, dir)
    def admit(rows: (Long, String)*) = store.admit(
        rows.toDF("id", "t"), col("id"), col("t"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a doc identical to stored content: all chunks known, zero new bytes
    val same = admit((1L, fox))
    assert(same(1L)._2 == 0L && same(1L)._3 == 0L &&
      same(1L)._4 == fox.length.toLong, s"got $same")
    // fresh content: every chunk new, bytes = doc length
    val fresh = admit((2L, "entirely different words never seen in the store corpus"))
    assert(fresh(2L)._2 == fresh(2L)._1 && fresh(2L)._4 == 0L)
    // admission is a pure read: repeating the batch changes nothing, and
    // two in-batch copies of the same unseen doc BOTH price as new
    val twin = admit((3L, "xyz xyz xyz novel"), (4L, "xyz xyz xyz novel"))
    assert(twin(3L) == twin(4L) && twin(3L)._2 > 0L)
    // append: what was new is now stored
    store.append(Seq((5L, "xyz xyz xyz novel")).toDF("id", "t"), col("id"), col("t"))
    val after = admit((6L, "xyz xyz xyz novel"))
    assert(after(6L)._2 == 0L && after(6L)._3 == 0L, s"got $after")
    // params survive the metadata round-trip
    assert(ChunkStore.open(spark, dir).params == store.params)
    // exact (collision-paranoid) mode prices identically on real data
    val exactSame = store.admit(Seq((7L, fox)).toDF("id", "t"),
        col("id"), col("t"), exact = true)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).head
    assert(exactSame == ((0L, 0L, fox.length.toLong)), s"got $exactSame")
  }

  test("ChunkStore: admission shuffles hashes, never stored text; vtype guards") {
    import graft.operators.ChunkStore
    val dir = java.nio.file.Files.createTempDirectory("graft-chunkstore-h").toString
    ChunkStore.save(Seq(Tuple1("seed corpus content for the hash keyed store"))
      .toDF("t"), col("t"), dir, window = 8, divisor = 32)
    val store = ChunkStore.open(spark, dir)
    // plan discipline: the stored side of the admission join reads ONLY
    // (h, clen) from parquet — chunk text bytes never enter the shuffle
    val plan = store.admit(Seq((1L, "a new page")).toDF("id", "t"),
      col("id"), col("t")).queryExecution.executedPlan.toString
    val storedScan = plan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("chunks")).mkString("\n")
    assert(storedScan.contains("h:bigint") && storedScan.contains("clen:bigint"),
      s"stored-side scan must read the hash key:\n$storedScan")
    assert(!storedScan.contains("c:string"),
      s"stored-side scan must NOT read chunk text:\n$storedScan")
    // exact mode is the one place stored text is allowed back in
    val exactPlan = store.admit(Seq((1L, "a new page")).toDF("id", "t"),
      col("id"), col("t"), exact = true).queryExecution.executedPlan.toString
    assert(exactPlan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("chunks"))
      .mkString.contains("c:string"))
    // a binary batch against a string store fails with a clear message
    val bin = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "b")
    val e = intercept[IllegalArgumentException](
      store.admit(bin, col("id"), col("b")))
    assert(e.getMessage.contains("string chunks"))
    // binary stores round-trip their vtype and admit binary batches
    val bdir = java.nio.file.Files.createTempDirectory("graft-chunkstore-b").toString
    ChunkStore.save(Seq(Tuple1(Array.tabulate(64)(i => (i % 7).toByte))).toDF("b"),
      col("b"), bdir, window = 8, divisor = 16)
    val bstore = ChunkStore.open(spark, bdir)
    assert(bstore.params.vtype == "binary")
    val stats = bstore.admit(Seq((1L, Array.tabulate(64)(i => (i % 7).toByte)))
      .toDF("id", "b"), col("id"), col("b"))
      .collect().map(r => (r.getLong(2), r.getLong(4))).head
    assert(stats == ((0L, 64L)), s"got $stats")
  }

  test("ChunkStore: a pre-hash-key (v1) layout fails open() with a rebuild message") {
    import graft.operators.ChunkStore
    val dir = java.nio.file.Files.createTempDirectory("graft-chunkstore-v1").toString
    // simulate a store persisted by the old format: (c, clen) chunks table,
    // metadata without a format field
    Seq(("old chunk", 9L)).toDF("c", "clen")
      .write.mode("overwrite").parquet(s"$dir/chunks")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "metadata.json"),
      """{"window": 8, "divisor": 32}""".getBytes("UTF-8"))
    // without the version gate this would open fine and then blow up at
    // admit/append with a confusing missing-column error on `h`
    val e = intercept[IllegalArgumentException](ChunkStore.open(spark, dir))
    assert(e.getMessage.contains("format") && e.getMessage.contains("rebuild"),
      s"got: ${e.getMessage}")
  }

  test("ChunkStore: a format-less v2 layout (hash-keyed chunks) still opens") {
    import graft.operators.ChunkStore
    // stores written between the layout change and the version stamp have
    // the v2 (h, clen, c) chunks table but no format field — the schema
    // sniff must classify them as v2, not reject them as v1
    val dir = java.nio.file.Files.createTempDirectory("graft-chunkstore-v2nf").toString
    ChunkStore.save(Seq(Tuple1("content for a format-less but v2-shaped store"))
      .toDF("t"), col("t"), dir, window = 8, divisor = 32)
    // raw-overwrite the metadata (drop the Hadoop checksum sidecar too —
    // the nio write bypasses it and a stale crc would fail the re-read)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, ".metadata.json.crc"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "metadata.json"),
      """{"window": 8, "divisor": 32, "vtype": "string"}""".getBytes("UTF-8"))
    val store = ChunkStore.open(spark, dir)
    assert(store.params.window == 8 && store.params.vtype == "string")
    // and it is fully usable: everything it stored is known
    val stats = store.admit(
      Seq((1L, "content for a format-less but v2-shaped store")).toDF("id", "t"),
      col("id"), col("t")).collect().head
    assert(stats.getLong(2) == 0L, s"expected zero new chunks, got $stats")
  }

  test("cdcChunks: rolling-hash boundaries, reconstruction, edit-survival, edge docs") {
    import graft.functions.SketchFunctions
    def run(ts: String*): Seq[Seq[String]] = ts.map(Tuple1(_)).toDF("t")
      .select(SketchFunctions.cdcChunks(col("t"), 8, 32).as("c"))
      .collect().toSeq.map(_.getSeq[String](0))
    // hand-verified reference chunking (independent per-position replay)
    val fox = "the quick brown fox jumps over the lazy dog again and again the quick brown fox"
    assert(run(fox).head ==
      Seq("the quick brown fox jumps over th",
        "e lazy dog again and again the quick brown fox"))
    // edges: empty -> no chunks; shorter than the window -> one whole chunk
    assert(run("").head.isEmpty)
    assert(run("tiny").head == Seq("tiny"))
    // chunks always reconstruct the input exactly
    for ((t, cs) <- Seq(fox, "tiny", "", "a" * 100).zip(run(fox, "tiny", "", "a" * 100)))
      assert(cs.mkString == t, s"reconstruction failed for '$t'")
    // the CDC property: two documents sharing a long suffix re-align on
    // content-defined boundaries, so their trailing chunks are IDENTICAL
    // even though their prefixes (and so all offsets) differ
    val suffix = " meanwhile the standard disclaimer paragraph follows and it " +
      "is identical on every page of this crawl so content defined chunks " +
      "align and deduplicate across documents"
    val Seq(a, b) = run("doc one says something unique here." + suffix,
      "a totally different second document prefix!" + suffix)
    assert(a.takeRight(2) == b.takeRight(2),
      s"shared suffix must re-chunk identically:\n$a\nvs\n$b")
    // chunking itself is a zero-shuffle codegen projection
    val plan = Seq(Tuple1(fox)).toDF("t")
      .select(SketchFunctions.cdcChunks(col("t"), 8, 32))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"cdcChunks must not shuffle:\n$plan")
    // binary arm: over pure-ASCII input, byte chunks mirror the string
    // chunks exactly (UTF-8 of ASCII is the identity)
    val binGot = Seq(Tuple1(fox)).toDF("t")
      .select(SketchFunctions.cdcChunks(col("t").cast("binary"), 8, 32).as("c"))
      .collect()(0).getSeq[Array[Byte]](0).map(new String(_, "UTF-8")).toSeq
    assert(binGot == run(fox).head, s"binary arm diverged on ASCII:\n$binGot")
    // ...and on multi-byte input the BYTE stream (not code points) is
    // what chunks and reconstructs
    val uni = "é日本語" * 30
    val uniChunks = Seq(Tuple1(uni)).toDF("t")
      .select(SketchFunctions.cdcChunks(col("t").cast("binary"), 8, 32).as("c"))
      .collect()(0).getSeq[Array[Byte]](0)
    assert(uniChunks.map(_.length).sum == uni.getBytes("UTF-8").length)
    assert(uniChunks.flatten.toSeq == uni.getBytes("UTF-8").toSeq)
    // dedup stats: exact on a corpus of one duplicated short doc
    val stats = graft.operators.Chunking.cdcDedupStats(
      Seq("tiny", "tiny", "other").map(Tuple1(_)).toDF("t"), col("t"), 8, 32)
      .collect()(0)
    // chunks: "tiny" x2 + "other" -> 3 total, 2 distinct; chars 4+4+5 /
    // distinct 4+5
    assert((stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3)) ==
      ((3L, 2L, 13L, 9L)), s"got $stats")
    assert(stats.getDouble(4) == math.rint(9.0 / 13.0 * 1e6) / 1e6 ||
      stats.getDouble(4) == BigDecimal(9.0 / 13.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("scrubPii: detects and redacts each class, ip wins over phone on dotted quads") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org or admin@example.com thanks"),
      (2L, "server 10.0.42.7 and 192.168.1.255 are up"),
      (3L, "call +1 555 123 4567 or 555-987-6543 now"),
      (4L, "nothing sensitive here at all"),
      (5L, "mixed: a@b.co on 8.8.8.8 phone 555 111 2222")).toDF("doc_id", "text")
    val got = TextAnalysis.scrubPii(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((2L, 0L, 0L,
      "mail me at [EMAIL] or [EMAIL] thanks")))
    // dotted quads are IPs, never half-matched by the looser phone shape
    assert(got(2L) == ((0L, 2L, 0L, "server [IP] and [IP] are up")))
    assert(got(3L) == ((0L, 0L, 2L, "call [PHONE] or [PHONE] now")))
    assert(got(4L) == ((0L, 0L, 0L, "nothing sensitive here at all")))
    assert(got(5L) == ((1L, 1L, 1L, "mixed: [EMAIL] on [IP] phone [PHONE]")))
    // zero shuffles: the scrub is a single codegen'd projection
    val plan = TextAnalysis.scrubPii(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "scrub must not shuffle")
    // idempotence: a scrubbed text has nothing left to scrub
    val once = TextAnalysis.scrubPii(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("text_clean"))
    val twice = TextAnalysis.scrubPii(once, col("doc_id"), col("text_clean"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
    twice.foreach { case (id, (e, ip, ph, txt)) =>
      assert(e == 0 && ip == 0 && ph == 0, s"doc $id re-detected PII")
      assert(got(id)._4 == txt, s"doc $id changed on second scrub")
    }
  }

  // ----------------------------------------------------- ranking/profiling

  test("topKPerGroup: heap selection per group with deterministic ties") {
    val rows = Seq(
      ("en", 1L, 0.9), ("en", 2L, 0.7), ("en", 3L, 0.9), ("en", 4L, 0.1),
      ("de", 5L, 0.5), ("de", 6L, 0.8)).toDF("lang", "doc_id", "q")
    val got = Ranking.topKPerGroup(rows, col("lang"), col("doc_id"), col("q"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3).toLong)).toSet
    // en ties at 0.9 break toward the smaller id: 1 then 3
    assert(got == Set(("en", 1L, 1L), ("en", 3L, 2L), ("de", 6L, 1L), ("de", 5L, 2L)))
    // plan discipline: heap aggregate, no Window/Sort of the scored rows
    val plan = Ranking.topKPerGroup(rows, col("lang"), col("doc_id"), col("q"), k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "per-group top-k must not plan a Window")
  }

  test("topKRowsPerGroup carries payloads without a join-back") {
    val rows = Seq(
      ("en", 1L, 0.9, "alpha"), ("en", 2L, 0.7, "beta"), ("en", 3L, 0.95, "gamma"),
      ("de", 5L, 0.5, "delta")).toDF("lang", "doc_id", "q", "txt")
    val got = Ranking.topKRowsPerGroup(rows, col("lang"), col("doc_id"), col("q"),
        struct(col("txt")), k = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getStruct(3).getString(0), r.getInt(4)))
      .toSet
    assert(got == Set(("en", 3L, "gamma", 1), ("en", 1L, "alpha", 2),
      ("de", 5L, "delta", 1)))
  }

  test("globalRowNumber: matches single-window numbering across many range partitions") {
    val rows = (1L to 97L).map(i => (i, (i * 37) % 100)).toDF("id", "score")
    val got = Ranking.globalRowNumber(rows, Seq(col("score").desc, col("id")),
        numPartitions = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = rows.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == expected)
    // plan discipline: every Window in the plan is partitioned by _pid —
    // a bare `row_number() OVER (ORDER BY ...)` would show an empty
    // partition spec and funnel the corpus through one task
    val plan = Ranking.globalRowNumber(rows, Seq(col("score").desc, col("id")),
        numPartitions = 7)
      .queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty)
    assert(windows.filter(_.contains("row_number")).forall(_.contains("_pid#")),
      s"corpus-ranking window not partitioned by _pid:\n$plan")
  }

  test("quantileBuckets: exact rank cuts, fractions honored on a known frame") {
    val rows = (1L to 10L).map(i => (i, 100L - i)).toDF("id", "w")
    val got = Ranking.quantileBuckets(rows, Seq(col("w").desc, col("id")),
        Seq(("head", 0.1), ("middle", 0.4), ("tail", 0.5)), numPartitions = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    // w descends with id, so rank == id; ceil(0.1*10)=1, ceil(0.5*10)=5
    assert(got(1L) == ((1L, "head")))
    (2L to 5L).foreach(i => assert(got(i) == ((i, "middle")), s"id $i: ${got(i)}"))
    (6L to 10L).foreach(i => assert(got(i) == ((i, "tail")), s"id $i: ${got(i)}"))
  }

  test("rrf fusion: rank-sum ordering, single-list candidates survive") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "nid", "rnk")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("qid", "nid", "rnk")
    val got = Ranking.reciprocalRankFusionPerQuery(Seq(a, b), k = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getAs[Long]("nid"), r.getAs[Int]("rnk")))
    // 11 is in both lists (1/62 + 1/61) > 10 (1/61) > 12 (1/62)
    assert(got.toSeq == Seq((11L, 1), (10L, 2), (12L, 3)))
  }

  test("profile: one row per column with exact stats") {
    val rows = Seq((1L, Some("a")), (2L, None), (2L, Some("b")))
      .toDF("k", "s")
    val got = Profiling.profile(rows, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(got("k") == ((3L, 0L, 2L, "1", "2")))
    assert(got("s") == ((3L, 1L, 2L, "a", "b")))
  }

  test("disk IVF append: new vectors searchable without rebuild") {
    import graft.operators.IvfIndex
    val dim = 8
    val rnd = new scala.util.Random(11)
    val base = (0 until 100).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("nid", "nvec")
    val dir = java.nio.file.Files.createTempDirectory("ivfapp").toString + "/idx"
    val disk = IvfIndex.buildTrained(base, nlist = 4, iters = 2).save(spark, dir)

    // append a distinctive new vector, then query AT it: must be rank 1
    val probe = Array.fill(dim)(0.9f)
    disk.append(Seq((999L, probe)).toDF("nid", "nvec"))
    assert(spark.read.parquet(dir).count() == 101)
    val hit = disk.search(
      Seq((1L, probe)).toDF("qid", "qvec"), k = 3, nprobe = 2)
      .filter(col("rnk") === 1).head()
    assert(hit.getAs[Long]("nid") == 999L,
      s"appended vector should top its own query, got $hit")
  }

  // ------------------------------------------------- product quantization

  private def clusteredVecs(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val center = i % 4
      val v = Array.tabulate(dim)(d =>
        (if (d % 4 == center) 1.0f else 0.0f) + rnd.nextFloat() * 0.2f)
      (i.toLong, v)
    }
  }

  test("pq: codes in range, deterministic training, bounded reconstruction error") {
    val data = clusteredVecs(200, 16).toDF("id", "v")
    val cb = ProductQuantization.train(data, col("v"), dim = 16, m = 4, k = 8, iters = 3)
    val cb2 = ProductQuantization.train(data, col("v"), dim = 16, m = 4, k = 8, iters = 3)
    assert(cb.codebooks.flatten.flatten.toSeq == cb2.codebooks.flatten.flatten.toSeq,
      "training must be deterministic (seeded init, fixed iters)")
    assert(cb.m == 4 && cb.k == 8 && cb.subDim == 4)

    val enc = data.select(col("id"), ProductQuantization.encode(col("v"), cb).as("codes"))
    val codes = enc.select(explode(col("codes"))).collect().map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c < 8))

    // mean squared reconstruction error well below the mean squared norm
    val err = data
      .withColumn("rv", ProductQuantization.decode(
        ProductQuantization.encode(col("v"), cb), cb))
      .select(avg(expr(
        "aggregate(zip_with(cast(v as array<double>), rv, (a, b) -> (a-b)*(a-b)), 0D, (acc, x) -> acc + x)")))
      .head().getDouble(0)
    assert(err < 0.2, s"reconstruction MSE too high: $err")
  }

  test("pq adc: top-k recall against exact dot-product search") {
    val data = clusteredVecs(220, 16)
    val candidates = data.filter(_._1 >= 20).toDF("nid", "nvec")
    val queries = data.filter(_._1 < 20).toDF("qid", "qvec")
    val cb = ProductQuantization.train(candidates, col("nvec"), dim = 16, m = 4, k = 16, iters = 3)
    val enc = candidates.select(col("nid"),
      ProductQuantization.encode(col("nvec"), cb).as("codes"))
    val pq = ProductQuantization.adcTopK(queries, enc, cb, k = 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    import graft.functions.GraftFunctions
    val exact = candidates.crossJoin(broadcast(queries))
      .select(col("qid"), col("nid"),
        GraftFunctions.vecDot(col("qvec").cast("array<double>"),
          col("nvec").cast("array<double>")).as("score_raw"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score_raw").desc, col("nid").asc)
    val exactTop = exact.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = pq.map { case (q, ids) => ids.intersect(exactTop(q)).size / 10.0 }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.5, s"ADC recall@10 too low: $meanRecall")
  }
}
