package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions
import graft.operators.TextDedup

class TextDedupSpec extends SparkSpec {

  // Two planted near-dup clusters + unrelated docs.
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "completely different text about spark query engines and shuffle joins"),
      (4L, "completely different text about spark query engines and broadcast joins"),
      (5L, "unrelated document mentioning parquet column pruning and predicate pushdown"),
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
  }

  test("wordShingles: distinct word bigrams") {
    import spark.implicits._
    val sh = Seq(Tuple1("a b c a b")).toDF("t")
      .select(TextDedup.wordShingles(col("t"), 2)).head().getSeq[String](0)
    assert(sh.toSet == Set("a b", "b c", "c a"))
    val tri = Seq(Tuple1("a b c d")).toDF("t")
      .select(TextDedup.wordShingles(col("t"), 3)).head().getSeq[String](0)
    assert(tri.toSet == Set("a b c", "b c d"))
    val short = Seq(Tuple1("solo")).toDF("t")
      .select(TextDedup.wordShingles(col("t"), 2)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("word_ngram_hashes equals the xxhash64-over-shingle-strings formulation") {
    import spark.implicits._
    val df = Seq(Tuple1("the quick brown fox"), Tuple1("a  b"), Tuple1("solo"), Tuple1(""))
      .toDF("t")
    val native = df.select(
      graft.functions.SketchFunctions.wordNgramHashes(col("t"), 2, distinct = true))
      .collect().map(_.getSeq[Long](0).toSet)
    val viaHof = df.select(
      array_sort(array_distinct(transform(
        TextDedup.wordShingles(col("t"), 2), s => xxhash64(s)))))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(native.toSeq == viaHof.toSeq)
    // multiset (distinct=false) keeps duplicates
    val multi = Seq(Tuple1("x y x y x")).toDF("t")
      .select(graft.functions.SketchFunctions.wordNgramHashes(col("t"), 1, distinct = false))
      .head().getSeq[Long](0)
    assert(multi.length == 5 && multi.toSet.size == 2)
  }

  test("minhash signature: identical sets → identical signatures; similar sets → mostly equal") {
    import spark.implicits._
    val sigs = docs
      .select(col("doc_id"),
        SketchFunctions.minhashSignature(
          TextDedup.shingleHashes(TextDedup.wordShingles(col("text"))), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).size == 64)
    val agree12 = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    val agree16 = sigs(1L).zip(sigs(6L)).count { case (a, b) => a == b }
    assert(agree12 > 40, s"near-dups agree on $agree12/64")
    assert(agree16 < 10, s"unrelated agree on $agree16/64")
  }

  test("minhashNearDupPairs finds planted pairs and nothing else") {
    val pairs = TextDedup.minhashNearDupPairs(docs, col("doc_id"), col("text"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("minhash equals exhaustive ngram-Jaccard on the same corpus") {
    val lsh = TextDedup.minhashNearDupPairs(docs, col("doc_id"), col("text"), threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = TextDedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact)
  }

  test("simhash: near-dups within small hamming distance, unrelated far") {
    import spark.implicits._
    val sims = docs.select(col("doc_id"), TextDedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(2L)) <= 8)
    assert(ham(sims(1L), sims(6L)) > 10)
  }

  test("simhashNearDupPairs: pigeonhole blocking finds all pairs within bound") {
    import spark.implicits._
    val sims = docs.select(col("doc_id"), TextDedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bound = 16
    val expected = (for {
      a <- sims.keys; b <- sims.keys if a < b
      if java.lang.Long.bitCount(sims(a) ^ sims(b)) <= bound
    } yield (a, b)).toSet
    val got = TextDedup.simhashNearDupPairs(docs, col("doc_id"), col("text"), maxHamming = bound)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.contains((1L, 2L)))
  }

  test("commonShingleFraction flags templated text, not unique text") {
    import spark.implicits._
    // docs 1-4 share the boilerplate "all rights reserved"; doc 5 is unique
    val corpus = Seq(
      (1L, "alpha text all rights reserved"),
      (2L, "beta words all rights reserved"),
      (3L, "gamma thing all rights reserved"),
      (4L, "delta item all rights reserved"),
      (5L, "totally unique content here")).toDF("doc_id", "text")
    val got = TextDedup.commonShingleFraction(
      corpus, col("doc_id"), col("text"), shingleSize = 2, minDocFreq = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // each of docs 1-4 has 4 distinct bigrams; "all rights"/"rights reserved"
    // appear in 4 docs -> common_frac = 2/4
    (1L to 4L).foreach { d => assert(got(d) == ((4L, 0.5)), s"doc $d: ${got(d)}") }
    assert(got(5L)._2 == 0.0)
    // plan discipline: the common-set flag comes back by broadcast — the
    // exploded shingle stream shuffles only into the df aggregation, never
    // through a hash-partitioned join (stop-shingles are skew keys there)
    val plan = TextDedup.commonShingleFraction(
      corpus, col("doc_id"), col("text"), shingleSize = 2, minDocFreq = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "common-set join must broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "exploded stream must not shuffle into the join")
  }

  test("spanDuplicationStats: within-doc and cross-doc duplicate windows, case-folded keys") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a B c d e f"), // spans (W=4,S=2): [a B c d], [c d e f]
      (2L, "x y a b C d z w"), // [x y a b], [a b C d], [c d z w]
      (3L, "p q r s p q r s"), // [p q r s], [r s p q], [p q r s] — within-doc dup
      (4L, "too few tokens")).toDF("doc_id", "text")
    val got = TextDedup.spanDuplicationStats(
      corpus, col("doc_id"), col("text"), windowTokens = 4, stride = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // "a b c d" occurs in docs 1 and 2 (case-folded); "p q r s" twice in doc 3
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((3L, 1L, 0.3333)))
    assert(got(3L) == ((3L, 2L, 0.6667)))
    assert(!got.contains(4L), "sub-window docs contribute no spans")
  }

  test("stripDuplicateSpans: covered tokens drop, originals' case survives") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a B c d e f"),
      (2L, "x y a b C d z w"),
      (3L, "p q r s p q r s"),
      (4L, "too few tokens")).toDF("doc_id", "text")
    val got = TextDedup.stripDuplicateSpans(
      corpus, col("doc_id"), col("text"), windowTokens = 4, stride = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "e f") // dup span s=0 covers tokens 0-3
    assert(got(2L) == "x y z w") // dup span s=2 covers tokens 2-5
    assert(got(3L) == "") // both dup spans cover everything
    assert(got(4L) == "too few tokens") // sub-window doc passes whole
  }

  test("maximalDuplicateSpans: consecutive dup windows chain into variable-length spans") {
    import spark.implicits._
    val corpus = Seq(
      // docs 1 and 2 share the 6-token passage "a b c d e f": with w=4,
      // starts 0,1,2 are duplicated in doc 1 → ONE maximal span of 6
      // tokens, not three 4-token windows
      (1L, "a b c d e f X Y"),
      (2L, "P Q a b c d e f"),
      // doc 3 repeats its own 4-token window at two non-adjacent places:
      // two separate maximal spans of exactly w tokens
      (3L, "k l m n Z Z Z k l m n"),
      (4L, "too few tokens")).toDF("doc_id", "text")
    val got = TextDedup.maximalDuplicateSpans(
      corpus, col("doc_id"), col("text"), windowTokens = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(got == Set(
      (1L, 0, 6, "a b c d e f"),
      (2L, 2, 6, "a b c d e f"),
      (3L, 0, 4, "k l m n"),
      (3L, 7, 4, "k l m n")))
  }

  test("maximalDuplicateSpans matches a plain-Scala reference on a randomized corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(4321)
    val vocab = Array("a", "b", "c", "d", "e")
    val docs = (1L to 40L).map { id =>
      val n = 2 + rnd.nextInt(30)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val w = 4
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val spans = toks.toSeq.flatMap { case (id, ts) =>
      (0 to ts.length - w).map(st => (id, st, ts.slice(st, st + w).mkString(" ")))
    }
    val df = spans.groupBy(_._3).map { case (k, v) => k -> v.size }
    val ref = toks.toSeq.flatMap { case (id, ts) =>
      val dupStarts = spans.filter(x => x._1 == id && df(x._3) >= 2).map(_._2).sorted
      // chain consecutive starts into maximal runs
      val runs = dupStarts.foldLeft(List.empty[(Int, Int)]) {
        case ((a, b) :: rest, s) if s == b + 1 => (a, s) :: rest
        case (acc, s) => (s, s) :: acc
      }.reverse
      runs.map { case (a, b) =>
        (id, a, b - a + w, ts.slice(a, b + w).mkString(" ")) }
    }.toSet
    val got = TextDedup.maximalDuplicateSpans(
      docs.toDF("doc_id", "text"), col("doc_id"), col("text"), windowTokens = w)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(got == ref)
  }

  test("span dedup matches a plain-Scala reference on a randomized corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val vocab = Array("a", "b", "c", "d", "e") // tiny vocab → dup windows certain
    val docs = (1L to 40L).map { id =>
      val n = 2 + rnd.nextInt(30)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val (w, s) = (4, 2)
    // reference: the operator semantics in ~15 lines of plain Scala
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val spans = toks.toSeq.flatMap { case (id, ts) =>
      (0 to ts.length - w by s).map(st => (id, st, ts.slice(st, st + w).mkString(" ")))
    }
    val df = spans.groupBy(_._3).map { case (k, v) => k -> v.size }
    val statsRef = spans.groupBy(_._1).map { case (id, ss) =>
      val dup = ss.count(x => df(x._3) >= 2)
      id -> ((ss.size.toLong, dup.toLong,
        BigDecimal(dup.toDouble / ss.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val stripRef = toks.map { case (id, ts) =>
      val dupStarts = spans.filter(x => x._1 == id && df(x._3) >= 2).map(_._2)
      id -> ts.zipWithIndex.collect {
        case (t, i) if !dupStarts.exists(st => st <= i && i < st + w) => t
      }.mkString(" ")
    }

    val corpus = docs.toDF("doc_id", "text")
    val gotStats = TextDedup.spanDuplicationStats(
      corpus, col("doc_id"), col("text"), windowTokens = w, stride = s)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(gotStats == statsRef, "stats diverge from reference")
    val gotStrip = TextDedup.stripDuplicateSpans(
      corpus, col("doc_id"), col("text"), windowTokens = w, stride = s)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotStrip == stripRef, "strip diverges from reference")
    // cross-invariant: zero duplicate spans ⇔ strip leaves the tokens intact
    toks.foreach { case (id, ts) =>
      if (gotStats.get(id).forall(_._2 == 0L))
        assert(gotStrip(id) == ts.mkString(" "), s"doc $id stripped without dups")
    }
  }

  test("span dedup rejects degenerate window/stride") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextDedup.spanDuplicationStats(df, col("doc_id"), col("text"), windowTokens = 0)
    }
    intercept[IllegalArgumentException] {
      TextDedup.stripDuplicateSpans(df, col("doc_id"), col("text"), stride = 0)
    }
  }

  test("flagContaminated: overlap counts against a broadcast benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "secret benchmark question about spark")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "innocuous text with nothing shared"),
      (2L, "a secret benchmark question indeed"), // 2 overlapping bigrams
      (3L, "")).toDF("doc_id", "text")
    val got = TextDedup.flagContaminated(train, bench, col("doc_id"), col("text"),
        shingleSize = 2, minOverlap = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L) == ((0L, false)))
    assert(got(2L) == ((2L, true)), s"got ${got(2L)}")
    assert(got(3L) == ((0L, false)), "empty doc must survive with zero overlap")
  }

  test("flagContaminatedBloom: exact counts match flagContaminated; plan uses might_contain") {
    import spark.implicits._
    val bench = (1L to 20L).map(i => (100L + i, s"secret benchmark question number$i about spark"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "innocuous text with nothing shared"),
      (2L, "a secret benchmark question indeed"),
      (3L, ""),
      (4L, "secret benchmark question number7 about spark exactly")).toDF("doc_id", "text")
    val bloomed = TextDedup.flagContaminatedBloom(train, bench, col("doc_id"), col("text"),
      shingleSize = 2, minOverlap = 2)
    val exact = TextDedup.flagContaminated(train, bench, col("doc_id"), col("text"),
      shingleSize = 2, minOverlap = 2)
    val gotB = bloomed.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val gotE = exact.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // the Bloom path is a PREFILTER: results are exactly the broadcast-set path's
    assert(gotB == gotE, s"bloom $gotB vs exact $gotE")
    assert(gotB(4L)._2 && !gotB(1L)._2 && gotB(3L) == ((0L, false)))
    // the corpus-side stream is pruned by the codegen bloom predicate
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prefilter must appear in the plan:\n$plan")

    // sizing clamps to the session's bloom conf maxima instead of
    // failing analysis (a tiny cap forces a dense filter; the confirm
    // join keeps results exact regardless)
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "256")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "16")
    try {
      val clamped = TextDedup.flagContaminatedBloom(train, bench, col("doc_id"), col("text"),
          shingleSize = 2, minOverlap = 2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(clamped == gotE, s"clamped bloom $clamped vs exact $gotE")
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.maxNumItems")
    }
  }

  test("minhashNearDupGroups: identical components to the pair+CC path, linear output") {
    import spark.implicits._
    // exact-dup class of 20 verbatim copies (the sf1 blow-up shape), a
    // non-exact near-dup pair, a transitive chain, singletons, and
    // shingle-less one-word docs that must NOT merge with each other
    val copies = (100L until 120L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog near the river bank"))
    val rows = copies ++ Seq(
      (10L, "spark query engines love columnar parquet scans with pushdown filters"),
      (11L, "spark query engines love columnar parquet scans with pushdown predicates"),
      (20L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (21L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (22L, "alpha beta gamma delta epsilon zeta eta theta iota kappa pi rho"),
      (30L, "a lone unrelated document about bucketed joins and shuffle exchanges"),
      (40L, "solo"),
      (41L, "solo"),
      (42L, ""))
    val df = rows.toDF("doc_id", "text")

    val viaGroups = TextDedup.minhashNearDupGroups(
        df, col("doc_id"), col("text"), threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val viaPairs = graft.operators.ConnectedComponents.clusterPairs(
        TextDedup.minhashNearDupPairs(df, col("doc_id"), col("text"), threshold = 0.5),
        df, col("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(viaGroups == viaPairs,
      s"group-first diverged from pair+CC:\n$viaGroups\nvs\n$viaPairs")

    // one row per doc; the 20-copy class maps to min id 100
    assert(viaGroups.size == rows.size)
    (100L until 120L).foreach(i => assert(viaGroups(i)._1 == 100L))
    assert(viaGroups(100L)._2 && !viaGroups(101L)._2)
    // shingle-less docs stay singletons even with identical text
    assert(viaGroups(40L) == ((40L, true)) && viaGroups(41L) == ((41L, true)))
    assert(viaGroups(42L) == ((42L, true)))

    // and the pair path's output for the copy class alone is quadratic
    // (190 rows) where the group output is 20 — the scale contract
    val pairRows = TextDedup.minhashNearDupPairs(
        copies.toDF("doc_id", "text"), col("doc_id"), col("text"), threshold = 0.5)
      .count()
    assert(pairRows == 190L, s"expected 190 pair rows, got $pairRows")
  }

  test("crossCorpusNearDup: admission flags match brute-force Jaccard, no same-side pairs") {
    import spark.implicits._
    val existing = Seq(
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (4L, "spark query engines love columnar parquet scans with pushdown filters"),
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (8L, "the quick brown fox jumps over the lazy dog near the river bank")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      // verbatim dup of existing 2 AND 8 -> matched_id = min = 2
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      // one-word variant of existing 4 (J well above 0.5)
      (3L, "spark query engines love columnar parquet scans with pushdown predicates"),
      // near-dup of another INCOMING doc only -> same-side match must NOT count
      (5L, "completely novel content about watermark state stores and session gaps"),
      (7L, "completely novel content about watermark state stores and session windows"),
      // shingle-less
      (9L, "solo")
    ).toDF("doc_id", "text")

    val got = TextDedup.crossCorpusNearDup(incoming, existing,
        col("doc_id"), col("text"), threshold = 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got == Map(
      1L -> ((2L, false)),
      3L -> ((4L, false)),
      5L -> ((-1L, true)),
      7L -> ((-1L, true)),
      9L -> ((-1L, true))), s"got $got")
  }

  test("DedupIndex: save->open->admit matches the in-flight operator; append extends the corpus") {
    import spark.implicits._
    val existing = Seq(
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (4L, "spark query engines love columnar parquet scans with pushdown filters"),
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")
    ).toDF("doc_id", "text")
    val lateArrival = Seq(
      (8L, "watermarks bound streaming state across session gaps and late events")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "spark query engines love columnar parquet scans with pushdown predicates"),
      (5L, "watermarks bound streaming state across session gaps and late arrivals"),
      (7L, "completely novel content nothing in the stored corpus resembles at all")
    ).toDF("doc_id", "text")
    def collectAdmit(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(2))))
      .toMap

    val dir = java.nio.file.Files.createTempDirectory("dedup-index-spec-").toString
    graft.operators.DedupIndex.save(existing, col("doc_id"), col("text"), dir,
      threshold = 0.5)
    val idx = graft.operators.DedupIndex.open(spark, dir)
    assert(idx.params.bands == 21 && idx.params.threshold == 0.5)

    val viaIndex = collectAdmit(idx.admit(incoming, col("doc_id"), col("text")))
    val viaFlight = collectAdmit(TextDedup.crossCorpusNearDup(
      incoming, existing, col("doc_id"), col("text"), threshold = 0.5))
    assert(viaIndex == viaFlight, s"index path diverged:\n$viaIndex\nvs\n$viaFlight")
    // before the append, doc 5's near-match (8) is not in the index
    assert(viaIndex(5L) == ((-1L, true)))

    idx.append(lateArrival, col("doc_id"), col("text"))
    val after = collectAdmit(idx.admit(incoming, col("doc_id"), col("text")))
    assert(after(5L) == ((8L, false)), s"appended doc not matched: ${after(5L)}")
    assert(after - 5L == viaIndex - 5L, "append changed unrelated admissions")
  }

  test("simhashNearDupGroups: identical components to the pair+CC path, linear output") {
    import spark.implicits._
    // verbatim copy class (identical prints collapse before the Hamming
    // join), a one-word-swap near-dup within Hamming 3, a transitive
    // chain, unrelated singletons, and empty/one-token docs (identical
    // prints — the PAIR path groups those too, so groups must as well)
    val copies = (100L until 115L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog near the river bank"))
    val rows = copies ++ Seq(
      (10L, "spark query engines love columnar parquet scans with pushdown filters today"),
      (11L, "spark query engines love columnar parquet scans with pushdown filters tonight"),
      (30L, "a lone unrelated document about bucketed joins and shuffle exchanges"),
      (40L, "solo"),
      (41L, "solo"),
      (42L, ""),
      (43L, ""))
    val df = rows.toDF("doc_id", "text")

    val viaGroups = TextDedup.simhashNearDupGroups(
        df, col("doc_id"), col("text"), maxHamming = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val viaPairs = graft.operators.ConnectedComponents.clusterPairs(
        TextDedup.simhashNearDupPairs(df, col("doc_id"), col("text"), maxHamming = 3),
        df, col("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(viaGroups == viaPairs,
      s"group-first diverged from pair+CC:\n$viaGroups\nvs\n$viaPairs")

    // one row per doc; the copy class maps to min id 100
    assert(viaGroups.size == rows.size)
    (100L until 115L).foreach(i => assert(viaGroups(i)._1 == 100L))
    assert(viaGroups(100L)._2 && !viaGroups(101L)._2)
    // identical one-word docs share a print => same group (pair-path parity)
    assert(viaGroups(41L)._1 == viaGroups(40L)._1)
    assert(viaGroups(43L)._1 == viaGroups(42L)._1)
    assert(viaGroups(30L) == ((30L, true)))

    // pair path is quadratic on the copy class (105 rows); groups emit 15
    val pairRows = TextDedup.simhashNearDupPairs(
        copies.toDF("doc_id", "text"), col("doc_id"), col("text"), maxHamming = 3)
      .count()
    assert(pairRows == 105L, s"expected 105 pair rows, got $pairRows")
  }

  test("dedupLines: each line keeps only its globally-first occurrence") {
    import spark.implicits._
    val docs = Seq(
      (0L, "z"),
      (1L, "a\nb\na"),   // within-doc dup: third line is a repeat of the first
      (2L, "b\nc"),      // "b" already seen in doc 1
      (3L, "a\nb"),      // every line lost → empty doc survives with n_kept=0
      (4L, "q\na\nr")).toDF("doc_id", "text") // kept lines keep original order
    val got = TextDedup.dedupLines(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.size == 5)
    assert(got(0L) == ((1L, 0L, "z")))
    assert(got(1L) == ((2L, 1L, "a\nb")), s"got ${got(1L)}")
    assert(got(2L) == ((1L, 1L, "c")))
    assert(got(3L) == ((0L, 2L, "")), s"all-lost doc must re-attach: ${got(3L)}")
    assert(got(4L) == ((2L, 1L, "q\nr")), s"order must survive: ${got(4L)}")
    // election is by (doc_id, idx), not arrival order: re-keying doc 0 above
    // doc 1 moves "a"'s first occurrence into doc 1... (z is unique either way)
    val rekeyed = docs.withColumn("doc_id",
      when(col("doc_id") === 0L, lit(9L)).otherwise(col("doc_id")))
    val got2 = TextDedup.dedupLines(rekeyed, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got2(9L) == "z" && got2(1L) == "a\nb")
    // never quadratic: no cartesian/broadcast-nested-loop in the plan
    val plan = TextDedup.dedupLines(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"dedupLines must stay key-partitioned:\n$plan")
  }
}
