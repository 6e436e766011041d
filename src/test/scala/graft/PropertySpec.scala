package graft

import org.scalacheck.Gen

import graft.functions.TopKHeap
import graft.meta.{DatasetMetadata, DenseModelMetadata, SparseModelMetadata}

/** Property tests for the pure cores: heap selection, metadata round-trip,
  * the n-gram tokenizer equivalence (per SURVEY §5 port plan).
  * scalacheck generators driven directly (no scalatestplus bridge in the
  * offline dependency set).
  */
class PropertySpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], trials: Int = 100)(body: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    var seed = seed0
    var done = 0
    var attempts = 0
    while (done < trials && attempts < trials * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { v => body(v); done += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(done > trials / 2, s"generator produced only $done/$trials samples")
  }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => body(t._1, t._2))

  test("property: TopKHeap selects exactly the sort-based top-k") {
    val gen = for {
      k <- Gen.choose(1, 8)
      n <- Gen.choose(0, 60)
      scores <- Gen.listOfN(n, Gen.choose(0.0, 1.0))
      ids <- Gen.listOfN(n, Gen.choose(0L, 20L)) // small id range → ties likely
    } yield (k, scores.zip(ids))
    forAll(gen) { case (k, pairs) =>
      val h = new TopKHeap(k)
      pairs.foreach { case (s, i) => h.insert(s, i) }
      val expected = pairs
        .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
        .take(k)
      assert(h.sortedDesc.toSeq == expected)
    }
  }

  test("property: heap merge order does not change the result") {
    val pairGen = Gen.listOf(Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0L, 1000L)))
    forAll2(pairGen, pairGen) { (xs, ys) =>
      val ab = new TopKHeap(5); val ba = new TopKHeap(5)
      val hx = new TopKHeap(5); val hy = new TopKHeap(5)
      xs.foreach { case (s, i) => hx.insert(s, i) }
      ys.foreach { case (s, i) => hy.insert(s, i) }
      (xs ++ ys).foreach { case (s, i) => ab.insert(s, i) }
      hx.mergeFrom(hy)
      (ys ++ xs).foreach { case (s, i) => ba.insert(s, i) }
      assert(hx.sortedDesc.toSeq == ab.sortedDesc.toSeq)
      assert(ab.sortedDesc.toSeq == ba.sortedDesc.toSeq)
    }
  }

  test("property: DatasetMetadata render/parse round-trips") {
    val strGen = Gen.alphaNumStr.suchThat(_.nonEmpty)
    val metaGen = for {
      name <- strGen
      docs <- Gen.choose(0L, Long.MaxValue / 2)
      qs <- Gen.choose(0L, 1000000L)
      dim <- Gen.choose(1, 4096)
      tok <- Gen.option(strGen)
      desc <- Gen.option(Gen.asciiPrintableStr)
      tags <- Gen.option(Gen.listOf(strGen))
      sparse <- Gen.option(strGen.map(n => SparseModelMetadata(n, None)))
    } yield DatasetMetadata(
      name = name, created_at = "2021-01-01 00:00:00.000000",
      documents = docs, queries = qs,
      dense_model = DenseModelMetadata("m", tok, dim),
      sparse_model = sparse, description = desc, tags = tags)
    forAll(metaGen) { m =>
      assert(DatasetMetadata.fromJson(m.toJson) == m)
    }
  }

  test("property: filter compiler equals hand-built predicates on random filters") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = (1 to 300).map { i =>
      (i, Seq("red", "blue", "green", "teal")(i % 4), (i % 50).toDouble, i % 3 == 0)
    }
    val df = rows.toDF("id", "color", "size", "flag").cache()
    val colorGen = Gen.oneOf("red", "blue", "green", "teal", "absent")
    val numGen = Gen.choose(0, 55)
    val caseGen: Gen[(String, Int => Boolean, String)] = Gen.oneOf(
      colorGen.map(c => (s"""{"color": {"$$eq": "$c"}}""",
        (i: Int) => rows(i - 1)._2 == c, s"eq $c")),
      colorGen.map(c => (s"""{"color": {"$$ne": "$c"}}""",
        (i: Int) => rows(i - 1)._2 != c, s"ne $c")),
      numGen.map(n => (s"""{"size": {"$$gte": $n}}""",
        (i: Int) => rows(i - 1)._3 >= n, s"gte $n")),
      numGen.map(n => (s"""{"size": {"$$lt": $n}}""",
        (i: Int) => rows(i - 1)._3 < n, s"lt $n")),
      Gen.zip(colorGen, numGen).map { case (c, n) =>
        (s"""{"$$or": [{"color": "$c"}, {"size": {"$$gt": $n}}]}""",
          (i: Int) => rows(i - 1)._2 == c || rows(i - 1)._3 > n, s"or $c $n")
      },
      Gen.zip(colorGen, numGen).map { case (c, n) =>
        (s"""{"color": {"$$in": ["$c", "red"]}, "size": {"$$lte": $n}}""",
          (i: Int) => Seq(c, "red").contains(rows(i - 1)._2) && rows(i - 1)._3 <= n,
          s"in+lte $c $n")
      })
    forAll(caseGen, trials = 60) { case (filterJson, pred, label) =>
      val got = df.filter(graft.operators.FilterCompiler.compile(filterJson))
        .select("id").collect().map(_.getInt(0)).toSet
      val want = rows.map(_._1).filter(pred).toSet
      assert(got == want, s"filter case: $label → $filterJson")
    }
    df.unpersist()
  }

  test("property: per-row top_k search equals per-query sort/take on random data") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // candidates are 2-d unit-ish vectors [c, sqrt(1-c²)] against the query
    // [1, 0], so each candidate's cosine is directly controlled by c
    val gen = for {
      nq <- Gen.choose(1, 5)
      nc <- Gen.choose(1, 40)
      ks <- Gen.listOfN(nq, Gen.choose(1, 7))
      cs <- Gen.listOfN(nc, Gen.choose(-0.99, 0.99))
    } yield (ks, cs)
    forAll(gen, trials = 10) { case (ks, cs) =>
      val qs = ks.zipWithIndex
        .map { case (k, q) => (q.toLong, Seq(1.0f, 0.0f), null: String, k) }
        .toDF("qid", "qvec", "filter", "top_k")
      val cands = cs.zipWithIndex.map { case (c, i) =>
        (i.toLong, Seq(c.toFloat, math.sqrt(1 - c * c).toFloat), "{}")
      }.toDF("nid", "nvec", "metadata")
      val got = graft.operators.Similarity.filteredTopKPerQuery(qs, cands)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
      // replicate the scoring exactly: float-stored components widened to
      // double, fused dot/norm pass (VectorCosineSimilarity)
      val scored = cs.zipWithIndex.map { case (c, i) =>
        val x = c.toFloat.toDouble
        val y = math.sqrt(1 - c * c).toFloat.toDouble
        (i.toLong, x / (math.sqrt(1.0) * math.sqrt(x * x + y * y)))
      }
      val ranked = scored.sortBy { case (nid, s) => (-s, nid) }.map(_._1)
      ks.zipWithIndex.foreach { case (k, q) =>
        assert(got.getOrElse(q.toLong, Seq.empty) == ranked.take(k),
          s"qid=$q k=$k")
      }
    }
  }

  test("property: connected components equal a local union-find") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 16)
      m <- Gen.choose(0, 20)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield (n.toLong, edges.filter(e => e._1 != e._2))
    forAll(gen, trials = 8) { case (n, edges) =>
      // union-find merging larger root under smaller: root == set minimum
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n.toInt).map(i => i.toLong -> find(i).toLong).toMap
      val got = graft.operators.ConnectedComponents
        .run(edges.toDF("src", "dst"), (0L until n).toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"n=$n edges=$edges")
    }
  }

  test("property: chunk grammar covers every char and reassembles the text") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gen = for {
      cs <- Gen.choose(2, 10)
      ov <- Gen.choose(0, 9).map(o => math.min(o, cs - 1))
      text <- Gen.listOf(Gen.alphaChar).map(_.mkString)
    } yield (cs, ov, text)
    forAll(gen, trials = 12) { case (cs, ov, text) =>
      val step = cs - ov
      val rows = graft.operators.Chunking
        .chunkByChars(Seq((1L, text)).toDF("doc_id", "text"),
          col("doc_id"), col("text"), cs, ov)
        .orderBy("chunk_idx").collect()
        .map(r => (r.getLong(2), r.getString(3)))
      assert(rows.length == math.max(1, (text.length + step - 1) / step))
      rows.foreach { case (start, t) =>
        assert(t == text.slice(start.toInt, start.toInt + cs))
      }
      // concatenating each chunk's non-overlap prefix plus the full last
      // chunk reproduces the document exactly — no char lost or duplicated
      val rebuilt = rows.init.map(_._2.take(step)).mkString + rows.last._2
      assert(rebuilt == text, s"cs=$cs ov=$ov len=${text.length}")
    }
  }

  test("property: native ngram hashes equal HOF formulation on random word texts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val word = Gen.oneOf("spark", "join", "the", "a", "merge", "x", "日本", "é")
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    val texts = Gen.listOfN(40, textGen).sample.getOrElse(Seq("a b c"))
    val df = texts.toDF("t")
    Seq(1, 2, 3).foreach { n =>
      val native = df.select(
        graft.functions.SketchFunctions.wordNgramHashes(col("t"), n, distinct = true))
        .collect().map(_.getSeq[Long](0).toSet).toSeq
      val hof = df.select(
        array_distinct(transform(graft.operators.TextDedup.wordShingles(col("t"), n),
          s => xxhash64(s))))
        .collect().map(_.getSeq[Long](0).toSet).toSeq
      assert(native == hof, s"mismatch at n=$n")
    }
  }

  test("property: dedupLines matches a plain-Scala election on randomized corpora") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val linePool = Vector("alpha beta", "gamma", "delta epsilon zeta", "", "eta", "theta iota")
    val docGen = Gen.listOf(Gen.oneOf(linePool)).map(_.mkString("\n"))
    val corpusGen = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, docGen))
    forAll(corpusGen, trials = 8) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // reference: first (doc, idx) occurrence wins, rebuild in order
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = docs.map { case (id, t) =>
        val ls = t.split("\n", -1).toSeq
        val kept = ls.filter(l => seen.add(l))
        (id, kept.size.toLong, (ls.size - kept.size).toLong, kept.mkString("\n"))
      }.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val got = graft.operators.TextDedup.dedupLines(
          docs.toDF("id", "t"), col("id"), col("t"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got == expected, s"corpus=$texts\n$got\nvs\n$expected")
    }
  }

  test("property: overlapMatrix matches plain-Scala set arithmetic on randomized groups") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val docGen = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val rowGen = Gen.zip(Gen.oneOf("g1", "g2", "g3"), docGen)
    forAll(Gen.choose(3, 20).flatMap(n => Gen.listOfN(n, rowGen)), trials = 8) { rows =>
      def bigrams(t: String): Set[String] = {
        val w = t.toLowerCase.split(" ").toSeq
        w.zip(w.drop(1)).map { case (x, y) => s"$x $y" }.toSet
      }
      val sets = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(_._2).map(bigrams).fold(Set.empty)(_ ++ _)
      }.filter(_._2.nonEmpty)
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        sa = sets(a); sb = sets(b); c = (sa & sb).size
      } yield (a, b) -> ((sa.size.toLong, sb.size.toLong, c.toLong,
        BigDecimal(c.toDouble / (sa.size + sb.size - c))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
      val got = graft.operators.Profiling.overlapMatrix(
          rows.toDF("g", "t"), col("g"), col("t"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      assert(got == expected, s"rows=$rows\n$got\nvs\n$expected")
    }
  }

  test("property: CDC chunks reconstruct the input and cut exactly at hash boundaries") {
    import org.apache.spark.unsafe.types.UTF8String
    // independent O(n·w) reference: per-position Horner over code points
    // (no rolling update — a structurally different formulation)
    def refChunks(s: String, w: Int, d: Int): Seq[String] = {
      val cps = s.codePoints().toArray
      val n = cps.length
      if (n == 0) return Seq.empty
      if (n < w) return Seq(s)
      val bounds = (w - 1 until n).filter { j =>
        var h = 0L
        for (i <- j - w + 1 to j) h = h * 31L + cps(i)
        h % d == 0
      }
      val cuts = (-1 +: bounds) :+ (n - 1)
      cuts.sliding(2).collect {
        case Seq(a, b) if b > a => new String(cps, a + 1, b - a)
      }.toSeq.filter(_.nonEmpty)
    }
    val charGen = Gen.oneOf(('a' to 'f') :+ ' ' :+ '.' :+ '日' :+ 'é')
    val gen = for {
      n <- Gen.choose(0, 120)
      cs <- Gen.listOfN(n, charGen)
      w <- Gen.choose(2, 10)
      d <- Gen.oneOf(4, 16, 32)
    } yield (cs.mkString, w, d)
    forAll(gen, trials = 150) { case (s, w, d) =>
      val expr = graft.functions.CdcChunks(
        org.apache.spark.sql.catalyst.expressions.Literal(s), w, d)
      val got = expr.compute(UTF8String.fromString(s))
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(got.mkString == s, s"reconstruction failed for '$s' (w=$w d=$d)")
      assert(got == refChunks(s, w, d),
        s"boundary divergence for '$s' (w=$w d=$d):\n$got\nvs\n${refChunks(s, w, d)}")
    }
  }
}
