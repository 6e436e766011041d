package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfPq

/** IVF-PQ composition guarantees: the probed-cell ADC search matches an
  * independent scalar re-implementation from the captured codebooks, the
  * scan plan both prunes partitions (PartitionFilters) AND excludes the
  * raw-vector column (ReadSchema), the layout reopens cold, and the exact
  * re-rank path returns true dot-product ranks of the ADC survivors.
  */
class IvfPqSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private def cands = emb.filter(col("vec_id") >= 5)
    .select(col("vec_id").as("nid"), col("embedding").as("nvec"))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Same metric + tie-break as CentroidOps.nearest: argmin of
    * |c|² − 2·v·c, ties to the smaller cell id.
    */
  private def nearest(v: Array[Double], cents: Array[Array[Double]]): Int =
    cents.indices.minBy(j => (dot(cents(j), cents(j)) - 2.0 * dot(v, cents(j)), j))

  /** Scalar replay of the full IVF-PQ pipeline (assign → residual →
    * encode → reconstruct → probe → two-term ADC score → top-k) from a
    * codebook pair — independent of every Spark expression involved.
    */
  private def scalarReplay(
      cbs: IvfPq.Codebooks,
      cRows: Array[(Long, Array[Double])],
      qRows: Array[(Long, Array[Double])],
      nprobe: Int,
      k: Int): Set[(Long, Long, Double, Int)] = {
    val cents = cbs.centroids
    val pq = cbs.pq
    val sd = pq.subDim
    val recon = cRows.map { case (nid, v) =>
      val cell = nearest(v, cents)
      val resid = v.indices.map(i => v(i) - cents(cell)(i)).toArray
      val rv = (0 until pq.m).flatMap { s =>
        val sub = resid.slice(s * sd, s * sd + sd)
        pq.codebooks(s)(nearest(sub, pq.codebooks(s)))
      }.toArray
      (nid, cell, rv)
    }
    qRows.flatMap { case (qid, qv) =>
      val probed = cents.indices
        .sortBy(j => (dot(cents(j), cents(j)) - 2.0 * dot(qv, cents(j)), j))
        .take(nprobe).toSet
      recon.filter(t => probed.contains(t._2))
        .map { case (nid, cell, rv) => (nid, dot(qv, cents(cell)) + dot(qv, rv)) }
        .sortBy { case (nid, sc) => (-sc, nid) }
        .take(k).zipWithIndex
        .map { case ((nid, sc), i) => (qid, nid, math.rint(sc * 1e4) / 1e4, i + 1) }
    }.toSet
  }

  test("ivf-pq: ADC search matches a scalar replay; plan prunes partitions AND the raw-vector column") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val idx = IvfPq.buildTrained(spark, cands, tmp, dim = 64,
      nlist = 8, m = 4, k = 16, iters = 2)
    val df = idx.search(queries, k = 5, nprobe = 3)

    // --- plan shape: the composition is visible in the scan itself
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"probed cells did not reach the scan as PartitionFilters:\n$plan")
    val readSchema = "ReadSchema: struct<[^>]*>".r.findFirstIn(plan)
    assert(readSchema.isDefined, plan)
    assert(readSchema.get.contains("codes:"), s"scan must read codes: $readSchema")
    assert(!readSchema.get.contains("v:"),
      s"ADC search must NOT read the raw vector column: $readSchema")
    assert(!plan.contains("Window"), s"Window survives in plan:\n$plan")

    // --- value oracle: scalar replay from the captured codebooks
    val cRows = cands.select(col("nid"), col("nvec").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val qRows = queries.select(col("qid"), col("qvec").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val expected = scalarReplay(idx.codebooks, cRows, qRows, nprobe = 3, k = 5)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected)

    // --- cold reopen: codebooks round-trip through JSON, results identical
    val reopened = IvfPq.load(spark, tmp)
    assert(reopened.codebooks.centroids.map(_.toSeq).toSeq ==
      idx.codebooks.centroids.map(_.toSeq).toSeq)
    assert(reopened.codebooks.pq.subDim == idx.codebooks.pq.subDim)
    assert(reopened.codebooks.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      idx.codebooks.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val again = reopened.search(queries, k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(again == got)

    // --- layout: one directory per cell, codebooks ride alongside
    val files = new java.io.File(tmp).listFiles()
    assert(files.count(_.getName.startsWith("cell=")) > 1)
    assert(files.exists(_.getName == "_ivfpq_codebooks.json"))
  }

  test("ivf-pq append: new vectors searchable without rebuild, frozen codebooks") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq-append").toString
    // build on the first half, append the second half as an ingest batch
    val first = cands.filter(col("nid") < 250)
    val second = cands.filter(col("nid") >= 250)
    val idx = IvfPq.buildTrained(spark, first, tmp, dim = 64,
      nlist = 8, m = 4, k = 16, iters = 2)
    idx.append(second)
    val got = IvfPq.load(spark, tmp).search(queries, k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // reference: the scalar replay over ALL candidates with the codebooks
    // trained on `first` only — append must equal "the rows were always
    // there" under frozen codebooks
    val cRows = cands.select(col("nid"), col("nvec").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val qRows = queries.select(col("qid"), col("qvec").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val expected = scalarReplay(idx.codebooks, cRows, qRows, nprobe = 3, k = 5)
    assert(got == expected && got.nonEmpty)
    // appended rows actually land: some result id is from the second half
    assert(got.exists(_._2 >= 250), s"no appended vector ever surfaced: $got")
  }

  test("ivf-pq refined: survivors re-ranked by exact dots, still no raw scan in the ADC stage") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq-refine").toString
    val idx = IvfPq.buildTrained(spark, cands, tmp, dim = 64,
      nlist = 8, m = 4, k = 16, iters = 2)
    val refined = idx.searchRefined(queries, k = 5, nprobe = 3, rerank = 20)
    val got = refined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // exact scores: every returned (qid, nid) must carry the TRUE dot
    // product of the raw vectors, not the ADC approximation
    val cMap = cands.select(col("nid"), col("nvec").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qMap = queries.select(col("qid"), col("qvec").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    got.foreach { case (qid, nid, score, _) =>
      val exact = math.rint(dot(qMap(qid), cMap(nid)) * 1e4) / 1e4
      assert(score == exact, s"($qid, $nid): refined=$score exact=$exact")
    }
    // ranks are dense 1..k per query and ordered by the exact score
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length).toSeq)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted(Ordering[Double].reverse).toSeq,
        s"qid=$qid not ordered by exact score: $sorted")
    }
    // the ADC stage's scan excludes the raw vector column even when the
    // refine pass (a separate scan) reads it
    val adcPlan = idx.search(queries, k = 20, nprobe = 3)
      .queryExecution.executedPlan.toString
    val rs = "ReadSchema: struct<[^>]*>".r.findFirstIn(adcPlan)
    assert(rs.isDefined && !rs.get.contains("v:"), s"$rs")
  }

  test("ivf-pq filtered: JSON filter in-scan before ADC scoring, raw vectors still unread") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq-filt").toString
    val meta = cands.withColumn("metadata",
      to_json(struct((col("nid") % 3).cast("int").as("grp"))))
    val idx = IvfPq.buildTrained(spark, meta, tmp, dim = 64,
      nlist = 8, m = 4, k = 16, iters = 2)
    val qs = queries
      .withColumn("filter", lit("""{"grp": {"$in": [0, 2]}}"""))
      .withColumn("top_k", lit(4))
    val df = idx.searchFiltered(qs, nprobe = 8) // full probe: exact over survivors

    // value check: full-probe filtered ADC = scalar replay restricted to
    // the filter's surviving candidates (grp != 1)
    val cRows = cands.select(col("nid"), col("nvec").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .filter { case (nid, _) => nid % 3 != 1 }
    val qRows = queries.select(col("qid"), col("qvec").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val expected = scalarReplay(idx.codebooks, cRows, qRows, nprobe = 8, k = 4)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected)
    assert(got.forall { case (_, nid, _, _) => nid % 3 != 1 },
      "a filtered-out candidate leaked into the results")

    // plan: filter interpreted in-scan, partitions pruned, raw vectors
    // STILL excluded from the ReadSchema (metadata rides instead)
    val narrowed = idx.searchFiltered(qs, nprobe = 3)
    val plan = narrowed.queryExecution.executedPlan.toString
    assert(plan.contains("json_filter_match"), s"filter not in-scan:\n$plan")
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined, plan)
    // whole line (the struct<...> shorthand truncates at array<int>'s '>')
    val rsF = "ReadSchema: [^\n]*".r.findFirstIn(plan)
    assert(rsF.isDefined && !rsF.get.contains("v:"),
      s"filtered ADC search must not read raw vectors: $rsF")
    assert(rsF.get.contains("metadata"), s"metadata must be scanned: $rsF")
  }
}
