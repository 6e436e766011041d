package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Similarity}

/** Filter-aware probe widening (`DiskIvfIndex.searchFilteredAdaptive`):
  * the response to the measured hollow-cell effect — a selective filter
  * empties probed cells, so the probe set must widen until enough
  * filter-surviving candidates are expected (per-cell histograms built by
  * `buildStats`), never narrowing below the configured floor.
  */
class AdaptiveFilteredSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  private def cands = emb.filter(col("vec_id") >= 10)
    .select(col("vec_id").as("nid"), col("embedding").as("nvec"),
      to_json(struct(col("label"))).as("metadata"))

  private def queries(filterOf: org.apache.spark.sql.Column) =
    emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .withColumn("filter", filterOf)
      .withColumn("top_k", lit(10).cast("int"))

  private def narrowFilter =
    concat(lit("""{"label": {"$eq": """), col("qid") % 10, lit("}}"))

  private def buildDisk(nlist: Int) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-adaptive-").toString
    val idx = IvfIndex.buildTrained(cands, nlist = nlist, iters = 2)
    val disk = idx.save(spark, tmp)
    idx.unpersist()
    disk
  }

  private def keyed(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def sidecarOf(dir: String): String = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_cell_stats.json")), "UTF-8")

  /** Overwrite the sidecar THROUGH the Hadoop FS (keeps the .crc sidecar
    * consistent — a raw java.nio write trips ChecksumException on the
    * next Hadoop read). */
  private def writeSidecar(dir: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_cell_stats.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  test("stats sidecar: format-stamped; rebalance refreshes it incrementally to a fresh rebuild") {
    val disk = buildDisk(nlist = 4)
    disk.buildStats("label")
    val json = sidecarOf(disk.dir)
    assert(json.contains("\"format\": 2") && json.contains("\"fields\"")
      && json.contains("\"label\""))
    // grow the codebook: the rebalance must refresh the sidecar from a
    // partition-pruned scan of the TOUCHED cells only, landing on exactly
    // the histogram a full rebuild would write
    val maxCell = spark.read.parquet(disk.dir).groupBy("cell").count()
      .agg(max("count")).head().getLong(0)
    val rebal = disk.rebalance(maxCellRows = math.max(1L, maxCell - 1), kSplit = 2, iters = 1)
    assert(rebal.centroids.length > disk.centroids.length)
    val refreshed = sidecarOf(disk.dir)
    assert(rebal.searchFilteredAdaptive(queries(narrowFilter), nprobe = 2).count() > 0)
    rebal.buildStats("label")
    assert(refreshed == sidecarOf(disk.dir),
      "incremental post-rebalance refresh differs from a full rebuild")
  }

  test("a cell-count-mismatched sidecar (interrupted refresh) is refused until rebuilt") {
    val disk = buildDisk(nlist = 4)
    disk.buildStats("label")
    // simulate a crash between the rename commit and the stats refresh:
    // the file's cell count no longer matches the codebook
    val stale = sidecarOf(disk.dir).replace("\"ncells\": 4", "\"ncells\": 3")
    assert(stale != sidecarOf(disk.dir), "fixture must actually change the file")
    writeSidecar(disk.dir, stale)
    val e = intercept[IllegalArgumentException] {
      disk.searchFilteredAdaptive(queries(narrowFilter), nprobe = 2)
    }
    assert(e.getMessage.contains("rebuild stats"), e.getMessage)
    disk.buildStats("label")
    assert(disk.searchFilteredAdaptive(queries(narrowFilter), nprobe = 2).count() > 0)
  }

  test("narrow filter: adaptive widens to the exact filtered answer; fixed nprobe misses it") {
    val disk = buildDisk(nlist = 8)
    disk.buildStats("label")
    val qs = queries(narrowFilter)
    val exact = keyed(Similarity.filteredTopKPerQuery(qs, cands))
    val fixed = keyed(disk.searchFiltered(qs, nprobe = 2))
    // ~10% selectivity leaves ~6 survivors per probed pair of cells —
    // a target of 50 forces a (near-)full probe, so adaptive must return
    // exactly the filtered brute-force answer
    val adaptive = keyed(disk.searchFilteredAdaptive(
      qs, nprobe = 2, targetSurvivors = 50))
    assert(adaptive == exact,
      s"adaptive != exact: missing ${exact -- adaptive}, extra ${adaptive -- exact}")
    val fixedRecall = fixed.count(exact.contains).toDouble / exact.size
    assert(fixedRecall < 1.0,
      s"fixed nprobe=2 unexpectedly exact (recall $fixedRecall) — test needs a harder corpus")
  }

  test("append merges into the stats sidecar, so adaptive stays exact over appended rows") {
    val half = emb.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 0)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"),
        to_json(struct(col("label"))).as("metadata"))
    val rest = emb.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 1)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"),
        to_json(struct(col("label"))).as("metadata"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-adaptive-app-").toString
    val idx = IvfIndex.buildTrained(half, nlist = 8, iters = 2)
    val disk = idx.save(spark, tmp)
    idx.unpersist()
    disk.buildStats("label")
    disk.append(rest)
    // the merged histogram must count the whole layout — totals equal a
    // fresh rebuild's
    def sidecar() = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/_cell_stats.json")), "UTF-8")
    val merged = sidecar()
    disk.buildStats("label")
    assert(merged == sidecar(),
      "append-merged stats differ from a fresh rebuild over the same rows")
    // and the widened search over the full layout is exact
    val qs = queries(narrowFilter)
    assert(keyed(disk.searchFilteredAdaptive(qs, nprobe = 2, targetSurvivors = 50))
      == keyed(Similarity.filteredTopKPerQuery(qs, cands)))
  }

  test("append succeeds over a stale sidecar; search keeps refusing until rebuild") {
    val disk = buildDisk(nlist = 2)
    disk.buildStats("label")
    // manufacture staleness (an interrupted post-rebalance refresh): cell
    // count in the file no longer matches the codebook
    writeSidecar(disk.dir, sidecarOf(disk.dir)
      .replace("\"ncells\": 2", "\"ncells\": 7"))
    // the layout mutation must not die on the stale histogram
    disk.append(emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 5000000L).as("nid"), col("embedding").as("nvec"),
        to_json(struct(col("label"))).as("metadata")))
    val e = intercept[IllegalArgumentException] {
      disk.searchFilteredAdaptive(queries(narrowFilter), nprobe = 2)
    }
    assert(e.getMessage.contains("rebuild stats"), e.getMessage)
    disk.buildStats("label")
    assert(disk.searchFilteredAdaptive(queries(narrowFilter), nprobe = 2).count() > 0)
  }

  /** Two-field metadata corpus shared by the multi-field tests. */
  private def twoField = emb.filter(col("vec_id") >= 10)
    .select(col("vec_id").as("nid"), col("embedding").as("nvec"),
      to_json(struct(col("label"),
        (col("label") % 3).cast("string").as("tag"))).as("metadata"))

  private def tagQueries(filterOf: org.apache.spark.sql.Column) =
    emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .withColumn("filter", filterOf)
      .withColumn("top_k", lit(10).cast("int"))

  test("two stats fields coexist on one layout, each adaptively exact; replace=true drops the rest") {
    val two = twoField
    val tmp = java.nio.file.Files.createTempDirectory("graft-adaptive-two-").toString
    val idx = IvfIndex.buildTrained(two, nlist = 8, iters = 2)
    val disk = idx.save(spark, tmp)
    idx.unpersist()
    disk.buildStats("label")
    disk.buildStats("label") // same-field rebuild: the staleness remedy
    disk.buildStats("tag")   // a SECOND field joins without dropping the first
    assert(sidecarOf(tmp).contains("\"label\"") && sidecarOf(tmp).contains("\"tag\""))
    val tagQs = tagQueries(
      concat(lit("""{"tag": {"$eq": """"), col("qid") % 3, lit(""""}}""")))
    assert(keyed(disk.searchFilteredAdaptive(tagQs, nprobe = 1, targetSurvivors = 1000000))
      == keyed(Similarity.filteredTopKPerQuery(tagQs, two)))
    val labelQs = tagQueries(narrowFilter)
    assert(keyed(disk.searchFilteredAdaptive(labelQs, nprobe = 1, targetSurvivors = 1000000))
      == keyed(Similarity.filteredTopKPerQuery(labelQs, two)))
    // replace=true keeps ONLY the requested field: tag filters lose their
    // adaptivity (floor behavior) while label keeps widening
    disk.buildStats("label", replace = true)
    assert(!sidecarOf(tmp).contains("\"tag\""))
    assert(keyed(disk.searchFilteredAdaptive(tagQs, nprobe = 1, targetSurvivors = 1000000))
      == keyed(disk.searchFiltered(tagQs, nprobe = 1)))
  }

  test("$and with an un-statted conjunct estimates from the statted one and widens to exact") {
    val two = twoField
    val tmp = java.nio.file.Files.createTempDirectory("graft-adaptive-mixed-").toString
    val idx = IvfIndex.buildTrained(two, nlist = 8, iters = 2)
    val disk = idx.save(spark, tmp)
    idx.unpersist()
    disk.buildStats("label") // tag is present in metadata but NOT statted
    // {"label": $eq q%10, "tag": $gte "0"}: the tag conjunct matches every
    // row (tags are "0".."2"), so the exact answer is the narrow label
    // slice — reachable only by widening, which must run off the label
    // conjunct's histogram instead of flooring on the foreign field
    for (f <- Seq(
        concat(lit("""{"label": {"$eq": """), col("qid") % 10,
          lit("""}, "tag": {"$gte": "0"}}""")),
        concat(lit("""{"$and": [{"label": {"$eq": """), col("qid") % 10,
          lit("""}}, {"tag": {"$gte": "0"}}]}""")))) {
      val qs = tagQueries(f)
      val exact = keyed(Similarity.filteredTopKPerQuery(qs, two))
      val adaptive = keyed(disk.searchFilteredAdaptive(
        qs, nprobe = 2, targetSurvivors = 1000000))
      assert(adaptive == exact,
        s"missing ${exact -- adaptive}, extra ${adaptive -- exact}")
      val fixed = keyed(disk.searchFiltered(qs, nprobe = 2))
      assert(fixed != exact,
        "floor nprobe=2 unexpectedly exact — the widening isn't being exercised")
    }
  }

  test("two statted fields in one $and estimate as the cross-field min and widen to exact") {
    val two = twoField
    val tmp = java.nio.file.Files.createTempDirectory("graft-adaptive-cross-").toString
    val idx = IvfIndex.buildTrained(two, nlist = 8, iters = 2)
    val disk = idx.save(spark, tmp)
    idx.unpersist()
    disk.buildStats("label")
    disk.buildStats("tag")
    val qs = tagQueries(concat(lit("""{"label": {"$lt": 2}, "tag": {"$eq": """"),
      col("qid") % 3, lit(""""}}""")))
    val exact = keyed(Similarity.filteredTopKPerQuery(qs, two))
    val adaptive = keyed(disk.searchFilteredAdaptive(
      qs, nprobe = 2, targetSurvivors = 1000000))
    assert(adaptive == exact,
      s"missing ${exact -- adaptive}, extra ${adaptive -- exact}")
  }

  test("two statted fields in one $or estimate as the cross-field sum and widen to exact") {
    val two = twoField
    val tmp = java.nio.file.Files.createTempDirectory("graft-adaptive-orsum-").toString
    val idx = IvfIndex.buildTrained(two, nlist = 8, iters = 2)
    val disk = idx.save(spark, tmp)
    idx.unpersist()
    disk.buildStats("label")
    disk.buildStats("tag")
    val qs = tagQueries(concat(lit("""{"$or": [{"label": {"$eq": """),
      col("qid") % 10, lit("""}}, {"tag": {"$eq": """"), col("qid") % 3,
      lit(""""}}]}""")))
    val exact = keyed(Similarity.filteredTopKPerQuery(qs, two))
    val adaptive = keyed(disk.searchFilteredAdaptive(
      qs, nprobe = 2, targetSurvivors = 1000000))
    assert(adaptive == exact,
      s"missing ${exact -- adaptive}, extra ${adaptive -- exact}")
    // a disjunction with a non-estimable arm is itself non-estimable:
    // the un-statted field's survivors are unbounded by the estimable arm
    val qsMixed = tagQueries(concat(lit("""{"$or": [{"label": {"$eq": """),
      col("qid") % 10, lit("""}}, {"nosuch": {"$eq": 1}}]}""")))
    assert(keyed(disk.searchFilteredAdaptive(qsMixed, nprobe = 2,
        targetSurvivors = 1000000))
      == keyed(disk.searchFiltered(qsMixed, nprobe = 2)))
  }

  test("PQ layout: rebalance refreshes the stats sidecar to a fresh rebuild") {
    import graft.operators.IvfPq
    val tmp = java.nio.file.Files.createTempDirectory("graft-adaptive-pqreb-").toString
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val pq = IvfPq.buildTrained(spark, cands, tmp, dim = dim,
      nlist = 2, m = 4, k = 16, iters = 2)
    pq.buildStats("label")
    val maxCell = spark.read.parquet(tmp).groupBy("cell").count()
      .agg(max("count")).head().getLong(0)
    val rebal = pq.rebalance(maxCellRows = math.max(1L, maxCell - 1), kSplit = 2, iters = 1)
    assert(rebal.codebooks.centroids.length > 2)
    val refreshed = sidecarOf(tmp)
    assert(rebal.searchFilteredAdaptive(queries(narrowFilter), nprobe = 2).count() > 0)
    rebal.buildStats("label")
    assert(refreshed == sidecarOf(tmp),
      "incremental PQ post-rebalance refresh differs from a full rebuild")
  }

  test("PQ layout: adaptive widening reaches the full-probe filtered ADC answer") {
    import graft.operators.IvfPq
    val tmp = java.nio.file.Files.createTempDirectory("graft-adaptive-pq-").toString
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val pq = IvfPq.buildTrained(spark, cands, tmp, dim = dim,
      nlist = 8, m = 4, k = 16, iters = 2)
    pq.buildStats("label")
    val qs = queries(narrowFilter)
    // an unreachable target forces a full probe per query — adaptive must
    // equal the full-probe filtered ADC search (NOT brute exact: the PQ
    // path's yardstick is its own quantized scoring)
    val full = keyed(pq.searchFiltered(qs, nprobe = 8))
    val adaptive = keyed(pq.searchFilteredAdaptive(
      qs, nprobe = 2, targetSurvivors = 1000000))
    assert(adaptive == full,
      s"missing ${full -- adaptive}, extra ${adaptive -- full}")
    val fixed = keyed(pq.searchFiltered(qs, nprobe = 2))
    assert(fixed != full, "nprobe=2 unexpectedly full — test needs a harder corpus")
  }

  test("already-satisfied target and unsupported filters behave as the fixed floor") {
    val disk = buildDisk(nlist = 8)
    disk.buildStats("label")
    // broad filter ($ne): survivors per cell ~90% — floor depth already
    // meets a tiny target, so adaptive == fixed at the same nprobe
    val broad = queries(concat(lit("""{"label": {"$ne": """), col("qid") % 10, lit("}}")))
    assert(keyed(disk.searchFilteredAdaptive(broad, nprobe = 3, targetSurvivors = 1))
      == keyed(disk.searchFiltered(broad, nprobe = 3)))
    // a filter with NO estimable conjunct (every leaf on an un-statted
    // field) falls back to the floor, identical to searchFiltered — use a
    // PRESENT un-statted field so both sides return rows and the
    // assertion actually distinguishes floor from widening
    val two = twoField
    val tmp = java.nio.file.Files.createTempDirectory("graft-adaptive-floor-").toString
    val idx = IvfIndex.buildTrained(two, nlist = 8, iters = 2)
    val diskTwo = idx.save(spark, tmp)
    idx.unpersist()
    diskTwo.buildStats("label")
    val tagOnly = tagQueries(
      concat(lit("""{"tag": {"$eq": """"), col("qid") % 3, lit(""""}}""")))
    val floored = keyed(diskTwo.searchFilteredAdaptive(
      tagOnly, nprobe = 2, targetSurvivors = 1000000))
    assert(floored == keyed(diskTwo.searchFiltered(tagOnly, nprobe = 2)))
    assert(floored != keyed(Similarity.filteredTopKPerQuery(tagOnly, two)),
      "floor unexpectedly exact — the floor assertion isn't biting")
  }

  test("composed filters on the stats field estimate exactly: between, $and/$or, $nin") {
    val disk = buildDisk(nlist = 8)
    disk.buildStats("label")
    for (f <- Seq(
        // multi-op condition object — the between idiom (~20% selectivity)
        lit("""{"label": {"$gte": 3, "$lt": 5}}"""),
        // the same between as an explicit $and of two docs
        lit("""{"$and": [{"label": {"$gte": 3}}, {"label": {"$lt": 5}}]}"""),
        // $or of two narrow $eq docs
        lit("""{"$or": [{"label": {"$eq": 1}}, {"label": {"$eq": 7}}]}"""),
        // $nin — null-safe negation of membership (~80% selectivity)
        lit("""{"label": {"$nin": [0, 1]}}"""),
        // bare-value $eq shorthand
        lit("""{"label": 4}"""),
        // $exists true — every histogrammed value survives
        lit("""{"label": {"$exists": true}}"""))) {
      val qs = queries(f)
      val exact = keyed(Similarity.filteredTopKPerQuery(qs, cands))
      // unreachable target -> the estimator must recognize the shape and
      // widen to a full probe = the exact filtered answer
      val adaptive = keyed(disk.searchFilteredAdaptive(
        qs, nprobe = 2, targetSurvivors = 1000000))
      assert(adaptive == exact,
        s"filter $f: missing ${exact -- adaptive}, extra ${adaptive -- exact}")
    }
  }

  test("range filters ($lt/$gte) estimate exactly and widen to the exact filtered answer") {
    // the round-10 hole: q138's own regimes use $lt/$gte, which silently
    // fell back to the fixed floor — exactly the narrow-filter recall gap
    // adaptive probing exists to close
    val disk = buildDisk(nlist = 8)
    disk.buildStats("label")
    for (f <- Seq(lit("""{"label": {"$lt": 1}}"""), lit("""{"label": {"$gte": 9}}"""),
        lit("""{"label": {"$lte": 0}}"""), lit("""{"label": {"$gt": 8}}"""))) {
      val qs = queries(f)
      val exact = keyed(Similarity.filteredTopKPerQuery(qs, cands))
      // ~10% selectivity + unreachable target -> must widen to a full probe
      val adaptive = keyed(disk.searchFilteredAdaptive(
        qs, nprobe = 2, targetSurvivors = 1000000))
      assert(adaptive == exact,
        s"missing ${exact -- adaptive}, extra ${adaptive -- exact}")
    }
    // a broad range whose floor depth already satisfies a tiny target
    // stays at the floor — the estimator counts range survivors, so it
    // must NOT treat the shape as unsupported (which would also floor)
    // nor widen (target already met)
    val broad = queries(lit("""{"label": {"$lt": 9}}"""))
    assert(keyed(disk.searchFilteredAdaptive(broad, nprobe = 3, targetSurvivors = 1))
      == keyed(disk.searchFiltered(broad, nprobe = 3)))
  }

  test("$in with duplicate members does not double-count survivors") {
    val disk = buildDisk(nlist = 8)
    disk.buildStats("label")
    // {"$in": [v, v]} is semantically {v}: a double-counting estimator
    // believes 2x the survivors and stops widening early; the correct one
    // (distinct members) can't reach the unreachable target and probes
    // fully, returning the exact filtered answer
    val dupIn = queries(concat(lit("""{"label": {"$in": ["""),
      col("qid") % 10, lit(", "), col("qid") % 10, lit("]}}")))
    val exact = keyed(Similarity.filteredTopKPerQuery(dupIn, cands))
    val adaptive = keyed(disk.searchFilteredAdaptive(
      dupIn, nprobe = 2, targetSurvivors = 1000000))
    assert(adaptive == exact,
      s"missing ${exact -- adaptive}, extra ${adaptive -- exact}")
  }

  test("stats sidecar round-trips control characters in metadata values; field name is validated") {
    val tagged = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"),
        to_json(struct(concat(lit("a\nb\t"), col("label").cast("string"))
          .as("tag"))).as("metadata"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-adaptive-esc-").toString
    val idx = IvfIndex.buildTrained(tagged, nlist = 4, iters = 2)
    val disk = idx.save(spark, tmp)
    idx.unpersist()
    disk.buildStats("tag") // newline/tab inside every histogram value
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .withColumn("filter", concat(lit("""{"tag": {"$eq": "a\nb\t"""),
        col("qid") % 10, lit(""""}}""")))
      .withColumn("top_k", lit(10).cast("int"))
    val exact = keyed(Similarity.filteredTopKPerQuery(qs, tagged))
    assert(exact.nonEmpty, "filter must match rows for the test to bite")
    // loadStats parses the escaped sidecar and the $eq estimator matches
    // the raw (unescaped) extracted values
    val adaptive = keyed(disk.searchFilteredAdaptive(
      qs, nprobe = 1, targetSurvivors = 1000000))
    assert(adaptive == exact,
      s"missing ${exact -- adaptive}, extra ${adaptive -- exact}")
    val e = intercept[IllegalArgumentException](disk.buildStats("bad.field"))
    assert(e.getMessage.contains("simple identifier"), e.getMessage)
  }

  test("$in filters estimate as the sum of member counts and widen to the exact answer") {
    val disk = buildDisk(nlist = 8)
    disk.buildStats("label")
    val inFilter = queries(concat(lit("""{"label": {"$in": ["""),
      col("qid") % 10, lit(", "), (col("qid") + 3) % 10, lit("]}}")))
    val exact = keyed(Similarity.filteredTopKPerQuery(inFilter, cands))
    // ~20% selectivity: an unreachable target forces the full filtered probe
    val adaptive = keyed(disk.searchFilteredAdaptive(
      inFilter, nprobe = 2, targetSurvivors = 1000000))
    assert(adaptive == exact,
      s"missing ${exact -- adaptive}, extra ${adaptive -- exact}")
  }
}
