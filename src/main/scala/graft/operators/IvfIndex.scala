package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Build-once / query-many IVF index over an embedding corpus.
  *
  * [[IvfIndex.build]] assigns every candidate to a cell, repartitions by
  * cell and persists — paying the corpus shuffle exactly once. Each
  * subsequent [[IvfIndex.search]] broadcasts the query batch, joins on the
  * (co-located) cell key with zero additional shuffle of the corpus, and
  * reuses the codegen cosine kernel. On a cluster the persisted frame
  * would instead be a bucketed table on `cell` (see [[Bucketing]]) so the
  * layout survives across jobs; the query-side plan is identical.
  */
final class IvfIndex private (
    private[operators] val cells: DataFrame,
    val signBits: Int) {

  /** Top-k per query; `multiProbe` adds single-bit-flip neighbor cells. */
  def search(queries: DataFrame, k: Int, multiProbe: Boolean = true): DataFrame = {
    val q0 = queries.select(col("qid"), col("qvec").cast("array<double>").as("qv"))
      .withColumn("cell0", IvfIndex.cellOf("qv", signBits))
    val probed =
      if (!multiProbe) q0.select(col("qid"), col("qv"), col("cell0").as("cell"))
      else q0.select(col("qid"), col("qv"),
        explode(transform(sequence(lit(0), lit(signBits)), i =>
          when(i === 0, col("cell0"))
            .otherwise(col("cell0").bitwiseXOR(call_function("shiftleft", lit(1), i - 1)))))
          .as("cell"))
    val scored = cells.join(broadcast(probed), "cell")
      .select(col("qid"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    Similarity.heapSelect(scored, k)
  }

  def unpersist(): Unit = cells.unpersist()
}

object IvfIndex {

  private[operators] def cellOf(vec: String, signBits: Int) =
    (0 until signBits).map { i =>
      when(element_at(col(vec), i + 1) >= 0, 1 << i).otherwise(0)
    }.reduce(_ + _)

  /** Expects `candidates(nid, nvec)`. One shuffle (repartition by cell),
    * then the layout is reused by every search.
    */
  def build(candidates: DataFrame, signBits: Int = 4): IvfIndex = {
    val cells = candidates
      .select(col("nid"), col("nvec").cast("array<double>").as("v"))
      .withColumn("cell", cellOf("v", signBits))
      .repartition(col("cell"))
      .persist()
    new IvfIndex(cells, signBits)
  }

  /** Data-adaptive variant: Lloyd-trained centroids instead of sign-hash
    * cells. Training is [[KMeans.train]] (`iters` distributed passes);
    * the corpus then shuffles once into cell partitions exactly like
    * [[build]]. Quality difference: trained cells follow the data's
    * density, so a given recall needs fewer probes than hash binning.
    */
  /** Columns the candidate frame may carry beyond (nid, nvec); kept in the
    * layout when present so filter-aware searches can read them in-scan.
    */
  private[operators] def carried(candidates: DataFrame): Seq[org.apache.spark.sql.Column] =
    if (candidates.columns.contains("metadata")) Seq(col("metadata")) else Nil

  def buildTrained(
      candidates: DataFrame,
      nlist: Int = 16,
      iters: Int = 5): TrainedIvfIndex = {
    val base = candidates.select(
      col("nid") +: col("nvec").cast("array<double>").as("v") +: carried(candidates): _*)
    val centroids = KMeans.train(base, col("v"), nlist, iters)
    val cells = base
      .withColumn("cell", KMeans.assignCell(col("v"), centroids))
      .repartition(col("cell"))
      .persist()
    new TrainedIvfIndex(cells, centroids)
  }

  /** Reopen a layout persisted by [[TrainedIvfIndex.save]]. Refuses a
    * layout whose rebalance commit was interrupted mid-rename (pending
    * marker present) — complete it with [[DiskIvfIndex.recover]] first.
    */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): DiskIvfIndex = {
    RebalanceCommit.failIfPending(spark, dir)
    new DiskIvfIndex(spark, dir, DiskIvfIndex.readCentroids(spark, dir))
  }
}

/** IVF index with a trained coarse codebook; queries probe their `nprobe`
  * nearest cells (closest centroids first), so recall/cost is tunable per
  * search without touching the persisted layout.
  */
final class TrainedIvfIndex private[operators] (
    private[operators] val cells: DataFrame,
    val centroids: Array[Array[Double]]) {

  def search(queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    val probed = queries
      .select(col("qid"), col("qvec").cast("array<double>").as("qv"))
      .select(col("qid"), col("qv"),
        explode(KMeans.probeCells(col("qv"), centroids, nprobe)).as("cell"))
    val scored = cells.join(broadcast(probed), "cell")
      .select(col("qid"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    Similarity.heapSelect(scored, k)
  }

  /** Persist the index as an on-disk layout that outlives this session:
    * cells become Hive-style partition directories (`cell=<id>/...`) and
    * the codebook rides next to them as JSON. Load with
    * [[IvfIndex.load]]; its searches scan ONLY the probed cells' files
    * via planning-time partition pruning — at 100 TB with nprobe/nlist =
    * 3/1024, that is 0.3% of the corpus bytes per query batch, and the
    * build shuffle is paid once ever, not once per session.
    */
  def save(spark: org.apache.spark.sql.SparkSession, dir: String): DiskIvfIndex = {
    Bucketing.writePartitioned(cells, dir, Seq("cell"))
    DiskIvfIndex.writeCentroids(spark, dir, centroids)
    new DiskIvfIndex(spark, dir, centroids)
  }

  def unpersist(): Unit = cells.unpersist()
}

/** A trained IVF index backed by a cell-partitioned parquet directory —
  * the layout that survives across jobs and clusters. Searches collect the
  * query batch's probed cell ids (≤ queries × nprobe ints — driver-safe at
  * any corpus size) and push them as a partition filter, so the scan
  * plans `PartitionFilters` and never opens a non-probed cell's files.
  */
final class DiskIvfIndex(
    spark: org.apache.spark.sql.SparkSession,
    val dir: String,
    val centroids: Array[Array[Double]]) {

  def search(queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    // Collect the probed query batch ONCE (queries × nprobe rows — tiny and
    // driver-safe at any corpus size) and reuse it for both the partition
    // filter and the broadcast join side; evaluating the probe plan twice
    // would re-run probeCells over the query batch per search.
    val probedPlan = queries
      .select(col("qid"), col("qvec").cast("array<double>").as("qv"))
      .select(col("qid"), col("qv"),
        explode(KMeans.probeCells(col("qv"), centroids, nprobe)).as("cell"))
    val probedRows = Similarity.collectProbeBatch(probedPlan, "DiskIvfIndex.search")
    val probeSet = probedRows.map(_.getAs[Int]("cell")).distinct
    val probed = spark.createDataFrame(
      java.util.Arrays.asList(probedRows: _*), probedPlan.schema)
    // the probe-cell union is tiny and data-independent of the corpus —
    // folding it into the plan is what turns probing into pruning
    val cells = spark.read.parquet(dir)
      .filter(col("cell").isin(probeSet.map(Integer.valueOf): _*))
    val scored = cells.join(broadcast(probed), "cell")
      .select(col("qid"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    Similarity.heapSelect(scored, k)
  }

  /** Incrementally add vectors to the on-disk layout without a rebuild:
    * new rows are assigned their trained cell and appended as new files
    * under the existing `cell=<id>` partition directories. The codebook
    * and already-written files are untouched, so daily ingest costs one
    * map stage over the BATCH — never a corpus reshuffle. Cell balance
    * drifts as the data distribution shifts; retrain + re-layout when
    * recall sags (the classic IVF maintenance trade).
    */
  def append(newCandidates: DataFrame): Unit = {
    val assignedPlan = newCandidates
      .select(col("nid") +: col("nvec").cast("array<double>").as("v") +:
        IvfIndex.carried(newCandidates): _*)
      .withColumn("cell", KMeans.assignCell(col("v"), centroids))
    // sidecar present ⇒ pin the batch BEFORE the write, so the stats merge
    // counts exactly the rows that became durable (a lazy plan re-executed
    // after the append could overcount — the unsafe direction); the common
    // no-sidecar append keeps the plain one-pass lazy plan
    val assigned = AdaptiveProbe.pinIfStatsPresent(spark, dir, assignedPlan)
    assigned.write.mode("append").partitionBy("cell").parquet(dir)
    AdaptiveProbe.mergeStatsOnAppend(spark, dir, centroids.length, assigned)
  }

  /** Partition-local index maintenance — the operator [[append]]'s doc
    * promises ("retrain + re-layout when recall sags"), without the
    * corpus-wide re-layout: split every cell holding more than
    * `maxCellRows` rows into `kSplit` sub-cells trained by a Lloyd pass
    * over THAT CELL's vectors only. Cold cells' files are never read or
    * rewritten (spec-asserted byte-identical); each hot cell costs its own
    * partition-pruned scans (training passes + one dynamic-partition-
    * overwrite rewrite of its rows). At 100 TB with daily appends this is
    * the difference between rewriting a few hot `cell=` directories and
    * re-shuffling the corpus.
    *
    * Id discipline: sub-centroid 0 keeps the split cell's id — positional
    * cell ids stay dense and every existing directory name keeps meaning —
    * and the remaining sub-centroids take fresh ids appended to the
    * codebook. The codebook file is written LAST (the metadata-last
    * discipline of `DatasetWriter`), so a reader racing the rebalance
    * resolves a consistent (pre-split) index until the commit point.
    *
    * Like every production IVF split, reassignment is local to the split
    * cell: rows of other cells are not revisited, so the global
    * assignment drifts from exact nearest-centroid — probing absorbs
    * that (it already absorbs append drift), and the q142 oracle proves
    * rows are never lost or doubled by checking full-probe search against
    * the independent brute force.
    *
    * Job shape is HOT-CELL-COUNT-INDEPENDENT: one partition-pruned read
    * of all hot cells, grouped Lloyd training
    * ([[KMeans.trainPerGroup]] — one job per iteration over the union),
    * and ONE staged write of every split cell's output. The commit is
    * [[RebalanceCommit]]'s marker-gated rename protocol: rows are durable
    * in the stage before any source directory moves, the grown codebook
    * lands before any rename (new ids are append-only, so an early
    * codebook is always consistent — never a moved row it can't see),
    * and an interrupted commit is refused by `load` until
    * [[DiskIvfIndex.recover]] completes the rename worklist.
    */
  def rebalance(maxCellRows: Long, kSplit: Int = 2, iters: Int = 3): DiskIvfIndex = {
    require(kSplit >= 2, s"kSplit=$kSplit must be >= 2")
    require(maxCellRows >= 1, s"maxCellRows=$maxCellRows must be >= 1")
    RebalanceCommit.failIfPending(spark, dir)
    // one partition-column-only scan; result bounded by the cell count
    val hot = spark.read.parquet(dir)
      .groupBy("cell").count()
      .filter(col("count") > maxCellRows)
      .collect().map(_.getAs[Int]("cell")).sorted
    if (hot.isEmpty) return this
    // ONE partition-pruned read of every hot cell, materialized across the
    // training passes and the staged write (the source dirs stay untouched
    // until the commit renames — a failure here leaves the index intact)
    val rows = spark.read.parquet(dir)
      .filter(col("cell").isin(hot.map(Integer.valueOf): _*))
      .localCheckpoint()
    val subs = KMeans.trainPerGroup(rows, col("cell"), col("v"), kSplit, iters)
    val cents = scala.collection.mutable.ArrayBuffer(centroids: _*)
    val newIds: Map[Int, Seq[Int]] = hot.map { c =>
      val s = subs(c)
      val ids = c +: (0 until s.length - 1).map(cents.length + _)
      cents(c) = s(0)
      cents ++= s.drop(1)
      c -> (ids: Seq[Int])
    }.toMap
    // per-row new cell id via a per-hot-cell dispatch chain (each branch's
    // sub-codebook is one reference object, so the plan stays O(hot cells))
    val reassigned = rows.withColumn("cell",
      hot.tail.foldLeft(when(col("cell") === hot.head,
        element_at(typedlit(newIds(hot.head)),
          KMeans.assignCell(col("v"), subs(hot.head)) + 1))) { (acc, c) =>
        acc.when(col("cell") === c,
          element_at(typedlit(newIds(c)), KMeans.assignCell(col("v"), subs(c)) + 1))
      })
    // stage everything in ONE job, then codebook, then the rename commit
    reassigned.write.mode("overwrite").partitionBy("cell")
      .parquet(RebalanceCommit.stagePath(dir))
    DiskIvfIndex.writeCentroids(spark, dir, cents.toArray)
    RebalanceCommit.commit(spark, dir, hot.toSeq, newIds.values.flatten.toSeq.distinct.sorted)
    // stats sidecar (if any) refreshes from a partition-pruned scan of the
    // touched cells only — never a corpus rescan; crash-before leaves the
    // old-cell-count file, which adaptive search refuses until rebuilt
    AdaptiveProbe.refreshStatsAfterRebalance(spark, dir,
      centroids.length, cents.length, hot.toSeq,
      newIds.values.flatten.toSeq.distinct)
    new DiskIvfIndex(spark, dir, cents.toArray)
  }

  /** Filter-aware probed search — the reference's serving semantic at
    * scale: `filter` and `top_k` are consumed TOGETHER by a search
    * (reference `dataset.py:136-140`, `cfg.py:33-34`), so the filter must
    * run inside the index path, not as a brute-force pre-pass. Expects
    * `queries(qid, qvec, filter, top_k)` (filter: JSON string or null =
    * match-all) over a layout built from candidates carrying a `metadata`
    * JSON column.
    *
    * Plan shape, in order: (1) the probed cells arrive as planning-time
    * `PartitionFilters` — non-probed `cell=` dirs are never opened;
    * (2) [[graft.functions.JsonFilterMatch]] interprets each query's
    * filter against the scanned rows' metadata INSIDE the probed scan —
    * before the cosine kernel, so filtered-out candidates are never
    * scored; (3) selection is the bounded per-row-`top_k` heap. At 100 TB
    * this is partition pruning × predicate filtering × k-bounded shuffle —
    * no stage sees more than the probed cells' surviving rows.
    */
  /** Build the per-cell value histogram for `statsField` (a key inside
    * the `metadata` JSON column) and persist it next to the layout as
    * `_cell_stats.json` — the sidecar [[searchFilteredAdaptive]] sizes
    * probe depth from. One partial-aggregated scan; the result is bounded
    * by cells × distinct values, so the field contract is LOW CARDINALITY
    * (labels, sources, languages — not ids; guarded at 65536 pairs).
    * Rows whose metadata lacks the field are counted in neither the
    * histogram nor the totals: the estimator UNDERCOUNTS survivors, which
    * can only widen the probe set (the safe direction). The sidecar holds
    * one histogram PER FIELD: building a new field keeps the existing
    * fields' adaptivity, rebuilding the same field refreshes just that
    * entry (and a stale sidecar is repaired wholesale — every stored
    * field re-aggregates), and `replace = true` drops every other field.
    */
  def buildStats(statsField: String, replace: Boolean = false): Unit =
    AdaptiveProbe.buildStats(spark, dir, centroids.length, statsField, replace)

  /** [[searchFiltered]] with FILTER-AWARE probe depth — the answer to the
    * measured hollow-cell effect (BASELINE.md round 10: a ~10%-selectivity
    * filter drops the nlist=32/nprobe=16 operating point from 0.85 to 0.70
    * recall@10, because most probed rows fail the filter). Per query, the
    * probe set WIDENS past the `nprobe` floor — never narrows below it —
    * until the expected number of filter-surviving candidates (from the
    * [[buildStats]] histogram) reaches `targetSurvivors`, capped at a full
    * probe. Selectivity estimation supports the full filter grammar over
    * any single statted field exactly — `$eq`/`$ne`/`$in`/`$nin`/
    * `$exists:true`, the range operators `$lt`/`$lte`/`$gt`/`$gte`,
    * multi-op condition objects (the between idiom), and `$and`/`$or`
    * combinators over those (one sum over that field's histogram under
    * the composed predicate); filters spanning several statted fields
    * estimate as a cross-field upper bound (min over conjuncts, sum over
    * disjuncts), conjuncts on un-statted fields are dropped from the
    * estimate (still an upper bound — the widened depth stays ≥ the
    * floor and closer to the need), and only a filter with NO estimable
    * conjunct falls back to the fixed floor (= plain [[searchFiltered]]
    * behavior). Stale stats after appends
    * degrade toward the floor, never below it; a rebalance refreshes the
    * sidecar incrementally (touched cells only), and a layout whose
    * sidecar cell count mismatches the codebook (interrupted refresh,
    * cardinality-cap skip, foreign provenance) is refused until stats are
    * rebuilt.
    *
    * Scale shape: identical to [[searchFiltered]] (probe-batch collect →
    * partition filter → broadcast join → heap selection); the depth
    * decision is integer arithmetic over the broadcast-sized histogram on
    * the collected probe batch — no extra cluster work.
    */
  def searchFilteredAdaptive(
      queries: DataFrame,
      nprobe: Int = 2,
      targetSurvivors: Int = 100): DataFrame = {
    val maxK = Similarity.maxTopK(queries)
    val (kept, schema) = AdaptiveProbe.keptProbeRows(
      queries, centroids, dir, nprobe, targetSurvivors)
    val probeSet = kept.map(_.getAs[Int]("cell")).distinct
    val probed = spark.createDataFrame(
        java.util.Arrays.asList(kept: _*), schema)
      .drop("rank")
    val cells = spark.read.parquet(dir)
      .filter(col("cell").isin(probeSet.map(Integer.valueOf): _*))
    val scored = cells.join(broadcast(probed), "cell")
      .filter(GraftFunctions.jsonFilterMatch(col("filter"), col("metadata")))
      .select(col("qid"), col("top_k"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    Similarity.heapSelectPerQuery(scored, maxK)
  }

  /** Diagnostic twin of [[searchFilteredAdaptive]]: the per-query probe
    * set the adaptive widening decided on, as `(qid, cell)` rows —
    * without running the scoring join. This is what a capacity planner or
    * a recall-grid measurement reads: realized scan cost = the probed
    * cells' candidate-row counts, and at 100 TB scanned bytes track that
    * sum, not the nominal `nprobe` floor.
    */
  def adaptiveProbeCells(
      queries: DataFrame,
      nprobe: Int = 2,
      targetSurvivors: Int = 100): DataFrame = {
    val (kept, schema) = AdaptiveProbe.keptProbeRows(
      queries, centroids, dir, nprobe, targetSurvivors)
    spark.createDataFrame(java.util.Arrays.asList(kept: _*), schema)
      .select(col("qid"), col("cell"))
  }

  def searchFiltered(queries: DataFrame, nprobe: Int = 2): DataFrame = {
    val maxK = Similarity.maxTopK(queries)
    // collect the probed batch once (queries × nprobe rows; driver-safe),
    // reused as both partition filter and broadcast side — same rationale
    // as `search`
    val probedPlan = queries
      .select(col("qid"), col("qvec").cast("array<double>").as("qv"),
        col("filter"), col("top_k").cast("int").as("top_k"))
      .select(col("qid"), col("qv"), col("filter"), col("top_k"),
        explode(KMeans.probeCells(col("qv"), centroids, nprobe)).as("cell"))
    val probedRows =
      Similarity.collectProbeBatch(probedPlan, "DiskIvfIndex.searchFiltered")
    val probeSet = probedRows.map(_.getAs[Int]("cell")).distinct
    val probed = spark.createDataFrame(
      java.util.Arrays.asList(probedRows: _*), probedPlan.schema)
    val cells = spark.read.parquet(dir)
      .filter(col("cell").isin(probeSet.map(Integer.valueOf): _*))
    val scored = cells.join(broadcast(probed), "cell")
      .filter(GraftFunctions.jsonFilterMatch(col("filter"), col("metadata")))
      .select(col("qid"), col("top_k"), col("nid"),
        GraftFunctions.vecCosine(col("qv"), col("v")).as("score_raw"))
    Similarity.heapSelectPerQuery(scored, maxK)
  }
}

object DiskIvfIndex {

  /** Complete an interrupted rebalance commit (pending marker present) and
    * reopen the layout. Idempotent: every row is on disk throughout the
    * commit window (original dir or stage), so recovery only re-runs the
    * remaining renames from the marker's worklist. No-op marker-free.
    */
  def recover(spark: org.apache.spark.sql.SparkSession, dir: String): DiskIvfIndex = {
    RebalanceCommit.recover(spark, dir)
    IvfIndex.load(spark, dir)
  }

  private val CentroidsFile = "_centroids.json"
  private[graft] val FormatVersion = 1

  // the centroids file is the layout's completeness marker (written last
  // by save(); rebalance writes it pre-rename BY DESIGN — append-only ids
  // keep an early codebook consistent, see RebalanceCommit)
  private[operators] def writeCentroids(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      centroids: Array[Array[Double]]): Unit =
    LayoutMeta.write(spark, dir, CentroidsFile, FormatVersion,
      s""""centroids": ${centroids
        .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")}""")

  private[operators] def readCentroids(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Array[Array[Double]] = {
    import org.json4s.{JArray, JDouble, JInt, JObject}
    def mat(v: org.json4s.JValue): Array[Array[Double]] = v match {
      case JArray(rows) => rows.map {
        case JArray(xs) => xs.map {
          case JDouble(d) => d
          case JInt(i) => i.toDouble
          case other => throw new IllegalArgumentException(s"bad centroid value: $other")
        }.toArray
        case other => throw new IllegalArgumentException(s"bad centroid row: $other")
      }.toArray
      case other => throw new IllegalArgumentException(s"bad centroids file: $other")
    }
    LayoutMeta.parseFile(spark, dir, CentroidsFile, "IVF index") match {
      // pre-format-stamp layouts wrote the bare centroid matrix — that IS
      // format 1's content, so it stays readable (the LayoutMeta contract)
      case bare @ JArray(_) => mat(bare)
      case obj @ JObject(_) =>
        LayoutMeta.checkFormat(
          LayoutMeta.formatOf(obj), FormatVersion, dir, "IVF index")
        mat(obj \ "centroids")
      case other => throw new IllegalArgumentException(s"bad centroids file: $other")
    }
  }
}
