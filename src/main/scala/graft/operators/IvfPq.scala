package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** IVF-PQ: coarse IVF partition pruning COMPOSED with product-quantized
  * ADC scoring — the production ANN architecture at 100 TB.
  *
  * [[IvfIndex]] alone prunes which cells a query scans but reads raw
  * vectors inside them; [[ProductQuantization]] alone scans m-byte codes
  * but reads every cell. This operator is both at once: the corpus lives
  * on disk as Hive-style `cell=<id>` partition directories (planning-time
  * partition pruning — a probed search never opens a non-probed cell's
  * files), and each row inside a cell carries its PQ RESIDUAL codes, so
  * the probed scan reads `m` ints per vector instead of `dim` floats
  * (64-dim float → 4 codes ≈ 25× fewer scanned bytes when the reader
  * prunes the raw-vector column). At nprobe/nlist = 3/1024 over 100 TB
  * that stacks to ~0.3% of partitions × ~4% of bytes per row — the
  * scan-cost product neither half achieves alone.
  *
  * Residual encoding (the classic IVF-ADC formulation, Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011): PQ
  * codebooks are trained on `v − centroid(cell(v))`, which has far lower
  * variance than raw vectors, so the same m×k code budget reconstructs
  * more accurately. Scoring uses the linearity of the inner product:
  *
  *   dot(q, centroid + residual̂) = dot(q, centroid) + dot(q, residual̂)
  *
  * — the coarse term is computed once per (query, cell) on the broadcast
  * side, the fine term is the classic ADC lookup-table kernel
  * ([[ProductQuantization.adcTable]]/[[ProductQuantization.adcLookupScore]]):
  * an m×k partial-dot table per query, m array lookups + adds per scanned
  * row. Selection is the bounded-heap aggregate (never a Window over the
  * scored stream).
  *
  * The layout keeps the raw vector column NEXT TO the codes — parquet is
  * columnar, so an ADC search that selects only `(nid, codes)` never
  * reads those bytes (the scan's ReadSchema excludes `v`; spec-asserted),
  * while an exact re-rank of ADC survivors can fetch them from the same
  * probed partitions without a second layout.
  *
  * No reference analogue: pinecone-datasets ships vectors to a server
  * (`dataset.py:1-50` sketches the upsert path); this is the index such a
  * server builds, re-expressed as a Spark layout + query plan.
  */
object IvfPq {

  /** Everything a search needs besides the layout directory: the coarse
    * centroids (partition pruning + the coarse score term) and the
    * residual PQ codebooks (the fine ADC term).
    */
  final case class Codebooks(
      centroids: Array[Array[Double]],
      pq: ProductQuantization.PQCodebook)

  /** Train coarse + residual-PQ codebooks over `candidates(nid, nvec)` and
    * write the disk layout under `dir`. Build cost: 1 + coarseIters corpus
    * passes for Lloyd, 1 + pqIters for residual PQ, one repartition-free
    * partitioned write (`cell=` dirs). The assigned/residual frame is
    * persisted across the PQ passes so the cell assignment is computed
    * once, not once per Lloyd iteration.
    */
  def buildTrained(
      spark: SparkSession,
      candidates: DataFrame,
      dir: String,
      dim: Int,
      nlist: Int = 16,
      m: Int = 4,
      k: Int = 16,
      iters: Int = 3): DiskIvfPqIndex = {
    val base = candidates.select(
      col("nid") +: col("nvec").cast("array<double>").as("v") +:
        IvfIndex.carried(candidates): _*)
    val centroids = KMeans.train(base, col("v"), nlist, iters)
    val centLit = typedlit(centroids.map(_.toSeq).toSeq)
    val assigned = base
      .withColumn("cell", KMeans.assignCell(col("v"), centroids))
      .withColumn("resid",
        zip_with(col("v"), element_at(centLit, col("cell") + 1), (a, b) => a - b))
      .persist()
    try {
      val pq = ProductQuantization.train(assigned, col("resid"), dim, m, k, iters)
      val encoded = assigned.select(
        col("nid") +: col("v") +:
          ProductQuantization.encode(col("resid"), pq).as("codes") +:
          IvfIndex.carried(assigned) :+ col("cell"): _*)
      Bucketing.writePartitioned(encoded, dir, Seq("cell"))
      DiskIvfPqIndex.writeCodebooks(spark, dir, Codebooks(centroids, pq))
      new DiskIvfPqIndex(spark, dir, Codebooks(centroids, pq))
    } finally assigned.unpersist()
  }

  /** Reopen a layout written by [[buildTrained]] in a later session.
    * Refuses a layout whose rebalance commit was interrupted mid-rename —
    * complete it with [[DiskIvfPqIndex.recover]] first.
    */
  def load(spark: SparkSession, dir: String): DiskIvfPqIndex = {
    RebalanceCommit.failIfPending(spark, dir)
    new DiskIvfPqIndex(spark, dir, DiskIvfPqIndex.readCodebooks(spark, dir))
  }
}

/** An IVF-PQ index backed by a cell-partitioned parquet directory. Search
  * collects the query batch's probed cells (≤ queries × nprobe ints —
  * driver-safe at any corpus size), pushes them as a partition filter, and
  * ADC-scores the probed cells' CODES — the raw vector column is never
  * read (pruned from the scan's ReadSchema by column projection).
  */
final class DiskIvfPqIndex(
    spark: SparkSession,
    val dir: String,
    val codebooks: IvfPq.Codebooks) {

  /** ADC top-k. Returns `(qid, nid, score, rnk)`, score = inner product
    * against the IVF-PQ reconstruction, deterministic nid tie-break.
    */
  def search(queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    // Collect the probed batch ONCE (same rationale as DiskIvfIndex.search:
    // evaluating the probe plan twice would re-run probeCells per search)
    // and reuse it for the partition filter and the broadcast join side.
    val probedPlan = queries
      .select(col("qid"), col("qvec").cast("array<double>").as("qv"))
      .select(col("qid"), col("qv"),
        explode(KMeans.probeCells(col("qv"), codebooks.centroids, nprobe)).as("cell"))
    val probedRows =
      Similarity.collectProbeBatch(probedPlan, "DiskIvfPqIndex.search")
    val probeSet = probedRows.map(_.getAs[Int]("cell")).distinct
    val centLit = typedlit(codebooks.centroids.map(_.toSeq).toSeq)
    // ADC lookup tables ride the broadcast side: per (query, cell) the
    // coarse dot(q, centroid) term and per query the m×k partial-dot
    // table — both computed ONCE per probed row, so the probed scan's
    // per-row kernel is m lookups + adds, never a full-dim dot
    val probed = spark.createDataFrame(
        java.util.Arrays.asList(probedRows: _*), probedPlan.schema)
      .withColumn("coarse",
        GraftFunctions.vecDot(col("qv"), element_at(centLit, col("cell") + 1)))
      .withColumn("lut", ProductQuantization.adcTable(col("qv"), codebooks.pq))
      .select(col("qid"), col("cell"), col("coarse"), col("lut"))
    // the projection to (nid, codes, cell) is what prunes the raw-vector
    // bytes: parquet never materializes the unselected `v` column
    val cells = spark.read.parquet(dir)
      .filter(col("cell").isin(probeSet.map(Integer.valueOf): _*))
      .select(col("nid"), col("codes"), col("cell"))
    val scored = cells.join(broadcast(probed), "cell")
      .select(col("qid"), col("nid"),
        ProductQuantization.adcLookupScore(col("lut"), col("codes"),
          codebooks.pq.m, prefix = Seq(col("coarse"))).as("score_raw"))
    Similarity.heapSelect(scored, k)
  }

  /** Exact re-rank of ADC survivors: take the top `rerank` by ADC score,
    * then score THOSE by exact inner product from the raw vectors — read
    * from the SAME probed partitions (partition filter re-applied), join
    * by nid on a frame bounded by queries × rerank rows. The standard
    * two-stage IVF-PQ serving shape: codes pick ~rerank candidates cheap,
    * exact dots fix the ranks of the few that matter.
    */
  def searchRefined(
      queries: DataFrame, k: Int, nprobe: Int = 2, rerank: Int = 32): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val q = queries.select(col("qid"), col("qvec").cast("array<double>").as("qv"))
    val adc = search(q.select(col("qid"), col("qv").as("qvec")), rerank, nprobe)
      .select(col("qid"), col("nid"))
    // survivors are ≤ queries × rerank rows — broadcast-sized by
    // construction; the raw-vector fetch joins them against the probed
    // partitions only, so the exact pass reads the same pruned byte range
    val probeSet = q
      .select(explode(KMeans.probeCells(col("qv"), codebooks.centroids, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0))
    val raw = spark.read.parquet(dir)
      .filter(col("cell").isin(probeSet.map(Integer.valueOf): _*))
      .select(col("nid"), col("v"))
    val scored = raw.join(broadcast(adc), "nid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("nid"),
        GraftFunctions.vecDot(col("qv"), col("v")).as("score_raw"))
    Similarity.heapSelect(scored, k)
  }

  /** Incrementally add vectors without a rebuild (the
    * [[DiskIvfIndex.append]] contract, composed with encoding): new rows
    * are assigned their trained cell, residual-encoded against the FROZEN
    * codebooks, and appended as new files under the existing `cell=<id>`
    * directories — one map stage over the batch, never a corpus reshuffle.
    * Codebooks drift from the data distribution as ingest accumulates;
    * retrain + re-layout when recall sags.
    */
  def append(newCandidates: DataFrame): Unit = {
    val centLit = typedlit(codebooks.centroids.map(_.toSeq).toSeq)
    val base = newCandidates.select(
      col("nid") +: col("nvec").cast("array<double>").as("v") +:
        IvfIndex.carried(newCandidates): _*)
    val encoded = base
      .withColumn("cell", KMeans.assignCell(col("v"), codebooks.centroids))
      .withColumn("resid",
        zip_with(col("v"), element_at(centLit, col("cell") + 1), (a, b) => a - b))
      .select(col("nid") +: col("v") +:
        ProductQuantization.encode(col("resid"), codebooks.pq).as("codes") +:
        IvfIndex.carried(base) :+ col("cell"): _*)
    // sidecar present ⇒ pin before the write (see DiskIvfIndex.append)
    val pinned = AdaptiveProbe.pinIfStatsPresent(spark, dir, encoded)
    pinned.write.mode("append").partitionBy("cell").parquet(dir)
    AdaptiveProbe.mergeStatsOnAppend(
      spark, dir, codebooks.centroids.length, pinned)
  }

  /** Partition-local maintenance for the PQ layout — [[DiskIvfIndex.rebalance]]'s
    * contract composed with residual re-encoding: each split cell's rows
    * are re-encoded from their RAW vectors (`resid = v − subCentroid`)
    * against the FROZEN PQ codebooks — this is why the layout keeps `v`
    * next to the codes. The residual distribution drifts from the one the
    * codebooks were trained on (the same accepted trade as [[append]]);
    * the coarse term stays exact because it is computed from the updated
    * centroid at query time. Cold cells are never read or rewritten;
    * sub-centroid 0 keeps the split cell's id. Full-probe `searchRefined`
    * with rerank ≥ corpus stays EXACTLY the brute-force inner-product
    * top-k (q143's oracle), because the refine pass reads raw vectors —
    * codes only shortlist.
    *
    * Job shape and durability are [[DiskIvfIndex.rebalance]]'s: one
    * partition-pruned read of all hot cells, grouped Lloyd training
    * ([[KMeans.trainPerGroup]]), ONE staged write, then
    * [[RebalanceCommit]]'s marker-gated rename commit (codebooks written
    * before any rename — append-only ids make the early codebook always
    * consistent; `load` refuses an interrupted commit until
    * [[DiskIvfPqIndex.recover]]).
    */
  def rebalance(maxCellRows: Long, kSplit: Int = 2, iters: Int = 3): DiskIvfPqIndex = {
    require(kSplit >= 2, s"kSplit=$kSplit must be >= 2")
    require(maxCellRows >= 1, s"maxCellRows=$maxCellRows must be >= 1")
    RebalanceCommit.failIfPending(spark, dir)
    val hot = spark.read.parquet(dir)
      .groupBy("cell").count()
      .filter(col("count") > maxCellRows)
      .collect().map(_.getAs[Int]("cell")).sorted
    if (hot.isEmpty) return this
    val rows = spark.read.parquet(dir)
      .filter(col("cell").isin(hot.map(Integer.valueOf): _*))
      .drop("codes")
      .localCheckpoint()
    val subs = KMeans.trainPerGroup(rows, col("cell"), col("v"), kSplit, iters)
    val cents = scala.collection.mutable.ArrayBuffer(codebooks.centroids: _*)
    val newIds: Map[Int, Seq[Int]] = hot.map { c =>
      val s = subs(c)
      val ids = c +: (0 until s.length - 1).map(cents.length + _)
      cents(c) = s(0)
      cents ++= s.drop(1)
      c -> (ids: Seq[Int])
    }.toMap
    // per-hot-cell dispatch chains over the OLD cell id: sub-assignment,
    // then the new residual against the winning sub-centroid, then the new
    // id — each branch's sub-codebook rides as one reference object
    def chain(f: Int => org.apache.spark.sql.Column) =
      hot.tail.foldLeft(when(col("cell") === hot.head, f(hot.head))) {
        (acc, c) => acc.when(col("cell") === c, f(c))
      }
    val assigned = rows
      .withColumn("__sub", chain(c => KMeans.assignCell(col("v"), subs(c))))
      .withColumn("resid", chain(c => zip_with(col("v"),
        element_at(typedlit(subs(c).map(_.toSeq).toSeq), col("__sub") + 1),
        (a, b) => a - b)))
      .withColumn("cell", chain(c => element_at(typedlit(newIds(c)), col("__sub") + 1)))
    val out = assigned.select(
      col("nid") +: col("v") +:
        ProductQuantization.encode(col("resid"), codebooks.pq).as("codes") +:
        IvfIndex.carried(assigned) :+ col("cell"): _*)
    out.write.mode("overwrite").partitionBy("cell")
      .parquet(RebalanceCommit.stagePath(dir))
    val cb = IvfPq.Codebooks(cents.toArray, codebooks.pq)
    DiskIvfPqIndex.writeCodebooks(spark, dir, cb)
    RebalanceCommit.commit(spark, dir, hot.toSeq, newIds.values.flatten.toSeq.distinct.sorted)
    // same incremental stats refresh as DiskIvfIndex.rebalance: touched
    // cells only, after the commit point
    AdaptiveProbe.refreshStatsAfterRebalance(spark, dir,
      codebooks.centroids.length, cents.length, hot.toSeq,
      newIds.values.flatten.toSeq.distinct)
    new DiskIvfPqIndex(spark, dir, cb)
  }

  /** Filter-aware ADC search ([[DiskIvfIndex.searchFiltered]]'s contract
    * over the PQ layout): partition pruning on probed cells, then each
    * query's JSON filter interpreted against the rows' `metadata` inside
    * the probed scan, then ADC scoring of the SURVIVORS only — the scan
    * still projects `(nid, codes, metadata, cell)`, so the raw-vector
    * column stays out of the ReadSchema exactly as in [[search]].
    * Expects `queries(qid, qvec, filter, top_k)` over a layout built from
    * candidates carrying a `metadata` JSON column.
    */
  def searchFiltered(queries: DataFrame, nprobe: Int = 2): DataFrame = {
    val maxK = Similarity.maxTopK(queries)
    val probedPlan = queries
      .select(col("qid"), col("qvec").cast("array<double>").as("qv"),
        col("filter"), col("top_k").cast("int").as("top_k"))
      .select(col("qid"), col("qv"), col("filter"), col("top_k"),
        explode(KMeans.probeCells(col("qv"), codebooks.centroids, nprobe)).as("cell"))
    val probedRows =
      Similarity.collectProbeBatch(probedPlan, "DiskIvfPqIndex.searchFiltered")
    val probeSet = probedRows.map(_.getAs[Int]("cell")).distinct
    val centLit = typedlit(codebooks.centroids.map(_.toSeq).toSeq)
    // same ADC-LUT broadcast shape as [[search]]: coarse term + m×k table
    // computed per probed row, scan kernel = m lookups + adds
    val probed = spark.createDataFrame(
        java.util.Arrays.asList(probedRows: _*), probedPlan.schema)
      .withColumn("coarse",
        GraftFunctions.vecDot(col("qv"), element_at(centLit, col("cell") + 1)))
      .withColumn("lut", ProductQuantization.adcTable(col("qv"), codebooks.pq))
      .select(col("qid"), col("cell"), col("filter"), col("top_k"),
        col("coarse"), col("lut"))
    val cells = spark.read.parquet(dir)
      .filter(col("cell").isin(probeSet.map(Integer.valueOf): _*))
      .select(col("nid"), col("codes"), col("metadata"), col("cell"))
    val scored = cells.join(broadcast(probed), "cell")
      .filter(GraftFunctions.jsonFilterMatch(col("filter"), col("metadata")))
      .select(col("qid"), col("top_k"), col("nid"),
        ProductQuantization.adcLookupScore(col("lut"), col("codes"),
          codebooks.pq.m, prefix = Seq(col("coarse"))).as("score_raw"))
    Similarity.heapSelectPerQuery(scored, maxK)
  }

  /** Persist the per-cell metadata histogram for filter-aware probing —
    * [[DiskIvfIndex.buildStats]]'s contract over the PQ layout (the two
    * layouts share the [[AdaptiveProbe]] sidecar format: both partition
    * by `cell` and carry `metadata`).
    */
  def buildStats(statsField: String, replace: Boolean = false): Unit =
    AdaptiveProbe.buildStats(
      spark, dir, codebooks.centroids.length, statsField, replace)

  /** [[searchFiltered]] with FILTER-AWARE probe depth —
    * [[DiskIvfIndex.searchFilteredAdaptive]]'s contract over ADC scoring:
    * the probe set widens past the `nprobe` floor until the
    * [[buildStats]] histogram predicts `targetSurvivors` filter-surviving
    * candidates (exact for the full grammar over one statted field, a
    * cross-field upper bound for filters spanning several — see
    * [[DiskIvfIndex.searchFilteredAdaptive]]), capped at a full probe. The probed
    * scan still reads `(nid, codes, metadata, cell)` only — widening the
    * probe set multiplies CODE bytes, never raw-vector bytes, which is
    * what makes deep adaptive probes affordable on the PQ layout at
    * 100 TB (a full probe here costs ~m/dim·4 of the IVF one).
    */
  def searchFilteredAdaptive(
      queries: DataFrame,
      nprobe: Int = 2,
      targetSurvivors: Int = 100): DataFrame = {
    val maxK = Similarity.maxTopK(queries)
    val (kept, schema) = AdaptiveProbe.keptProbeRows(
      queries, codebooks.centroids, dir, nprobe, targetSurvivors)
    val probeSet = kept.map(_.getAs[Int]("cell")).distinct
    val centLit = typedlit(codebooks.centroids.map(_.toSeq).toSeq)
    val probed = spark.createDataFrame(
        java.util.Arrays.asList(kept: _*), schema)
      .drop("rank")
      .withColumn("coarse",
        GraftFunctions.vecDot(col("qv"), element_at(centLit, col("cell") + 1)))
      .withColumn("lut", ProductQuantization.adcTable(col("qv"), codebooks.pq))
      .select(col("qid"), col("cell"), col("filter"), col("top_k"),
        col("coarse"), col("lut"))
    val cells = spark.read.parquet(dir)
      .filter(col("cell").isin(probeSet.map(Integer.valueOf): _*))
      .select(col("nid"), col("codes"), col("metadata"), col("cell"))
    val scored = cells.join(broadcast(probed), "cell")
      .filter(GraftFunctions.jsonFilterMatch(col("filter"), col("metadata")))
      .select(col("qid"), col("top_k"), col("nid"),
        ProductQuantization.adcLookupScore(col("lut"), col("codes"),
          codebooks.pq.m, prefix = Seq(col("coarse"))).as("score_raw"))
    Similarity.heapSelectPerQuery(scored, maxK)
  }
}

object DiskIvfPqIndex {

  /** Complete an interrupted rebalance commit and reopen the layout —
    * [[DiskIvfIndex.recover]]'s contract for the PQ layout.
    */
  def recover(spark: SparkSession, dir: String): DiskIvfPqIndex = {
    RebalanceCommit.recover(spark, dir)
    IvfPq.load(spark, dir)
  }

  private val CodebooksFile = "_ivfpq_codebooks.json"
  private[graft] val FormatVersion = 1

  // completeness marker: written last by buildTrained; pre-rename in
  // rebalance BY DESIGN (append-only ids — see RebalanceCommit)
  private[operators] def writeCodebooks(
      spark: SparkSession, dir: String, cb: IvfPq.Codebooks): Unit = {
    val cent = cb.centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    val pq = cb.pq.codebooks
      .map(_.map(_.mkString("[", ",", "]")).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    LayoutMeta.write(spark, dir, CodebooksFile, FormatVersion,
      s""""subDim":${cb.pq.subDim},"centroids":$cent,"pq":$pq""")
  }

  private[operators] def readCodebooks(
      spark: SparkSession, dir: String): IvfPq.Codebooks = {
    import org.json4s.{JArray, JDouble, JInt, JObject}
    val parsed = LayoutMeta.read(
      spark, dir, CodebooksFile, FormatVersion, "IVF-PQ index")
    def d(v: org.json4s.JValue): Double = v match {
      case JDouble(x) => x
      case JInt(i) => i.toDouble
      case other => throw new IllegalArgumentException(s"bad number: $other")
    }
    parsed match {
      case JObject(fields) =>
        val fm = fields.toMap
        val subDim = fm("subDim") match {
          case JInt(i) => i.toInt
          case other => throw new IllegalArgumentException(s"bad subDim: $other")
        }
        def mat(v: org.json4s.JValue): Array[Array[Double]] = v match {
          case JArray(rows) => rows.map {
            case JArray(xs) => xs.map(d).toArray
            case other => throw new IllegalArgumentException(s"bad row: $other")
          }.toArray
          case other => throw new IllegalArgumentException(s"bad matrix: $other")
        }
        val cent = mat(fm("centroids"))
        val pq = fm("pq") match {
          case JArray(subs) => subs.map(mat).toArray
          case other => throw new IllegalArgumentException(s"bad pq: $other")
        }
        IvfPq.Codebooks(cent, ProductQuantization.PQCodebook(subDim, pq))
      case other => throw new IllegalArgumentException(s"bad codebooks file: $other")
    }
  }
}
