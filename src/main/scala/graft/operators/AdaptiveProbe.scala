package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for filter-aware probe widening over a cell-partitioned
  * layout ([[DiskIvfIndex.searchFilteredAdaptive]] and the PQ twin): the
  * per-cell metadata-value histogram sidecar and the per-query depth
  * decision. One histogram format serves both layouts — the sidecar lives
  * next to the codebook and is keyed only by `cell`, which both layouts
  * partition by.
  */
private[operators] object AdaptiveProbe {

  private[operators] val StatsFile = "_cell_stats.json"
  private[operators] val FormatVersion = 1

  /** JSON string-body escape: backslash, quote, and control characters
    * (U+0000–U+001F as \\uXXXX) — a metadata value containing a newline
    * must not produce a sidecar every later [[loadStats]] rejects.
    */
  private def jsonStr(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** The stats field is interpolated into both the sidecar JSON and the
    * `get_json_object` JSONPath — restrict it to the identifier charset
    * so neither embedding can be broken or redirected.
    */
  private def validField(statsField: String): String = {
    require(statsField.nonEmpty && statsField.forall(c =>
      c.isLetterOrDigit && c < 128 || c == '_'),
      s"stats field must be a simple identifier ([A-Za-z0-9_]+), got '$statsField'")
    statsField
  }

  /** One partial-aggregated scan → the `(cell, value) → count` histogram
    * for `statsField` (a key inside the `metadata` JSON column), persisted
    * as the format-stamped sidecar. Bounded by cells × distinct values —
    * the field contract is LOW CARDINALITY (guarded at 65536 pairs). Rows
    * whose metadata lacks the field count in neither histogram nor totals:
    * the estimator UNDERCOUNTS survivors, which only widens the probe set
    * (the safe direction).
    *
    * One sidecar per layout: rebuilding the SAME field is always allowed
    * (the staleness remedy), but switching fields silently would strip
    * the old field's adaptivity (its filters would quietly fall to the
    * fixed floor) — that takes `replace = true`.
    */
  def buildStats(
      spark: SparkSession, dir: String, ncells: Int, statsField: String,
      replace: Boolean = false): Unit = {
    if (!replace) {
      val path = new org.apache.hadoop.fs.Path(s"$dir/$StatsFile")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) {
        implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
        scala.util.Try(
          (LayoutMeta.read(spark, dir, StatsFile, FormatVersion,
            "IVF cell-stats") \ "field").extract[String])
          .toOption.filter(_ != validField(statsField)).foreach { old =>
            throw new IllegalArgumentException(
              s"cell stats at $dir are built for field '$old'; building " +
                s"'$statsField' would replace them and silently drop '$old' " +
                s"filter adaptivity — pass replace = true to switch fields")
          }
      }
    }
    writeStats(spark, dir, ncells, statsField,
      histogramOf(spark.read.parquet(dir), statsField))
  }

  /** `(cell, value) → count` over `df` (which must carry `cell` and the
    * `metadata` JSON column). Bounded by cells × distinct values.
    */
  private def histogramOf(
      df: DataFrame, statsField: String): Map[(Int, String), Long] = {
    val rows = df
      .groupBy(col("cell"),
        get_json_object(col("metadata"), s"$$.${validField(statsField)}").as("value"))
      .count()
      .filter(col("value").isNotNull)
      .collect()
    require(rows.length <= 65536,
      s"cell stats for '$statsField' has ${rows.length} (cell, value) pairs " +
        s"— the stats field must be low-cardinality")
    rows.map(r => (r.getAs[Int]("cell"), r.getAs[String]("value")) ->
      r.getAs[Long]("count")).toMap
  }

  private def writeStats(
      spark: SparkSession, dir: String, ncells: Int, statsField: String,
      hist: Map[(Int, String), Long]): Unit = {
    val body = hist.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1)
      .map { case (cell, entries) =>
        val vals = entries.sortBy(_._1._2)
          .map { case ((_, v), n) => s""""${jsonStr(v)}": $n""" }
          .mkString("{", ", ", "}")
        s""""$cell": $vals"""
      }.mkString("{", ", ", "}")
    LayoutMeta.write(spark, dir, StatsFile, FormatVersion,
      s""""field": "${validField(statsField)}", "ncells": $ncells, "stats": $body""")
  }

  /** Keep the sidecar truthful across [[DiskIvfIndex.append]]-style batch
    * appends: merge the batch's histogram into the stored one (one
    * aggregate over the BATCH, never a layout rescan). No-op when the
    * layout has no sidecar, or when the batch carries no `metadata`
    * column — then the appended rows simply stay uncounted, which
    * UNDERCOUNTS survivors and can only widen probes (the safe
    * direction). Single-writer, like every other mutation of these
    * layouts.
    */
  /** Pin the assigned batch before an append WRITES it, iff a stats
    * sidecar exists (and the batch carries `metadata` — otherwise the
    * merge below is a no-op anyway): [[mergeStatsOnAppend]] re-reads the
    * batch AFTER the rows are durable, and an unpinned lazy plan that is
    * non-deterministic or derives from the layout directory itself could
    * recompute a DIFFERENT histogram than the written rows — an OVERcount,
    * which narrows probes and breaks the undercount-only invariant.
    * `localCheckpoint` materializes exactly the rows the write will ship;
    * the extra cost is paid only on the (rare) sidecar-present append.
    */
  def pinIfStatsPresent(
      spark: SparkSession, dir: String, assignedBatch: DataFrame): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$StatsFile")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && assignedBatch.columns.contains("metadata"))
      assignedBatch.localCheckpoint()
    else assignedBatch
  }

  def mergeStatsOnAppend(
      spark: SparkSession, dir: String, ncells: Int, assignedBatch: DataFrame): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$StatsFile")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path) || !assignedBatch.columns.contains("metadata")) return
    // a STALE sidecar (built before a rebalance grew the codebook) must
    // not fail the append — the layout mutation is the primary operation.
    // Leave the stale file in place: search-time loadStats keeps refusing
    // it with the rebuild instruction, exactly as before the append.
    val stale = scala.util.Try(loadStats(spark, dir, ncells))
    stale.toOption.foreach { case (field, _, stats) =>
      val flat = for ((c, vs) <- stats; (v, n) <- vs) yield (c, v) -> n
      val merged = histogramOf(assignedBatch, field).foldLeft(flat.toMap) {
        case (acc, (k, n)) => acc.updated(k, acc.getOrElse(k, 0L) + n)
      }
      // re-apply the build-time cardinality guard: the batch can introduce
      // new values. The rows are already durable and the old sidecar stays
      // in place (stale = undercount = safe), so failing HERE loses nothing.
      require(merged.size <= 65536,
        s"appending this batch would grow cell stats for '$field' to " +
          s"${merged.size} (cell, value) pairs (cap 65536) — the rows were " +
          s"appended and the sidecar left unmerged (stale, undercount-safe); " +
          s"rebuild stats on a lower-cardinality field")
      writeStats(spark, dir, ncells, field, merged)
    }
  }

  /** Keep the sidecar truthful across a rebalance WITHOUT the full-corpus
    * rescan a cold rebuild costs: the split moved ONLY the hot cells'
    * rows, so the refreshed histogram = (stored histogram minus the hot
    * cells' entries) + one PARTITION-PRUNED aggregate over the touched
    * cells (hot ∪ their new sub-cell ids) — at 100 TB that is a scan of
    * the split directories, not the corpus. Runs strictly AFTER the
    * rename commit, so a crash anywhere before the refreshed write leaves
    * the old-cell-count sidecar, which search-time [[loadStats]] refuses
    * with the rebuild instruction — never a silently wrong histogram.
    * No-op when the layout has no sidecar or the stored one is already
    * stale (unknown provenance — leave it refused); if the refreshed
    * histogram would exceed the 65536-pair cardinality guard, the stale
    * sidecar is likewise left in place (refused, rebuild decides).
    */
  def refreshStatsAfterRebalance(
      spark: SparkSession, dir: String, oldNcells: Int, newNcells: Int,
      hot: Seq[Int], newIds: Seq[Int]): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$StatsFile")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    scala.util.Try(loadStats(spark, dir, oldNcells)).toOption.foreach {
      case (field, _, stats) =>
        val touched = (hot ++ newIds).distinct
        val hotSet = hot.toSet
        // untouched cells keep their stored entries verbatim; the touched
        // cells' entries are re-aggregated from the post-commit layout.
        // The two key spaces are disjoint: hot ids re-enter via the scan
        // (sub-cell 0 keeps the split cell's id) and new ids never had
        // stored entries.
        val kept = for {
          (c, vs) <- stats if !hotSet.contains(c)
          (v, n) <- vs
        } yield (c, v) -> n
        val scanned = histogramOf(
          spark.read.parquet(dir)
            .filter(col("cell").isin(touched.map(Integer.valueOf): _*)),
          field)
        val merged = kept.toMap ++ scanned
        if (merged.size <= 65536) writeStats(spark, dir, newNcells, field, merged)
    }
  }

  /** `(field, per-cell totals, per-cell value→count)` from the sidecar.
    * Refuses stats whose cell count no longer matches the codebook (a
    * rebalance grew the layout — rebuild the histogram).
    */
  def loadStats(spark: SparkSession, dir: String, ncells: Int)
      : (String, Map[Int, Long], Map[Int, Map[String, Long]]) = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val v = LayoutMeta.read(spark, dir, StatsFile, FormatVersion, "IVF cell-stats")
    val field = (v \ "field").extract[String]
    val statsCells = (v \ "ncells").extract[Int]
    require(statsCells == ncells,
      s"cell stats at $dir were built over $statsCells cells but the codebook " +
        s"has $ncells — rebuild stats after rebalance (buildStats(\"$field\"))")
    val stats: Map[Int, Map[String, Long]] = (v \ "stats") match {
      case org.json4s.JObject(cells) => cells.map { case (c, vals) =>
        c.toInt -> (vals match {
          case org.json4s.JObject(vs) => vs.map {
            case (value, org.json4s.JInt(n)) => value -> n.toLong
            case (value, org.json4s.JLong(n)) => value -> n
            case other => throw new IllegalArgumentException(s"bad stat: $other")
          }.toMap
          case other => throw new IllegalArgumentException(s"bad cell stats: $other")
        })
      }.toMap
      case other => throw new IllegalArgumentException(s"bad stats file: $other")
    }
    (field, stats.map { case (c, vs) => c -> vs.values.sum }, stats)
  }

  /** The collected, depth-trimmed probe batch: per query, the full
    * nearest-first cell ranking widened past the `nprobe` floor — never
    * below it — until the histogram predicts `targetSurvivors` surviving
    * candidates (the full filter grammar over the stats field estimated
    * exactly — see the `survivorsOf` estimator below; filters touching
    * any other field fall back to the floor), capped at a full probe.
    * Returns the kept `(qid, qv, filter, top_k, cell)` rows plus their
    * schema — integer arithmetic on the driver over a probe-cap-bounded
    * batch; no extra cluster work.
    */
  def keptProbeRows(
      queries: DataFrame,
      centroids: Array[Array[Double]],
      dir: String,
      nprobe: Int,
      targetSurvivors: Int)
      : (Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType) = {
    val spark = queries.sparkSession
    val (field, _, stats) = loadStats(spark, dir, centroids.length)
    val nlist = centroids.length
    val rankedPlan = queries
      .select(col("qid"), col("qvec").cast("array<double>").as("qv"),
        col("filter"), col("top_k").cast("int").as("top_k"))
      .select(col("qid"), col("qv"), col("filter"), col("top_k"),
        posexplode(KMeans.probeCells(col("qv"), centroids, nlist)))
      .withColumnsRenamed(Map("pos" -> "rank", "col" -> "cell"))
    val rankedRows =
      Similarity.collectProbeBatch(rankedPlan, "searchFilteredAdaptive")
    /** Per-cell survivor estimate for a filter document, or None when the
      * shape is outside the estimator (→ the nprobe floor). Built as a
      * per-VALUE predicate over the histogram keys (the raw
      * `get_json_object` renderings), composed recursively over the full
      * filter grammar as boolean algebra — so everything FilterCompiler
      * can express OVER THE STATS FIELD ALONE estimates exactly:
      * `$eq/$ne/$in/$nin/$exists:true`, the four range operators, multi-op
      * condition objects (the `{"$gte": a, "$lt": b}` between idiom),
      * bare-value $eq shorthand, and `$and`/`$or` combinators over those.
      * Any leaf on another field, `$exists:false` (its survivors live
      * outside the histogram), or an unknown operator → None.
      *
      * Each predicate mirrors FilterCompiler's JSON-mode semantics: a
      * NUMERIC literal compares against `cast(value as double)` — so
      * "3.0" matches `$eq 3`, a non-numeric value casts to null and fails
      * `$eq` but survives `$ne`/`$nin` (null-safe negation) — and a
      * STRING literal compares raw strings. Caveat kept deliberately:
      * Java's UTF-16 compareTo and Spark's UTF-8 byte order disagree for
      * values mixing U+E000–U+FFFF with supplementary-plane codepoints —
      * there the string-range ESTIMATE can drift (it is a probe-depth
      * hint; the nprobe floor still holds), while the filter itself stays
      * exact.
      */
    def survivorsOf(filterJson: String): Option[Int => Long] = {
      import org.json4s._
      def num(v: JValue): Option[Double] = v match {
        case JInt(i) => Some(i.toDouble)
        case JLong(l) => Some(l.toDouble)
        case JDouble(d) => Some(d)
        case _ => None
      }
      def eqPred(v: JValue): Option[String => Boolean] = v match {
        case JString(str) => Some(_ == str)
        case JBool(b) => Some(_ == b.toString)
        case _ => num(v).map(d => (s: String) => s.toDoubleOption.contains(d))
      }
      def rangePred(op: String, v: JValue): Option[String => Boolean] = {
        val sign: Int => Boolean = op match {
          case "$lt" => _ < 0
          case "$lte" => _ <= 0
          case "$gt" => _ > 0
          case "$gte" => _ >= 0
        }
        v match {
          case JString(strLit) => Some(s => sign(s.compareTo(strLit)))
          case _ => num(v).map(d => (s: String) =>
            s.toDoubleOption.exists(x => sign(java.lang.Double.compare(x, d))))
        }
      }
      def predOf(op: String, v: JValue): Option[String => Boolean] = (op, v) match {
        case ("$eq", _) => eqPred(v)
        case ("$ne", _) => eqPred(v).map(p => (s: String) => !p(s))
        case ("$in", JArray(vs)) =>
          val ps = vs.map(eqPred)
          if (ps.exists(_.isEmpty)) None
          else Some(s => ps.flatten.exists(_(s)))
        case ("$nin", JArray(vs)) =>
          val ps = vs.map(eqPred)
          if (ps.exists(_.isEmpty)) None
          else Some(s => !ps.flatten.exists(_(s)))
        case ("$lt" | "$lte" | "$gt" | "$gte", _) => rangePred(op, v)
        case ("$exists", JBool(true)) => Some(_ => true)
        case _ => None
      }
      def condPred(cond: JValue): Option[String => Boolean] = cond match {
        case JObject(ops) if ops.nonEmpty && ops.forall(_._1.startsWith("$")) =>
          val ps = ops.map { case (op, v) => predOf(op, v) }
          if (ps.exists(_.isEmpty)) None
          else Some(s => ps.flatten.forall(_(s)))
        case JObject(_) => None
        case bare => eqPred(bare)
      }
      def docPred(doc: JValue): Option[String => Boolean] = doc match {
        case JObject(fields) if fields.nonEmpty =>
          val ps = fields.map {
            case ("$and", JArray(xs)) =>
              val sub = xs.map(docPred)
              if (sub.exists(_.isEmpty)) None
              else Some((s: String) => sub.flatten.forall(_(s)))
            case ("$or", JArray(xs)) =>
              val sub = xs.map(docPred)
              if (sub.exists(_.isEmpty)) None
              else Some((s: String) => sub.flatten.exists(_(s)))
            case (f, cond) if f == field => condPred(cond)
            case _ => None
          }
          if (ps.exists(_.isEmpty)) None
          else Some(s => ps.flatten.forall(_(s)))
        case _ => None
      }
      scala.util.Try(org.json4s.jackson.JsonMethods.parse(filterJson)).toOption
        .flatMap(docPred)
        .map(p => (c: Int) =>
          stats.getOrElse(c, Map.empty)
            .collect { case (value, n) if p(value) => n }.sum)
    }
    val kept = rankedRows.groupBy(_.getAs[Any]("qid")).values.flatMap { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      val depth = survivorsOf(sorted.head.getAs[String]("filter")) match {
        case None => math.min(nprobe, nlist)
        case Some(surv) =>
          var d = 0
          var cum = 0L
          while (d < sorted.length && (d < nprobe || cum < targetSurvivors)) {
            cum += surv(sorted(d).getAs[Int]("cell"))
            d += 1
          }
          d
      }
      sorted.take(depth)
    }.toArray
    (kept, rankedPlan.schema)
  }
}
