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
    */
  def buildStats(
      spark: SparkSession, dir: String, ncells: Int, statsField: String): Unit =
    writeStats(spark, dir, ncells, statsField,
      histogramOf(spark.read.parquet(dir), statsField))

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
    * candidates ($eq/$ne/$in/$lt/$lte/$gt/$gte on the stats field
    * estimated exactly; any other filter shape falls back to the floor),
    * capped at a full probe.
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
    val (field, totals, stats) = loadStats(spark, dir, centroids.length)
    val nlist = centroids.length
    val rankedPlan = queries
      .select(col("qid"), col("qvec").cast("array<double>").as("qv"),
        col("filter"), col("top_k").cast("int").as("top_k"))
      .select(col("qid"), col("qv"), col("filter"), col("top_k"),
        posexplode(KMeans.probeCells(col("qv"), centroids, nlist)))
      .withColumnsRenamed(Map("pos" -> "rank", "col" -> "cell"))
    val rankedRows =
      Similarity.collectProbeBatch(rankedPlan, "searchFilteredAdaptive")
    def survivorsOf(filterJson: String): Option[Int => Long] = {
      import org.json4s._
      def lit(v: JValue): Option[String] = v match {
        case JInt(i) => Some(i.toString)
        case JLong(l) => Some(l.toString)
        case JString(s) => Some(s)
        case JBool(b) => Some(b.toString)
        case JDouble(d) => Some(d.toString)
        case _ => None
      }
      scala.util.Try(org.json4s.jackson.JsonMethods.parse(filterJson)).toOption.flatMap {
        case JObject(List((f, JObject(List((op, v)))))) if f == field =>
          (op, v) match {
            case ("$eq", _) => lit(v).map(value => (c: Int) =>
              stats.getOrElse(c, Map.empty).getOrElse(value, 0L))
            case ("$ne", _) => lit(v).map(value => (c: Int) =>
              totals.getOrElse(c, 0L) -
                stats.getOrElse(c, Map.empty).getOrElse(value, 0L))
            case ("$in", JArray(vs)) =>
              val lits = vs.map(lit)
              if (lits.exists(_.isEmpty)) None
              else {
                // distinct: {"$in": [3, 3]} must not double-count (an
                // overcount would widen LESS than needed — unsafe)
                val values = lits.flatten.distinct
                Some((c: Int) => values
                  .map(stats.getOrElse(c, Map.empty).getOrElse(_, 0L)).sum)
              }
            case ("$lt" | "$lte" | "$gt" | "$gte", _) =>
              // Range estimation is the same exact sum arithmetic as $in,
              // over the histogram keys the comparison admits. It mirrors
              // FilterCompiler's JSON-mode semantics: a NUMERIC literal
              // compares against `cast(value as double)` (a non-numeric
              // stored value casts to null and fails the real filter —
              // skipping it here matches, not just undercounts); a STRING
              // literal compares the raw extracted strings. Caveat kept
              // deliberately: Java's UTF-16 compareTo and Spark's UTF-8
              // byte order disagree for values mixing U+E000–U+FFFF with
              // supplementary-plane codepoints — there the ESTIMATE can
              // drift (it is a probe-depth hint; the nprobe floor still
              // holds), while the filter itself stays exact.
              val sign: Int => Boolean = op match {
                case "$lt" => _ < 0
                case "$lte" => _ <= 0
                case "$gt" => _ > 0
                case "$gte" => _ >= 0
              }
              val admits: Option[String => Boolean] = v match {
                case JInt(_) | JLong(_) | JDouble(_) =>
                  val d = v match {
                    case JInt(i) => i.toDouble
                    case JLong(l) => l.toDouble
                    case JDouble(x) => x
                    case _ => Double.NaN
                  }
                  Some(s => s.toDoubleOption
                    .exists(x => sign(java.lang.Double.compare(x, d))))
                case JString(strLit) => Some(s => sign(s.compareTo(strLit)))
                case _ => None
              }
              admits.map(p => (c: Int) =>
                stats.getOrElse(c, Map.empty)
                  .collect { case (value, n) if p(value) => n }.sum)
            case _ => None
          }
        case _ => None
      }
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
