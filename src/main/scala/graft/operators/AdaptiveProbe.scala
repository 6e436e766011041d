package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for filter-aware probe widening over a cell-partitioned
  * layout ([[DiskIvfIndex.searchFilteredAdaptive]] and the PQ twin): the
  * per-cell metadata-value histogram sidecar and the per-query depth
  * decision. One histogram format serves both layouts — the sidecar lives
  * next to the codebook and is keyed only by `cell`, which both layouts
  * partition by. The sidecar carries ONE histogram PER STATS FIELD, so a
  * workload filtering on several metadata fields gets adaptivity on each.
  */
private[operators] object AdaptiveProbe {

  private[operators] val StatsFile = "_cell_stats.json"
  /** Format 2 = the multi-field shape (`"fields": {f: {cell: {v: n}}}`).
    * [[loadStats]] still accepts format-1 sidecars (single `"field"` +
    * `"stats"`) by translating them to a one-entry field map — existing
    * layouts keep serving without a rebuild.
    */
  private[operators] val FormatVersion = 2

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

  /** Field → (cell, value) → count. */
  private type FieldStats = Map[String, Map[(Int, String), Long]]

  /** Add (or refresh) `statsField`'s `(cell, value) → count` histogram in
    * the layout's stats sidecar — one partial-aggregated scan per built
    * field, each bounded by cells × distinct values (the field contract is
    * LOW CARDINALITY, guarded at 65536 pairs per field). Rows whose
    * metadata lacks the field count in neither histogram nor totals: the
    * estimator UNDERCOUNTS survivors, which only widens the probe set
    * (the safe direction).
    *
    * Multi-field semantics: building a NEW field keeps every other field's
    * histogram (same-`ncells` sidecars merge verbatim — no rescan of the
    * already-built fields); rebuilding the SAME field refreshes just that
    * entry. A STALE sidecar (built before a rebalance grew the codebook)
    * is repaired wholesale: every field it names is re-aggregated at the
    * current cell count, so one `buildStats` call remains the complete
    * staleness remedy. `replace = true` drops all other fields and keeps
    * only `statsField` — the cleanup path when an old field's adaptivity
    * is no longer wanted.
    */
  def buildStats(
      spark: SparkSession, dir: String, ncells: Int, statsField: String,
      replace: Boolean = false): Unit = {
    val field = validField(statsField)
    val df = spark.read.parquet(dir)
    val carried: FieldStats =
      if (replace) Map.empty
      else scala.util.Try(parseStats(spark, dir)).toOption match {
        case Some((storedCells, stored)) if storedCells == ncells =>
          (stored - field).map { case (f, cells) =>
            f -> (for ((c, vs) <- cells; (v, n) <- vs) yield (c, v) -> n).toMap
          }
        case Some((_, stored)) => // stale: re-aggregate every stored field
          (stored.keySet - field).map(f => f -> histogramOf(df, f)).toMap
        case None => Map.empty
      }
    writeStats(spark, dir, ncells,
      carried + (field -> histogramOf(df, field)))
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
      spark: SparkSession, dir: String, ncells: Int,
      fields: FieldStats): Unit = {
    // deterministic rendering (sorted fields / cells / values): incremental
    // maintenance paths are spec-asserted byte-equal to a fresh rebuild
    val body = fields.toSeq.sortBy(_._1).map { case (field, hist) =>
      val cells = hist.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1)
        .map { case (cell, entries) =>
          val vals = entries.sortBy(_._1._2)
            .map { case ((_, v), n) => s""""${jsonStr(v)}": $n""" }
            .mkString("{", ", ", "}")
          s""""$cell": $vals"""
        }.mkString("{", ", ", "}")
      s""""${jsonStr(validField(field))}": $cells"""
    }.mkString("{", ", ", "}")
    LayoutMeta.write(spark, dir, StatsFile, FormatVersion,
      s""""ncells": $ncells, "fields": $body""")
  }

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

  /** Keep the sidecar truthful across [[DiskIvfIndex.append]]-style batch
    * appends: merge the batch's histogram into each stored field's (one
    * aggregate over the BATCH per field, never a layout rescan). No-op
    * when the layout has no sidecar, or when the batch carries no
    * `metadata` column — then the appended rows simply stay uncounted,
    * which UNDERCOUNTS survivors and can only widen probes (the safe
    * direction). Runs AFTER the rows are durable, so nothing here may
    * fail the append: a STALE sidecar (pre-rebalance cell count) is left
    * in place for search-time [[loadStats]] to keep refusing with the
    * rebuild instruction, and a field whose merged histogram would exceed
    * the 65536-pair cardinality guard keeps its OLD entries (the appended
    * rows stay uncounted for that field — stale, undercount-safe) with a
    * stderr warning instead of an exception a caller might misread as a
    * failed append and retry into a double-append. Single-writer, like
    * every other mutation of these layouts.
    */
  def mergeStatsOnAppend(
      spark: SparkSession, dir: String, ncells: Int, assignedBatch: DataFrame): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$StatsFile")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path) || !assignedBatch.columns.contains("metadata")) return
    scala.util.Try(loadStats(spark, dir, ncells)).toOption.foreach { stored =>
      val mergedFields = stored.map { case (field, cells) =>
        val flat = for ((c, vs) <- cells; (v, n) <- vs) yield (c, v) -> n
        val merged = histogramOf(assignedBatch, field).foldLeft(flat.toMap) {
          case (acc, (k, n)) => acc.updated(k, acc.getOrElse(k, 0L) + n)
        }
        if (merged.size <= 65536) field -> merged
        else {
          System.err.println(
            s"[graft] appending grew cell stats for '$field' past the 65536 " +
              s"(cell, value)-pair cap (${merged.size}) — keeping the " +
              s"pre-append histogram (undercounts the new rows, which only " +
              s"widens probes); rebuild stats on a lower-cardinality field")
          field -> flat.toMap
        }
      }
      writeStats(spark, dir, ncells, mergedFields)
    }
  }

  /** Keep the sidecar truthful across a rebalance WITHOUT the full-corpus
    * rescan a cold rebuild costs: the split moved ONLY the hot cells'
    * rows, so each field's refreshed histogram = (stored histogram minus
    * the hot cells' entries) + one PARTITION-PRUNED aggregate over the
    * touched cells (hot ∪ their new sub-cell ids) — at 100 TB that is a
    * scan of the split directories, not the corpus. Runs strictly AFTER
    * the rename commit, so a crash anywhere before the refreshed write
    * leaves the old-cell-count sidecar, which search-time [[loadStats]]
    * refuses with the rebuild instruction — never a silently wrong
    * histogram. No-op when the layout has no sidecar or the stored one is
    * already stale (unknown provenance — leave it refused); if any field's
    * refreshed histogram would exceed the 65536-pair cardinality guard,
    * the stale sidecar is likewise left in place (refused, rebuild
    * decides).
    */
  def refreshStatsAfterRebalance(
      spark: SparkSession, dir: String, oldNcells: Int, newNcells: Int,
      hot: Seq[Int], newIds: Seq[Int]): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$StatsFile")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    scala.util.Try(loadStats(spark, dir, oldNcells)).toOption.foreach { stored =>
      val touched = (hot ++ newIds).distinct
      val hotSet = hot.toSet
      val touchedScan = spark.read.parquet(dir)
        .filter(col("cell").isin(touched.map(Integer.valueOf): _*))
      // untouched cells keep their stored entries verbatim; the touched
      // cells' entries are re-aggregated from the post-commit layout.
      // The two key spaces are disjoint: hot ids re-enter via the scan
      // (sub-cell 0 keeps the split cell's id) and new ids never had
      // stored entries.
      val refreshed = stored.map { case (field, cells) =>
        val kept = for {
          (c, vs) <- cells if !hotSet.contains(c)
          (v, n) <- vs
        } yield (c, v) -> n
        field -> (kept.toMap ++ histogramOf(touchedScan, field))
      }
      if (refreshed.values.forall(_.size <= 65536))
        writeStats(spark, dir, newNcells, refreshed)
    }
  }

  /** Parse the sidecar (either format) WITHOUT the cell-count check:
    * `(ncells it was built over, field → cell → value → count)`.
    */
  private def parseStats(spark: SparkSession, dir: String)
      : (Int, Map[String, Map[Int, Map[String, Long]]]) = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val v = LayoutMeta.parseFile(spark, dir, StatsFile, "IVF cell-stats")
    def cellsOf(body: org.json4s.JValue): Map[Int, Map[String, Long]] =
      body match {
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
    val fields = LayoutMeta.formatOf(v) match {
      case 1 => // legacy single-field shape: {"field": f, "stats": {...}}
        Map((v \ "field").extract[String] -> cellsOf(v \ "stats"))
      case FormatVersion => (v \ "fields") match {
        case org.json4s.JObject(fs) =>
          fs.map { case (f, body) => f -> cellsOf(body) }.toMap
        case other => throw new IllegalArgumentException(s"bad stats file: $other")
      }
      case other =>
        throw new IllegalArgumentException(
          s"$dir/$StatsFile has format $other; this reader supports 1-$FormatVersion")
    }
    ((v \ "ncells").extract[Int], fields)
  }

  /** `field → per-cell value→count` from the sidecar. Refuses stats whose
    * cell count no longer matches the codebook (a rebalance grew the
    * layout — rebuild the histograms).
    */
  def loadStats(spark: SparkSession, dir: String, ncells: Int)
      : Map[String, Map[Int, Map[String, Long]]] = {
    val (statsCells, fields) = parseStats(spark, dir)
    require(statsCells == ncells,
      s"cell stats at $dir were built over $statsCells cells but the codebook " +
        s"has $ncells — rebuild stats after rebalance " +
        s"(buildStats(${fields.keys.toSeq.sorted.map("\"" + _ + "\"").mkString(" / ")}))")
    fields
  }

  /** The collected, depth-trimmed probe batch: per query, the full
    * nearest-first cell ranking widened past the `nprobe` floor — never
    * below it — until the histogram predicts `targetSurvivors` surviving
    * candidates, capped at a full probe. Filters composed entirely over
    * ONE stats field estimate exactly; filters spanning several stats
    * fields estimate as a cross-field bound (min over conjuncts, sum over
    * disjuncts — each an upper bound, so the widened depth is always ≥
    * the floor and closer to the need than it); conjuncts on un-statted
    * fields are DROPPED from the estimate (again an upper bound) rather
    * than flooring the whole filter, and only a filter with no estimable
    * conjunct at all falls back to the fixed floor. Returns the kept
    * `(qid, qv, filter, top_k, cell)` rows plus their schema — integer
    * arithmetic on the driver over a probe-cap-bounded batch; no extra
    * cluster work.
    */
  def keptProbeRows(
      queries: DataFrame,
      centroids: Array[Array[Double]],
      dir: String,
      nprobe: Int,
      targetSurvivors: Int)
      : (Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType) = {
    val spark = queries.sparkSession
    val stats = loadStats(spark, dir, centroids.length)
    val nlist = centroids.length
    val rankedPlan = queries
      .select(col("qid"), col("qvec").cast("array<double>").as("qv"),
        col("filter"), col("top_k").cast("int").as("top_k"))
      .select(col("qid"), col("qv"), col("filter"), col("top_k"),
        posexplode(KMeans.probeCells(col("qv"), centroids, nlist)))
      .withColumnsRenamed(Map("pos" -> "rank", "col" -> "cell"))
    val rankedRows =
      Similarity.collectProbeBatch(rankedPlan, "searchFilteredAdaptive")
    /** Per-cell survivor estimate for a filter document, or None when NO
      * part of it is estimable (→ the nprobe floor). The filter compiles
      * to a small tree: leaves are per-VALUE predicates over one stats
      * field's histogram keys (the raw `get_json_object` renderings),
      * boolean algebra over the SAME field folds into one leaf — so
      * everything FilterCompiler can express over a single stats field
      * estimates exactly: `$eq/$ne/$in/$nin/$exists:true`, the four range
      * operators, multi-op condition objects (the `{"$gte": a, "$lt": b}`
      * between idiom), bare-value $eq shorthand, and `$and`/`$or`
      * combinators — while CROSS-field nodes evaluate as bounds
      * (conjunction = min of child estimates, disjunction = their sum).
      * In a conjunction (top-level document or `$and`), a conjunct that
      * is NOT estimable — another (un-statted) field, `$exists:false`
      * (its survivors live outside the histogram), an unknown operator —
      * is dropped: the remaining conjuncts' estimate is a survivor upper
      * bound, so widening against it is always ≥ the floor fallback and
      * strictly closer to the need. A disjunction with any non-estimable
      * arm is itself non-estimable (its survivors are unbounded by the
      * estimable arms).
      *
      * Each leaf predicate mirrors FilterCompiler's JSON-mode semantics: a
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
      sealed trait Node
      case class Leaf(field: String, p: String => Boolean) extends Node
      case class AndN(cs: List[Node]) extends Node
      case class OrN(cs: List[Node]) extends Node
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
      // same-field boolean algebra folds into one exact leaf; cross-field
      // combinations stay tree nodes evaluated as bounds
      def andOf(ns: List[Node]): Node = ns match {
        case (Leaf(f, _) :: _) if ns.forall {
          case Leaf(g, _) => g == f; case _ => false } =>
          val ps = ns.collect { case Leaf(_, p) => p }
          Leaf(f, s => ps.forall(_(s)))
        case single :: Nil => single
        case _ => AndN(ns)
      }
      def orOf(ns: List[Node]): Node = ns match {
        case (Leaf(f, _) :: _) if ns.forall {
          case Leaf(g, _) => g == f; case _ => false } =>
          val ps = ns.collect { case Leaf(_, p) => p }
          Leaf(f, s => ps.exists(_(s)))
        case single :: Nil => single
        case _ => OrN(ns)
      }
      // conjunction semantics: drop non-estimable conjuncts (upper
      // bound); None only when nothing is estimable
      def conj(entries: List[Option[Node]]): Option[Node] = {
        val defined = entries.flatten
        if (defined.isEmpty) None else Some(andOf(defined))
      }
      def docNode(doc: JValue): Option[Node] = doc match {
        case JObject(fields) if fields.nonEmpty =>
          conj(fields.map {
            case ("$and", JArray(xs)) => conj(xs.map(docNode))
            case ("$or", JArray(xs)) =>
              val sub = xs.map(docNode)
              if (sub.exists(_.isEmpty)) None else Some(orOf(sub.flatten))
            case (f, cond) if stats.contains(f) => condPred(cond).map(Leaf(f, _))
            case _ => None
          })
        case _ => None
      }
      def eval(n: Node, c: Int): Long = n match {
        case Leaf(f, p) => stats(f).getOrElse(c, Map.empty)
          .collect { case (value, cnt) if p(value) => cnt }.sum
        case AndN(cs) => cs.map(eval(_, c)).min
        case OrN(cs) => cs.map(eval(_, c)).sum
      }
      scala.util.Try(org.json4s.jackson.JsonMethods.parse(filterJson)).toOption
        .flatMap(docNode)
        .map(node => (c: Int) => eval(node, c))
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
