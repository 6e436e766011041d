package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev knob (same contract as Bench): SPARK_GRAFT_ONLY=q90 dumps a
    // comma-separated subset. The driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val signatures = scala.collection.mutable.TreeMap.empty[String, String]
    // Wall time per query (plan + execute + dump), written to
    // verify_times.json for base-vs-scaled comparison of the scale tiers
    // (tools/run_sf100x.sh's ratio step reads the two dumps' files) —
    // the partition-discipline evidence, not a bench-grade number (one
    // run, includes the coalesce(1) dump write).
    val times = scala.collection.mutable.TreeMap.empty[String, Double]
    val failed = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .flatMap { case (name, fn) =>
      try {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        // pre-execution physical plan: stable across runs at one SF, and
        // the thing a plan regression changes first
        signatures(name) =
          graft.tools.PlanAudit.signature(df.queryExecution.executedPlan.toString)
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        times(name) = (System.nanoTime() - t0) / 1e9
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      }
    }.toSet
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // In subset mode only the subset's oracles are dumped (and checked):
    // a data-dependent oracle for a query that did not run this pass has
    // no captured context, by design.
    val oracle = SparkEntry.oracleSql
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    // Fail loudly on inconsistent state: a query that ran successfully must
    // never ship the degenerate placeholder oracle — that would record a
    // false result for the round instead of surfacing the bug. (A FAILED
    // query's placeholder is fine: its parquet dump is already missing, so
    // the driver records the error either way.)
    val degenerate = oracle.collect {
      case (k, sql) if sql == SparkEntry.unavailableOracle && !failed(k) => k
    }
    if (degenerate.nonEmpty)
      throw new IllegalStateException(
        s"data-dependent oracle(s) missing their captured run context " +
          s"despite the query succeeding: ${degenerate.mkString(", ")}")
    val json = oracle
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val timesJson = times
      // explicit ROOT locale: the default-locale formatter would emit a
      // comma decimal separator under e.g. de_DE, breaking json.load
      .map { case (k, v) =>
        s"${q(k)}: ${String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_times.json"), timesJson)

    // ---- plan-snapshot diff: every recorded query's plan signature is
    // compared against the committed PLAN_SNAPSHOT.json (same SF only —
    // planning-time broadcast decisions depend on file sizes). A changed
    // signature prints a loud [plan-audit] CHANGED line: plan regressions
    // surface HERE, at the commit that caused them, not rounds later as
    // an ambiguous bench delta. Refresh intentionally with
    // PLAN_SNAPSHOT_UPDATE=1 after reviewing the diff.
    val sigJson = signatures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{\n", ",\n", "}\n")
    Files.writeString(Paths.get(s"$outDir/plan_signatures.json"), sigJson)
    val snapPath = Paths.get("PLAN_SNAPSHOT.json")
    val update = sys.env.get("PLAN_SNAPSHOT_UPDATE").contains("1")
    if (update) {
      // Subset runs (SPARK_GRAFT_ONLY) must refresh ONLY the queries that
      // ran — overwriting would silently drop the other ~119 signatures
      // and disarm the tripwire for them. Merge into the existing
      // snapshot when it records the same SF; a different SF means the
      // old signatures aren't comparable anyway, so start fresh.
      val existing: Map[String, String] =
        if (!Files.exists(snapPath)) Map.empty
        else {
          import org.json4s.{JObject, JString}
          org.json4s.jackson.JsonMethods.parse(Files.readString(snapPath)) match {
            case JObject(fields) =>
              val fm = fields.toMap
              val sameSf = fm.get("sf_dir").collect { case JString(s) => s }.contains(sfDir)
              if (!sameSf) Map.empty
              else fm.get("signatures").collect {
                case JObject(sigs) => sigs.collect { case (k, JString(v)) => k -> v }.toMap
              }.getOrElse(Map.empty)
            case _ => Map.empty
          }
        }
      val merged = scala.collection.immutable.TreeMap.empty[String, String] ++
        existing ++ signatures
      val mergedJson = merged
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{\n", ",\n", "}\n")
      Files.writeString(snapPath,
        s"""{"sf_dir": ${q(sfDir)}, "signatures": $mergedJson}""")
      println(s"[plan-audit] snapshot refreshed for $sfDir " +
        s"(${signatures.size} ran, ${merged.size} total)")
    } else if (Files.exists(snapPath)) {
      import org.json4s.{JObject, JString}
      org.json4s.jackson.JsonMethods.parse(Files.readString(snapPath)) match {
        case JObject(fields) =>
          val fm = fields.toMap
          val snapSf = fm.get("sf_dir").collect { case JString(s) => s }
          if (!snapSf.contains(sfDir)) {
            println(s"[plan-audit] snapshot is for ${snapSf.getOrElse("?")}, " +
              s"this run is $sfDir — compare skipped")
          } else {
            val snap = fm.get("signatures").collect {
              case JObject(sigs) => sigs.collect { case (k, JString(v)) => k -> v }.toMap
            }.getOrElse(Map.empty)
            var changed = 0
            signatures.foreach { case (name, sig) =>
              snap.get(name) match {
                case Some(old) if old != sig =>
                  changed += 1
                  System.err.println(s"[plan-audit] CHANGED $name\n" +
                    s"[plan-audit]   was: $old\n[plan-audit]   now: $sig")
                case None =>
                  println(s"[plan-audit] NEW $name (not in snapshot)")
                case _ => ()
              }
            }
            if (changed > 0)
              System.err.println(s"[plan-audit] $changed plan signature(s) changed — " +
                "review, then PLAN_SNAPSHOT_UPDATE=1 to accept")
            else println(s"[plan-audit] ${signatures.size} signatures match the snapshot")
          }
        case _ => println("[plan-audit] snapshot unreadable — skipping compare")
      }
    }
    spark.stop()
  }
}
