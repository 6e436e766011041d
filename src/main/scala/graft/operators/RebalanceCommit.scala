package graft.operators

import org.apache.spark.sql.SparkSession

/** Staged-commit protocol shared by [[DiskIvfIndex.rebalance]] and
  * [[DiskIvfPqIndex.rebalance]] — the discipline that removes both scale
  * hazards of an in-place cell split:
  *
  *   - NO EXECUTOR-LOSS WINDOW: every moved row is durable on disk (the
  *     staged layout under `dir/_rebalance_stage`, written by ONE job for
  *     all hot cells) before any source file is touched. A failure at any
  *     point leaves every row either in its original `cell=` directory or
  *     in the stage — never only in executor memory.
  *   - NO HALF-WRITTEN READER: the commit is bracketed by a pending
  *     marker (`_rebalance_pending.json`). `IvfIndex.load` /
  *     `IvfPq.load` refuse a layout whose marker is present, and
  *     `recover` completes the interrupted renames idempotently. Both
  *     stage and marker are underscore-prefixed, so Spark's file listing
  *     never surfaces them to a plain `spark.read.parquet(dir)`.
  *
  * Write order (each step safe to crash after):
  *   1. staged layout (complete, `_SUCCESS`-terminated) — invisible;
  *   2. grown codebook — SAFE EARLY because new cell ids are append-only:
  *      a codebook referencing not-yet-materialized cells probes empty
  *      directories (harmless), while the reverse order would leave moved
  *      rows invisible to every probe (the round-9 advisory);
  *   3. pending marker (hot cells + new ids — the full rename worklist);
  *   4. phase 1: every hot `cell=` dir renamed INTO the stage
  *      (`old_cell=`), one rename each — rows stay on disk throughout;
  *   5. phase 2: every staged `cell=` dir renamed into the layout;
  *   6. marker deleted — the commit point;
  *   7. stage deleted (best-effort; leftover stage without a marker is
  *      inert garbage the next rebalance overwrites).
  *
  * Idempotent recovery: phase 1's park-rename doubles as its own "done"
  * flag (`old_cell=` present ⇒ the hot dir was moved out, so a present
  * `cell=<hot>` can only be the staged sub-cell 0 already moved in), and
  * phase 2 skips targets that already exist — so `recover` simply re-runs
  * phases 4–7 from the marker's worklist.
  */
private[operators] object RebalanceCommit {

  private val Marker = "_rebalance_pending.json"
  private[operators] val StageDir = "_rebalance_stage"

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def pending(spark: SparkSession, dir: String): Boolean = {
    val (fs, _) = fsOf(spark, dir)
    fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$Marker"))
  }

  def failIfPending(spark: SparkSession, dir: String): Unit =
    require(!pending(spark, dir),
      s"index at $dir has an interrupted rebalance commit " +
        s"($Marker present) — run DiskIvfIndex.recover / DiskIvfPqIndex" +
        s".recover to complete it before opening the layout")

  def stagePath(dir: String): String = s"$dir/$StageDir"

  /** Steps 3–7. The caller has already written the staged layout and the
    * grown codebook.
    */
  def commit(spark: SparkSession, dir: String, hot: Seq[Int], ids: Seq[Int]): Unit = {
    val (fs, _) = fsOf(spark, dir)
    val markerPath = new org.apache.hadoop.fs.Path(s"$dir/$Marker")
    val tmpPath = new org.apache.hadoop.fs.Path(s"$dir/$Marker.tmp")
    val json = s"""{"hot": ${hot.mkString("[", ",", "]")}, """ +
      s""""ids": ${ids.mkString("[", ",", "]")}}"""
    // write-temp-then-rename: a crash mid-write leaves only the .tmp (the
    // layout stays openable and a re-run overwrites it); the marker itself
    // only ever appears complete, so recover() never sees truncated JSON
    val out = fs.create(tmpPath, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    fs.delete(markerPath, false)
    require(fs.rename(tmpPath, markerPath),
      s"rebalance: failed to publish commit marker $markerPath")
    finishRenames(spark, dir, hot, ids)
  }

  /** Complete an interrupted commit from the marker's worklist (no-op when
    * no marker is present). The layout is fully consistent afterwards.
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    val (fs, _) = fsOf(spark, dir)
    val markerPath = new org.apache.hadoop.fs.Path(s"$dir/$Marker")
    if (!fs.exists(markerPath)) return
    val in = fs.open(markerPath)
    val json = try {
      val len = fs.getFileStatus(markerPath).getLen.toInt
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
    import org.json4s.jackson.JsonMethods
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    scala.util.Try {
      val v = JsonMethods.parse(json)
      ((v \ "hot").extract[Seq[Int]], (v \ "ids").extract[Seq[Int]])
    } match {
      case scala.util.Success((hot, ids)) => finishRenames(spark, dir, hot, ids)
      case scala.util.Failure(e) =>
        // an unparseable marker BEFORE any rename (no parked `old_cell=`
        // dir in the stage) locked a layout that is still fully
        // consistent — delete it instead of wedging the layout. Once a
        // park has happened, the worklist is genuinely lost: refuse.
        val parked = scala.util.Try(
          fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$StageDir"))
            .exists(_.getPath.getName.startsWith("old_cell="))).getOrElse(false)
        if (parked) throw new IllegalStateException(
          s"rebalance marker at $dir is unreadable AFTER renames began — " +
            s"manual repair required", e)
        fs.delete(markerPath, false)
    }
  }

  private def finishRenames(
      spark: SparkSession, dir: String, hot: Seq[Int], ids: Seq[Int]): Unit = {
    val (fs, _) = fsOf(spark, dir)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    // phase 1: park every hot cell's directory inside the stage — a parked
    // dir is this phase's own completion flag for that cell
    hot.foreach { c =>
      val old = path(s"$dir/cell=$c")
      val parked = path(s"$dir/$StageDir/old_cell=$c")
      if (fs.exists(old) && !fs.exists(parked)) {
        require(fs.rename(old, parked), s"rebalance: failed to park $old")
      }
    }
    // phase 2: surface every staged sub-cell (a Lloyd split can leave a
    // sub-cell empty — then its staged dir simply doesn't exist and the id
    // stays an empty cell, which probes read as zero rows)
    ids.foreach { n =>
      val staged = path(s"$dir/$StageDir/cell=$n")
      val dst = path(s"$dir/cell=$n")
      if (fs.exists(staged) && !fs.exists(dst)) {
        require(fs.rename(staged, dst), s"rebalance: failed to surface $staged")
      }
    }
    // commit point, then best-effort cleanup
    fs.delete(path(s"$dir/$Marker"), false)
    fs.delete(path(s"$dir/$StageDir"), true)
  }
}
