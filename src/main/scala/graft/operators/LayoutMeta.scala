package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared metadata-file discipline for every persisted index layout
  * ([[DedupIndex]], [[LmIndex]], [[TokenizerIndex]], [[DiskIvfIndex]],
  * [[DiskIvfPqIndex]]; [[ChunkStore]] pioneered the contract) — two
  * invariants a reader can rely on:
  *
  *   - COMPLETENESS MARKER: every layout writes its metadata file LAST,
  *     after all data tables, so a missing metadata file means the writer
  *     was interrupted (or the directory was never a layout of this kind).
  *     `read` turns that into a named, actionable error instead of a
  *     parquet-not-found stack from whichever table a method touches
  *     first.
  *   - FORMAT VERSION: the metadata carries a `format` stamp checked on
  *     open, so a layout-shape change never gets misread as data (the
  *     round-8 ChunkStore lesson: a v1 reader over a v2 table decoded
  *     garbage instead of failing). Layouts written before the stamp
  *     existed parse as format 1 — which IS the current shape for every
  *     index here, so nothing compatible is ever rejected (the round-9
  *     ChunkStore advisory).
  */
private[graft] object LayoutMeta {

  /** Write `dir/file` as a JSON object with the format stamp first.
    * `bodyFields` is the layout's own fields as a JSON fragment
    * (`"k": 3, "seed": 42`). Callers MUST invoke this after every data
    * table is durable — this write is the layout's completeness marker.
    */
  def write(
      spark: SparkSession, dir: String, file: String,
      format: Int, bodyFields: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$file")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(s"""{"format": $format, $bodyFields}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Read and parse `dir/file`, enforcing both invariants. `what` names
    * the layout kind in errors (e.g. "LM index").
    */
  def read(
      spark: SparkSession, dir: String, file: String,
      expected: Int, what: String): org.json4s.JValue = {
    val v = parseFile(spark, dir, file, what)
    checkFormat(formatOf(v), expected, dir, what)
    v
  }

  /** Parse `dir/file` without the format check — for readers whose legacy
    * shape is not a JSON object (the bare-array centroids file).
    */
  def parseFile(
      spark: SparkSession, dir: String, file: String,
      what: String): org.json4s.JValue = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$file")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path))
      throw new IllegalArgumentException(
        s"no $file under $dir — either the $what layout is incomplete " +
          s"(its writer was interrupted before the metadata completeness " +
          s"marker) or this directory is not a $what layout")
    val in = fs.open(path)
    val json = try {
      val len = fs.getFileStatus(path).getLen.toInt
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
    org.json4s.jackson.JsonMethods.parse(json)
  }

  /** The parsed metadata's format, defaulting absent → 1 (pre-stamp
    * layouts; format 1 is the unchanged current shape everywhere).
    */
  def formatOf(v: org.json4s.JValue): Int = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    (v \ "format").toOption.map(_.extract[Int]).getOrElse(1)
  }

  def checkFormat(format: Int, expected: Int, dir: String, what: String): Unit =
    require(format == expected,
      s"$what layout at $dir has format $format but this build reads " +
        s"format $expected — rebuild the layout with this build's save()")
}
