package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scale-analysis helper: run named `SparkEntry.queries` entries against a
  * testdata directory and print each result's row count — the denominator
  * scale validation needs when a query's runtime grows faster than its
  * input (near-dup pair volume is quadratic in duplicate-group size, so a
  * replicated corpus inflates OUTPUT far faster than rows; see
  * BASELINE.md's sf1 section).
  *
  * Usage: runMain graft.tools.CountQuery <sfDir> <q22_minhash_neardup,...>
  */
object CountQuery {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CountQuery <sfDir> <name,name,...>")
    val Array(dir, names) = args
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n.trim,
        sys.error(s"unknown query: $n"))
      val t0 = System.nanoTime()
      val cnt = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[count] ${n.trim} rows=$cnt sec=$sec%.2f")
    }
    spark.stop()
  }
}
