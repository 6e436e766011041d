package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Scale-validation corpus builder: writes an N×-replicated copy of a
  * testdata directory with referentially-consistent key shifts (replica r
  * adds `r · 10⁸` to every primary AND the matching foreign keys, so joins
  * scale linearly instead of fanning out). `nation`/`region` stay single —
  * they are fixed dimension tables at every TPC-H scale factor.
  *
  * Replicated documents/embeddings are EXACT copies under new ids — the
  * realistic worst case for the dedup family (a crawl corpus at scale is
  * full of verbatim duplicates), so near-dup pair volume and cluster
  * sizes grow superlinearly BY CONSTRUCTION. The scale run's purpose is
  * to measure exactly that (see BASELINE.md's sf1 section).
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {

  private val Shift = 100000000L // > every key's max at any tested SF

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <factor>")
    val Array(src, dst, f) = args
    val factor = f.toInt
    require(factor >= 1, "factor must be >= 1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    // table -> columns carrying entity ids (primary or foreign) to shift
    val shiftCols: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "nation" -> Nil, // fixed dims: copied once, never replicated
      "region" -> Nil)

    shiftCols.foreach { case (name, cols) =>
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out: DataFrame =
        if (cols.isEmpty) base
        else (0 until factor).map { r =>
          cols.foldLeft(base) { (df, c) =>
            df.withColumn(c, col(c) + lit(r * Shift))
          }
        }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name: ${if (cols.isEmpty) "1x (dim)" else s"${factor}x"}")
    }
    spark.stop()
  }
}
