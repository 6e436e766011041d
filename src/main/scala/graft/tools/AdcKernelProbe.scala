package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.ProductQuantization

/** One-off measurement for BASELINE.md: per-row cost of the PQ scan
  * kernel, decode-then-dot (round-7 shape: reconstruct the full-dim
  * vector per row via the interpreted `transform`+`flatten` HOF, then a
  * 64-dim codegen dot) vs the ADC lookup table (round-8 shape: m
  * `element_at` lookups + adds against a per-query m×k partial-dot
  * table). Scores 4M synthetic coded rows against one query with each
  * kernel, best of 3, prints one JSON line. Lifecycle (train/write) is
  * deliberately absent — this isolates the part the 100 TB scan pays
  * per row.
  */
object AdcKernelProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 64; val m = 4; val k = 16; val sd = dim / m
    // deterministic synthetic codebook + query
    val cb = ProductQuantization.PQCodebook(sd,
      Array.tabulate(m, k, sd)((s, c, d) => ((s * 31 + c * 7 + d) % 13 - 6) / 6.0))
    val qv = Seq.tabulate(dim)(d => ((d * 17) % 19 - 9) / 9.0)
    val n = 4000000L
    val codes = spark.range(n).select(col("id").as("nid"),
      array((0 until m).map(s => pmod(hash(col("id"), lit(s)), lit(k))): _*)
        .as("codes"))
      .persist()
    codes.count() // materialize outside the timed region

    val qvLit = typedlit(qv)
    def decodeDot = codes.select(
      GraftFunctions.vecDot(qvLit,
        ProductQuantization.decode(col("codes"), cb)).as("s"))
    val lut = typedlit(Seq.tabulate(m, k)((s, c) =>
      (0 until sd).map(d => qv(s * sd + d) * cb.codebooks(s)(c)(d)).sum))
    def lutScore = codes.select(
      ProductQuantization.adcLookupScore(lut, col("codes"), m).as("s"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(df: => org.apache.spark.sql.DataFrame): Double = {
      df.agg(sum("s")).collect() // warm codegen
      (1 to 3).map(_ => time(df.agg(sum("s")).collect())).min
    }
    val tDecode = best(decodeDot)
    val tLut = best(lutScore)
    println(s"""{"rows": $n, "decode_dot_sec": $tDecode, "adc_lut_sec": $tLut, "speedup": ${tDecode / tLut}}""")
    spark.stop()
  }
}
