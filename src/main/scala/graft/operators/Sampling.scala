package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Random `df.sample()` is non-reproducible across runs/partitionings; the
  * pipeline idiom at scale is *hash splitting*: a row's membership in
  * train/validation/sample is a pure function of its key, stable across
  * reruns, engines and repartitioning, and implemented as a codegen'd
  * filter at scan speed (no shuffle, prunes before any downstream work).
  */
object Sampling {

  /** Keep rows whose 64-bit key hash lands below `keep`/`buckets`
    * (xxhash64 — the fast engine-native path).
    */
  def hashSample(df: DataFrame, key: Column, keep: Int, buckets: Int = 100): DataFrame =
    df.filter(pmod(xxhash64(key), lit(buckets)) < lit(keep))

  /** Cross-engine-portable variant: first hex digit of md5(key-as-string)
    * selects `sixteenths`/16 of rows. Byte-identical in any engine with a
    * standard md5 — the reproducible train/val split.
    */
  def md5Sample(df: DataFrame, key: Column, sixteenths: Int): DataFrame = {
    require(sixteenths >= 0 && sixteenths <= 16, "sixteenths in [0,16]")
    if (sixteenths == 16) df
    else df.filter(substring(md5(key.cast("string")), 1, 1) < lit("0123456789abcdefg".charAt(sixteenths).toString))
  }

  /** Deterministic per-stratum hash sampling: keep ~`keep`/`buckets` of
    * each stratum (e.g. per language) regardless of stratum skew. Same
    * scan-speed filter; the stratum column only feeds the hash so no
    * grouping shuffle happens.
    */
  def stratifiedHashSample(
      df: DataFrame, key: Column, stratum: Column, keep: Int, buckets: Int = 100): DataFrame =
    df.filter(pmod(xxhash64(stratum, key), lit(buckets)) < lit(keep))
}
