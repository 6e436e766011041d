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

  /** Balanced downsampling: exactly `min(n, |stratum|)` rows per stratum,
    * chosen deterministically as the n smallest md5-derived hash values —
    * count-based where [[weightedMix]] is fraction-based, the shape used
    * to build evaluation sets and per-language-balanced corpora.
    *
    * Scale shape: selection is the bounded-heap aggregate (≤n rows per
    * stratum per map task cross the shuffle — never a per-stratum sort of
    * corpus-sized groups). The rank key is the first 12 md5 hex digits as
    * an exact 48-bit double (fixed-width lowercase hex compares
    * identically as a string, which is how an independent engine
    * replicates the order), tie-broken by the numeric key.
    *
    * Returns `(stratum, id, rnk)` with `rnk` 1..n by hash order.
    */
  def balancedSample(
      df: DataFrame,
      keyCol: Column,
      stratumCol: Column,
      n: Int): DataFrame = {
    val h = conv(substring(md5(keyCol.cast("string")), 1, 12), 16, 10)
      .cast("double") // 48 bits — exact in a double
    Ranking.topKPerGroup(df, stratumCol, keyCol.cast("long"), -h, n)
      .select(col("group").as("stratum"), col("id"), col("rnk"))
  }

  /** Source-weighted corpus mixing: keep a per-source FRACTION of rows
    * (`{web → 0.5, code → 1.0, forums → 0.25}`) — how training mixes are
    * rebalanced without materializing intermediate corpora. Membership
    * compares the first 3 md5 hex digits of the key (uniform over 4096
    * buckets, byte-identical in any engine with a standard md5) against a
    * per-source threshold selected by a `when`-chain over the tiny weight
    * map — a codegen'd scan filter: no shuffle, no join, reproducible
    * across engines/reruns/repartitioning. Sources absent from `weights`
    * are dropped. Weight granularity is 1/4096.
    */
  def weightedMix(
      df: DataFrame,
      key: Column,
      srcCol: Column,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      "weights must be fractions in [0, 1]")
    // threshold as a 3-hex-digit string; "g" sorts above every hex digit,
    // so weight 1.0 keeps everything
    val thr = weights.foldLeft(lit("000")) { case (acc, (s, w)) =>
      when(srcCol === s,
        if (w >= 1.0) lit("g") else lit(f"${math.floor(w * 4096).toInt}%03x"))
        .otherwise(acc)
    }
    df.filter(substring(md5(key.cast("string")), 1, 3) < thr)
  }
}
