package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional data skipping.
  *
  * Partition pruning ([[Bucketing.writePartitioned]]) skips files on ONE
  * key; sorting skips on one ordered key. When queries filter on several
  * columns at once (time AND tenant, lat AND lon), interleaving the bits
  * of the normalized column ranks puts rows that are close in EVERY
  * dimension into the same files, so parquet min/max footer stats prune
  * files for box predicates on any dimension subset. At 100 TB this is the
  * difference between "scan the year" and "open a handful of files" —
  * paid once at layout time (one range shuffle), enjoyed by every query.
  *
  * Everything here is built-in expressions (shift/mask/sum — codegen'd):
  * the z-value is just a derived sort key; `repartitionByRange(z)` +
  * `sortWithinPartitions(z)` is what turns it into a layout.
  */
object ZOrder {

  /** Interleave the low `bits` bits of the given non-negative long columns
    * (column j contributes bit i to output bit `i*n + j`).
    */
  def interleaveBits(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"need cols*bits <= 63, got ${cols.size} * $bits")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }

  /** Rank-normalize a numeric column to `[0, 2^bits)` given its global
    * (min, max) — the cheap one-row stats pass callers run once.
    */
  def normalize(c: Column, min: Double, max: Double, bits: Int = 16): Column = {
    val span = math.max(max - min, java.lang.Double.MIN_NORMAL)
    least(
      floor((c.cast("double") - min) / span * ((1L << bits) - 1)).cast("long"),
      lit((1L << bits) - 1L))
  }

  /** Z-value for arbitrary numeric columns: one single-row min/max
    * aggregate over `df` (the only job), then normalize + interleave.
    */
  def zValueFor(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"min_$c"),
      max(col(c)).cast("double").as(s"max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    cols.foreach { c =>
      require(!stats.isNullAt(stats.fieldIndex(s"min_$c")),
        s"zValueFor: column '$c' has no non-null values to normalize " +
          "(empty frame or all-null column)")
    }
    interleaveBits(cols.map { c =>
      normalize(col(c), stats.getAs[Double](s"min_$c"), stats.getAs[Double](s"max_$c"), bits)
    }, bits)
  }

  /** Write `df` as a z-ordered parquet layout on `cols`: range-partition by
    * z-value into `numFiles` files, sort within each, drop the helper
    * column. One range shuffle total; every file then covers a compact
    * Morton block, so its parquet min/max stats are tight in ALL `cols`.
    */
  def writeZOrdered(df: DataFrame, dir: String, cols: Seq[String],
      numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("_z", zValueFor(df, cols, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
}
