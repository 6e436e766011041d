package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

/** Events-table timestamp normalization.
  *
  * The synthetic `events` table has shipped with two physical types for
  * `ts` across testdata generations: TIMESTAMP(NANOS) (which Spark's
  * vectorized reader only accepts as long nanos, via
  * `spark.sql.legacy.parquet.nanosAsLong`) and plain TIMESTAMP(MICROS)
  * (read as timestamp / timestamp_ntz). Every consumer wants the same
  * two columns regardless: `ts` as a true micros timestamp (what DuckDB's
  * reader produces for both physical types) and `ts_ns` as long
  * nanoseconds (exact integer session/as-of arithmetic, matching
  * DuckDB's `epoch_ns(ts)`).
  */
object Events {

  /** Rewrite `ts` to (ts: timestamp, ts_ns: long) whatever the physical
    * parquet type was. For micros input, ts_ns is micros*1000 — identical
    * to DuckDB's `epoch_ns` on the same file.
    */
  def normalize(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => // nanos-as-long (TIMESTAMP(NANOS) parquet)
      df.withColumn("ts_ns", col("ts"))
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case _ => // timestamp[us]; NTZ wall-clock == instant under UTC session tz
      df.withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
  }

  /** The schema to hand `readStream` for the events table at `path` —
    * streaming reads need an explicit schema, and the right one depends
    * on the file generation. Probed with a driver-side batch footer read
    * (no data scan).
    */
  /** Strip single-alternative glob braces ("dir/{name}.parquet" →
    * "dir/name.parquet") for BATCH reads: the braces exist only so
    * `readStream` accepts a single-file source, and a batch read over the
    * brace form makes `FileStreamSink.hasMetadata` stat the literal brace
    * path — logging a full FileNotFoundException stack at WARN per read.
    * Only SINGLE-alternative braces unwrap; a real alternation glob
    * ("dir/{a,b}.parquet") is left intact — the batch reader expands it.
    */
  private[graft] def deglob(path: String): String =
    path.replaceAll("\\{([^,{}]*)\\}", "$1")

  def streamReadSchema(spark: org.apache.spark.sql.SparkSession, path: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical = spark.read.parquet(deglob(path)).schema("ts").dataType
    val tsType = if (physical == LongType) LongType else TimestampType
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", org.apache.spark.sql.types.StringType),
      StructField("value", org.apache.spark.sql.types.DoubleType),
      StructField("props", org.apache.spark.sql.types.StringType)))
  }
}
