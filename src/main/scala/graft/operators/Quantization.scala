package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8-range) quantization of embedding columns.
  *
  * At 100 TB the embedding column IS the dataset: 4-byte floats → 1-byte
  * codes cuts storage, scan I/O and shuffle bytes ~4×, at a recall cost
  * small enough that production ANN systems default to it. Codes are
  * per-vector min/max scaled: `code = round((x - min)/(max - min) * 255)`,
  * reconstructed as `min + code/255*(max-min)`. Everything is built-in
  * array expressions, so quantization happens at scan speed with no UDFs
  * and the quantized table is an ordinary parquet sink.
  */
object Quantization {

  /** 0..255 integer codes (int — parquet stores them dictionary/RLE
    * packed; a byte column would save nothing on disk and costs a cast).
    * Flat vectors (max == min) code to 0 and reconstruct to `qmin`.
    */
  def quantizeCodes(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val mn = array_min(v)
    val rng = array_max(v) - mn
    transform(v, x =>
      when(rng === 0.0, lit(0))
        .otherwise(round((x - mn) / rng * 255.0)).cast("int"))
  }

  /** Adds `codes`, `qmin`, `qmax` next to (or replacing) the vector. */
  def quantize(df: DataFrame, vecCol: Column, keepVector: Boolean = false): DataFrame = {
    val v = vecCol.cast("array<double>")
    val out = df
      .withColumn("codes", quantizeCodes(vecCol))
      .withColumn("qmin", array_min(v))
      .withColumn("qmax", array_max(v))
    if (keepVector) out else out.drop(vecCol)
  }

  /** Reconstructed double vector from codes + range. */
  def dequantize(codes: Column, qmin: Column, qmax: Column): Column =
    transform(codes, c => qmin + c.cast("double") / 255.0 * (qmax - qmin))
}
