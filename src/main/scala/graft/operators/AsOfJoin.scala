package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — an operator Spark has no built-in for.
  *
  * For every left row, find the single right row with the greatest
  * timestamp `<=` the left row's timestamp within the same key (the
  * "backward" direction of time-series as-of joins; the reference's data
  * model has no joins at all — `/root/reference/` SURVEY §2A end-note — so
  * this is a pure engine extension over the `events`-style tables).
  *
  * Formulation: tag both sides, union, and take a running
  * `last(right_payload, ignoreNulls)` over a per-key window ordered by
  * `(ts, side, tiebreak)` with right rows sorting before left rows at
  * equal timestamps (at-or-before is inclusive). This costs exactly ONE
  * shuffle of `|L| + |R|` rows on the key and one sort within each
  * partition — no range lookup per row, no per-key collect, no broadcast
  * of either side — so it scales to 100 TB the same way any keyed window
  * does. Skewed keys can be pre-salted by the caller if one key dominates.
  */
object AsOfJoin {

  /** Backward as-of join.
    *
    * @param left      probe side; all its columns survive
    * @param right     reference side
    * @param key       equi-join key column name (present on both sides)
    * @param leftTs    left event-time column (numeric or timestamp)
    * @param rightTs   right event-time column (same type as leftTs)
    * @param rightId   unique right tiebreaker — among right rows with equal
    *                  (key, ts) the one with the greatest id wins
    * @param payload   right columns to attach
    * @return left columns plus a nullable struct column `asof` holding the
    *         matched right payload (null when no right row is at-or-before)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightId: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType =
      right.select(struct(payload.map(col): _*).as("_p")).schema("_p").dataType
    val lrowType =
      left.select(struct(leftCols.map(col): _*).as("_l")).schema("_l").dataType

    val r = right.select(
      col(key).as("_k"),
      col(rightTs).as("_ts"),
      lit(0).as("_side"),
      col(rightId).cast("long").as("_tb"),
      struct(payload.map(col): _*).as("_payload"),
      lit(null).cast(lrowType).as("_lrow"))

    val l = left.select(
      col(key).as("_k"),
      col(leftTs).as("_ts"),
      lit(1).as("_side"),
      lit(null).cast("long").as("_tb"),
      lit(null).cast(payloadType).as("_payload"),
      struct(leftCols.map(col): _*).as("_lrow"))

    // Right rows sort before left rows at equal _ts (inclusive at-or-
    // before); among equal-(ts) right rows the greatest _tb is last and
    // therefore wins the running last().
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col("_lrow").getField(c).as(c)) :+ col("asof"): _*)
  }

  /** Forward as-of join: for every left row, the single right row with
    * the SMALLEST timestamp `>=` the left row's timestamp within the same
    * key — "the next event after". Same one-shuffle union-window
    * formulation as [[backward]], run down a DESCENDING time order so the
    * running `last(_, ignoreNulls)` holds the nearest at-or-after right
    * row. Tiebreak mirrors backward symmetrically: among right rows at
    * the exact left timestamp the SMALLEST `rightId` wins (the "first"
    * upcoming event).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightId: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType =
      right.select(struct(payload.map(col): _*).as("_p")).schema("_p").dataType
    val lrowType =
      left.select(struct(leftCols.map(col): _*).as("_l")).schema("_l").dataType

    val r = right.select(
      col(key).as("_k"),
      col(rightTs).as("_ts"),
      lit(0).as("_side"),
      col(rightId).cast("long").as("_tb"),
      struct(payload.map(col): _*).as("_payload"),
      lit(null).cast(lrowType).as("_lrow"))

    val l = left.select(
      col(key).as("_k"),
      col(leftTs).as("_ts"),
      lit(1).as("_side"),
      lit(null).cast("long").as("_tb"),
      lit(null).cast(payloadType).as("_payload"),
      struct(leftCols.map(col): _*).as("_lrow"))

    // Descending time: right rows still sort before left rows at equal
    // _ts (inclusive at-or-after), and _tb DESC makes the smallest right
    // id the last right row seen — the winner of the running last().
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").desc, col("_side").asc, col("_tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col("_lrow").getField(c).as(c)) :+ col("asof"): _*)
  }
}
