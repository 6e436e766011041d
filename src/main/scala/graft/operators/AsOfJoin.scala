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

  // Internal column names carry the same __graft_ prefix discipline as the
  // other operators so they can never shadow a user column; the appended
  // output column is guarded explicitly below.
  private val K = "__graft_asof_k"
  private val Ts = "__graft_asof_ts"
  private val Side = "__graft_asof_side"
  private val Tb = "__graft_asof_tb"
  private val Payload = "__graft_asof_payload"
  private val Lrow = "__graft_asof_lrow"

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
      payload: Seq[String]): DataFrame =
    joined(left, right, key, leftTs, rightTs, rightId, payload, fwd = false)

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
      payload: Seq[String]): DataFrame =
    joined(left, right, key, leftTs, rightTs, rightId, payload, fwd = true)

  private def joined(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightId: String,
      payload: Seq[String],
      fwd: Boolean): DataFrame = {
    // The output APPENDS `asof` to the left columns — a left frame that
    // already carries one would yield duplicate names and silently break
    // downstream resolution (the reserved-name hazard Ranking.epochShuffle
    // guards identically).
    require(!left.columns.contains("asof"),
      "left frame already has a column named 'asof' — rename it before AsOfJoin")
    val leftCols = left.columns.toSeq
    val payloadType =
      right.select(struct(payload.map(col): _*).as("_p")).schema("_p").dataType
    val lrowType =
      left.select(struct(leftCols.map(col): _*).as("_l")).schema("_l").dataType

    val r = right.select(
      col(key).as(K),
      col(rightTs).as(Ts),
      lit(0).as(Side),
      col(rightId).cast("long").as(Tb),
      struct(payload.map(col): _*).as(Payload),
      lit(null).cast(lrowType).as(Lrow))

    val l = left.select(
      col(key).as(K),
      col(leftTs).as(Ts),
      lit(1).as(Side),
      lit(null).cast("long").as(Tb),
      lit(null).cast(payloadType).as(Payload),
      struct(leftCols.map(col): _*).as(Lrow))

    // Right rows sort before left rows at equal ts in BOTH directions
    // (at-or-before / at-or-after are inclusive). Backward runs time
    // ascending with the greatest right id last (it wins the running
    // last()); forward runs time descending with the smallest right id
    // last — the symmetric tiebreak.
    val w = Window.partitionBy(K)
      .orderBy(
        (if (fwd) col(Ts).desc else col(Ts).asc),
        col(Side).asc,
        (if (fwd) col(Tb).desc else col(Tb).asc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("asof", last(col(Payload), ignoreNulls = true).over(w))
      .filter(col(Side) === 1)
      .select(leftCols.map(c => col(Lrow).getField(c).as(c)) :+ col("asof"): _*)
  }
}
