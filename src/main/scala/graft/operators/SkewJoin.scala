package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one key dominates so heavily that even
  * split partitions bottleneck, or when the join is re-executed many times
  * and a deterministic layout is worth the cost. The fact side gets a
  * deterministic per-row salt in [0, saltFactor); the dimension side is
  * replicated `saltFactor`× with every salt value, and the join key becomes
  * (key, salt) — spreading each hot key over `saltFactor` reducers.
  *
  * Replication cost is `saltFactor × |right|`, so keep the small side
  * right. Result equals the plain inner join row-for-row.
  */
object SkewJoin {

  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    // Deterministic salt: hash of the full left row spreads rows of the
    // same key uniformly without rand()'s re-execution hazards (a retried
    // task must salt identically or rows are lost/duplicated).
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)).cast("int"))
    val saltedRight = right.crossJoin(
      right.sparkSession.range(saltFactor).select(col("id").cast("int").as("__salt")))
    saltedLeft
      .join(saltedRight, leftKey === rightKey && saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }
}
