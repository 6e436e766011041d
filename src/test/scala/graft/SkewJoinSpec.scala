package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {

  test("salted join equals plain inner join on a skewed key distribution") {
    import spark.implicits._
    // 90% of fact rows share one key — classic hot-key skew.
    val fact = (1 to 5000).map { i =>
      (if (i % 10 == 0) i % 7 else 1, s"payload$i")
    }.toDF("k", "payload")
    val dim = (0 to 7).map(k => (k, s"dim$k")).toDF("dk", "dval")

    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "payload", "dval")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq.sorted
    val salted = SkewJoin.saltedInnerJoin(fact, dim, col("k"), col("dk"), saltFactor = 4)
      .select("k", "payload", "dval")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salt spreads a hot key across multiple partitions-worth of values") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (1, i)).toDF("k", "v")
    val salts = fact.withColumn("__salt",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts >= 6) // deterministic hash uses most of the 8 salt slots
  }
}
