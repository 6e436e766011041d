package graft

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, MeasuredJoin, TextDedup}

/** The round-13 join-strategy optimization: verify joins and the CC loop
  * pick broadcast vs sort-merge from MEASURED cardinalities. The contract
  * under test is regime-independence — every gate setting must produce
  * identical RESULTS, only different plans.
  */
class MeasuredJoinSpec extends SparkSpec {

  private def withGates[T](rowGate: Long, byteGate: Long)(body: => T): T = {
    val rk = "spark.graft.join.broadcastRowGate"
    val bk = "spark.graft.join.broadcastByteGate"
    val prevR = spark.conf.getOption(rk)
    val prevB = spark.conf.getOption(bk)
    spark.conf.set(rk, rowGate.toString)
    spark.conf.set(bk, byteGate.toString)
    try body
    finally {
      prevR.fold(spark.conf.unset(rk))(spark.conf.set(rk, _))
      prevB.fold(spark.conf.unset(bk))(spark.conf.set(bk, _))
    }
  }

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "completely different text about spark query engines and shuffle joins"),
      (4L, "completely different text about spark query engines and broadcast joins"),
      (5L, "unrelated document mentioning parquet column pruning and predicate pushdown"),
      (6L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
  }

  private def pairsAt(rowGate: Long, byteGate: Long): Set[(Long, Long)] =
    withGates(rowGate, byteGate) {
      TextDedup.minhashNearDupPairs(docs, col("doc_id"), col("text"),
          threshold = 0.5)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }

  test("verify joins: identical pairs across broadcast / filtered-merge / full-merge regimes") {
    val broadcastRegime = pairsAt(1000000L, 64L << 20)   // small pairs, small payload
    val filteredMerge = pairsAt(1000000L, 0L)            // payload over byte gate
    val fullMerge = pairsAt(0L, 0L)                      // pairs over row gate (100×-tier path)
    assert(broadcastRegime.nonEmpty, "planted near-dups must pair")
    assert(broadcastRegime == filteredMerge)
    assert(broadcastRegime == fullMerge)
  }

  test("groups operator: identical clusters across regimes") {
    def groupsAt(rowGate: Long): Map[Long, (Long, Boolean)] =
      withGates(rowGate, if (rowGate == 0) 0L else 64L << 20) {
        TextDedup.minhashNearDupGroups(docs, col("doc_id"), col("text"),
            threshold = 0.5)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      }
    val bc = groupsAt(1000000L)
    val merge = groupsAt(0L)
    assert(bc == merge)
    assert(bc(6L) == ((1L, false)), "exact-copy doc 6 joins doc 1's cluster")
  }

  test("connected components: identical labels across regimes") {
    import spark.implicits._
    // chain 1-2-3-4 + clique 10-11-12 + singleton 20
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L)).toDF("src", "dst")
    val ids = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    def compAt(rowGate: Long): Map[Long, Long] =
      withGates(rowGate, 64L << 20) {
        ConnectedComponents.clusterPairs(
            edges.select(col("src").as("id_a"), col("dst").as("id_b")),
            ids, col("id"), pointerHalving = true)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
    val bc = compAt(1000000L)
    val merge = compAt(0L)
    assert(bc == merge)
    assert(bc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("rowBytes / materializeAndMeasure: exact accounting, None for unsupported types") {
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq.empty[Long]))
      .toDF("id", "sh").localCheckpoint(eager = false)
    val (n, bytes) = MeasuredJoin.materializeAndMeasure(df)
    assert(n == 2)
    // per row: 8 header + 8 (long id) + 24 + 8·|sh| → 64 + 40
    assert(bytes.contains(104L))
    // maps are outside the accounted type set — caller must assume big
    val m = Seq((1, Map("a" -> 1))).toDF("id", "m")
    assert(MeasuredJoin.rowBytes(m).isEmpty)
  }

  test("leading-bucket suppression: same pair set as any-band emission") {
    import spark.implicits._
    // band-hash vectors: 1 and 2 collide in ALL three bands (suppressed
    // at bands 1/2, emitted at band 0); 3 meets them only in band 2 (no
    // leading collision — emitted there); 5 and 6 collide at bands 0 and
    // 1 only (band-1 emission suppressed via h0); 4 collides nowhere
    val bhs = Map(
      1L -> Seq(10L, 20L, 30L),
      2L -> Seq(10L, 20L, 30L),
      3L -> Seq(11L, 21L, 30L),
      4L -> Seq(12L, 22L, 32L),
      5L -> Seq(13L, 23L, 33L),
      6L -> Seq(13L, 23L, 34L))
    val banded = bhs.toSeq.flatMap { case (id, hs) =>
      hs.zipWithIndex.map { case (h, i) => (id, i, h, hs.head, hs(1)) }
    }.toDF("doc_id", "band_idx", "band_hash", "h0", "h1")
    val out = TextDedup.bucketPairsLeadSuppressed(banded, col("band_idx"),
        col("band_hash"), col("doc_id"), col("h0"), col("h1"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L)))
  }

  test("reliable verify-join snapshots: identical pairs to the local-snapshot path") {
    val dir = java.nio.file.Files.createTempDirectory("mj-reliable-").toString
    spark.sparkContext.setCheckpointDir(dir)
    val rel = TextDedup.minhashNearDupPairs(docs, col("doc_id"), col("text"),
        threshold = 0.5, reliable = true)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rel == pairsAt(1000000L, 64L << 20))
  }
}
