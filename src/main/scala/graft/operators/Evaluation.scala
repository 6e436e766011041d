package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the harness that keeps an ANN
  * deployment honest. Every approximate path in this engine (IVF
  * single/multi-probe, trained IVF, IVF-PQ, MRL truncation, LSH) trades
  * recall for scan fraction; the ONLY defensible way to pick nprobe /
  * nlist / band counts is to measure recall against the exact result on
  * a query sample, continuously. This is that measurement as a first-
  * class operator rather than a notebook afterthought.
  *
  * Scale shape: inputs are RESULT tables (query-batch × k rows —
  * metadata-scale, not corpus-scale), so the hit join and per-query
  * aggregate are trivially partial-aggregated; nothing here ever touches
  * the corpus. The expensive side — producing the exact reference on a
  * SAMPLE of queries — is the caller's explicit choice of sample size,
  * which is the knob that makes continuous recall monitoring affordable
  * at 100 TB (exact top-k over a 1e4-query sample, not the full load).
  */
object Evaluation {

  /** Per-query recall of `candidate` against the exact `reference`:
    * `(qid, n_ref, n_hit, recall)` where `recall = |cand ∩ ref| / |ref|`
    * per query. Both inputs are `(qid, nid, ...)` top-k tables; extra
    * columns are ignored. Reference rows drive the denominator, so a
    * candidate that returns fewer than k rows (a sparse IVF cell) is
    * penalized, not excused. */
  def recallAtK(reference: DataFrame, candidate: DataFrame): DataFrame = {
    // A duplicate-emitting result table is precisely the bug class this
    // harness exists to surface — dedup both sides so a malformed ANN
    // path distorts recall visibly (missing hits) rather than
    // arithmetically (a doubled (qid, nid) row would multiply the join
    // and inflate n_ref AND n_hit).
    val ref = reference.select(col("qid"), col("nid")).dropDuplicates("qid", "nid")
    // batch×k rows by construction — always broadcast-sized, so the hit
    // join never sorts or shuffles the (already tiny) result tables
    val cand = broadcast(candidate.select(col("qid"), col("nid"))
      .dropDuplicates("qid", "nid")
      .withColumn("__ev_hit", lit(1L)))
    ref.join(cand, Seq("qid", "nid"), "left")
      .groupBy("qid")
      .agg(
        count(lit(1)).as("n_ref"),
        sum(coalesce(col("__ev_hit"), lit(0L))).as("n_hit"))
      .select(col("qid"), col("n_ref"), col("n_hit"),
        (round(col("n_hit").cast("double") /
          col("n_ref").cast("double"), 4) + lit(0.0)).as("recall"))
  }
}
