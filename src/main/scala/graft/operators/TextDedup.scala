package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions

/** Sketch-based near-duplicate detection over text columns:
  * MinHash+LSH (shingle → signature → band → bucket-join → exact verify)
  * and SimHash (token hashes → 64-bit majority print → chunk-blocked
  * Hamming join).
  *
  * Scale shape (the part that must survive 100 TB): documents are reduced
  * to fixed-size sketches at scan time (codegen'd expressions over
  * `xxhash64`-ed shingles); the only shuffles are (a) the band-bucket
  * equi-join on (band_idx, band_hash) — tens of bytes per row — and (b)
  * id-keyed joins to re-attach shingle sets for the exact-Jaccard verify of
  * the (small) candidate set. Nothing quadratic ever materializes; the
  * candidate volume is controlled by the band/row parameters.
  */
object TextDedup {

  /** Distinct word n-gram shingles of a lowercased text column.
    * `zip_with`-composed for n=2; sliding windows via guarded
    * transform/sequence otherwise.
    */
  def wordShingles(text: Column, n: Int = 2): Column = {
    val words = split(lower(text), " ")
    val grams =
      if (n == 1) words
      else if (n == 2)
        zip_with(
          slice(words, lit(1), greatest(size(words) - 1, lit(0))),
          slice(words, lit(2), greatest(size(words) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))
      else {
        // chained zip_with over shifted slices: `words` appears only as a
        // HOF *argument* (evaluated once per row). Putting it inside a
        // transform lambda (slice(words, i+1, n) per index) would re-run
        // the tokenizer per element — quadratic in document length.
        val m = greatest(size(words) - (n - 1), lit(0))
        (2 to n).foldLeft(slice(words, lit(1), m)) { (acc, k) =>
          zip_with(acc, slice(words, lit(k), m),
            (a, b) => concat_ws(" ", a, b))
        }
      }
    array_distinct(grams)
  }

  /** Shingle set → `array<long>` of xxhash64 shingle hashes. */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => xxhash64(s))

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * @param numHashes signature length (bands × rowsPerBand)
    * @param bands     LSH bands; collision prob at Jaccard J is
    *                  1-(1-J^rows)^bands — defaults tuned so J≥0.8 pairs
    *                  are caught with probability ~1-1e-12
    * @param threshold final exact-Jaccard cutoff on verified candidates
    * @return (id_a, id_b, jac) — all pairs with shingle-Jaccard ≥ threshold
    *         among LSH candidates
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      threshold: Double = 0.5,
      shingleSize: Int = 2,
      numHashes: Int = 63,
      bands: Int = 21,
      seed: Long = 42L,
      reliable: Boolean = false): DataFrame = {
    // Single-pass native shingle hashing (see WordNgramHashes): the doc body
    // never becomes a shingle-string array, and Jaccard runs on long sets.
    val shingled = df.select(idCol.as("doc_id"),
      SketchFunctions.wordNgramHashes(lower(textCol), shingleSize, distinct = true).as("sh"))
    lshVerifiedPairs(shingled, threshold, numHashes, bands, seed, reliable)
  }

  /** The LSH band/bucket/verify core over a pre-shingled `(doc_id, sh)`
    * frame — shared by the pair and group operators.
    */
  private[graft] def lshVerifiedPairs(
      shingled0: DataFrame,
      threshold: Double,
      numHashes: Int,
      bands: Int,
      seed: Long,
      reliable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    // Shingle-less docs can never pair (the oracle's candidates require a
    // shared shingle; Jaccard over two empty sets is 0/0) — and all of
    // them share the one empty-set signature, so without this filter they
    // form the corpus's worst stop-bucket AND trip ANSI divide-by-zero in
    // the verify.
    val shingled = shingled0.filter(size(col("sh")) > 0).withColumn("sig",
      SketchFunctions.minhashSignature(col("sh"), numHashes, seed))

    // Each banded row carries its doc's LEADING band hashes (bands 0 and
    // 1) alongside its own: bucketPairsLeadSuppressed then skips emitting
    // a pair from band j when the pair provably collides at one of those
    // leading bands (where it IS emitted), so a near-identical pair —
    // which collides in ~all `bands` bands — materializes once instead of
    // `bands`× before the distinct. At the round-13 100× tier the
    // emit-everywhere shape generated ~6×10⁹ pre-distinct rows at ~21×
    // multiplicity; leading-band suppression cuts exactly that class
    // (guide §2.3 shuffle fewer bytes) for 16 extra bytes per banded row.
    // The leading hashes are recomputed per band inside the one generator
    // expression (two 3-long xxhash64 slices) — cheaper than carrying the
    // doc's full band-hash array through the explode, which re-copies an
    // O(bands) array per banded row.
    val h1Off = (if (bands > 1) r else 0) + 1
    val banded = shingled.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        j => struct(
          xxhash64(slice(col("sig"), j * r + 1, lit(r))).as("bh"),
          xxhash64(slice(col("sig"), lit(1), lit(r))).as("h0"),
          xxhash64(slice(col("sig"), lit(h1Off), lit(r))).as("h1")))))
      .select(col("doc_id"), col("pos").as("band_idx"),
        col("col.bh").as("band_hash"),
        col("col.h0").as("h0"), col("col.h1").as("h1"))

    // One scan + one shuffle: group each LSH bucket and emit its pairs,
    // instead of a self-join that would recompute the whole upstream for
    // both sides. Buckets are small by construction (band collisions need
    // J^rows agreement); `maxBucketSize` guards the degenerate case so one
    // stop-bucket can't go quadratic.
    val cand = bucketPairsLeadSuppressed(banded, col("band_idx"),
      col("band_hash"), col("doc_id"), col("h0"), col("h1"))

    val sets = shingled.select(col("doc_id"), col("sh"))
    // Verify-join strategy from MEASURED pair cardinality (see
    // [[MeasuredJoin.attachPairPayloads]]): the candidate-pair stream is
    // quadratic in duplicate multiplicity while the planner's estimate of
    // it — a groupBy + array-explode chain — shrinks with the aggregate,
    // so at scale a planning-time broadcast election of it aborted on
    // spark.driver.maxResultSize (the round-12 100×-tier finding). The
    // helper materializes + counts the pairs: small measured runs get the
    // broadcast plan over the SEMI-FILTERED shingle sets (one shingle
    // pass instead of two, zero payload shuffles); big runs get exactly
    // the MERGE-pinned chain that survived the 100× tier.
    MeasuredJoin.attachPairPayloads(cand, "id_a", "id_b",
        sets, sets, "sh", "sh_a", "sh_b", reliable = reliable)
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** Group-first near-duplicate clustering: every document straight to its
    * `(id, component, is_canonical)` cluster assignment WITHOUT ever
    * materializing the duplicate-pair explosion. Semantically identical to
    * `ConnectedComponents.clusterPairs(minhashNearDupPairs(...))` — same
    * components, same canonical (minimum) ids — but where the pair path
    * emits k·(k−1)/2 rows for a cluster of k verbatim copies, this one's
    * output and intermediate volume stay LINEAR in k. On a crawl corpus
    * (duplicate multiplicity in the thousands for viral pages) that is the
    * difference between a dedup pass and a blow-up; it is the contract an
    * index-ingest pipeline (reference: `dataset.py:197-236` iterates docs
    * into an index upsert, presuming deduped input) actually consumes.
    *
    * How the explosion is avoided (three linear stages):
    *   1. EXACT-SET COLLAPSE — documents with identical shingle sets are
    *      near-dups at Jaccard 1.0 by definition, so each distinct set
    *      elects the minimum doc id as representative in one
    *      partial-aggregated `groupBy(xxhash64(sh))` (a verbatim-duplicate
    *      class collapses map-side; the star doc→rep edges are implicit in
    *      the rep mapping, never materialized as pairs). The 2⁻⁶⁴ set-hash
    *      collision odds are the same accepted-risk class as the LSH miss
    *      probability documented on the pair oracle.
    *   2. LSH + EXACT-JACCARD VERIFY OVER REPRESENTATIVES ONLY — the
    *      banded bucket join ([[lshVerifiedPairs]], bucket-size guard
    *      included) runs on one row per DISTINCT shingle set, so bucket
    *      pair counts are quadratic only in distinct near-dup variants,
    *      not duplicate multiplicity. Jaccard depends only on the sets,
    *      so a rep-level edge stands for every member-level edge exactly.
    *   3. CC OVER PAIRED REPS ONLY — min-label propagation
    *      ([[graft.operators.ConnectedComponents]]) runs on the pair
    *      endpoint set (not the corpus): singleton reps and their exact-dup
    *      members re-attach with one left join + coalesce at the end.
    *
    * Docs with NO shingles (shorter than one n-gram window) are singletons
    * by definition (two empty sets have undefined Jaccard — the pair path
    * drops them the same way), so they bypass all three stages.
    *
    * Returns one row per input document: `(id, component, is_canonical)`
    * with `component` the minimum doc id of the near-dup group.
    */
  def minhashNearDupGroups(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      threshold: Double = 0.5,
      shingleSize: Int = 2,
      numHashes: Int = 63,
      bands: Int = 21,
      seed: Long = 42L,
      pointerHalving: Boolean = false,
      reliable: Boolean = false): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold in (0,1] so exact duplicates (J=1) always group, got $threshold")
    val shingled = df.select(idCol.as("doc_id"),
        SketchFunctions.wordNgramHashes(lower(textCol), shingleSize, distinct = true).as("sh"))
      .withColumn("k", xxhash64(col("sh")))
    // 1. exact-set collapse: min doc id per distinct non-empty shingle set.
    //    groupBy partial-aggregates, so a million-copy class shrinks
    //    map-side; the join-back rides AQE's skew split for hot keys.
    val reps = shingled.filter(size(col("sh")) > 0)
      .groupBy("k").agg(min(col("doc_id")).as("rep"))
    val docRep = shingled.join(reps, Seq("k"), "left")
      .select(col("doc_id"),
        coalesce(col("rep"), col("doc_id")).as("rep"), col("sh"))
    // 2. LSH + verify over one row per distinct set
    val repRows = docRep
      .filter(col("doc_id") === col("rep") && size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"))
    val pairs = lshVerifiedPairs(repRows, threshold, numHashes, bands, seed,
      reliable)
    // 3. propagate min labels over the paired reps only (vertices derive
    // from the loop's own checkpointed edge snapshot — deriving them from
    // the live pair plan would run the LSH pipeline twice)
    val repComp = ConnectedComponents.runEdgeVertices(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
      pointerHalving = pointerHalving, reliable = reliable)
    // attach: doc → rep → component; unpaired reps keep themselves (the
    // rep IS the exact-dup class minimum, so coalesce(component, rep) is
    // the group minimum in every case). repComp is a materialized CC
    // snapshot whose LogicalRDD stats are estimates — measure it exactly
    // and let the measurement pick broadcast vs merge ([[MeasuredJoin]]).
    docRep.select(col("doc_id"), col("rep"))
      .join(MeasuredJoin.measuredSide(repComp),
        col("rep") === col("id"), "left")
      .select(col("doc_id").as("id"),
        coalesce(col("component"), col("rep")).as("component"))
      .withColumn("is_canonical", col("id") === col("component"))
  }

  /** Cross-corpus incremental near-dup: flag each INCOMING document that
    * is a near-duplicate (word-shingle Jaccard ≥ `threshold`) of ANY
    * document in an EXISTING corpus — the admission decision an
    * incremental ingest pipeline makes per crawl batch (dedup the new
    * slice against everything already ingested WITHOUT re-clustering the
    * whole corpus). Distinct from decontamination ([[flagContaminated]]):
    * that measures raw shingle-overlap counts against a small benchmark
    * set; this is threshold-Jaccard near-dup against a corpus-sized
    * reference.
    *
    * Returns one row per incoming document:
    * `(id, matched_id, is_new)` with `matched_id` the MINIMUM existing
    * doc id among matches (deterministic), null when nothing matched.
    *
    * Scale shape: both sides reduce to minhash band hashes at scan time
    * and meet in ONE bucket aggregate on `(band_idx, band_hash)` — never
    * an incoming×existing join. Buckets emit only CROSS pairs (incoming ×
    * existing; same-side pairs are not this operator's job), capped and
    * observe-metered like [[bucketPairs]]. Exact-Jaccard verify touches
    * only candidates; the per-incoming-id `min(ex_id)` partial-aggregates
    * map-side, so a viral page matching thousands of existing docs
    * shrinks before the shuffle.
    */
  def crossCorpusNearDup(
      incoming: DataFrame,
      existing: DataFrame,
      idCol: Column,
      textCol: Column,
      threshold: Double = 0.5,
      shingleSize: Int = 2,
      numHashes: Int = 63,
      bands: Int = 21,
      seed: Long = 42L,
      reliable: Boolean = false): DataFrame = {
    val in = shingleSets(incoming, idCol, textCol, shingleSize)
    val ex = shingleSets(existing, idCol, textCol, shingleSize)
    crossAdmitCore(incoming.select(idCol.as("id")),
      in, bandHashes(in, numHashes, bands, seed),
      bandHashes(ex, numHashes, bands, seed), ex, threshold, reliable)
  }

  /** Non-empty word-shingle hash sets: `(doc_id, sh)`. Shared by the
    * in-memory cross-corpus operator and the persisted [[DedupIndex]]
    * (whose on-disk `sets/` table is exactly this frame).
    */
  private[graft] def shingleSets(
      df: DataFrame, idCol: Column, textCol: Column, shingleSize: Int): DataFrame =
    df.select(idCol.as("doc_id"),
        SketchFunctions.wordNgramHashes(lower(textCol), shingleSize, distinct = true).as("sh"))
      .filter(size(col("sh")) > 0)

  /** LSH band hashes of a pre-shingled `(doc_id, sh)` frame:
    * `(doc_id, band_idx, band_hash)` — the [[DedupIndex]] `bands/` table.
    */
  private[graft] def bandHashes(
      shingled: DataFrame, numHashes: Int, bands: Int, seed: Long): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    shingled
      .withColumn("sig", SketchFunctions.minhashSignature(col("sh"), numHashes, seed))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          j => xxhash64(slice(col("sig"), j * r + 1, lit(r))))))
      .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_hash"))
  }

  /** The cross-corpus admission core over pre-shingled/banded sides —
    * shared by [[crossCorpusNearDup]] (both sides computed in-flight) and
    * [[DiskDedupIndex.admit]] (existing side read back precomputed).
    */
  private[graft] def crossAdmitCore(
      incomingIds: DataFrame,
      inSets: DataFrame,
      inBands: DataFrame,
      exBands: DataFrame,
      exSets: DataFrame,
      threshold: Double,
      reliable: Boolean = false): DataFrame = {
    val cand = bucketCrossPairs(
      inBands.withColumn("side", lit("in"))
        .unionByName(exBands.withColumn("side", lit("ex"))),
      col("band_idx"), col("band_hash"), col("doc_id"), col("side"))
    // Measured verify-join strategy (see [[MeasuredJoin]]): the cross-pair
    // stream has the same estimate-shrunk-but-unbounded shape as the
    // self-join families — round 12 pinned those three and left this one
    // on planner estimates, so it also closes the latent broadcast-abort
    // risk here (per-role semi-filters: incoming and existing sets each
    // reduce to their own candidate ids).
    val matches = MeasuredJoin.attachPairPayloads(cand, "in_id", "ex_id",
        inSets, exSets, "sh", "sh_a", "sh_b", reliable = reliable)
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jac") >= threshold)
      .groupBy("in_id").agg(min(col("ex_id")).as("matched_id"))
    incomingIds
      .join(matches, col("id") === col("in_id"), "left")
      .select(col("id"), col("matched_id"),
        col("matched_id").isNull.as("is_new"))
  }

  /** [[bucketPairs]]'s cross-side twin: distinct (in_id, ex_id) pairs
    * co-occurring in a bucket, with same-side pairs never generated. Same
    * one-shuffle group shape, same non-silent cap guard (a bucket whose
    * total membership exceeds `maxBucketSize` is dropped and counted).
    */
  private[graft] def bucketCrossPairs(
      df: DataFrame,
      key1: Column,
      key2: Column,
      idCol: Column,
      sideCol: Column,
      maxBucketSize: Int = 10000): DataFrame = {
    val buckets = df.groupBy(key1, key2)
      .agg(
        array_sort(collect_set(when(sideCol === "in", idCol))).as("in_ids"),
        array_sort(collect_set(when(sideCol === "ex", idCol))).as("ex_ids"))
      .observe(s"bucket_cross_pairs_guard_${guardSeq.incrementAndGet()}",
        coalesce(sum(when(size(col("in_ids")) + size(col("ex_ids")) > maxBucketSize,
          1L).otherwise(0L)), lit(0L)).as("dropped_buckets"),
        coalesce(max(size(col("in_ids")) + size(col("ex_ids"))), lit(0)).as("max_bucket_size"),
        lit(maxBucketSize).as("max_allowed"))
      .filter(size(col("in_ids")) >= 1 && size(col("ex_ids")) >= 1 &&
        size(col("in_ids")) + size(col("ex_ids")) <= maxBucketSize)
    buckets
      .select(explode(flatten(transform(col("in_ids"), x =>
        transform(col("ex_ids"), y =>
          struct(x.as("in_id"), y.as("ex_id")))))).as("p"))
      .select(col("p.in_id"), col("p.ex_id"))
      .distinct()
  }

  /** SimHash of the token stream of a text column (multiset weighting). */
  def simhash(text: Column): Column =
    SketchFunctions.simhash64(
      SketchFunctions.wordNgramHashes(lower(text), 1, distinct = false))

  /** SimHash near-duplicate pairs within Hamming distance `maxHamming`.
    *
    * Blocking: the 64-bit print is cut into `maxHamming + 1` chunks; by
    * pigeonhole, any pair within the distance bound shares at least one
    * unchanged chunk, so the chunk-equality join is an *exact* candidate
    * generator (no recall loss), and candidates are verified with
    * `bit_count(xor)`.
    */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      maxHamming: Int = 3,
      reliable: Boolean = false): DataFrame =
    hammingPairs(df.select(idCol.as("doc_id"), simhash(textCol).as("sim")),
      maxHamming, reliable)

  /** Group-first SimHash clustering: `(id, component, is_canonical)`
    * directly, without materializing the Hamming pair explosion — the
    * SimHash twin of [[minhashNearDupGroups]], closing the other
    * superlinear pair family (a verbatim k-copy class emits k·(k−1)/2
    * Hamming-0 pairs in the pair path; here it costs one map-side
    * partial-aggregated groupBy row). Semantically identical to
    * `ConnectedComponents.clusterPairs(simhashNearDupPairs(...))`.
    *
    * The collapse key is even cleaner than MinHash's shingle-set hash:
    * the 64-bit print ITSELF. Identical prints are Hamming-0 near-dups
    * by definition (no hash-collision caveat at all — the print is the
    * similarity object, not a proxy for it), so:
    *   1. one `groupBy(sim)` elects the min doc id per distinct print;
    *   2. the pigeonhole-blocked [[hammingPairs]] join runs over one row
    *      per DISTINCT print (pair counts quadratic in distinct variants,
    *      not duplicate multiplicity);
    *   3. min-label propagation runs over the pair endpoints only, and
    *      members re-attach with one join + coalesce (the rep is its
    *      print-class minimum, so `coalesce(component, rep)` is the group
    *      minimum in every case).
    */
  def simhashNearDupGroups(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      maxHamming: Int = 3,
      pointerHalving: Boolean = false,
      reliable: Boolean = false): DataFrame = {
    val printed = df.select(idCol.as("doc_id"), simhash(textCol).as("sim"))
    val reps = printed.groupBy("sim").agg(min(col("doc_id")).as("rep"))
    val docRep = printed.join(reps, Seq("sim")).select(col("doc_id"), col("rep"))
    val pairs = hammingPairs(
      reps.select(col("rep").as("doc_id"), col("sim")), maxHamming, reliable)
    val repComp = ConnectedComponents.runEdgeVertices(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
      pointerHalving = pointerHalving, reliable = reliable)
    // measured attach strategy — same rationale as minhashNearDupGroups
    docRep.join(MeasuredJoin.measuredSide(repComp),
        col("rep") === col("id"), "left")
      .select(col("doc_id").as("id"),
        coalesce(col("component"), col("rep")).as("component"))
      .withColumn("is_canonical", col("id") === col("component"))
  }

  /** Pigeonhole-blocked Hamming pairs over ANY precomputed 64-bit sketch
    * (`(doc_id, sim)` input) — the shared engine under text simhash and
    * image perceptual-hash near-dup. Chunk-equality candidates are exact
    * (no recall loss), verified by `bit_count(xor)`.
    */
  def hammingPairs(
      printed: DataFrame,
      maxHamming: Int = 3,
      reliable: Boolean = false): DataFrame = {
    val nChunks = maxHamming + 1
    val bitsPer = 64 / nChunks
    val mask = (1L << bitsPer) - 1
    // each chunk row carries the print's LEADING chunk values (indices 0
    // and 1): identical prints collide in ALL nChunks buckets, so
    // leading-bucket suppression (see bucketPairsLeadSuppressed) cuts the
    // duplicate-class emission from nChunks× to 1× before the distinct
    def chunkVal(i: Column): Column =
      call_function("shiftrightunsigned", col("sim"), i * bitsPer)
        .bitwiseAND(lit(mask))
    val c1Idx = math.min(1, nChunks - 1)
    val chunked = printed.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(nChunks - 1)),
        i => struct(chunkVal(i).as("cv"),
          chunkVal(lit(0)).as("h0"), chunkVal(lit(c1Idx)).as("h1")))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        col("col.cv").as("chunk_val"),
        col("col.h0").as("h0"), col("col.h1").as("h1"))

    val sims = printed.select(col("doc_id"), col("sim"))
    // Verify-join strategy from MEASURED pair cardinality — same
    // discipline as lshVerifiedPairs (the pair stream is
    // multiplicity-quadratic but estimate-shrunk, so a planning-time
    // broadcast election of it is the 100×-tier abort class; see
    // [[MeasuredJoin.attachPairPayloads]]). For phash inputs the payload
    // table is a full image-decode pass, so the small-regime semi-filter
    // (one payload pass instead of two) is most of the win.
    MeasuredJoin.attachPairPayloads(
        bucketPairsLeadSuppressed(chunked, col("chunk_idx"), col("chunk_val"),
          col("doc_id"), col("h0"), col("h1")),
        "id_a", "id_b", sims, sims, "sim", "sim_a", "sim_b",
        reliable = reliable)
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  private val guardSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Distinct unordered id pairs co-occurring in a (key1, key2) bucket:
    * group → sorted id list → explode i<j combinations. One shuffle on the
    * bucket key; bucket size capped so a degenerate bucket (a "stop
    * shingle" every document shares) cannot go quadratic — at 100 TB that
    * cap is the difference between a bounded job and a runaway one.
    *
    * Dropping an oversized bucket is a recall trade, so it is observed, not
    * silent: an `observe` aggregation rides the bucket agg (no extra job)
    * counting dropped buckets and the largest seen, and
    * [[graft.tools.GuardMetricsListener]] logs a WARN whenever a run
    * dropped anything. The observation name carries a sequence number so a
    * plan composing several bucketPairs calls (e.g. the curation pipeline)
    * keeps each observation distinct.
    */
  private[graft] def bucketPairs(
      df: DataFrame,
      key1: Column,
      key2: Column,
      idCol: Column,
      maxBucketSize: Int = 10000): DataFrame = {
    val buckets = df.groupBy(key1, key2)
      .agg(array_sort(collect_set(idCol)).as("ids"))
      .observe(s"bucket_pairs_guard_${guardSeq.incrementAndGet()}",
        coalesce(sum(when(size(col("ids")) > maxBucketSize, 1L).otherwise(0L)), lit(0L))
          .as("dropped_buckets"),
        coalesce(max(size(col("ids"))), lit(0)).as("max_bucket_size"),
        lit(maxBucketSize).as("max_allowed"))
      .filter(size(col("ids")).between(2, maxBucketSize))
    buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, greatest(size(col("ids")) - i - 1, lit(0))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** [[bucketPairs]] with LEADING-BUCKET suppression: a pair found in the
    * bucket at index position `j` (key1) is NOT emitted when its two ids
    * provably collide at index 0 (`h0` equal, any j ≥ 1) or at index 1
    * (`h1` equal, any j ≥ 2) — positions where the pair IS emitted — so a
    * near-duplicate pair, which collides in ~every band/chunk, emits once
    * instead of once per collision. That multiplicity is the rule for the
    * workload, not the edge case: verbatim copies share EVERY band, and
    * the emit-everywhere shape generated each duplicate-class pair
    * ~bands× before its `distinct` (~21× at the LSH defaults — ~6×10⁹
    * pre-distinct rows at the round-13 100× tier). Pairs whose first
    * collision is at index ≥ 2 may still emit more than once (their
    * collision probability per band is low by construction), so the
    * `distinct` stays — fed ~the true pair volume instead of bands× it.
    *
    * `h0Col`/`h1Col` carry each id's key value at index positions 0 and 1
    * (16 fixed bytes per row — deliberately NOT the full prefix array,
    * whose per-row copy through the explode costs more than the distinct
    * it saves at bench scale). Suppression only ever removes an emission
    * that has a surviving earlier twin, so the post-distinct pair set is
    * unchanged — with the one documented exception that a pair whose
    * index-0/1 bucket was DROPPED by the size guard loses that twin; both
    * semantics are explicit, observed recall trades under a degenerate
    * stop-bucket, and every recorded tier runs with zero dropped buckets
    * (the observation metric).
    */
  private[graft] def bucketPairsLeadSuppressed(
      df: DataFrame,
      key1: Column,
      key2: Column,
      idCol: Column,
      h0Col: Column,
      h1Col: Column,
      maxBucketSize: Int = 10000): DataFrame = {
    val buckets = df.groupBy(key1, key2)
      .agg(array_sort(collect_list(
        struct(idCol.as("id"), h0Col.as("h0"), h1Col.as("h1")))).as("ms"))
      .observe(s"bucket_pairs_guard_${guardSeq.incrementAndGet()}",
        coalesce(sum(when(size(col("ms")) > maxBucketSize, 1L).otherwise(0L)), lit(0L))
          .as("dropped_buckets"),
        coalesce(max(size(col("ms"))), lit(0)).as("max_bucket_size"),
        lit(maxBucketSize).as("max_allowed"))
      .filter(size(col("ms")).between(2, maxBucketSize))
    buckets
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        filter(
          transform(
            slice(col("ms"), i + 2, greatest(size(col("ms")) - i - 1, lit(0))),
            y => struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
              (((key1 > 0) && (x.getField("h0") === y.getField("h0"))) ||
                ((key1 > 1) && (x.getField("h1") === y.getField("h1"))))
                .as("sup"))),
          s => !s.getField("sup"))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Boilerplate detection: per document, the fraction of its distinct
    * word-n-gram shingles that are "common" — shared by at least
    * `minDocFreq` documents corpus-wide. High fractions mark templated /
    * navigation / license text that survives pairwise dedup because no
    * single pair is similar enough (the C4-style cleaning signal).
    *
    * Scale shape: documents reduce to shingle hashes at scan time; the
    * document-frequency pass is one partial-aggregated count over
    * (hash, doc) rows — tens of bytes per shingle, bodies never move. The
    * flag then comes back by BROADCASTING the `df >= minDocFreq` common
    * set rather than shuffle-joining the exploded stream on the hash: a
    * stop-shingle key ("all rights reserved") is hot on both sides of that
    * join, and while AQE's skew split papers over it, the broadcast
    * removes the skew surface entirely. The common set is the heavy-hitter
    * vocabulary (distinct shingles in ≥minDocFreq docs), which is
    * vocabulary-bounded, not corpus-bounded — and `minDocFreq` rises with
    * corpus size, shrinking it further.
    *
    * Returns `(doc_id, n_shingles, common_frac)` for every document with
    * at least one shingle.
    */
  def commonShingleFraction(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleSize: Int = 2,
      minDocFreq: Int = 20): DataFrame = {
    val ex = df.select(idCol.as("doc_id"),
        explode(SketchFunctions.wordNgramHashes(
          lower(textCol), shingleSize, distinct = true)).as("g"))
    val common = ex.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocFreq)
      .select(col("g"), lit(true).as("is_common"))
    ex.join(broadcast(common), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("is_common"), 1L).otherwise(0L)).as("n_common"))
      .select(col("doc_id"), col("n_shingles"),
        round(col("n_common").cast("double") / col("n_shingles"), 4).as("common_frac"))
  }

  /** Benchmark decontamination: flag training documents sharing at least
    * `minOverlap` distinct n-gram shingles with a (small) benchmark set —
    * the standard test-set-leakage gate before a corpus enters training.
    *
    * Scale shape: the benchmark's distinct shingle hashes are broadcast
    * (benchmarks are thousands of documents; the corpus is the 100 TB
    * side), the corpus is scanned ONCE with a broadcast hash join on the
    * shingle stream, and overlap counts partial-aggregate per document.
    * Every training document comes back (overlap 0 included) so the gate
    * can both drop and audit.
    *
    * Returns `(doc_id, overlap_shingles, contaminated)`.
    */
  def flagContaminated(
      train: DataFrame,
      bench: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleSize: Int = 2,
      minOverlap: Int = 1): DataFrame = {
    def shingled(df: DataFrame) = df.select(idCol.as("doc_id"),
      SketchFunctions.wordNgramHashes(lower(textCol), shingleSize, distinct = true).as("sh"))
    val benchShingles = shingled(bench)
      .select(explode(col("sh")).as("g")).distinct()
      .withColumn("hit", lit(1))
    // ONE pass over the training corpus: explode_outer keeps zero-shingle
    // docs alive (null g, no hit), the bench set joins by broadcast, and
    // the per-doc overlap is a partial-aggregated conditional count — no
    // second scan, no doc_id shuffle join to re-attach zero-overlap docs
    shingled(train)
      .select(col("doc_id"), explode_outer(col("sh")).as("g"))
      .join(broadcast(benchShingles), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("overlap_shingles"))
      .select(col("doc_id"), col("overlap_shingles"),
        (col("overlap_shingles") >= minOverlap).as("contaminated"))
  }

  /** [[flagContaminated]] with a Bloom-filter prefilter — the shape for
    * benchmark sets too large to broadcast as an exact hash set. A 10M-
    * shingle benchmark is ~hundreds of MB as a broadcast join table but
    * ~17 MB as a 1%-FPR Bloom filter; at 100 TB the corpus-side shingle
    * stream is pruned at scan speed by the codegen `might_contain`
    * predicate (Spark's own runtime-filter expressions, reused here as a
    * first-class operator), so the exact confirm join only ever sees the
    * ~FPR-sized survivor stream. Results are EXACT: the Bloom filter only
    * prefilters; an equi-join confirms every hit, so false
    * positives cost a lookup, never a wrong count. Sizing is clamped to
    * the session's `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/
    * `maxNumBits` (defaults 4M/64M) — a 10M-shingle benchmark at default
    * confs gets a denser-than-1%-FPR filter rather than an analysis
    * failure; raise the confs to keep the target FPR at that scale.
    *
    * Trade-off vs [[flagContaminated]]: zero-overlap documents are
    * re-attached with a second corpus-side pass over the id column
    * (column-pruned scan + broadcast join of the tiny per-doc hit counts)
    * instead of riding the single exploded pass — the right trade exactly
    * when the benchmark is too big to broadcast exactly.
    *
    * Returns `(doc_id, overlap_shingles, contaminated)`.
    */
  def flagContaminatedBloom(
      train: DataFrame,
      bench: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleSize: Int = 2,
      minOverlap: Int = 1,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    import org.apache.spark.sql.types.BinaryType
    require(fpp > 0.0 && fpp < 1.0, s"fpp in (0,1), got $fpp")

    def shingled(df: DataFrame) = df.select(idCol.as("doc_id"),
      SketchFunctions.wordNgramHashes(lower(textCol), shingleSize, distinct = true).as("sh"))
    val benchShingles = shingled(bench)
      .select(explode(col("sh")).as("g")).distinct()

    // Build the filter in ONE partial-aggregated pass (BloomFilterAggregate
    // is mergeable: per-partition filters OR together). Sizing needs the
    // distinct count; benchmarks are the small side, so a count() scan is
    // cheap — and the result is a driver artifact like a codebook.
    // BloomFilterAggregate validates its args against the session's
    // runtime-bloom-filter conf maxima (defaults: 4M items / 64M bits) and
    // FAILS ANALYSIS above them, so clamp to whatever this session allows —
    // a clamped filter is the same filter with a higher effective FPR, and
    // the confirm join downstream stays exact either way.
    val conf = train.sparkSession.conf
    val maxItems = conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems").map(_.toLong)
      .getOrElse(4000000L)
    val maxBits = conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits").map(_.toLong)
      .getOrElse(67108864L)
    val nItems = math.min(math.max(benchShingles.count(), 1L), maxItems)
    val numBits = math.min(math.max(64L,
      math.ceil(-nItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong),
      maxBits)
    val bloomBytes = benchShingles.agg(GraftSqlBridge.column(
        new BloomFilterAggregate(
          GraftSqlBridge.expression(col("g")),
          Literal(nItems), Literal(numBits)).toAggregateExpression())
        .as("bf"))
      .head().getAs[Array[Byte]](0)
    val mightContain = (g: Column) => GraftSqlBridge.column(
      new BloomFilterMightContain(
        Literal(bloomBytes, BinaryType), GraftSqlBridge.expression(g)))

    // Pass 1: exploded shingle stream pruned by the Bloom predicate BEFORE
    // the (still-exact) confirm join; per-doc hit counts partial-aggregate.
    // The confirm join is a plain shuffle equi-join ON PURPOSE: this
    // operator exists precisely because the bench set is too big to
    // broadcast exactly, and its survivor-side input is already
    // FPR-sized — forcing a broadcast here would re-create the problem
    // the bloom solved. (AQE still upgrades to broadcast when the set
    // turns out small.)
    val hits = shingled(train)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .filter(mightContain(col("g")))
      .join(benchShingles.withColumn("hit", lit(1)), Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("overlap_shingles"))
    // Pass 2: re-attach zero-overlap docs — a column-pruned id scan
    // joined with the contaminated-docs-only count table (tiny in the
    // realistic regime; AQE broadcasts it when it is).
    train.select(idCol.as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("overlap_shingles"), lit(0L)).as("overlap_shingles"))
      .select(col("doc_id"), col("overlap_shingles"),
        (col("overlap_shingles") >= minOverlap).as("contaminated"))
  }

  /** Tokens of `textCol` split on single spaces, empties dropped — the
    * shared tokenization of the span-dedup pair below (positions must
    * align between key hashing and text reconstruction).
    */
  private def spanTokens(textCol: Column): Column =
    filter(split(textCol, " "), t => length(t) > 0)

  /** Key hash of the `w`-token window starting at 0-based token `s`:
    * xxhash64 of the lowercased space-joined window (lower distributes
    * over the space join, so hashing the joined-then-lowered string equals
    * hashing lowered tokens).
    */
  private def spanKey(ts: Column, s: Column, w: Int): Column =
    xxhash64(lower(concat_ws(" ", slice(ts, s + 1, lit(w)))))

  /** Exploded span instances `(doc_id, s, g)`: one row per fixed-stride
    * token window — starts 0, stride, 2·stride… while `s + w ≤ n_tokens`.
    * Documents shorter than one window contribute no spans.
    */
  private def spanInstances(
      df: DataFrame, idCol: Column, textCol: Column, w: Int, stride: Int): DataFrame =
    df.select(idCol.as("doc_id"), spanTokens(textCol).as("ts"))
      .filter(size(col("ts")) >= w)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("ts")) - w, lit(stride))).as("s"),
        col("ts"))
      .select(col("doc_id"), col("s"), spanKey(col("ts"), col("s"), w).as("g"))

  /** Span-level exact substring duplication stats — the Lee et al.
    * "Deduplicating Training Data" signal: duplicated PASSAGES inside
    * otherwise-distinct documents, which document-level exact dedup and
    * pairwise near-dup both miss. Each document is cut into fixed-stride
    * `windowTokens`-token windows; a window is duplicated when its token
    * sequence occurs ≥2 times corpus-wide (including twice in the same
    * document).
    *
    * Scale shape — NO join back onto the exploded span stream (a viral
    * boilerplate span is a skew key there). Spans partial-aggregate to
    * (doc, key) multiplicities; a key-level aggregate then finds the
    * UNIQUE keys (df = 1), each of which names its one owning document, so
    * per-doc duplicate counts come from `n_spans − n_unique` via a
    * doc-cardinality join. The hottest key in the corpus collapses
    * map-side, and no shuffle ever carries span instances to a join. The
    * two consumers of the (doc, key) aggregate are separate plan branches
    * (shared via exchange reuse when the planner applies it; recomputed
    * scans otherwise — either way the skew-join surface never exists).
    *
    * Returns `(doc_id, n_spans, n_dup_spans, dup_frac)` for every document
    * with ≥ `windowTokens` tokens.
    */
  def spanDuplicationStats(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      windowTokens: Int = 8,
      stride: Int = 4): DataFrame = {
    require(windowTokens > 0, "windowTokens must be > 0")
    require(stride > 0, "stride must be > 0")
    val perDocKey = spanInstances(df, idCol, textCol, windowTokens, stride)
      .groupBy("doc_id", "g").agg(count(lit(1)).as("m"))
    // df=1 keys belong to exactly one (doc, position): min(doc_id) IS the doc
    val uniquePerDoc = perDocKey.groupBy("g")
      .agg(sum("m").as("df"), min("doc_id").as("only_doc"))
      .filter(col("df") === 1)
      .groupBy(col("only_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_unique"))
    val spansPerDoc = perDocKey.groupBy("doc_id").agg(sum("m").as("n_spans"))
    val dup = col("n_spans") - coalesce(col("n_unique"), lit(0L))
    spansPerDoc.join(uniquePerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"), dup.as("n_dup_spans"),
        round(dup.cast("double") / col("n_spans"), 4).as("dup_frac"))
  }

  /** Removes duplicated passages from each document: every token covered
    * by at least one duplicated window (as in [[spanDuplicationStats]]) is
    * dropped and the survivors are re-joined with single spaces (token-
    * level reconstruction — original inter-token whitespace is not
    * preserved). Documents shorter than one window pass through whole.
    *
    * Scale shape: this one genuinely needs per-POSITION flags, so the
    * duplicated-key set joins back onto the span stream — AQE's skew-join
    * split (on in [[graft.GraftSession]]) carries the hot boilerplate
    * keys. Duplicated starts then collect per document (bounded by
    * n_tokens/stride, document-bounded like chunking) and one codegen pass
    * over the token array drops covered tokens.
    *
    * Returns `(doc_id, text_clean)` for every input document.
    */
  def stripDuplicateSpans(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      windowTokens: Int = 8,
      stride: Int = 4): DataFrame = {
    require(windowTokens > 0, "windowTokens must be > 0")
    require(stride > 0, "stride must be > 0")
    val w = windowTokens
    val spans = spanInstances(df, idCol, textCol, w, stride)
    val dupKeys = spans.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select("g")
    val dupStarts = spans.join(dupKeys, "g")
      .groupBy("doc_id").agg(sort_array(collect_list(col("s"))).as("dup_starts"))
    df.select(idCol.as("doc_id"), spanTokens(textCol).as("ts"))
      .join(dupStarts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_starts").isNull, concat_ws(" ", col("ts")))
          .otherwise(concat_ws(" ",
            filter(col("ts"), (_, i) =>
              !exists(col("dup_starts"), s => s <= i && i < s + w))))
          .as("text_clean"))
  }

  /** VARIABLE-LENGTH duplicated spans: maximal runs of consecutive
    * duplicated seed windows, the scalable relaxation of Lee et al.'s
    * maximal duplicated substrings (their suffix-array formulation reports
    * exact maximal substrings; chaining stride-1 duplicated windows keys
    * the same passages without a corpus-wide suffix sort — a window-join
    * instead of a suffix array, at the cost of w−1 tokens of boundary
    * slack and the possibility that one chain's windows match different
    * partners).
    *
    * Every w-token window (stride 1) is keyed and counted corpus-wide; a
    * document's duplicated starts then chain into maximal runs [a..b]
    * (consecutive starts, gap 1), each reported as the span of tokens
    * [a, b + w). Stripping needs no new path: the union of covered tokens
    * equals stride-1 [[stripDuplicateSpans]]'s, so this operator only
    * REPORTS the maximal extents (dedup diagnostics, span-length
    * distributions, targeted review).
    *
    * Scale shape: the span stream is one row per corpus token (the
    * wordcount-explode shape) and partial-aggregates by key map-side; the
    * duplicated-key join-back rides AQE's skew split exactly like
    * [[stripDuplicateSpans]]; run chaining happens INSIDE a per-document
    * aggregate (one codegen `aggregate()` pass over the sorted starts
    * array, document-bounded like chunking) — no Window over the span
    * stream, no driver collection.
    *
    * Returns `(doc_id, span_start, span_tokens, span_text)` — one row per
    * maximal duplicated span; `span_text` is the original (case-preserved)
    * token sequence re-joined with single spaces.
    */
  def maximalDuplicateSpans(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      windowTokens: Int = 8): DataFrame = {
    require(windowTokens > 0, "windowTokens must be > 0")
    val w = windowTokens
    val spans = spanInstances(df, idCol, textCol, w, stride = 1)
    val dupKeys = spans.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select("g")
    val dupStarts = spans.join(dupKeys, "g")
      .groupBy("doc_id").agg(sort_array(collect_list(col("s"))).as("ss"))
    // gaps-and-islands over the sorted starts, inside one codegen
    // aggregate(): state = (closed runs, current run [ca, cb])
    val emptyRuns = array().cast("array<struct<a:int,b:int>>")
    def push(runs: Column, a: Column, b: Column): Column =
      concat(runs, array(struct(a.as("a"), b.as("b"))))
    val runs = aggregate(
      col("ss"),
      struct(emptyRuns.as("runs"), lit(-1).as("ca"), lit(-1).as("cb")),
      (st, s) =>
        when(st("ca") === -1,
          struct(st("runs").as("runs"), s.as("ca"), s.as("cb")))
          .when(s === st("cb") + 1,
            struct(st("runs").as("runs"), st("ca").as("ca"), s.as("cb")))
          .otherwise(
            struct(push(st("runs"), st("ca"), st("cb")).as("runs"),
              s.as("ca"), s.as("cb"))),
      st => when(st("ca") === -1, st("runs"))
        .otherwise(push(st("runs"), st("ca"), st("cb"))))
    dupStarts
      .select(col("doc_id"), explode(runs).as("r"))
      .join(df.select(idCol.as("doc_id"), spanTokens(textCol).as("ts")), "doc_id")
      .select(col("doc_id"),
        col("r.a").as("span_start"),
        (col("r.b") - col("r.a") + w).as("span_tokens"),
        concat_ws(" ",
          slice(col("ts"), col("r.a") + 1, col("r.b") - col("r.a") + w))
          .as("span_text"))
  }

  /** Exhaustive n-gram Jaccard similarity join (no sketch): candidates are
    * pairs sharing ≥1 shingle. Exact but quadratic in the worst case —
    * use [[minhashNearDupPairs]] at scale; this is the oracle-friendly
    * reference formulation.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      threshold: Double,
      shingleSize: Int = 2): DataFrame = {
    val shingled = df.select(idCol.as("doc_id"),
      SketchFunctions.wordNgramHashes(lower(textCol), shingleSize, distinct = true).as("sh"))
    val exploded = shingled.select(col("doc_id"), explode(col("sh")).as("g"))
    val cand = exploded.select(col("doc_id").as("id_a"), col("g"))
      .join(exploded.select(col("doc_id").as("id_b"), col("g")), "g")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(shingled.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingled.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** Corpus-wide EXACT line deduplication (the CCNet/Dolma paragraph-dedup
    * family): every line that appears anywhere else in the corpus keeps
    * exactly its globally-first occurrence — the copy with the minimum
    * `(doc_id, line_idx)` — and every other occurrence is removed from its
    * document. Distinct from the span operators ([[stripDuplicateSpans]]):
    * those chase duplicated token WINDOWS across line boundaries; this is
    * the cheap whole-line pass crawl pipelines run first, because nav
    * chrome and consent banners repeat VERBATIM as whole lines millions of
    * times.
    *
    * Scale shape: three hash-partitioned stages, nothing quadratic —
    *   1. line stream: `posexplode(split)` at scan speed;
    *   2. first-occurrence election: `groupBy(line)` with
    *      `min(struct(doc_id, idx))` — partial aggregation collapses a
    *      million-copy banner to one row per map task BEFORE the shuffle,
    *      so shuffle volume is bounded by distinct-line count, and the
    *      kept occurrences fall straight out of the aggregate (no join
    *      back onto the fat exploded stream);
    *   3. rebuild: `groupBy(doc_id)` re-assembles surviving lines in
    *      original order; one id-equi left join re-attaches docs whose
    *      every line lost its election (they emit empty text, n_kept=0).
    *
    * Returns one row per input document:
    * `(doc_id, n_lines_kept, n_lines_dropped, text_dedup)`.
    */
  def dedupLines(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val docs = df.select(idCol.as("doc_id"), split(textCol, "\n").as("ls"))
    val lines = docs.select(col("doc_id"),
      posexplode(col("ls")).as(Seq("idx", "line")))
    // min(struct) orders by (doc_id, idx) lexicographically = the
    // globally-first occurrence; carrying idx in the struct makes the
    // winner unique, so the output is deterministic.
    val kept = lines
      .groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("keep"))
      .select(col("keep.doc_id").as("doc_id"), col("keep.idx").as("idx"),
        col("line"))
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_lines_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("idx"), col("line")))),
          s => s.getField("line")), "\n").as("text_dedup"))
    docs.select(col("doc_id"), size(col("ls")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("n_lines") - coalesce(col("n_lines_kept"), lit(0L)))
          .as("n_lines_dropped"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }
}
