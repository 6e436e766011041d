package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column row/null/distinct counts and
  * min/max — the "analyze" step a data-quality gate runs before a corpus
  * enters training.
  *
  * Shape: ONE aggregation job computes every column's metrics (Spark
  * plans the multi-distinct via Expand — still a single partial-aggregated
  * shuffle), then a local explode unpivots the single result row into one
  * row per column. min/max are rendered as strings so heterogeneous
  * column types unify into one frame.
  *
  * `distinct_count` here is exact (`COUNT(DISTINCT)`) so the DuckDB
  * oracle can match it bit-for-bit; at 100 TB swap in
  * `approx_count_distinct` (HLL, mergeable, constant memory — see
  * [[Sketches]]) — the plan shape is otherwise identical.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    } :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    row
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("null_count"),
        col(s"nd_$c").as("distinct_count"),
        col(s"mn_$c").as("min_value"),
        col(s"mx_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }

  /** Fixed-width histogram of a numeric column — the length/score
    * distribution view every corpus report includes.
    *
    * Two jobs: a (min, max) aggregate (two doubles to the driver), then
    * bucket assignment as a codegen expression feeding one
    * partial-aggregated count — the value stream shuffles as (bucket,
    * partial count) rows, bytes per partition. Values at `max` clamp into
    * the last bucket; only non-empty buckets return.
    *
    * Returns `(bucket, lo, hi, cnt)` with `lo`/`hi` the bucket bounds.
    */
  def histogram(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be > 0")
    val v = col(valueCol).cast("double")
    val Array(lo, hi) = df.filter(v.isNotNull)
      .agg(min(v), max(v)).collect()(0) match {
      case r if r.isNullAt(0) =>
        throw new IllegalArgumentException(s"histogram($valueCol): no non-null values")
      case r => Array(r.getDouble(0), r.getDouble(1))
    }
    val width = (hi - lo) / nBuckets
    val bucket =
      if (width == 0.0) lit(0L) // constant column: everything in bucket 0
      else least(lit(nBuckets - 1L), floor((v - lo) / width)).cast("long")
    df.filter(v.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bucket"),
        round(lit(lo) + col("bucket") * width, 4).as("lo"),
        round(lit(lo) + (col("bucket") + 1) * width, 4).as("hi"),
        col("cnt"))
  }

  /** Token-distribution drift between two corpus slices — the monitoring
    * primitive behind "did this crawl snapshot shift away from the last
    * one?" / "does the filtered corpus still look like the source?".
    * Both sides reduce to Laplace-smoothed unigram distributions over the
    * same 4096 hashed buckets (first 3 md5 hex digits — the repo's
    * cross-engine-portable bucket, same as DSIR's), so vocabulary size
    * never matters; the comparison emits three standard divergences:
    *
    *   - `tv_distance`   — total variation `½ Σ|p_a − p_b|` (pure rational
    *     arithmetic, bit-reproducible across engines);
    *   - `hellinger`     — `sqrt(½ Σ(√p_a − √p_b)²)` (sqrt is correctly
    *     rounded under IEEE-754, so also engine-exact);
    *   - `js_divergence` — Jensen–Shannon in nats (symmetric, finite under
    *     smoothing; `ln` is the one last-ulp-soft term, rounded to 6dp).
    *
    * All 4096 buckets participate (including empty ones): under Laplace
    * smoothing an unobserved bucket still carries `1/(N+4096)` mass, and
    * the two sides' empties differ whenever their token totals do.
    *
    * Scale shape: each side is ONE corpus scan partial-aggregated over
    * ≤4096 keys (map tasks emit at most 4096 rows regardless of corpus
    * size); everything after is arithmetic over two 4096-row broadcast
    * frames. No sort, no wide shuffle, no driver collect of anything
    * corpus-proportional.
    *
    * Returns one row:
    * `(n_tokens_a, n_tokens_b, tv_distance, hellinger, js_divergence)`.
    */
  def distributionDrift(dfA: DataFrame, dfB: DataFrame, textCol: Column): DataFrame = {
    val buckets = 4096
    def bucketCounts(df: DataFrame, as: String) = df
      .select(explode(filter(split(lower(textCol), " "), t => length(t) > 0)).as("t"))
      .select(conv(substring(md5(col("t")), 1, 3), 16, 10).cast("int").as("bkt"))
      .groupBy("bkt").agg(count(lit(1)).as(as))
    val all = dfA.sparkSession.range(buckets).select(col("id").cast("int").as("bkt"))
    val joined = all
      .join(broadcast(bucketCounts(dfA, "na")), Seq("bkt"), "left")
      .join(broadcast(bucketCounts(dfB, "nb")), Seq("bkt"), "left")
      .select(col("bkt"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val totals = joined.agg(sum("na").as("ta"), sum("nb").as("tb"))
    val pa = (col("na") + 1.0) / (col("ta") + buckets)
    val pb = (col("nb") + 1.0) / (col("tb") + buckets)
    val mid = (pa + pb) / 2.0
    joined.crossJoin(broadcast(totals))
      .agg(
        max(col("ta")).as("n_tokens_a"),
        max(col("tb")).as("n_tokens_b"),
        // `+ 0.0` collapses IEEE -0.0 to 0.0 (the oracle's ROUND(...) + 0.0
        // convention): js in particular can sum to a tiny negative on
        // near-identical slices and round to -0.0 engine-side otherwise
        (round(sum(abs(pa - pb)) / 2.0, 6) + lit(0.0)).as("tv_distance"),
        (round(sqrt(sum(pow(sqrt(pa) - sqrt(pb), 2.0)) / 2.0), 6) + lit(0.0))
          .as("hellinger"),
        (round((sum(pa * log(pa / mid)) + sum(pb * log(pb / mid))) / 2.0, 6)
          + lit(0.0)).as("js_divergence"))
  }

  /** Hour-over-hour categorical drift: for every hour with a predecessor,
    * the total-variation distance between the hour's category
    * distribution and the previous hour's — the ingest-monitoring signal
    * that catches a traffic mix shifting (one event type surging, a
    * source going dark) without any model. Pure rational arithmetic
    * (TV = `½ Σ|p_h − p_{h−1}|`, absent categories = 0), so dashboards
    * get bit-identical numbers from any engine.
    *
    * Scale shape: ONE partial-aggregated count over `(hour, category)`
    * (bounded by hours × categories — metadata cardinality, not event
    * volume), then all arithmetic runs on that compact frame: totals
    * join, a self full-outer join of consecutive hours on `(hour,
    * category)`, and a per-hour sum. Event volume is touched exactly
    * once, at scan speed.
    *
    * Returns `(hour, tv_drift)` — `hour` formatted as a string (engines
    * disagree on raw timestamp rendering), 6dp TV, first hour excluded
    * (no predecessor).
    */
  def hourlyCategoryDrift(df: DataFrame, tsCol: Column, catCol: Column): DataFrame = {
    val c = df.select(date_trunc("hour", tsCol).as("h"), catCol.as("cat"))
      .groupBy("h", "cat").agg(count(lit(1)).as("cnt"))
    val tot = c.groupBy("h").agg(sum("cnt").as("tot"))
    val p = c.join(tot, "h")
      .select(col("h"), col("cat"), (col("cnt").cast("double") / col("tot")).as("p"))
    val prev = p.select((col("h") + expr("INTERVAL 1 HOUR")).as("h"),
      col("cat"), col("p").as("p_prev"))
    // full outer on (h, cat): categories absent on either side carry 0
    val joined = p.join(prev, Seq("h", "cat"), "full_outer")
      .select(col("h"), coalesce(col("p"), lit(0.0)).as("p"),
        coalesce(col("p_prev"), lit(0.0)).as("p_prev"))
    // only hours with events in BOTH this hour and the previous one
    // (either side empty would degenerate TV to a vacuous 0.5)
    val withPrev = tot.select((col("h") + expr("INTERVAL 1 HOUR")).as("h"))
    joined.join(withPrev, Seq("h"), "left_semi")
      .join(tot.select(col("h")), Seq("h"), "left_semi")
      .groupBy("h")
      .agg(round(sum(abs(col("p") - col("p_prev"))) / 2.0, 6).as("tv_drift"))
      .select(date_format(col("h"), "yyyy-MM-dd HH:00").as("hour"), col("tv_drift"))
  }

  /** Pairwise content-overlap matrix between corpus slices (sources,
    * crawl snapshots, language shards): EXACT shingle-set Jaccard for
    * every pair of groups — "how much of source A is also in source B?",
    * the provenance/contamination view a multi-source training mix needs
    * before weights are chosen ([[graft.operators.Sampling.weightedMix]]).
    *
    * Semantics: per group, the DISTINCT set of word-`shingleSize`-gram
    * hashes of the lowercased text; per pair `(a < b)`, `n_common` the
    * distinct shingles in both and `jaccard = common / (n_a + n_b −
    * common)`. Pairs with zero overlap are emitted too (a monitoring
    * matrix with silently missing cells reads as "no data", not "no
    * overlap").
    *
    * Scale shape: never a shingle-stream self-join. One distinct pass
    * over `(group, shingle)` — partial-aggregated, shuffle bounded by
    * distinct volume — then `collect_set(group)` per shingle (bounded by
    * the number of groups, a metadata cardinality) and pair explosion of
    * that tiny set; per-group sizes and the final matrix assembly are
    * ≤groups² rows joined broadcast. Corpus bytes are touched exactly
    * once.
    *
    * Returns `(group_a, group_b, n_a, n_b, n_common, jaccard)`, one row
    * per unordered group pair, jaccard rounded to 6dp.
    */
  def overlapMatrix(
      df: DataFrame,
      groupCol: Column,
      textCol: Column,
      shingleSize: Int = 2): DataFrame = {
    import graft.functions.SketchFunctions
    val sh = df.select(groupCol.cast("string").as("g"),
        explode(SketchFunctions.wordNgramHashes(lower(textCol), shingleSize,
          distinct = true)).as("s"))
      .distinct()
    val sizes = sh.groupBy("g").agg(count(lit(1)).as("n"))
    // group-set per shingle is bounded by the group count; emit each
    // unordered pair once (the set arrives sorted)
    val common = sh.groupBy("s").agg(sort_array(collect_set(col("g"))).as("gs"))
      .filter(size(col("gs")) > 1)
      .select(explode(flatten(transform(col("gs"), (x, i) =>
        transform(slice(col("gs"), i + 2, greatest(size(col("gs")) - i - 1, lit(0))),
          y => struct(x.as("ga"), y.as("gb")))))).as("p"))
      .groupBy(col("p.ga"), col("p.gb")).agg(count(lit(1)).as("n_common"))
    val pairs = sizes.select(col("g").as("group_a"), col("n").as("n_a"))
      .crossJoin(broadcast(sizes.select(col("g").as("group_b"), col("n").as("n_b"))))
      .filter(col("group_a") < col("group_b"))
    pairs
      .join(broadcast(common),
        col("group_a") === col("ga") && col("group_b") === col("gb"), "left")
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_common"), lit(0L))), 6)
          .as("jaccard"))
  }

  /** Per-source quality-funnel attrition: how many documents survive each
    * stage of the canonical cleaning chain, grouped by provenance. At
    * 100 TB this is the FIRST dashboard a pipeline owner reads — a
    * mis-tuned gate silently wiping one source (or one language) shows up
    * here before it shows up in the trained model. Stages are cumulative
    * conjunctions (a doc counted at stage k passed stages 1..k):
    *
    *  1. `n_len_ok` — word-count window (`minWords..maxWords`)
    *  2. `n_gopher_ok` — + the Gopher heuristics ([[TextAnalysis
    *     .gopherQualityStats]]'s exact arithmetic: mean word length,
    *     alphabetic fraction, stopword hits)
    *  3. `n_rep_ok` — + repeated-bigram fraction ≤ `repMax`
    *     ([[TextAnalysis.repetitionStats]]'s signal)
    *  4. `n_kept` — + exact-duplicate canonical (globally-first doc_id
    *     per text; on a duplicate-free corpus this stage is free, and
    *     under replication it is exactly where the funnel tightens —
    *     the property the sf10x scale oracle checks)
    *
    * Scale shape: every per-doc flag is scan-local codegen (the same
    * array expressions as the per-doc operators); the dup election is one
    * partial-aggregated `groupBy(xxhash64(text))` whose join back ships
    * the 8-byte hash, never text; the final agg is bounded by source
    * count. Corpus bytes are read exactly once.
    */
  def qualityFunnel(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      srcCol: Column,
      minWords: Int = 30,
      maxWords: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2,
      repMax: Double = 0.05,
      stopwords: Seq[String] = TextAnalysis.defaultStopwords): DataFrame = {
    val toks = filter(split(lower(textCol), " "), t => length(t) > 0)
    val nWords = size(toks).cast("long")
    val charSum = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val meanLen =
      round(charSum.cast("double") / greatest(nWords, lit(1L)).cast("double"), 4)
    val alphaFrac = round(
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
        greatest(nWords, lit(1L)).cast("double"), 4)
    val stopHits = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
    val grams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val total = size(grams).cast("long")
    val uniq = size(array_distinct(grams)).cast("long")
    val repFrac = round((total - uniq).cast("double") /
      greatest(total, lit(1L)).cast("double"), 4)
    val perDoc = df.select(
      idCol.as("__qf_id"), srcCol.as("__qf_src"),
      xxhash64(textCol).as("__qf_h"),
      nWords.as("__qf_nw"), meanLen.as("__qf_mwl"),
      alphaFrac.as("__qf_af"), stopHits.as("__qf_sh"),
      repFrac.as("__qf_rep"))
    val canon = perDoc.groupBy("__qf_h")
      .agg(min(col("__qf_id")).as("__qf_canon"))
    val flagged = perDoc.join(canon, Seq("__qf_h"))
      .withColumn("__qf_s1",
        col("__qf_nw") >= minWords && col("__qf_nw") <= maxWords)
      .withColumn("__qf_s2",
        col("__qf_s1") && col("__qf_mwl") >= minMeanLen &&
          col("__qf_mwl") <= maxMeanLen &&
          col("__qf_af") >= minAlphaFrac && col("__qf_sh") >= minStopHits)
      .withColumn("__qf_s3", col("__qf_s2") && col("__qf_rep") <= repMax)
      .withColumn("__qf_s4",
        col("__qf_s3") && col("__qf_id") === col("__qf_canon"))
    flagged.groupBy(col("__qf_src").as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__qf_s1"), 1L).otherwise(0L)).as("n_len_ok"),
        sum(when(col("__qf_s2"), 1L).otherwise(0L)).as("n_gopher_ok"),
        sum(when(col("__qf_s3"), 1L).otherwise(0L)).as("n_rep_ok"),
        sum(when(col("__qf_s4"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("kept_frac",
        round(col("n_kept").cast("double") / col("n_docs"), 4) + lit(0.0))
  }
}
