package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Random `df.sample()` is non-reproducible across runs/partitionings; the
  * pipeline idiom at scale is *hash splitting*: a row's membership in
  * train/validation/sample is a pure function of its key, stable across
  * reruns, engines and repartitioning, and implemented as a codegen'd
  * filter at scan speed (no shuffle, prunes before any downstream work).
  */
object Sampling {

  /** Keep rows whose 64-bit key hash lands below `keep`/`buckets`
    * (xxhash64 — the fast engine-native path).
    */
  def hashSample(df: DataFrame, key: Column, keep: Int, buckets: Int = 100): DataFrame =
    df.filter(pmod(xxhash64(key), lit(buckets)) < lit(keep))

  /** Cross-engine-portable variant: first hex digit of md5(key-as-string)
    * selects `sixteenths`/16 of rows. Byte-identical in any engine with a
    * standard md5 — the reproducible train/val split.
    */
  def md5Sample(df: DataFrame, key: Column, sixteenths: Int): DataFrame = {
    require(sixteenths >= 0 && sixteenths <= 16, "sixteenths in [0,16]")
    if (sixteenths == 16) df
    else df.filter(substring(md5(key.cast("string")), 1, 1) < lit("0123456789abcdefg".charAt(sixteenths).toString))
  }

  /** Deterministic per-stratum hash sampling: keep ~`keep`/`buckets` of
    * each stratum (e.g. per language) regardless of stratum skew. Same
    * scan-speed filter; the stratum column only feeds the hash so no
    * grouping shuffle happens.
    */
  def stratifiedHashSample(
      df: DataFrame, key: Column, stratum: Column, keep: Int, buckets: Int = 100): DataFrame =
    df.filter(pmod(xxhash64(stratum, key), lit(buckets)) < lit(keep))

  /** Balanced downsampling: exactly `min(n, |stratum|)` rows per stratum,
    * chosen deterministically as the n smallest md5-derived hash values —
    * count-based where [[weightedMix]] is fraction-based, the shape used
    * to build evaluation sets and per-language-balanced corpora.
    *
    * Scale shape: selection is the bounded-heap aggregate (≤n rows per
    * stratum per map task cross the shuffle — never a per-stratum sort of
    * corpus-sized groups). The rank key is the first 12 md5 hex digits as
    * an exact 48-bit double (fixed-width lowercase hex compares
    * identically as a string, which is how an independent engine
    * replicates the order), tie-broken by the numeric key.
    *
    * Returns `(stratum, id, rnk)` with `rnk` 1..n by hash order.
    */
  def balancedSample(
      df: DataFrame,
      keyCol: Column,
      stratumCol: Column,
      n: Int): DataFrame = {
    val h = conv(substring(md5(keyCol.cast("string")), 1, 12), 16, 10)
      .cast("double") // 48 bits — exact in a double
    Ranking.topKPerGroup(df, stratumCol, keyCol.cast("long"), -h, n)
      .select(col("group").as("stratum"), col("id"), col("rnk"))
  }

  /** Source-weighted corpus mixing: keep a per-source FRACTION of rows
    * (`{web → 0.5, code → 1.0, forums → 0.25}`) — how training mixes are
    * rebalanced without materializing intermediate corpora. Membership
    * compares the first 3 md5 hex digits of the key (uniform over 4096
    * buckets, byte-identical in any engine with a standard md5) against a
    * per-source threshold selected by a `when`-chain over the tiny weight
    * map — a codegen'd scan filter: no shuffle, no join, reproducible
    * across engines/reruns/repartitioning. Sources absent from `weights`
    * are dropped. Weight granularity is 1/4096.
    */
  def weightedMix(
      df: DataFrame,
      key: Column,
      srcCol: Column,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      "weights must be fractions in [0, 1]")
    // threshold as a 3-hex-digit string; "g" sorts above every hex digit,
    // so weight 1.0 keeps everything
    val thr = weights.foldLeft(lit("000")) { case (acc, (s, w)) =>
      when(srcCol === s,
        if (w >= 1.0) lit("g") else lit(f"${math.floor(w * 4096).toInt}%03x"))
        .otherwise(acc)
    }
    df.filter(substring(md5(key.cast("string")), 1, 3) < thr)
  }

  /** Group-aware train/val/test split: the split is a pure function of the
    * GROUP key (author, domain, source...), so every row of a group lands
    * in the same split — the leakage-prevention contract for held-out
    * evaluation (a near-duplicate of a training document from the same
    * source can never sit in the test set). `splits` are
    * `(name, fraction)` in declaration order; fractions must sum to 1.
    *
    * Membership compares the group's first 12 md5 hex digits (48-bit
    * resolution, byte-identical in any engine with a standard md5 —
    * fixed-width lowercase hex compares lexicographically == numerically)
    * against the cumulative-fraction thresholds. A codegen'd projection:
    * no shuffle, no join, stable across reruns and repartitioning.
    *
    * Returns `df` plus a `split` column. Note the fractions divide GROUP
    * hash space, not rows: with few groups the realized row split tracks
    * the fractions only as closely as group sizes allow.
    */
  def groupSplit(
      df: DataFrame,
      groupCol: Column,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0.0),
      "splits must be non-empty positive fractions")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val hexThr = cum.map(c =>
      if (c >= 1.0) "g" // sorts above every hex digit — the final catch-all
      else f"${math.floor(c * (1L << 48)).toLong}%012x")
    val h = substring(md5(groupCol.cast("string")), 1, 12)
    val expr = splits.map(_._1).zip(hexThr).reverse
      .foldLeft(lit(splits.last._1): Column) { case (acc, (name, thr)) =>
        when(h < lit(thr), lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Temperature-based source mixing (the multilingual/data-mixture
    * rebalancing rule, XLM-R-style): source `i` with mass `n_i` (tokens,
    * chars, rows — `weightCol`) is sampled with probability proportional
    * to `n_i^temperature`, scaled so the expected kept mass is `budget`.
    * `temperature = 1` reproduces the natural distribution;
    * `temperature → 0` flattens toward uniform across sources — the knob
    * that keeps low-resource sources from vanishing in the mix.
    *
    * Per-source keep rate: `min(1, budget · n_i^τ / (Z · n_i))` with
    * `Z = Σ n_j^τ`. Rates are quantized to 1/4096 (3 md5 hex digits, the
    * [[weightedMix]] granularity) so membership stays a pure string
    * compare — byte-identical across engines, immune to 1-ulp FP drift in
    * the rate arithmetic flipping a row at the 48-bit boundary.
    *
    * Scale shape: one partial-agg pass over the (tiny) per-source masses,
    * a broadcast of the per-source thresholds, then a codegen'd scan
    * filter — the corpus itself is never shuffled. Oversampling
    * (rate > 1, i.e. multiple epochs of a small source) is clamped to 1:
    * epoch replication is a separate explode, not a filter.
    */
  def temperatureMix(
      df: DataFrame,
      key: Column,
      srcCol: Column,
      weightCol: Column,
      temperature: Double,
      budget: Double): DataFrame = {
    require(temperature > 0.0 && temperature <= 1.0,
      s"temperature in (0, 1], got $temperature")
    require(budget > 0.0, s"budget must be positive, got $budget")
    // internal names carry a prefix so they can never collide with (or
    // ambiguously resolve against) the caller's own columns
    val stats = df.groupBy(srcCol.as("__mix_src"))
      .agg(sum(weightCol).cast("double").as("__mix_n"))
    val z = stats.agg(sum(pow(col("__mix_n"), temperature)).as("__mix_z"))
    val thr = stats.crossJoin(z)
      .select(col("__mix_src"),
        least(lit(1.0),
          lit(budget) * pow(col("__mix_n"), temperature) / col("__mix_z") /
            col("__mix_n"))
          .as("__mix_rate"))
      .select(col("__mix_src"),
        when(col("__mix_rate") >= 1.0, lit("g"))
          .otherwise(lower(lpad(
            hex(floor(col("__mix_rate") * 4096).cast("long")), 3, "0")))
          .as("__mix_thr"))
    df.join(broadcast(thr), srcCol === col("__mix_src"))
      .filter(substring(md5(key.cast("string")), 1, 3) < col("__mix_thr"))
      .drop("__mix_src", "__mix_thr")
  }

  /** Epoch replication: the oversampling half of temperature mixing.
    * [[temperatureMix]] clamps per-source rates at 1 — a FILTER can only
    * drop. Training mixes also need the other direction: a low-resource
    * source with rate 2.4 should contribute every row twice plus a 0.4
    * fractional epoch. Each input row is replicated `floor(rate)` times
    * (epochs `0..floor(rate)-1`, unconditional) and once more at epoch
    * `floor(rate)` iff the row's hash lands under the quantized
    * fractional-part threshold — so expected kept mass per source is
    * exactly `rate · n_i`, i.e. the un-clamped temperature rule, and
    * `rate < 1` degenerates to the [[temperatureMix]] filter. The epoch
    * index is returned so downstream shuffling/packing can keep copies
    * apart.
    *
    * Determinism is the same 48-bit-md5 / 1-4096-grid contract as
    * [[temperatureMix]]; `floor(rate)` adds an integer boundary, which is
    * why rates are quantized AFTER the floor split (a 1-ulp drift in the
    * rate arithmetic flips membership only if `rate` sits within ~1e-13 of
    * a boundary — callers choosing pathological budget/τ combinations can
    * see one row of skew, the documented limit of cross-engine FP replay).
    *
    * Scale shape: one tiny stats agg → broadcast thresholds → a codegen'd
    * `explode(sequence(...))` projection. Row amplification is `rate`,
    * which is bounded by `budget / n_i` — only SMALL sources amplify, so
    * output mass ≈ `budget` no matter how large the corpus; the corpus is
    * never shuffled.
    */
  def epochReplicate(
      df: DataFrame,
      key: Column,
      srcCol: Column,
      weightCol: Column,
      temperature: Double,
      budget: Double): DataFrame = {
    require(temperature > 0.0 && temperature <= 1.0,
      s"temperature in (0, 1], got $temperature")
    require(budget > 0.0, s"budget must be positive, got $budget")
    val stats = df.groupBy(srcCol.as("__mix_src"))
      .agg(sum(weightCol).cast("double").as("__mix_n"))
    val z = stats.agg(sum(pow(col("__mix_n"), temperature)).as("__mix_z"))
    val rate = lit(budget) * pow(col("__mix_n"), temperature) /
      col("__mix_z") / col("__mix_n")
    val thr = stats.crossJoin(z)
      .select(col("__mix_src"),
        floor(rate).cast("long").as("__mix_full"),
        lower(lpad(hex(floor((rate - floor(rate)) * 4096).cast("long")),
          3, "0")).as("__mix_frac"))
    df.join(broadcast(thr), srcCol === col("__mix_src"))
      .withColumn("epoch", explode(sequence(lit(0L), col("__mix_full"))))
      .filter(col("epoch") < col("__mix_full") ||
        substring(md5(key.cast("string")), 1, 3) < col("__mix_frac"))
      .drop("__mix_src", "__mix_full", "__mix_frac")
  }

  /** Number of hashed-n-gram feature buckets for [[importanceResample]]:
    * fixed at 4096 = 3 md5 hex digits, the same cross-engine-portable
    * grid every other operator here uses (an independent engine
    * replicates the bucket with plain digit arithmetic on the md5 hex
    * string — no engine-specific hash).
    */
  val DsirBuckets = 4096

  /** Exploded unigram++bigram stream — the hashed feature set of DSIR
    * (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"). The tokens array is materialized in its
    * OWN projection before the bigram builder touches it: referencing
    * the raw `filter(split(lower(text)))` expression inside the
    * `transform` lambda would re-evaluate the full tokenizer once per
    * element index — quadratic in document length (measured ~5× on the
    * gram stream alone at sf0.1). CollapseProject leaves the
    * multi-referenced non-cheap alias in place.
    */
  private def gramStream(
      df: DataFrame, textCol: Column, keep: Seq[(Column, String)],
      outer: Boolean): DataFrame = {
    val toksExpr = filter(split(lower(textCol), " "), t => length(t) > 0)
    val base = df.select(keep.map { case (c, n) => c.as(n) } :+
      toksExpr.as("__toks"): _*)
    val toks = col("__toks")
    // sequence(1, 0) would DESCEND in Spark, so guard the <2-token case
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
    val grams = concat(toks, bigrams)
    base.select(keep.map { case (_, n) => col(n) } :+
      (if (outer) explode_outer(grams) else explode(grams)).as("__g"): _*)
  }

  /** First 3 md5 hex digits as an int in [0, 4096). */
  private def dsirBucket(g: Column): Column =
    conv(substring(md5(g), 1, 3), 16, 10).cast("int")

  /** Per-bucket gram counts of a corpus — a bounded driver artifact
    * (≤4096 rows) like a k-means centroid set: one corpus scan with
    * map-side partial aggregation over ≤4096 keys.
    */
  private def dsirBucketCounts(df: DataFrame, textCol: Column): (Array[Long], Long) = {
    val counts = gramStream(df, textCol, Nil, outer = false)
      .select(dsirBucket(col("__g")).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__c"))
      .collect()
    val arr = new Array[Long](DsirBuckets)
    counts.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    (arr, arr.sum)
  }

  /** DSIR-style importance resampling (Xie et al. 2023): select the `n`
    * rows of `raw` whose hashed-n-gram distribution looks most like the
    * (small) `target` exemplar corpus. A document's log importance weight
    * is `Σ_g log p̂_target(bucket(g)) − log p̂_raw(bucket(g))` over its
    * unigrams+bigrams, with Laplace-smoothed bucket probabilities — the
    * estimator that steers a web-scale crawl toward a quality domain
    * (Wikipedia, textbooks) without training a classifier.
    *
    * Deterministic variant: the paper samples Gumbel-top-k; here
    * selection is top-`n` by weight (rounded to 4 decimals so a 1-ulp
    * cross-engine drift in the float sum cannot reorder the cutoff),
    * tie-broken by id — reproducible across engines and reruns.
    *
    * Scale shape: two bounded distribution scans (partial-agg over ≤4096
    * keys, collected like centroids), then one scoring pass: the gram
    * stream explodes, each gram's log-ratio is a WHOLE-STAGE-CODEGEN
    * lookup into the 4096-double plan-literal array, and per-doc sums
    * partial-aggregate map-side (the shuffle carries ~one row per doc
    * per task). A higher-order `aggregate` over the gram array would
    * avoid that shuffle but drops the md5/bucket arithmetic out of
    * codegen into interpreted per-element evaluation — measured ~10×
    * slower; the tiny doc-keyed shuffle is the right trade. Selection is
    * top-`n` as TakeOrderedAndProject — a per-partition bounded heap and
    * an O(n) driver merge, never a global sort.
    *
    * Returns `(doc_id, logw)`, the selected ids with their weights.
    */
  def importanceResample(
      raw: DataFrame,
      target: DataFrame,
      idCol: Column,
      textCol: Column,
      n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val (rawCnt, rawTot) = dsirBucketCounts(raw, textCol)
    val (tgtCnt, tgtTot) = dsirBucketCounts(target, textCol)
    val logRatio: Seq[Double] = (0 until DsirBuckets).map { b =>
      math.log((tgtCnt(b) + 1.0) / (tgtTot + DsirBuckets.toDouble)) -
        math.log((rawCnt(b) + 1.0) / (rawTot + DsirBuckets.toDouble))
    }
    val ratioLit = typedlit(logRatio)
    // explode_outer keeps zero-gram docs alive (null gram scores 0.0)
    gramStream(raw, textCol, Seq(idCol -> "doc_id"), outer = true)
      .select(col("doc_id"),
        when(col("__g").isNull, lit(0.0))
          .otherwise(element_at(ratioLit, dsirBucket(col("__g")) + 1)).as("__r"))
      .groupBy("doc_id")
      .agg((round(sum("__r"), 4) + lit(0.0)).as("logw"))
      .orderBy(col("logw").desc, col("doc_id").asc)
      .limit(n)
  }

  /** Greedy corpus selection under a global weight budget: walk rows in
    * (`orderCol` DESC, id ASC) order and keep each row while the running
    * `weightCol` total stays ≤ `budget` — "take the highest-quality
    * documents until the token budget is spent", the last step of every
    * curated-pretraining recipe.
    *
    * The naive formulation is a GLOBAL window cumsum — a total sort of
    * the corpus. The scale shape here is the two-level prefix sum:
    * (1) one partial-aggregated pass sums weight per distinct `orderCol`
    * value (cardinality-bounded by contract: scores are quantized — a
    * rounded quality score, an integer length), collected to the driver
    * like a histogram; (2) the driver prefix-walks the sorted values and
    * finds the boundary value `v*`; (3) rows with `orderCol` strictly
    * above `v*` pass a codegen scan filter (no shuffle, no sort); (4) only
    * the boundary-value rows — one value's worth of the corpus — pay a
    * window cumsum, ordered by id with the remaining budget. So the total
    * sort never happens; the expensive path touches ~1/|distinct values|
    * of the data.
    *
    * Ties inside the boundary value resolve by id ASC — deterministic and
    * replayable by any engine's `SUM() OVER (ORDER BY q DESC, id ASC)`.
    *
    * Returns `(id, q, w)` — the selected rows with their order key and
    * weight.
    */
  def selectUnderBudget(
      df: DataFrame,
      idCol: Column,
      orderCol: Column,
      weightCol: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val keyed = df.select(idCol.as("id"), orderCol.cast("double").as("q"),
      weightCol.cast("long").as("w"))
    // (1) per-value weight histogram — bounded driver artifact. The
    // quantized-score contract is enforced, not assumed: an unquantized
    // order column (distinct count ~ corpus size) would silently move
    // the whole corpus to the driver, so overflowing the cap is an
    // error, not an OOM.
    val maxDistinct = 1 << 22
    val histRows = keyed.groupBy("q").agg(sum("w").as("tw"))
      .take(maxDistinct + 1)
    require(histRows.length <= maxDistinct,
      s"orderCol has more than $maxDistinct distinct values — quantize " +
        "the score (e.g. round(score, 3)) before selectUnderBudget")
    val hist = histRows.map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(-_._1)
    // (2) driver prefix walk: values kept whole, then the boundary value
    var remaining = budget
    var fullAbove = Double.NegativeInfinity // keep all q > fullAbove ...
    var boundary: Option[(Double, Long)] = None // ... plus q == v* under rest
    val it = hist.iterator
    var done = false
    while (it.hasNext && !done) {
      val (v, tw) = it.next()
      if (tw <= remaining) { remaining -= tw; fullAbove = v }
      else { boundary = Some((v, remaining)); done = true }
    }
    val full =
      if (fullAbove == Double.NegativeInfinity) keyed.filter(lit(false))
      else keyed.filter(col("q") >= lit(fullAbove))
    boundary match {
      case None => full
      case Some((v, rest)) =>
        // (4) one value's rows pay the window — a deliberate single
        // partition: this slice is ~1/|distinct q| of the corpus
        val w = Window.orderBy(col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val edge = keyed.filter(col("q") === lit(v))
          .withColumn("__cum", sum(col("w")).over(w))
          .filter(col("__cum") <= lit(rest))
          .drop("__cum")
        full.unionByName(edge)
    }
  }

  /** Water-filling budget allocation across sources — the fair-cap step
    * of mixture design: give every source its full supply up to a common
    * waterline λ chosen so the total exactly meets `budget`
    * (`alloc_i = min(supply_i, λ)`, `Σ alloc_i = budget`). Small sources
    * keep everything; dominant sources are capped at λ — the standard
    * remedy when one crawl snapshot would otherwise drown the mix.
    *
    * The waterline is found WITHOUT iteration: sort sources by supply
    * ascending; source at rank r is fully served iff even granting
    * everyone from r onward its supply fits the remaining budget —
    * `supply_r · (n − r + 1) ≤ budget − prefix_{r−1}` — a condition
    * that is MONOTONE in r, kept in cross-multiplied INTEGER form so
    * both engines decide every boundary identically (no double division
    * anywhere near a comparison). With k = count of fully-served,
    * `λ = (budget − prefix_k) / (n − k)` — division happens once, only
    * for display and the capped allocations.
    *
    * Scale shape: ONE partial-aggregated `groupBy(source)` bounds
    * everything downstream by source count (metadata cardinality, not
    * corpus rows); the rank/prefix Window and the one-row fold run on
    * that tiny frame. Corpus bytes are read exactly once.
    *
    * Returns `(source, supply, allocated, saturated, waterline)`;
    * `waterline` is NULL when the budget covers every source (no cap
    * binds). Ties in supply break on source name — determinism the
    * replicated-corpus oracle relies on.
    */
  /** Exact-size stratified sample: `sampleSize` rows total, allocated
    * across groups PROPORTIONALLY with largest-remainder (Hamilton)
    * rounding — `alloc_g = floor(n_g·S/N)` plus one for the groups with
    * the largest remainders until the allocations sum to exactly S.
    * [[stratifiedHashSample]] keeps a deterministic *fraction* per group
    * (threshold filter, no sort) but its realized size wobbles with the
    * hash; evaluation sets and fixed labeling budgets need the COUNT
    * exact, which requires ranking inside each group.
    *
    * Determinism: the allocation is pure INTEGER arithmetic
    * (`(n_g·S) div N` / `mod N`, remainder ties broken by group name),
    * and selection takes each group's first `alloc_g` rows ordered by
    * `(md5(key), key)` — the corpus-invariant hash order every sampler
    * in this file uses. Any engine replays both exactly.
    *
    * Scale shape: group counts partial-aggregate; the quota arithmetic
    * runs on the group-cardinality frame (one broadcast back); selection
    * is ONE per-group Window over the hash order — the sort unit is the
    * group, which is the price of an exact count (callers who can live
    * with ±hash-wobble should stay with the threshold samplers).
    */
  def stratifiedExactSample(
      df: DataFrame,
      key: Column,
      groupCol: Column,
      sampleSize: Long): DataFrame = {
    require(sampleSize >= 0, s"sampleSize must be non-negative, got $sampleSize")
    val keyed = df.withColumn("__se_g", groupCol)
      .withColumn("__se_k", key.cast("string"))
      .withColumn("__se_h", md5(col("__se_k")))
    val counts = keyed.groupBy("__se_g").agg(count(lit(1)).as("__se_n"))
    val tot = counts.agg(sum(col("__se_n")).as("__se_tot"))
    val quota = counts.crossJoin(tot)
      .withColumn("__se_base",
        call_function("div", col("__se_n") * sampleSize, col("__se_tot")))
      .withColumn("__se_rem",
        pmod(col("__se_n") * sampleSize, col("__se_tot")))
    val leftover = quota
      .agg((lit(sampleSize) - sum(col("__se_base"))).as("__se_left"))
    val alloc = quota.crossJoin(leftover)
      .withColumn("__se_rr", row_number().over(
        Window.orderBy(col("__se_rem").desc, col("__se_g").asc)).cast("long"))
      .withColumn("__se_alloc",
        col("__se_base") +
          when(col("__se_rr") <= col("__se_left"), 1L).otherwise(0L))
      .select(col("__se_g"), col("__se_alloc"))
    val w = Window.partitionBy(col("__se_g"))
      .orderBy(col("__se_h").asc, col("__se_k").asc)
    keyed
      .withColumn("__se_rn", row_number().over(w).cast("long"))
      .join(broadcast(alloc), Seq("__se_g"))
      .filter(col("__se_rn") <= col("__se_alloc"))
      .drop("__se_g", "__se_k", "__se_h", "__se_rn", "__se_alloc")
  }

  def waterfillAllocation(
      df: DataFrame,
      srcCol: Column,
      weightCol: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val stats = df.groupBy(srcCol.as("__wf_src"))
      .agg(sum(weightCol.cast("long")).as("__wf_s"))
    val w = Window.orderBy(col("__wf_s").asc, col("__wf_src").asc)
    val ranked = stats
      .withColumn("__wf_r", row_number().over(w).cast("long"))
      .withColumn("__wf_p",
        coalesce(sum(col("__wf_s")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val n = ranked.agg(count(lit(1)).cast("long").as("__wf_n"))
    val flagged = ranked.crossJoin(n)
      .withColumn("__wf_full",
        col("__wf_s") * (col("__wf_n") - col("__wf_r") + 1L) <=
          lit(budget) - col("__wf_p"))
    val k = flagged.agg(
      sum(when(col("__wf_full"), 1L).otherwise(0L)).as("__wf_k"),
      max(when(col("__wf_full"), col("__wf_p") + col("__wf_s")))
        .as("__wf_pk"))
    flagged.crossJoin(k)
      .select(
        col("__wf_src").as("source"),
        col("__wf_s").as("supply"),
        when(col("__wf_full"), col("__wf_s").cast("double"))
          .otherwise(round(
            (lit(budget) - coalesce(col("__wf_pk"), lit(0L))).cast("double") /
              (col("__wf_n") - col("__wf_k")), 4) + lit(0.0))
          .as("allocated"),
        (!col("__wf_full")).as("saturated"),
        when(col("__wf_k") < col("__wf_n"),
          round(
            (lit(budget) - coalesce(col("__wf_pk"), lit(0L))).cast("double") /
              (col("__wf_n") - col("__wf_k")), 4) + lit(0.0))
          .as("waterline"))
  }
}
