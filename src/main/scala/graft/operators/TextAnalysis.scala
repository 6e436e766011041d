package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators: token counting, quality metrics, language
  * heuristics, content fingerprinting. All are built-in-function
  * compositions — fully codegen'd, no UDFs — so they run at scan speed
  * and push no extra shuffles beyond the final aggregation.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword count: splits on word boundaries and punctuation,
    * approximating tokenizer token counts without a vocab.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, """[\s\p{Punct}]+"""), x => length(x) > 0))

  /** Ratio of punctuation characters to all characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, """\p{Punct}""", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Ratio of whitespace-delimited tokens that are common-English
    * stopwords — a standard quality-scoring signal.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val words = split(lower(text), " ")
    size(filter(words, w => w.isInCollection(stopwords))).cast("double") /
      greatest(size(words), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation,
    * reasonable stopword density (Gopher/C4-style heuristics).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthOk = when(nTok.between(10, 10000), 1.0).otherwise(0.3)
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.5)
    val stopOk = when(stopwordRatio(text) > 0.01, 1.0).otherwise(0.6)
    round(lengthOk * 0.4 + punctOk * 0.3 + stopOk * 0.3, 4)
  }

  /** Per-group token/char statistics (the oracle-checked aggregate shape). */
  def qualityByGroup(df: DataFrame, textCol: Column, groupCol: Column): DataFrame =
    df.groupBy(groupCol.as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(textCol)).as("total_tokens"),
        (sum(tokenCount(textCol)).cast("double") / count(lit(1))).as("avg_tokens"),
        (sum(length(textCol)).cast("double") / count(lit(1))).as("avg_chars"))

  /** Whitespace-normalized 64-bit content fingerprint (hex): stable under
    * reflow/indentation changes, cheap to shuffle and join on.
    */
  def fingerprint(text: Column): Column =
    substring(md5(lower(regexp_replace(text, """\s+""", " "))), 1, 16)

  /** LEGACY 4-language stopword heuristic — NOT the language-ID path.
    * Use [[languageIdNgram]] (57 languages, unicode-script detection +
    * per-script character-trigram batteries) for real language
    * identification; this toy survives only as q20's historical oracle
    * surface and as a codegen-composition demonstration (scores text
    * against 5-stopword profiles for en/de/es/fr, "und" otherwise).
    */
  @deprecated("use languageIdNgram — this is a 4-language stopword toy", "round-11")
  def languageId(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    def score(words: Seq[String]): Column =
      words.map(w => when(t.contains(s" $w "), 1).otherwise(0))
        .reduce(_ + _)
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is"),
      "de" -> Seq("der", "die", "und", "ist", "das"),
      "es" -> Seq("el", "la", "de", "que", "es"),
      "fr" -> Seq("le", "la", "et", "est", "les"))
    val scored = profiles.map { case (lang, ws) => struct(score(ws).as("s"), lit(lang).as("l")) }
    val best = greatest(scored: _*)
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that")

  /** Real language identification over [[LanguageProfiles]]'s 57
    * languages: unicode-script detection first (~20 languages are decided
    * by script membership alone, plus the CJK rule kana⇒ja / hangul⇒ko /
    * han-without-kana⇒zh), then a character-trigram-set intersection
    * battery inside the four multi-language scripts (Latin 28 languages,
    * Cyrillic 5, Arabic 3, Devanagari 3). Returns
    * `(doc_id, script, lang_pred)`; `lang_pred` is "und" for script-less
    * text and for Latin text with zero battery hits.
    *
    * Scale shape: a zero-shuffle three-projection chain. Stage 1 computes
    * every script's char count in ONE pass over the row's codepoints
    * ([[graft.functions.CodepointRangeCounts]], a native codegen
    * expression probing a binary-searched range table — identical integer
    * results to the 25 per-script `regexp_replace` strips the DuckDB
    * oracle replays, at 1/25th the scan cost).
    * Stage 3's trigram extraction is the zip-with-over-slices form (the
    * char array is materialized ONCE per row and appears only in HOF
    * argument positions — never inside a lambda body, the re-evaluation
    * trap), and each battery only evaluates inside its script's CASE
    * branch, so a han-only document never pays for the Latin battery.
    * All decision arithmetic is integer counts with deterministic
    * (count, code) tie-breaks, so the DuckDB oracle replays it exactly
    * from the same profile literals.
    */
  /** The script range table, in [[LanguageProfiles.scripts]] order — one
    * reference object on the plan, probed by the single-pass counter.
    */
  private[graft] lazy val scriptRangeTable: graft.functions.CodepointRangeTable = {
    val triples = LanguageProfiles.scripts.zipWithIndex.flatMap {
      case (s, i) => s.ranges.map { case (lo, hi) => Array(lo, hi, i) }
    }.sortBy(_(0)).toArray
    new graft.functions.CodepointRangeTable(triples, LanguageProfiles.scripts.size)
  }

  def languageIdNgram(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    import LanguageProfiles._
    // null-safe: a null text classifies as ("none", "und") instead of
    // poisoning the count structs with null fields
    val t0 = df.select(idCol.as("doc_id"),
      concat(lit(" "),
        lower(regexp_replace(coalesce(textCol.cast("string"), lit("")),
          """\s+""", " ")),
        lit(" ")).as("t"))
    val counted = t0
      .withColumn("sc",
        graft.functions.GraftFunctions.codepointRangeCounts(col("t"), scriptRangeTable))
      .select(col("doc_id") +: col("t") +:
        scripts.zipWithIndex.map { case (s, i) =>
          element_at(col("sc"), i + 1).as(s"c_${s.name}")
        }: _*)
    val domStruct = greatest(scripts.map(s =>
      struct(col(s"c_${s.name}").as("c"), lit(s.name).as("s"))): _*)
    val total = scripts.map(s => col(s"c_${s.name}")).reduce(_ + _)
    val withDom = counted
      .withColumn("script0",
        when(total === 0, lit("none")).otherwise(domStruct.getField("s")))
      .withColumn("script",
        when(col("script0") === "han" && col("c_kana") > 0, lit("kana"))
          .otherwise(col("script0")))
      .withColumn("chars", split(col("t"), ""))
    // split(t, "") yields EXACTLY the char array with no trailing empty
    // element (verified on Spark 4.1.2: split(' abc ', '') = [' ','a','b',
    // 'c',' '], size 5 — Spark's empty-regex split drops the trailing empty
    // that raw Java split(regex, -1) would keep), so size = char count and
    // size-2 is the full trigram count — every produced gram is 3 chars,
    // identical by construction to the oracle's substr(t, i, 3) over
    // i = 1 .. len-2
    val m = greatest(size(col("chars")) - 2, lit(0))
    val gramExpr = array_distinct(zip_with(
      zip_with(slice(col("chars"), lit(1), m), slice(col("chars"), lit(2), m),
        (a, b) => concat(a, b)),
      slice(col("chars"), lit(3), m), (a, b) => concat(a, b)))
    val batteryScripts = scripts.filter(_.battery.nonEmpty)
    val withGrams = withDom.withColumn("grams",
      when(col("script").isin(batteryScripts.map(_.name): _*), gramExpr)
        .otherwise(array().cast("array<string>")))
    def batteryPick(s: Script): Column = {
      val best = greatest(s.battery.map { case (lang, grams) =>
        struct(size(array_intersect(col("grams"), typedlit(grams))).as("n"),
          lit(lang).as("l"))
      }: _*)
      when(best.getField("n") > 0, best.getField("l")).otherwise(lit(s.default))
    }
    val langExpr = scripts.filter(_.battery.isEmpty)
      .foldLeft(batteryScripts.foldLeft(
        when(col("script") === "none", lit("und"))) { (acc, s) =>
        acc.when(col("script") === s.name, batteryPick(s))
      }) { (acc, s) => acc.when(col("script") === s.name, lit(s.default)) }
      .otherwise(lit("und"))
    withGrams.select(col("doc_id"), col("script"), langExpr.as("lang_pred"))
  }

  /** Gopher-style quality gate (Rae et al. 2021, §A1.1): the document-
    * level filter rules a pretraining corpus passes before anything
    * expensive runs. All rules are closed-form expressions over the token
    * array — one codegen projection at scan speed, zero shuffles.
    *
    * Returns `(doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
    * passes)`; `passes` ANDs: word count in [minWords, maxWords], mean
    * word length in [minMeanLen, maxMeanLen], fraction of words with an
    * alphabetic character ≥ minAlphaFrac, ≥ minStopHits stopword hits.
    */
  def gopherQualityStats(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2,
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val toks = filter(split(lower(textCol), " "), t => length(t) > 0)
    val nWords = size(toks).cast("long")
    val charSum = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val meanLen = charSum.cast("double") / greatest(nWords, lit(1L)).cast("double")
    val alphaWords = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val alphaFrac = alphaWords.cast("double") / greatest(nWords, lit(1L)).cast("double")
    val stopHits = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
    df.select(idCol.as("doc_id"), nWords.as("n_words"),
        round(meanLen, 4).as("mean_word_len"),
        round(alphaFrac, 4).as("alpha_frac"),
        stopHits.as("stop_hits"))
      .withColumn("passes",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen &&
          col("alpha_frac") >= minAlphaFrac && col("stop_hits") >= minStopHits)
  }

  /** Within-document repetition signals (the Gopher/C4 "repetitious text"
    * family): fraction of word-bigram instances that repeat an earlier
    * bigram in the same document, plus the single most frequent token and
    * the fraction of the document it occupies.
    *
    * Scale shape: the bigram side is pure array expressions
    * (`size − size(array_distinct)`) — zero shuffle. The top-term side
    * needs a per-(doc, term) count, which partial-aggregates, then reduces
    * per doc through the string-keyed bounded heap with k = 1 (count desc,
    * term asc — deterministic ties, and hash-aggregable where a
    * `min(struct(...))` would force a SortAggregate) and joins back at doc
    * cardinality — token instances never shuffle into any join.
    */
  def repetitionStats(
      df: DataFrame,
      idCol: Column,
      textCol: Column): DataFrame = {
    val toks = filter(split(lower(textCol), " "), t => length(t) > 0)
    val grams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val total = size(grams).cast("long")
    val uniq = size(array_distinct(grams)).cast("long")
    val gramSide = df.select(idCol.as("doc_id"),
      size(toks).cast("long").as("n_words"),
      total.as("n_bigrams"),
      round((total - uniq).cast("double") /
        greatest(total, lit(1L)).cast("double"), 4).as("rep_bigram_frac"))
    val termCounts = df.select(idCol.as("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
    val topTerm = termCounts.groupBy("doc_id")
      .agg(graft.functions.TopKByStrKey.topK(
        col("cnt").cast("double"), col("term"), 1).as("tk"))
      .select(col("doc_id"),
        element_at(col("tk"), 1).getField("id").as("top_term"),
        element_at(col("tk"), 1).getField("score").cast("long").as("top_cnt"))
    gramSide.join(topTerm, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_bigrams"),
        col("rep_bigram_frac"),
        coalesce(col("top_term"), lit("")).as("top_term"),
        round(coalesce(col("top_cnt"), lit(0L)).cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"), 4).as("top_term_frac"))
  }

  /** Unigram log-probability scoring — the perplexity-filter family
    * (CCNet / RedPajama): score each document by the mean log-probability
    * of its tokens under the corpus's own unigram distribution; very low
    * scores mark gibberish, very high scores mark degenerate repetition.
    *
    * The language model is the top-`vocabSize` terms by corpus frequency
    * (ties toward the lexicographically smaller term); out-of-vocabulary
    * tokens get probability `oovCount / N`. True perplexity needs an
    * external n-gram LM; the unigram form is the self-contained variant
    * with the same pipeline shape.
    *
    * Scale shape: global term counts partial-aggregate (one shuffle of
    * (term, count) rows), then vocabulary AND corpus total reduce in ONE
    * aggregate — the string-keyed bounded heap plus a sum — to a single
    * stats row that broadcasts as a term→count MAP. Scoring is then a
    * codegen map lookup per token (no join at all), so the exploded token
    * stream never meets a skewed join key (stopwords are the hottest
    * terms AND the most common keys), followed by one partial-aggregated
    * per-doc average.
    *
    * Returns `(doc_id, n_tokens, logprob)`.
    */
  def unigramLogProbScore(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      vocabSize: Int = 50000,
      oovCount: Double = 0.5): DataFrame = {
    require(vocabSize > 0, "vocabSize must be > 0")
    val toks = filter(split(lower(textCol), " "), t => length(t) > 0)
    val tok = df.select(idCol.as("doc_id"), explode(toks).as("term"))
    val termCounts = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
    val stats = termCounts
      .agg(
        graft.functions.TopKByStrKey.topK(
          col("cnt").cast("double"), col("term"), vocabSize).as("tk"),
        sum("cnt").cast("double").as("n_total"))
      .select(
        map_from_arrays(
          transform(col("tk"), e => e.getField("id")),
          transform(col("tk"), e => e.getField("score"))).as("vocab"),
        col("n_total"))
    tok.crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (round(avg(log(
          coalesce(element_at(col("vocab"), col("term")), lit(oovCount))
            / col("n_total"))), 4) + lit(0.0)).as("logprob"))
  }

  /** Interpolated-bigram language-model score — the CCNet-family
    * perplexity filter one rung up from [[unigramLogProbScore]]: each
    * document is scored by the average log-probability of its bigram
    * transitions under a model trained on the corpus itself,
    * `P(w₂|w₁) = λ·c(w₁w₂)/c(w₁) + (1−λ)·c(w₂)/N` — repetitive
    * machine-generated text scores high, token-salad scores low, and the
    * conditional term catches phrase-level fluency a unigram model is
    * blind to.
    *
    * Bounded-model discipline (the 100 TB part): the unigram vocabulary
    * caps at `vocabSize` and the bigram table at `bigramTable`, both
    * selected corpus-wide by the string-keyed bounded heap
    * ([[graft.functions.TopKByStrKey]], count desc / key asc — map tasks
    * reduce to ≤k entries before the one tiny stats shuffle). Out-of-table
    * terms fall back to `oovCount`; out-of-table bigrams to the pure
    * backoff `(1−λ)·P_uni(w₂)`. The conditional's denominator is the
    * CAPPED vocab count (oov fallback), clamped to ≤1 — every term is
    * rational arithmetic over broadcast maps, so an independent engine
    * replays it exactly; only the final `ln` is transcendental, absorbed
    * by 4dp rounding like q80.
    *
    * Scale shape: two partial-agg count shuffles (terms, bigrams), two
    * bounded-heap stats aggs broadcast back, one doc-keyed partial-agg
    * scoring shuffle. No token-stream joins, no global sorts.
    *
    * Returns `(doc_id, n_bigrams, logprob)` — one row per document with
    * at least one bigram (≥2 tokens).
    */
  def bigramLogProbScore(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      vocabSize: Int = 50000,
      bigramTable: Int = 200000,
      lambda: Double = 0.7,
      oovCount: Double = 0.5): DataFrame = {
    require(vocabSize > 0 && bigramTable > 0, "table sizes must be > 0")
    val bgE = lmBigramPairs(df, idCol, textCol)
    lmScore(bgE,
      lmUniStats(lmTokens(df, textCol), vocabSize),
      lmBgStats(bgE, bigramTable),
      lambda, oovCount)
  }

  /** Token stream of a corpus (the unigram training input). */
  private[graft] def lmTokens(df: DataFrame, textCol: Column): DataFrame = {
    val toks = filter(split(lower(textCol), " "), t => length(t) > 0)
    df.select(explode(toks).as("term"))
  }

  /** `(doc_id, w1, w2)` bigram-transition stream of a corpus. */
  private[graft] def lmBigramPairs(
      df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = filter(split(lower(textCol), " "), t => length(t) > 0)
    val docs = df.select(idCol.as("doc_id"), toks.as("ts"))
    val m = greatest(size(col("ts")) - 1, lit(0))
    val pairs = zip_with(
      slice(col("ts"), lit(1), m), slice(col("ts"), lit(2), m),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    docs.select(col("doc_id"), explode(pairs).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  /** One-row `(vocab map, n_total)` unigram model: heap-capped counts +
    * FULL-corpus token total (the denominator never shrinks with the cap).
    */
  private[graft] def lmUniStats(tokE: DataFrame, vocabSize: Int): DataFrame =
    tokE.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .agg(
        graft.functions.TopKByStrKey.topK(
          col("cnt").cast("double"), col("term"), vocabSize).as("tk"),
        sum("cnt").cast("double").as("n_total"))
      .select(map_from_arrays(
        transform(col("tk"), e => e.getField("id")),
        transform(col("tk"), e => e.getField("score"))).as("vocab"),
        col("n_total"))

  /** One-row `(bgmap)` bigram table keyed `"w1 w2"`, heap-capped. */
  private[graft] def lmBgStats(bgE: DataFrame, bigramTable: Int): DataFrame =
    bgE.select(concat_ws(" ", col("w1"), col("w2")).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      .agg(graft.functions.TopKByStrKey.topK(
        col("cnt").cast("double"), col("bg"), bigramTable).as("tk"))
      .select(map_from_arrays(
        transform(col("tk"), e => e.getField("id")),
        transform(col("tk"), e => e.getField("score"))).as("bgmap"))

  /** Score a `(doc_id, w1, w2)` transition stream under broadcast model
    * frames — shared by the self-trained operator and the persisted
    * [[LmIndex]] (train-once / score-forever) path.
    */
  private[graft] def lmScore(
      bgE: DataFrame,
      uniStats: DataFrame,
      bgStats: DataFrame,
      lambda: Double,
      oovCount: Double): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val cond = least(lit(1.0),
      coalesce(element_at(col("bgmap"), concat_ws(" ", col("w1"), col("w2"))),
        lit(0.0)) /
        coalesce(element_at(col("vocab"), col("w1")), lit(oovCount)))
    val puni = coalesce(element_at(col("vocab"), col("w2")), lit(oovCount)) /
      col("n_total")
    bgE.crossJoin(broadcast(uniStats)).crossJoin(broadcast(bgStats))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (round(avg(log(lit(lambda) * cond + lit(1.0 - lambda) * puni)), 4)
          + lit(0.0)).as("logprob"))
  }

  /** A PII class: display name (column suffix), detection regex, and the
    * replacement token. Patterns stay inside the RE2-compatible subset
    * (character classes, bounded quantifiers, optional groups, `\b`) so
    * detection behaves identically under java.util.regex and RE2-based
    * engines — no lookarounds, no backreferences.
    */
  final case class PiiPattern(name: String, regex: String, token: String)

  /** Default scrub classes: emails, IPv4 addresses, phone numbers. */
  val defaultPiiPatterns: Seq[PiiPattern] = Seq(
    PiiPattern("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "[EMAIL]"),
    PiiPattern("ip", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "[IP]"),
    PiiPattern("phone", """(\+\d{1,3}[-. ])?\d{3}[-. ]\d{3}[-. ]\d{4}\b""", "[PHONE]"))

  /** PII detect + redact — the scrub gate every corpus passes before
    * training. Classes apply IN ORDER, each counting matches on the
    * previous stage's output and replacing them with its token (ordering
    * matters: IPv4 runs before phone so dotted quads never half-match the
    * looser phone shape).
    *
    * Scale shape: the whole pipeline is one `regexp_count`/
    * `regexp_replace` expression composition — a single codegen'd
    * projection at scan speed, zero shuffles, trivially row-parallel at
    * any corpus size.
    *
    * Returns `(doc_id, n_<class>..., text_clean)`.
    */
  /** HTML → text extraction (the first stage of every crawl pipeline):
    * drop script/style blocks wholesale, strip remaining tags, decode
    * the common entities, collapse whitespace. One codegen
    * regexp/replace chain — zero shuffles, and every pattern stays in
    * the RE2-compatible subset (non-greedy `.*?` + `(?s)`, no
    * backreferences/lookaround) so an independent engine replays the
    * exact output. Not a parser: pathological markup (nested CDATA,
    * unclosed script tags) degrades gracefully to over-stripping, the
    * right failure mode for corpus extraction.
    */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    // &amp; decodes LAST (standard extractor order): decoding it first
    // would turn a double-escaped "&amp;lt;" into a literal "<" — wrong
    // output, and a re-strippable fake tag on any second pass.
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020, §2.2): a crawl
    * document is filtered LINE BY LINE before any document-level gate —
    * drop lines that are too short, don't end in terminal punctuation,
    * carry cookie/JavaScript boilerplate, or look like code. Line rules
    * remove the navigation chrome and consent banners that survive HTML
    * stripping, which document-level quality scores ([[gopherQualityStats]])
    * cannot excise without discarding the whole page.
    *
    * A line is KEPT iff, after trimming, it
    *   - has at least `minWords` whitespace-separated words,
    *   - ends with terminal punctuation (`.` `!` `?` `"`),
    *   - contains no `blacklist` phrase (case-insensitive), and
    *   - contains no `{` (the C4 code heuristic).
    * Kept lines are emitted trimmed, re-joined with `\n`.
    *
    * Scale shape: the whole operator is one codegen'd higher-order-function
    * projection (`split` → `filter` lambda of length/`right-char`/`contains`
    * tests → `array_join`) — zero shuffles, no regex engine in the hot
    * path, trivially row-parallel at any corpus size. Every predicate is
    * exact string arithmetic, so an independent engine replays the output
    * byte-for-byte.
    *
    * Returns `(doc_id, n_lines_kept, n_lines_dropped, text_clean)`.
    */
  def cleanLines(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      minWords: Int = 3,
      blacklist: Seq[String] = Seq("javascript", "cookie")): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    val lines = split(textCol, "\n")
    val kept = filter(lines, l => {
      val t = trim(l)
      val wc = size(filter(split(t, " "), w => length(w) > 0))
      val punct = substring(t, -1, 1).isin(".", "!", "?", "\"")
      val clean = blacklist.foldLeft(punct && wc >= minWords) { (acc, b) =>
        acc && !contains(lower(t), lit(b.toLowerCase))
      }
      clean && !contains(t, lit("{"))
    })
    df.select(
      idCol.as("doc_id"),
      size(kept).cast("long").as("n_lines_kept"),
      (size(lines) - size(kept)).cast("long").as("n_lines_dropped"),
      array_join(transform(kept, l => trim(l)), "\n").as("text_clean"))
  }

  def scrubPii(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      patterns: Seq[PiiPattern] = defaultPiiPatterns): DataFrame = {
    require(patterns.nonEmpty, "scrubPii needs at least one pattern")
    var cur: Column = textCol
    val counts = patterns.map { p =>
      val c = regexp_count(cur, lit(p.regex)).cast("long").as(s"n_${p.name}")
      cur = regexp_replace(cur, p.regex, p.token)
      c
    }
    df.select(idCol.as("doc_id") +: counts :+ cur.as("text_clean"): _*)
  }

  /** Top-`topN` most-distinctive terms per document by TF-IDF — the
    * vocabulary/keyword-extraction step of a corpus-analysis pipeline.
    *
    * Scale shape: explode → (doc, term) count (one shuffle, partial-agg) →
    * term document-frequency (second shuffle over the much smaller distinct
    * doc-term set) → join back on term. The per-doc top-N selection goes
    * through the string-keyed bounded heap ([[graft.functions.TopKByStrKey]])
    * like every other selection in the repo: map tasks reduce to ≤topN
    * terms per doc before the shuffle, and no Window sort of the scored
    * term stream appears in the plan.
    *
    * IDF uses the smoothed RATIO form `(N+1)/(df+1)` rather than its log:
    * ranking and value stay in exact IEEE rational arithmetic, bit-equal
    * across engines (a transcendental `ln` can differ in the last ulp
    * between libm implementations, flipping ranks at ties). The classic
    * `ln` form is a one-line swap and order-equivalent per fixed tf.
    */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      topN: Int = 3): DataFrame = {
    val toks = filter(split(lower(textCol), " "), t => length(t) > 0)
    val tf = df.select(idCol.as("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") * (col("n_docs") + 1.0) / (col("df") + 1.0))
    // per-doc selection through the string-keyed bounded heap (score desc,
    // term asc): every map task reduces to ≤topN terms per doc before the
    // shuffle — no Window sort of the scored term stream.
    scored.groupBy("doc_id")
      .agg(graft.functions.TopKByStrKey.topK(col("tfidf"), col("term"), topN).as("tk"))
      .select(col("doc_id"), posexplode(col("tk")))
      .select(col("doc_id"), col("col.id").as("term"),
        round(col("col.score"), 4).as("tfidf"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** BM25 keyword relevance of each document for a literal term set.
    *
    * Scale shape: per-document term frequencies are closed-form array
    * expressions over the token array (`size(filter(...))`) — no explode,
    * no per-token shuffle, the whole TF side runs inside codegen at scan
    * speed. Corpus statistics (N, avgdl, per-term document frequencies)
    * reduce to ONE single-row aggregate that joins back by broadcast, so
    * the only shuffle at 100 TB is that one global agg — and it's a
    * partial-aggregated count, bytes per partition.
    *
    * Per-term contributions are summed in fixed term order (a column sum,
    * not a row agg), keeping results bit-stable across engines and runs.
    */
  def bm25(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    val toks = split(lower(textCol), " ")
    def tf(term: String): Column =
      size(filter(toks, t => t === term)).cast("double")

    val base = df.select(
      Seq(idCol.as("doc_id"), size(toks).cast("double").as("dl")) ++
        terms.map(t => tf(t).as(s"tf_$t")): _*)

    // one row: corpus size, average doc length, per-term doc frequency
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl") +:
        terms.map(t => sum(when(col(s"tf_$t") > 0, 1).otherwise(0)).cast("double").as(s"df_$t")): _*)

    val contribs = terms.map { t =>
      // BM25+-free classic form with the standard +0.5 idf smoothing
      val idf = log((col("n_docs") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5) + 1.0)
      val tfc = col(s"tf_$t")
      idf * (tfc * lit(k1 + 1.0)) /
        (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(contribs.reduce(_ + _), 4).as("bm25"))
  }
}
