package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016) — the
  * vocabulary a training pipeline actually ships: token counts under a
  * learned subword vocabulary drive packing budgets (`Chunking`), mixing
  * weights (`Sampling`), and cost estimates, so the tokenizer has to be
  * trainable ON the corpus and replayable by any engine.
  *
  * Scale shape — the classic decomposition that makes BPE training
  * corpus-size-INDEPENDENT after one scan:
  *
  *  1. [[wordFrequencies]]: ONE partial-aggregated `groupBy(word)` over
  *     the corpus. Map tasks collapse repeated words before the shuffle,
  *     so the shuffle is bounded by distinct-vocabulary size, not corpus
  *     tokens — at 100 TB the word-frequency table is still MBs.
  *  2. [[trainMerges]]: greedy merge learning runs driver-side over the
  *     capped word-frequency dict (`capWords` rows collected — bounded by
  *     construction, the same posture as `KMeans`' k centroids). Every
  *     BPE implementation trains on the word-freq dict, not the token
  *     stream; the iterations never touch the corpus again.
  *  3. [[encode]]: corpus-wide encoding is a scan-local chain of literal
  *     string replaces (one pass per learned merge) inside whole-stage
  *     codegen — no shuffle, no UDF, no driver involvement. A production
  *     encoder would fuse the passes into a single-pass rank-priority
  *     matcher; the chain keeps the arithmetic exactly replayable by an
  *     independent SQL engine (the merge ORDER is the semantics — BPE
  *     applies merges by learned rank, so the k-pass form is the honest
  *     distributed formulation, k being vocabulary budget, not data).
  *
  * Representation: every `[a-z0-9]` character of the lowercased text is
  * wrapped in brackets (`"the cat"` → `"[t][h][e] [c][a][t]"`); a merge
  * `(l, r)` rewrites `"[l][r]"` → `"[lr]"`. Brackets make token
  * boundaries explicit so a literal (non-regex) replace can never match
  * across token or word boundaries, and adjacent merge sites never share
  * a delimiter (the flaw of space-separated forms, where replacing
  * `" a a "` consumes the boundary the next match needs). Non-alnum
  * characters stay bare between brackets and act as merge barriers.
  *
  * Determinism contract (what the DuckDB oracle replays stage by stage):
  * pair counting is over ALL adjacent token pairs (overlapping — `aaa`
  * counts `(a,a)` twice) weighted by word frequency; the winner is
  * `(count DESC, "l r" ASC)`; merge application is left-to-right
  * non-overlapping (Java `String.replace` == SQL `replace`).
  */
object Bpe {

  /** Corpus word frequencies: the ONE corpus scan of BPE training.
    * Words are maximal `[a-z0-9]+` runs of the lowercased text; the
    * partial agg bounds the shuffle by distinct vocabulary. */
  def wordFrequencies(docs: DataFrame, textCol: Column): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(textCol),
        lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** `"abc"` → `"[a][b][c]"`. */
  private[graft] def bracket(word: String): String =
    word.map(c => s"[$c]").mkString

  /** Parse a bracketed representation back to its token list. Dict words
    * are pure `[a-z0-9]+`, so every token is adjacent to the next. */
  private[graft] def tokens(repr: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < repr.length) {
      val close = repr.indexOf(']', i)
      out += repr.substring(i + 1, close)
      i = close + 1
    }
    out.toArray
  }

  /** Greedy BPE merge learning over the word-frequency dict. Driver-side
    * on the `capWords` most frequent words (`cnt DESC, word ASC` — the
    * deterministic cap) — bounded by construction, never corpus-sized.
    * Returns merges in learned order; stops early only when no adjacent
    * pair remains (every word fully merged). */
  def trainMerges(
      wordFreq: DataFrame,
      numMerges: Int,
      capWords: Int = 256): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(capWords > 0, s"capWords must be positive, got $capWords")
    val dict = wordFreq
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(capWords)
      .collect()
      .map(r => (bracket(r.getString(0)), r.getLong(1)))
    var reprs = dict
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((repr, cnt) <- reprs) {
        val ts = tokens(repr)
        var i = 0
        while (i < ts.length - 1) {
          val k = (ts(i), ts(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (l, r) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, s"$a $b") }._1
        reprs = reprs.map { case (repr, cnt) =>
          (repr.replace(s"[$l][$r]", s"[$l$r]"), cnt)
        }
        merges += ((l, r))
      }
    }
    merges.toSeq
  }

  /** Bracketed representation of a full text column: `[a-z0-9]` chars
    * wrapped, everything else left bare (word/punctuation boundaries are
    * merge barriers by construction). */
  def bracketed(textCol: Column): Column =
    regexp_replace(lower(textCol), "([a-z0-9])", "[$1]")

  /** Encode a text column under learned merges: the k-pass literal
    * replace chain, entirely scan-local codegen. */
  def encode(textCol: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(bracketed(textCol)) { case (c, (l, r)) =>
      call_function("replace", c, lit(s"[$l][$r]"), lit(s"[$l$r]"))
    }

  /** Token count of an encoded string — one `[` per token. */
  def tokenCount(encoded: Column): Column =
    (length(encoded) -
      length(call_function("replace", encoded, lit("["), lit(""))))
      .cast("long")
}

/** Persisted BPE tokenizer — the train-once / encode-forever lifecycle
  * ([[LmIndex]]'s posture, fourth instance after the dedup index, LM
  * index, and chunk store). A tokenizer only produces comparable token
  * counts when every batch is encoded under the SAME frozen merge table:
  * retraining per batch silently shifts the count scale (and any packing
  * or budget decision made from it). The merge table IS the model:
  *
  * ```
  * dir/merges/         (rank, l, r)   — ≤ numMerges rows, learned order
  * dir/metadata.json   num_merges / cap_words
  * ```
  *
  * `open` restores the merge ORDER (rank) because BPE semantics are
  * rank-ordered application — a reordered table is a different tokenizer.
  * Scoring a batch reads ≤ numMerges rows, never the training corpus.
  */
object TokenizerIndex {

  private[graft] final case class Params(numMerges: Int, capWords: Int)

  private val MetaFile = "metadata.json"
  private[graft] val FormatVersion = 1

  /** Train on `docs` and freeze the tokenizer at `dir`. */
  def save(
      docs: DataFrame,
      textCol: Column,
      dir: String,
      numMerges: Int = 24,
      capWords: Int = 256): DiskTokenizer = {
    val spark = docs.sparkSession
    val merges = Bpe.trainMerges(
      Bpe.wordFrequencies(docs, textCol), numMerges, capWords)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      merges.zipWithIndex.map { case ((l, r), i) =>
        org.apache.spark.sql.Row(i, l, r)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("l",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("r",
          org.apache.spark.sql.types.StringType, nullable = false))))
      .write.mode("overwrite").parquet(s"$dir/merges")
    writeMeta(spark, dir, Params(numMerges, capWords))
    new DiskTokenizer(dir, Params(numMerges, capWords), merges)
  }

  def open(spark: SparkSession, dir: String): DiskTokenizer = {
    val p = readMeta(spark, dir)
    val merges = spark.read.parquet(s"$dir/merges")
      .orderBy(col("rank").asc)
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
    new DiskTokenizer(dir, p, merges)
  }

  // metadata is written LAST (after merges/) — the layout's completeness
  // marker per the LayoutMeta contract
  private def writeMeta(spark: SparkSession, dir: String, p: Params): Unit =
    LayoutMeta.write(spark, dir, MetaFile, FormatVersion,
      s""""num_merges": ${p.numMerges}, "cap_words": ${p.capWords}""")

  private def readMeta(spark: SparkSession, dir: String): Params = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val v = LayoutMeta.read(spark, dir, MetaFile, FormatVersion, "tokenizer")
    Params((v \ "num_merges").extract[Int], (v \ "cap_words").extract[Int])
  }
}

/** A frozen tokenizer: the learned merge table in rank order. */
final class DiskTokenizer(
    val dir: String,
    private[graft] val params: TokenizerIndex.Params,
    val merges: Seq[(String, String)]) {

  /** Encode a text column under the frozen merges (scan-local chain). */
  def encode(textCol: Column): Column = Bpe.encode(textCol, merges)

  /** Per-document token accounting for a batch: `(id, bpe_tokens,
    * base_chars, encoded_prefix)` — the columns a packing/budget stage
    * consumes, plus a prefix of the encoding itself for exact replay. */
  def encodeDocs(
      batch: DataFrame,
      idCol: Column,
      textCol: Column,
      prefixLen: Int = 240): DataFrame =
    batch
      .select(idCol.as("id"), encode(textCol).as("__graft_bpe_enc"),
        length(regexp_replace(lower(textCol), "[^a-z0-9]", ""))
          .cast("long").as("base_chars"))
      .select(col("id"),
        Bpe.tokenCount(col("__graft_bpe_enc")).as("bpe_tokens"),
        col("base_chars"),
        substring(col("__graft_bpe_enc"), 1, prefixLen).as("encoded_prefix"))
}
