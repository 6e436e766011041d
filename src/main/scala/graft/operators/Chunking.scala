package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document chunking for RAG / training-window pipelines: split each
  * document into fixed-size overlapping windows, one output row per chunk.
  *
  * Scale shape: pure codegen row explosion — chunk starts are a
  * `sequence(...)` the optimizer evaluates per row, the chunk text is a
  * `substring`, and there is NO shuffle anywhere: chunking a 100 TB corpus
  * is a single scan-speed map stage whose output feeds the embedding /
  * tokenization stage directly. (Contrast with collect-and-split on a
  * driver, which caps at driver memory.)
  *
  * Chunk grammar (deliberately simple enough to replicate in any engine):
  * step = chunkSize - overlap; chunk i covers characters / tokens
  * `[i*step, i*step + chunkSize)`; chunks are emitted for every start
  * strictly below the document length, and an empty document still emits
  * its single empty chunk (so every document survives the stage — dropping
  * empties is a separate, explicit filter).
  */
object Chunking {

  /** Character-window chunks. Output: one row per chunk with
    * `(chunk_idx, chunk_start, chunk_text)` columns appended to `idCol`.
    */
  def chunkByChars(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got ($chunkSize, $overlap)")
    val step = chunkSize - overlap
    // ceil(len/step) starts, minimum 1 so empty docs emit one empty chunk
    // (Column./ is double division — floor it back to an exact int count)
    val nChunks = greatest(
      floor((length(col("t")) + step - 1) / lit(step)).cast("int"), lit(1))
    df.select(idCol.as("doc_id"), textCol.as("t"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1), i => i * step)),
        col("t"))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("chunk_start"),
        col("t").substr(col("col") + 1, lit(chunkSize)).as("chunk_text"))
  }

  /** Token-window chunks over whitespace tokens; same grammar, token
    * units. Output rows carry the re-joined chunk text and its token count.
    */
  def chunkByTokens(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got ($chunkSize, $overlap)")
    val step = chunkSize - overlap
    val nChunks = greatest(
      floor((size(col("toks")) + step - 1) / lit(step)).cast("int"), lit(1))
    df.select(idCol.as("doc_id"), split(textCol, " ").as("toks"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1), i => i * step)),
        col("toks"))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("chunk_start"),
        array_join(slice(col("toks"), col("col") + 1, lit(chunkSize)), " ").as("chunk_text"),
        least(size(col("toks")) - col("col"), lit(chunkSize))
          .cast("long").as("chunk_tokens"))
  }

  /** Sequence packing (concat-and-chunk): lay every shard's documents
    * end-to-end in `orderCol` order and cut the concatenated token stream
    * into consecutive fixed-`capacity` context windows ("bins") — the
    * packed-dataset construction LLM training pipelines use to avoid
    * padding waste. A document whose tokens straddle a bin boundary is
    * split; the output is the PACK PLAN, one row per (document, bin)
    * segment:
    *
    *   (shard, bin, doc_id, seg_start, seg_len, bin_offset, seg_text)
    *
    * where `seg_start` is the token offset inside the document,
    * `bin_offset` the position inside the bin, and `seg_text` the
    * segment's whitespace-rejoined tokens. Materializing the actual
    * packed windows is then a `groupBy(shard, bin)` + `bin_offset`-ordered
    * concat — deliberately left to the caller, because most consumers
    * (tokenizer shards, tfrecord writers) stream the plan directly.
    *
    * Scale shape: packing is inherently SEQUENTIAL within a shard (each
    * bin boundary depends on every prior document's length), so the shard
    * column is the parallelism lever — hash-shard to O(cluster cores)
    * groups and each shard packs independently. The plan is one shuffle
    * (the per-shard window sort), then pure codegen arithmetic and a
    * `sequence(...)` explosion; nothing is collected and no shard's
    * token stream is ever materialized as one row. At 100 TB with ~10k
    * shards each window partition is ~10 GB of (id, count) pairs — the
    * window state per row is one running long, not the token arrays.
    *
    * Empty documents count as one empty token (`split("", " ") = [""]`),
    * so every document appears in the plan — dropping empties is an
    * explicit upstream filter, same contract as [[chunkByChars]].
    */
  def packSequences(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      shardCol: Column,
      capacity: Int,
      orderCol: Option[Column] = None): DataFrame =
    packTokenArrays(df, idCol, split(textCol, " "), shardCol, capacity,
      orderCol)

  /** [[packSequences]] over a caller-supplied token ARRAY column — the
    * tokenizer-aware form: pack under the same token accounting the
    * training run will see (e.g. a frozen BPE tokenizer's units,
    * [[TokenizerIndex]]), not whitespace words. Same plan, same output
    * contract; `seg_text` rejoins the caller's tokens with spaces.
    */
  def packTokenArrays(
      df: DataFrame,
      idCol: Column,
      toksCol: Column,
      shardCol: Column,
      capacity: Int,
      orderCol: Option[Column] = None): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val c = lit(capacity.toLong)
    val ord = orderCol.getOrElse(idCol)
    val w = Window.partitionBy(col("shard")).orderBy(col("ord"))
    df.select(shardCol.as("shard"), idCol.as("doc_id"), ord.as("ord"),
        toksCol.as("toks"))
      .withColumn("tok", size(col("toks")).cast("long"))
      // zero-token docs contribute nothing to the stream and would turn
      // the bin `sequence` descending (Spark infers step -1); they are
      // excluded from the plan. packSequences never produces one
      // (split("", " ") = [""] counts as one empty token).
      .filter(col("tok") > 0)
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("start", col("cum") - col("tok"))
      // first/last bin this document touches: its tokens occupy stream
      // positions [start, cum)
      .select(col("shard"), col("doc_id"), col("toks"), col("tok"), col("start"),
        explode(sequence(floor(col("start") / c), floor((col("cum") - 1) / c)))
          .as("bin"))
      .withColumn("seg_start", greatest(lit(0L), col("bin") * c - col("start")))
      .withColumn("seg_len",
        least(col("tok"), (col("bin") + 1) * c - col("start")) - col("seg_start"))
      .select(
        col("shard"),
        col("bin"),
        col("doc_id"),
        col("seg_start"),
        col("seg_len"),
        (col("start") + col("seg_start") - col("bin") * c).as("bin_offset"),
        array_join(slice(col("toks"), col("seg_start") + 1, col("seg_len")), " ")
          .as("seg_text"))
  }

  /** Content-defined-chunking dedup statistics: chunk every document with
    * the rolling-hash boundary rule ([[graft.functions.CdcChunks]]) and
    * measure how much of the corpus is REDUNDANT at chunk granularity —
    * the number a content-addressed store (or a CDC-based dedup pass over
    * crawl snapshots) would actually save. Because boundaries are
    * content-defined, the stats survive insertions/edits: a one-word edit
    * re-chunks one chunk, and every other chunk still counts as a
    * duplicate of the previous snapshot's.
    *
    * Returns ONE row:
    * `(n_chunks, n_distinct_chunks, total_chars, distinct_chars,
    * dedup_ratio)` with `dedup_ratio = distinct_chars / total_chars`
    * (6dp) — the fraction of corpus characters a content-addressed store
    * must keep.
    *
    * Scale shape: chunking is the O(n) codegen expression at scan speed;
    * the ONLY shuffle groups by chunk content, where partial aggregation
    * collapses every repeated chunk map-side (a million-copy boilerplate
    * chunk crosses the wire once per task, like [[TextDedup.dedupLines]]'
    * election); the final stats agg reduces ≤one row per distinct chunk
    * to a single row. At 100 TB swap the chunk-string grouping key for
    * `xxhash64(chunk)` to bound shuffle-key bytes — kept as the string
    * here so the oracle compare is collision-free.
    */
  def cdcDedupStats(
      df: DataFrame,
      textCol: Column,
      window: Int = 8,
      divisor: Int = 64): DataFrame = {
    df.select(explode(graft.functions.SketchFunctions.cdcChunks(
        textCol, window, divisor)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("cnt"))
      .agg(
        sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("cnt") * length(col("c")).cast("long")).as("total_chars"),
        sum(length(col("c")).cast("long")).as("distinct_chars"))
      .select(col("n_chunks"), col("n_distinct_chunks"), col("total_chars"),
        col("distinct_chars"),
        round(col("distinct_chars").cast("double") / col("total_chars"), 6)
          .as("dedup_ratio"))
  }
}
