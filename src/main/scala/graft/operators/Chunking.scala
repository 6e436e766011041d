package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
