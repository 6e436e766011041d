package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** One-off measurement for BASELINE.md: shuffle bytes written by
  * chunk-store admission when the membership join is keyed by full chunk
  * text (the round-7 shape) vs by `(xxhash64(c), octet_length(c))` (the
  * round-8 shape). Builds the q117 store (even half of `documents`) at
  * the given SF dir, then runs both join shapes over the same stored
  * table and prints one JSON line with total shuffle bytes each.
  */
object ChunkShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.GraftSession.builder(32)
      .master("local[32]").config("spark.ui.enabled", "false")
      // at 100 TB the stored distinct-chunk table is corpus-scale — far
      // past any broadcast threshold. Model that join path (sort-merge,
      // both sides shuffled) so the byte comparison reflects scale, not
      // the sf0.1 broadcast shortcut.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bytes = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val page = concat(col("text"),
      lit(" meanwhile the standard disclaimer paragraph follows and it " +
        "is identical on every page of this crawl so content defined " +
        "chunks align and deduplicate across documents"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-shufprobe-").toString
    graft.operators.ChunkStore.save(
      docs.filter(col("doc_id") % 2 === 0).select(page.as("t")),
      col("t"), tmp, window = 8, divisor = 32)
    val store = graft.operators.ChunkStore.open(spark, tmp)
    val odd = docs.filter(col("doc_id") % 2 === 1)

    def measure(f: => Unit): Long = {
      bytes.set(0); f
      // listener events are async — give the bus a moment to drain
      Thread.sleep(2000)
      bytes.get
    }

    // round-7 shape: membership keyed by the chunk's content string
    val stored = spark.read.parquet(s"$tmp/chunks")
    def textShape = {
      val known = stored.select(col("c")).distinct().withColumn("known", lit(true))
      odd.select(col("doc_id"),
          explode(graft.functions.SketchFunctions.cdcChunks(page, 8, 32)).as("c"))
        .withColumn("clen", octet_length(col("c")).cast("long"))
        .join(known, Seq("c"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("known").isNull, col("clen")).otherwise(0L)).as("new_bytes"))
    }
    // count() would let Catalyst eliminate the outer join (distinct
    // stored keys -> at most one match -> cardinality-preserving) and
    // measure the same degenerate plan twice; the noop sink evaluates
    // the full admission output.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val textKeyed = measure { run(textShape) }
    // round-8 shape: membership keyed by (xxhash64, octet length)
    val hashKeyed = measure { run(store.admit(odd, col("doc_id"), page)) }

    println(s"""{"sf_dir": "$sfDir", "admission_shuffle_bytes_text_keyed": $textKeyed, "admission_shuffle_bytes_hash_keyed": $hashKeyed}""")
    spark.stop()
  }
}
