package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, TokenizerIndex}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bracket and tokens round-trip") {
    assert(Bpe.bracket("abc") == "[a][b][c]")
    assert(Bpe.tokens("[a][bc][d]").toSeq == Seq("a", "bc", "d"))
    assert(Bpe.tokens("").isEmpty)
  }

  test("trainMerges learns the hand-computed greedy sequence") {
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3
    // Classic Sennrich example: first merges are (e,s) 9, (es,t) 9, ...
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val merges = Bpe.trainMerges(wf, numMerges = 4, capWords = 10)
    // pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, (w,e)=8...
    // ties break on "l r" ASC: "e s" < "s t" -> (e,s) first
    assert(merges.head == ("e", "s"))
    // round 2: (es,t)=9 is the unique max
    assert(merges(1) == ("es", "t"))
    // round 3: es/est merges removed newest's (w,e); max is now the
    // (l,o)=7 / (o,w)=7 tie -> "l o" ASC wins
    assert(merges(2) == ("l", "o"))
    // round 4: (lo,w)=7 unique
    assert(merges(3) == ("lo", "w"))
  }

  test("trainMerges stops when every word is fully merged") {
    val wf = Seq(("ab", 3L)).toDF("word", "cnt")
    val merges = Bpe.trainMerges(wf, numMerges = 10, capWords = 10)
    // one merge collapses "ab"; no pairs remain
    assert(merges == Seq(("a", "b")))
  }

  test("overlapping pair counting and left-to-right merge application") {
    val wf = Seq(("aaa", 1L)).toDF("word", "cnt")
    val merges = Bpe.trainMerges(wf, numMerges = 3, capWords = 10)
    // "aaa": (a,a) counted twice; merge left-to-right -> [aa][a]; then
    // (aa,a) -> [aaa]; then exhausted
    assert(merges == Seq(("a", "a"), ("aa", "a")))
  }

  test("encode applies merges in rank order and never crosses boundaries") {
    val df = Seq((1L, "ab ab! cab")).toDF("id", "text")
    val enc = df.select(
      Bpe.encode(col("text"), Seq(("a", "b"))).as("e")).head.getString(0)
    // space and '!' are merge barriers; 'c' prefix does not block [a][b]
    assert(enc == "[ab] [ab]! [c][ab]")
    val cnt = df.select(Bpe.tokenCount(
      Bpe.encode(col("text"), Seq(("a", "b")))).as("n")).head.getLong(0)
    assert(cnt == 4L) // [ab], [ab], [c], [ab]
  }

  test("multi-char merge cannot false-match inside a longer token") {
    // after (a,b)->ab exists, pattern [b][c] must not match inside [ab][c]
    val df = Seq((1L, "abc bc")).toDF("id", "text")
    val enc = df.select(
      Bpe.encode(col("text"), Seq(("a", "b"), ("b", "c"))).as("e"))
      .head.getString(0)
    // "abc": (a,b) merges first -> [ab][c]; (b,c) finds no [b][c] there
    assert(enc == "[ab][c] [bc]")
  }

  test("tokenizer index round-trips merges and params through disk") {
    val docs = Seq(
      (0L, "low low low lower newest"),
      (2L, "newest newest widest low"),
      (4L, "widest newest lower low")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe-idx-").toString
    val saved = TokenizerIndex.save(docs, col("text"), dir,
      numMerges = 6, capWords = 100)
    val opened = TokenizerIndex.open(spark, dir)
    assert(opened.merges == saved.merges)
    assert(opened.params == saved.params)
    // frozen encode on an unseen batch equals direct encode with the merges
    val batch = Seq((1L, "lowest newest")).toDF("doc_id", "text")
    val viaIndex = opened.encodeDocs(batch, col("doc_id"), col("text"))
      .select("bpe_tokens").head.getLong(0)
    val direct = batch.select(Bpe.tokenCount(
      Bpe.encode(col("text"), saved.merges)).as("n")).head.getLong(0)
    assert(viaIndex == direct)
  }

  test("encodeDocs output contract: id, counts, prefix") {
    val docs = Seq((7L, "aa aa aa")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe-idx2-").toString
    val tok = TokenizerIndex.save(docs, col("text"), dir,
      numMerges = 1, capWords = 10)
    assert(tok.merges == Seq(("a", "a")))
    val row = tok.encodeDocs(docs, col("doc_id"), col("text")).head
    assert(row.getAs[Long]("id") == 7L)
    assert(row.getAs[Long]("bpe_tokens") == 3L)   // three [aa] tokens
    assert(row.getAs[Long]("base_chars") == 6L)
    assert(row.getAs[String]("encoded_prefix") == "[aa] [aa] [aa]")
  }
}
