package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{FilterCompiler, TextDedup}

/** Dev probe: where do q101 (curation over groups) and q104 (cross-corpus
  * admission) spend their extra seconds after the measured-join rewrite?
  */
object GroupsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-ckpt-").toString)
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // q99 baseline
    time("q99 groups full") {
      TextDedup.minhashNearDupGroups(docs, col("doc_id"), col("text"),
        threshold = 0.5, reliable = true).count()
    }
    // q101 decomposition
    val groups = time("q101 groups construction (eager part)") {
      TextDedup.minhashNearDupGroups(docs, col("doc_id"), col("text"),
        threshold = 0.5, reliable = true)
    }
    val canon = groups.filter(col("is_canonical")).select(col("id").as("doc_id"))
    time("q101 canon count") { canon.count() }
    time("q101 full (gates + semi join)") {
      docs
        .filter(FilterCompiler.compile("""{"lang": {"$in": ["en", "de", "es"]}}"""))
        .filter(graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.99)
        .join(canon, Seq("doc_id"), "left_semi")
        .select("doc_id", "lang", "n_chars").count()
    }
    time("q101 gates only (no join)") {
      docs
        .filter(FilterCompiler.compile("""{"lang": {"$in": ["en", "de", "es"]}}"""))
        .filter(graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.99)
        .select("doc_id", "lang", "n_chars").count()
    }
    // q104 decomposition (mirrors crossAdmitCore internals)
    import graft.functions.SketchFunctions
    val incoming = docs.filter(col("doc_id") % 2 === 1)
    val existing = docs.filter(col("doc_id") % 2 === 0)
    def sets(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
      SketchFunctions.wordNgramHashes(lower(col("text")), 2, distinct = true).as("sh"))
      .filter(size(col("sh")) > 0)
    def bands(sh: org.apache.spark.sql.DataFrame) = sh
      .withColumn("sig", SketchFunctions.minhashSignature(col("sh"), 63, 42L))
      .select(col("doc_id"), posexplode(transform(sequence(lit(0), lit(20)),
        j => xxhash64(slice(col("sig"), j * 3 + 1, lit(3))))))
      .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_hash"))
    val inS = sets(incoming); val exS = sets(existing)
    val cand0 = TextDedup.bucketCrossPairs(
      bands(inS).withColumn("side", lit("in"))
        .unionByName(bands(exS).withColumn("side", lit("ex"))),
      col("band_idx"), col("band_hash"), col("doc_id"), col("side"))
    val cand = time("q104 cand ckpt") { cand0.localCheckpoint() }
    val ids = time("q104 ids ckpt") {
      cand.select(explode(array(col("in_id"), col("ex_id"))).as("doc_id"))
        .distinct().localCheckpoint()
    }
    println("[probe] q104 nIds=" + time("q104 ids count") { ids.count() })
    val tagged = time("q104 tagged semi ckpt") {
      inS.select(col("doc_id"), col("sh"), lit("a").as("_role"))
        .unionByName(exS.select(col("doc_id"), col("sh"), lit("b").as("_role")))
        .join(broadcast(ids), Seq("doc_id"), "left_semi").localCheckpoint()
    }
    time("q104 final (joins + agg + attach)") {
      val fA = tagged.filter(col("_role") === "a").drop("_role")
      val fB = tagged.filter(col("_role") === "b").drop("_role")
      val m = cand
        .join(broadcast(fA.select(col("doc_id").as("in_id"), col("sh").as("sh_a"))), "in_id")
        .join(broadcast(fB.select(col("doc_id").as("ex_id"), col("sh").as("sh_b"))), "ex_id")
        .withColumn("jac",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
        .filter(col("jac") >= 0.5)
        .groupBy("in_id").agg(min(col("ex_id")).as("matched_id"))
      incoming.select(col("doc_id").as("id"))
        .join(m, col("id") === col("in_id"), "left").count()
    }
    time("q104 crossCorpusNearDup full") {
      TextDedup.crossCorpusNearDup(incoming, existing,
        col("doc_id"), col("text"), threshold = 0.5).count()
    }
    spark.stop()
  }
}
