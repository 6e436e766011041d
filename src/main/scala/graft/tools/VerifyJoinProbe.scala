package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextDedup}

/** Dev probe: step-by-step wall times of the measured verify-join path
  * (MeasuredJoin.attachPairPayloads) for the minhash and blocked-cosine
  * families at bench scale — isolates which stage of the r13 rewrite
  * pays.
  */
object VerifyJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm-up
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // ---- minhash family internals
    import graft.functions.SketchFunctions
    val shingled = docs.select(col("doc_id"),
      SketchFunctions.wordNgramHashes(lower(col("text")), 2, distinct = true).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", SketchFunctions.minhashSignature(col("sh"), 63, 42L))
    val banded = shingled.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(20)),
        j => xxhash64(slice(col("sig"), j * 3 + 1, lit(3))))))
      .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_hash"))
    val candRaw = TextDedup.bucketPairs(banded, col("band_idx"), col("band_hash"), col("doc_id"))
    val cand = time("cand localCheckpoint (pair pipeline)") { candRaw.localCheckpoint() }
    val n = time("cand count") { cand.count() }
    println(s"[probe] nPairs=$n")
    val ids = cand.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
    val sets = shingled.select(col("doc_id"), col("sh"))
    val filtered = time("semi-filter sets + ckpt") {
      val f = sets.join(broadcast(ids), Seq("doc_id"), "left_semi").localCheckpoint()
      f.count(); f
    }
    println(s"[probe] filtered (rows,bytes)=${graft.operators.MeasuredJoin.materializeAndMeasure(filtered)}")
    time("verify join chain (broadcast x2) count") {
      cand.join(broadcast(filtered.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))), "id_a")
        .join(broadcast(filtered.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))), "id_b")
        .withColumn("jac",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
        .filter(col("jac") >= 0.5).count()
    }
    time("full minhashNearDupPairs (current impl)") {
      TextDedup.minhashNearDupPairs(docs, col("doc_id"), col("text"), threshold = 0.5).count()
    }

    // ---- cosine family, step by step
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val centroids = time("kmeans train") {
      graft.operators.KMeans.train(base, col("v"), 8, 3)
    }
    val probed = base.select(col("id"),
      explode(graft.operators.KMeans.probeCells(col("v"), centroids, 2)).as("cell"))
    val ccandRaw = TextDedup.bucketPairs(probed, lit("all"), col("cell"), col("id"), 10000)
    val ccand = time("cosine cand ckpt") { ccandRaw.localCheckpoint() }
    val cn = time("cosine cand count") { ccand.count() }
    println(s"[probe] cosine nPairs=$cn")
    val cids = ccand.select(explode(array(col("id_a"), col("id_b"))).as("doc_id")).distinct()
    val vecs = base.select(col("id").as("doc_id"), col("v"))
    val fv = time("cosine semi-filter + ckpt") {
      val f = vecs.join(broadcast(cids), Seq("doc_id"), "left_semi").localCheckpoint()
      f.count(); f
    }
    println(s"[probe] cosine filtered (rows,bytes)=${graft.operators.MeasuredJoin.materializeAndMeasure(fv)}")
    time("cosine verify chain (broadcast x2) count") {
      ccand.join(broadcast(fv.select(col("doc_id").as("id_a"), col("v").as("va"))), "id_a")
        .join(broadcast(fv.select(col("doc_id").as("id_b"), col("v").as("vb"))), "id_b")
        .withColumn("score_raw", graft.functions.GraftFunctions.vecCosine(col("va"), col("vb")))
        .filter(col("score_raw") > 0.3).count()
    }
    def mergeChainFrom(src: org.apache.spark.sql.DataFrame) = src.hint("merge")
      .join(vecs.select(col("doc_id").as("id_a"), col("v").as("va")), "id_a")
      .hint("merge").join(vecs.select(col("doc_id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("score_raw", graft.functions.GraftFunctions.vecCosine(col("va"), col("vb")))
      .filter(col("score_raw") > 0.3)
    val mSnap = mergeChainFrom(ccand)
    time("cosine verify merge-from-SNAPSHOT noop") {
      mSnap.write.format("noop").mode("overwrite").save()
    }
    println("[probe] merge-from-snapshot FINAL plan:\n" +
      mSnap.queryExecution.executedPlan.toString.take(5000))
    val mLive = mergeChainFrom(ccandRaw)
    time("cosine verify merge-from-LIVE noop") {
      mLive.write.format("noop").mode("overwrite").save()
    }
    time("full cosineNearDupAuto (current impl)") {
      Dedup.cosineNearDupAuto(emb, col("vec_id"), col("embedding"),
        threshold = 0.3, nlist = 8, nprobe = 2, iters = 3)._1.count()
    }
    spark.stop()
  }
}
