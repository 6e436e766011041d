package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFromText(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
    "doc_id", "text").cache()

  test("mediaFromText: opaque binary payload + modality tag per row") {
    val rows = media.collect()
    assert(rows.length == 500)
    assert(rows.map(_.modality).toSet == Set("image", "audio", "video"))
    assert(rows.forall(_.payload.nonEmpty))
  }

  test("decode: deterministic metadata, plausible ranges, stable across runs") {
    val a = Multimodal.decode(media).collect().sortBy(_.media_id)
    val b = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq) // stub codec is deterministic
    assert(a.forall(m => m.width >= 320 && m.width <= 1920))
    assert(a.forall(m => m.height >= 240 && m.height <= 1080))
    assert(a.filter(_.modality == "image").forall(_.n_frames == 1))
    assert(a.filter(_.modality == "video").exists(_.n_frames > 1))
    // n_bytes round-trips the payload size
    val sizes = media.collect().map(r => r.media_id -> r.payload.length).toMap
    assert(a.forall(m => m.n_bytes == sizes(m.media_id)))
  }

  test("sampleFrames: one row per stride-sampled frame") {
    val decoded = Multimodal.decode(media)
    val frames = Multimodal.sampleFrames(decoded, stride = 10)
    val perItem = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = decoded.collect()
      .map(m => m.media_id -> ((m.n_frames + 9) / 10).toLong).toMap
    assert(perItem == expected)
  }

  test("resize: fits the box, preserves aspect ratio, never upscales") {
    val decoded = Multimodal.decode(media)
    val resized = Multimodal.resize(decoded, maxW = 640, maxH = 480)
      .collect().map(m => m.media_id -> m).toMap
    val orig = decoded.collect()
    assert(orig.nonEmpty)
    orig.foreach { m =>
      val r = resized(m.media_id)
      assert(r.width <= 640 && r.height <= 480)
      assert(r.width <= m.width && r.height <= m.height) // no upscale
      // aspect ratio preserved within rounding
      val ar = m.width.toDouble / m.height
      val arR = r.width.toDouble / r.height
      assert(math.abs(ar - arR) / ar < 0.02, s"aspect drifted: $m -> $r")
      // non-dimension fields untouched
      assert(r.n_frames == m.n_frames && r.checksum == m.checksum)
    }
  }

  test("extractFeatures: fixed-dim, deterministic, partition-batched") {
    val f = Multimodal.extractFeatures(media, dim = 16, batchSize = 32).collect()
    assert(f.length == 500)
    assert(f.forall(_.feature.length == 16))
    assert(f.forall(_.feature.forall(x => x >= -1f && x <= 1f)))
    val again = Multimodal.extractFeatures(media, dim = 16, batchSize = 7).collect()
    // batch size must not affect values (pure per-row stub)
    assert(f.sortBy(_.media_id).map(_.feature.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.feature.toSeq).toSeq)
  }
}
