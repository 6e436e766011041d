package graft

import java.io.ByteArrayInputStream

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{DecodedMeta, MediaRow}

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
    "doc_id").cache()

  test("syntheticMedia: real container payloads, sniffed not declared") {
    val rows = media.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.payload.nonEmpty))
    val formats = rows.map(r => Multimodal.decodeMeta(r.media_id, r.payload).format)
    assert(formats.toSet == Set("png", "bmp", "wav", "mp4"))
  }

  test("generated PNGs are real: the JDK's own ImageIO decodes them with matching dims") {
    for (id <- Seq(0L, 4L, 8L, 100L, 496L)) {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(Multimodal.pngBytes(id)))
      assert(img != null, s"ImageIO rejected generated PNG for id=$id")
      assert(img.getWidth == Multimodal.fixtureWidth(id))
      assert(img.getHeight == Multimodal.fixtureHeight(id))
      val m = Multimodal.decodeMeta(id, Multimodal.pngBytes(id))
      assert(m.format == "png" && m.width == img.getWidth && m.height == img.getHeight)
    }
  }

  test("generated BMPs are real: ImageIO decodes them with matching dims") {
    for (id <- Seq(1L, 5L, 101L, 497L)) {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(Multimodal.bmpBytes(id)))
      assert(img != null, s"ImageIO rejected generated BMP for id=$id")
      assert(img.getWidth == Multimodal.fixtureWidth(id))
      assert(img.getHeight == Multimodal.fixtureHeight(id))
      val m = Multimodal.decodeMeta(id, Multimodal.bmpBytes(id))
      assert(m.format == "bmp" && m.width == img.getWidth && m.height == img.getHeight)
    }
  }

  test("generated WAVs are real: javax.sound parses rate/channels/frames identically") {
    for (id <- Seq(2L, 6L, 102L, 498L)) {
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new ByteArrayInputStream(Multimodal.wavBytes(id)))
      val m = Multimodal.decodeMeta(id, Multimodal.wavBytes(id))
      assert(m.format == "wav")
      assert(m.sample_rate == fmt.getFormat.getSampleRate.toInt)
      assert(m.channels == fmt.getFormat.getChannels)
      assert(m.n_frames == fmt.getFrameLength)
      assert(m.n_frames == Multimodal.fixtureSamples(id))
    }
  }

  test("decodeMeta: JPEG and GIF written by the JDK's own encoders parse correctly") {
    import java.awt.image.BufferedImage
    for ((w, h) <- Seq((33, 21), (640, 480), (1, 1))) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (fmt <- Seq("jpg", "gif")) {
        val bos = new java.io.ByteArrayOutputStream()
        assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
        val m = Multimodal.decodeMeta(1L, bos.toByteArray)
        val expect = if (fmt == "jpg") "jpeg" else "gif"
        assert(m.format == expect, s"$fmt sniffed as ${m.format}")
        assert(m.width == w && m.height == h, s"$fmt ${w}x$h parsed as ${m.width}x${m.height}")
        assert(m.n_frames == 1)
      }
    }
    // truncated JPEG (header cut before any SOF) degrades to unknown
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB), "jpg", bos)
    assert(Multimodal.decodeMeta(1L, bos.toByteArray.take(8)).format == "unknown")
  }

  test("decodeMeta: BMP legacy BITMAPCOREHEADER (12-byte DIB, 16-bit dims)") {
    // hand-built minimal COREHEADER bmp: 14 file header + 12 DIB
    val b = new Array[Byte](26)
    b(0) = 'B'; b(1) = 'M'
    b(14) = 12 // DIB size
    b(18) = 64 // width LE16
    b(20) = 48 // height LE16
    b(24) = 1 // planes
    val m = Multimodal.decodeMeta(7L, b)
    assert(m.format == "bmp" && m.width == 64 && m.height == 48)
  }

  test("decodeMeta: malformed payloads degrade to unknown, never throw") {
    val cases = Seq(
      Array.empty[Byte],
      Array[Byte](1, 2, 3),
      "RIFFxxxxWAVE".getBytes, // RIFF but no chunks
      "not a container at all, just text".getBytes,
      Multimodal.pngBytes(0L).take(10), // truncated PNG
      Multimodal.wavBytes(2L).take(20)) // truncated WAV
    cases.foreach { b =>
      val m = Multimodal.decodeMeta(1L, b)
      assert(m.format == "unknown" && m.width == 0 && m.n_frames == 0)
      assert(m.n_bytes == b.length)
    }
    // WAV with a declared chunk size past the buffer must not crash
    val lying = Multimodal.wavBytes(2L)
    lying(40) = 0x7f.toByte; lying(41) = 0x7f.toByte
    lying(42) = 0x7f.toByte; lying(43) = 0x7f.toByte
    assert(Multimodal.decodeMeta(1L, lying).format == "unknown")
  }

  test("decodeMeta: crafted chunk sizes near 2^31 must not wrap the bounds check") {
    // fmt chunk claims size 0x7ffffffc: off + 8 + size wraps negative in
    // 32-bit arithmetic, slipping past `> b.length` — long arithmetic must
    // reject it (degrade to unknown), not walk to a negative offset
    for (sz <- Seq(0x7ffffffcL, 0x7fffffffL, 0xfffffff0L)) {
      val b = Multimodal.wavBytes(2L)
      b(16) = sz.toByte; b(17) = (sz >>> 8).toByte
      b(18) = (sz >>> 16).toByte; b(19) = (sz >>> 24).toByte
      val m = Multimodal.decodeMeta(1L, b) // must not throw
      assert(m.format == "unknown", s"size 0x${sz.toHexString} parsed as ${m.format}")
    }
  }

  test("WAV blockAlign=1: metadata decodes (8-bit mono), sample reader skips it") {
    // metadata extraction never reads samples, so 8-bit mono PCM keeps its
    // header metadata; the 16-bit sample reader would read one byte past
    // the data chunk on the last frame, so feature extraction must skip it
    val b = Multimodal.wavBytes(2L)
    val ref = Multimodal.decodeMeta(1L, b) // blockAlign=2 baseline
    b(32) = 1; b(33) = 0 // blockAlign LE16 = 1
    val m = Multimodal.decodeMeta(1L, b)
    assert(m.format == "wav" && m.sample_rate == ref.sample_rate &&
      m.channels == ref.channels && m.n_frames == 2 * ref.n_frames,
      s"8-bit WAV lost metadata: $m vs baseline $ref")
    assert(Multimodal.extractAudioFeatures(
      spark.createDataset(Seq(Multimodal.MediaRow(1L, b)))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]))
      .collect().isEmpty)
  }

  test("decodeMeta: JPEG 0xFF fill bytes between segments are skipped") {
    // build a real JPEG via the JDK encoder, then inject legal padding
    // (extra 0xFF bytes) before the first segment after SOI
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      new java.awt.image.BufferedImage(33, 21, java.awt.image.BufferedImage.TYPE_INT_RGB),
      "jpg", bos)
    val orig = bos.toByteArray
    val padded = new java.io.ByteArrayOutputStream()
    padded.write(orig, 0, 2) // SOI
    padded.write(Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte)) // fill bytes
    padded.write(orig, 2, orig.length - 2)
    val m = Multimodal.decodeMeta(1L, padded.toByteArray)
    assert(m.format == "jpeg" && m.width == 33 && m.height == 21,
      s"padded JPEG parsed as $m")
  }

  test("decodeMeta: MP4 box walk — v0/v1 headers, largesize, truncation, crafted sizes") {
    val id = 3L
    val b = Multimodal.mp4Bytes(id)
    val nf = Multimodal.fixtureSamples(id)
    val moovSz = 324 + 4 * nf
    val trakSz = 208 + 4 * nf
    val m = Multimodal.decodeMeta(id, b)
    assert(m.format == "mp4" && m.n_bytes == 352 + 4 * nf)
    assert(m.width == Multimodal.fixtureWidth(id) && m.height == Multimodal.fixtureHeight(id))
    assert(m.n_frames == Multimodal.fixtureSamples(id))
    assert(m.sample_rate == Multimodal.fixtureSampleRate(id) && m.channels == 0)

    // every truncation point degrades to unknown or parses partially —
    // never throws (the at-scale contract)
    (0 until b.length).foreach { cut =>
      Multimodal.decodeMeta(id, b.take(cut)) // must not throw
    }

    // crafted box sizes near 2^31 / 2^32-1 must not wrap the bounds walk:
    // patch the moov size field (offset 20) and every parse must reject
    for (sz <- Seq(0x7ffffffcL, 0x7fffffffL, 0xfffffff0L)) {
      val evil = Multimodal.mp4Bytes(id).clone()
      evil(20) = (sz >>> 24).toByte; evil(21) = (sz >>> 16).toByte
      evil(22) = (sz >>> 8).toByte; evil(23) = sz.toByte
      assert(Multimodal.decodeMeta(id, evil).format == "unknown",
        s"moov size 0x${sz.toHexString} did not reject")
    }
    // size==1 largesize path: rewrite moov with a 64-bit size; the walk
    // must read the largesize and still find mvhd 8 bytes further in.
    // Crafted 2^63-range largesize must reject, not wrap.
    val big = new Array[Byte](b.length + 8)
    System.arraycopy(b, 0, big, 0, 20) // ftyp
    big(20) = 0; big(21) = 0; big(22) = 0; big(23) = 1 // size = 1
    System.arraycopy(b, 24, big, 24, 4) // 'moov'
    val large = moovSz.toLong + 8L
    (0 until 8).foreach(i => big(28 + i) = (large >>> (56 - 8 * i)).toByte)
    System.arraycopy(b, 28, big, 36, b.length - 28) // moov payload + mdat
    val lm = Multimodal.decodeMeta(id, big.take(36 + moovSz - 8))
    assert(lm.format == "mp4" && lm.width == Multimodal.fixtureWidth(id),
      s"largesize moov did not parse: $lm")
    val evil64 = big.clone()
    evil64(28) = 0x7f.toByte // largesize ≈ 2^63: off + size would wrap
    assert(Multimodal.decodeMeta(id, evil64.take(36 + moovSz - 8)).format == "unknown")

    // v1 tkhd (64-bit times): dims move from payload+76 to +88
    val v1 = Multimodal.mp4Bytes(id)
    // tkhd box starts at 20(ftyp)+8(moov hdr)+108(mvhd)+8(trak hdr) = 144;
    // rebuild it as v1 inside a fresh buffer with the 12 extra bytes
    val v1b = new Array[Byte](v1.length + 12)
    System.arraycopy(v1, 0, v1b, 0, 144)
    def putBe32(arr: Array[Byte], i: Int, v: Int): Unit = {
      arr(i) = (v >>> 24).toByte; arr(i + 1) = (v >>> 16).toByte
      arr(i + 2) = (v >>> 8).toByte; arr(i + 3) = v.toByte
    }
    putBe32(v1b, 144, 92 + 12) // tkhd size
    System.arraycopy(v1, 148, v1b, 148, 4) // 'tkhd'
    v1b(152) = 1 // version 1
    // times 8+8, track id 4, reserved 4, duration 8 = 32 bytes (zeros ok)
    System.arraycopy(v1, 156 + 20, v1b, 156 + 32, 92 - 8 - 4 - 20) // rest of payload
    // fix enclosing sizes: moov, trak grew by 12
    putBe32(v1b, 20, moovSz + 12)
    putBe32(v1b, 136, trakSz + 12)
    System.arraycopy(v1, 144 + 92, v1b, 144 + 92 + 12, v1.length - 144 - 92)
    val vm = Multimodal.decodeMeta(id, v1b)
    assert(vm.format == "mp4" && vm.width == Multimodal.fixtureWidth(id) &&
      vm.height == Multimodal.fixtureHeight(id), s"v1 tkhd did not parse: $vm")
  }

  test("mp4FrameSamples: stts runs accumulate, stsz per-sample and constant forms read") {
    val id = 7L
    val nf = Multimodal.fixtureSamples(id)
    val r1 = Multimodal.fixtureSttsRun1(id)
    val got = Multimodal.mp4FrameSamples(Multimodal.mp4Bytes(id), stride = 5).get
    assert(got.map(_._1) == (0 until nf by 5))
    got.foreach { case (i, t, sz) =>
      val want = if (i < r1) i.toLong else r1 + (i - r1).toLong * 2
      assert(t == want, s"frame $i time $t != $want (r1=$r1)")
      assert(sz == Multimodal.fixtureSampleBytes(i), s"frame $i size $sz")
    }
    // constant-size stsz form: patch sample_size to 777 — every frame
    // reports it regardless of the (now ignored) per-sample entries
    val b = Multimodal.mp4Bytes(id)
    // stsz starts after ftyp(20) + moov hdr(8) + mvhd(108) + trak hdr(8) +
    // tkhd(92) + mdia hdr(8) + mdhd(32) + minf hdr(8) + stbl hdr(8) +
    // stts(32); sample_size field is at payload +4 (after ver/flags)
    val stszOff = 20 + 8 + 108 + 8 + 92 + 8 + 32 + 8 + 8 + 32
    assert(new String(b, stszOff + 4, 4, "US-ASCII") == "stsz")
    val cb = b.clone()
    cb(stszOff + 12) = 0; cb(stszOff + 13) = 0; cb(stszOff + 14) = 3; cb(stszOff + 15) = 9
    val cGot = Multimodal.mp4FrameSamples(cb, stride = 25).get
    assert(cGot.forall(_._3 == 777L), s"constant-size form not honored: ${cGot.take(3)}")
    // stsz declared count lying past the box: sizes clamp to 0, no throw
    val lie = b.clone()
    val cntOff = stszOff + 16
    lie(cntOff) = 0x7f.toByte
    val lGot = Multimodal.mp4FrameSamples(lie, stride = 25).get
    assert(lGot.map(_._1) == (0 until nf by 25))
    // truncations never throw
    (0 until b.length by 13).foreach(cut => Multimodal.mp4FrameSamples(b.take(cut), 25))
    // sampleFramesWithTables end-to-end over the mixed media corpus
    val rows = Multimodal.sampleFramesWithTables(media, stride = 25).collect()
    val byId = rows.groupBy(_.media_id)
    assert(byId(3L).forall(f => f.frame_bytes == 100 + f.frame_idx % 7))
    assert(byId(2L).forall(f => f.frame_time == f.frame_idx && f.frame_bytes == 2))
    assert(byId(0L).toSeq == Seq(
      Multimodal.FrameRow(0L, 0, Multimodal.fixtureWidth(0L), Multimodal.fixtureHeight(0L), 0L, 0L)))
  }

  test("decode: distributed parse matches fixture arithmetic for every row") {
    val decoded = Multimodal.decode(media).collect()
    assert(decoded.length == 500)
    decoded.foreach { m =>
      val id = m.media_id
      (id % 4) match {
        case 2 =>
          assert(m.format == "wav" && m.width == 0 && m.height == 0)
          assert(m.n_frames == Multimodal.fixtureSamples(id))
          assert(m.sample_rate == Multimodal.fixtureSampleRate(id))
          assert(m.channels == 1)
          assert(m.n_bytes == 44 + 2L * Multimodal.fixtureSamples(id))
        case 3 =>
          assert(m.format == "mp4" &&
            m.n_bytes == 352 + 4L * Multimodal.fixtureSamples(id))
          assert(m.width == Multimodal.fixtureWidth(id))
          assert(m.height == Multimodal.fixtureHeight(id))
          assert(m.n_frames == Multimodal.fixtureSamples(id))
          assert(m.sample_rate == Multimodal.fixtureSampleRate(id))
          assert(m.channels == 0)
        case i =>
          assert(m.format == (if (i == 0) "png" else "bmp"))
          assert(m.width == Multimodal.fixtureWidth(id))
          assert(m.height == Multimodal.fixtureHeight(id))
          assert(m.n_frames == 1 && m.sample_rate == 0 && m.channels == 0)
      }
    }
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

  test("resize: fits the box, preserves aspect, never upscales, skips audio") {
    val decoded = Multimodal.decode(media)
    val resized = Multimodal.resize(decoded, maxW = 64, maxH = 48)
      .collect().map(m => m.media_id -> m).toMap
    val orig = decoded.collect()
    assert(orig.nonEmpty)
    orig.foreach { m =>
      val r = resized(m.media_id)
      if (m.format == "wav") assert(r == m) // zero-dim rows untouched
      else {
        assert(r.width <= 64 && r.height <= 48)
        assert(r.width <= m.width && r.height <= m.height) // no upscale
        // exact box-fit: both dims scaled by the same factor, rounded
        val scale = math.min(1.0,
          math.min(64.0 / m.width, 48.0 / m.height))
        assert(r.width == math.max(1, math.round(m.width * scale).toInt))
        assert(r.height == math.max(1, math.round(m.height * scale).toInt))
        assert(r.n_frames == m.n_frames && r.n_bytes == m.n_bytes)
      }
    }
  }

  test("extractAudioFeatures: real PCM chunk means, batch-size invariant") {
    val f = Multimodal.extractAudioFeatures(media, dim = 16, batchSize = 32)
      .collect().sortBy(_.media_id)
    val wavIds = media.collect().map(_.media_id).filter(_ % 4 == 2).sorted
    assert(f.map(_.media_id).toSeq == wavIds.toSeq) // only wav rows survive
    assert(f.forall(_.feature.length == 16))
    // reference computation straight from the fixture sample generator
    f.take(5).foreach { mf =>
      val n = Multimodal.fixtureSamples(mf.media_id)
      val sums = new Array[Double](16)
      val counts = new Array[Long](16)
      for (j <- 0 until n) {
        val c = ((j.toLong * 16) / n).toInt
        sums(c) += Multimodal.fixtureSample(mf.media_id, j).toDouble
        counts(c) += 1
      }
      val expect = Array.tabulate(16)(i => sums(i) / counts(i))
      assert(mf.feature.toSeq == expect.toSeq)
    }
    val again = Multimodal.extractAudioFeatures(media, dim = 16, batchSize = 7)
      .collect().sortBy(_.media_id)
    assert(f.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
  }

  test("decode survives payloads the fixture never makes (fuzz a few)") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      val m = Multimodal.decodeMeta(i.toLong, b) // must not throw
      assert(m.n_bytes == b.length)
    }
  }

  test("every pixel/PCM decoder honors never-throw on fuzzed and bit-flipped payloads") {
    val rnd = new scala.util.Random(77)
    def allDecoders(b: Array[Byte]): Unit = {
      Multimodal.ahashOf(1L, b)
      Multimodal.aprintOf(1L, b)
      Multimodal.pngGray8(b)
      Multimodal.gifGray(b)
    }
    // pure noise at assorted sizes
    (0 until 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      allDecoders(b)
    }
    // valid payloads with random single-byte corruption — the hard case:
    // headers parse, inner structures lie
    val seeds = Seq(
      Multimodal.pngBytes(4L), Multimodal.bmpBytes(5L),
      Multimodal.wavBytes(6L), Multimodal.mp4Bytes(7L))
    (0 until 400).foreach { _ =>
      val src = seeds(rnd.nextInt(seeds.length))
      val b = src.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      allDecoders(b)
      Multimodal.decodeMeta(1L, b)
    }
    // truncations of every valid payload at every tenth
    seeds.foreach { src =>
      (0 until 10).foreach { t => allDecoders(src.take(src.length * t / 10)) }
    }
  }

  test("averageHash: bit-exact vs a pixel-formula reference; near-dup Hamming behavior") {
    // plain-Scala reference straight from the fixture pixel formula
    def refHash(id: Long): (Long, Long) = {
      val w = Multimodal.fixtureWidth(id); val h = Multimodal.fixtureHeight(id)
      val cs = new Array[Long](64); val cc = new Array[Long](64); var ts = 0L
      for (r <- 0 until h; c <- 0 until w) {
        val lum = 3L * ((id + r.toLong * w + c) % 256)
        val k = (r * 8 / h) * 8 + c * 8 / w
        cs(k) += lum; cc(k) += 1; ts += lum
      }
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64)
        if (cs(k) * w * h > ts * cc(k)) {
          if (k < 32) hi |= 1L << (31 - k) else lo |= 1L << (63 - k)
        }
      (hi, lo)
    }
    for (id <- Seq(1L, 5L, 77L, 333L)) {
      val got = Multimodal.ahashOf(id, Multimodal.bmpBytes(id)).get
      assert((got.ahash_hi, got.ahash_lo) == refHash(id), s"id=$id")
    }
    // a few flipped pixels move few bits; a different image moves many
    def dist(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val base = Multimodal.bmpBytes(9L)
    val tweaked = base.clone()
    var i = 60
    while (i < math.min(base.length, 90)) { tweaked(i) = (tweaked(i) ^ 0x7f).toByte; i += 3 }
    val h0 = Multimodal.ahashOf(9L, base).get
    val h1 = Multimodal.ahashOf(9L, tweaked).get
    val h2 = Multimodal.ahashOf(13L, Multimodal.bmpBytes(13L)).get
    assert(dist((h0.ahash_hi, h0.ahash_lo), (h1.ahash_hi, h1.ahash_lo)) <= 4,
      "minor pixel edits must stay Hamming-close")
    assert(dist((h0.ahash_hi, h0.ahash_lo), (h2.ahash_hi, h2.ahash_lo)) > 4,
      "distinct images must diverge")
    // halves never touch the sign bit
    assert(h0.ahash_hi >= 0 && h0.ahash_lo >= 0)
    // non-decodable payloads: wrong format, truncated pixels, absurd dims
    assert(Multimodal.ahashOf(2L, Multimodal.wavBytes(2L)).isEmpty)
    assert(Multimodal.ahashOf(9L, base.take(100)).isEmpty)
    val huge = base.clone()
    huge(18) = -1; huge(19) = -1; huge(20) = 0x7f // w = huge
    assert(Multimodal.ahashOf(9L, huge).isEmpty)
  }

  test("jpegGray: fixture round-trips bit-exactly; ImageIO agrees both directions") {
    // 1. our encoder → our decoder: constant 8×8 blocks decode EXACTLY to
    // the formula (DC-only blocks round-trip with all-ones quant)
    for (id <- Seq(3L, 7L, 111L, 499L)) {
      val w = Multimodal.fixtureWidth(id); val h = Multimodal.fixtureHeight(id)
      val wb = (w + 7) / 8
      val got = Multimodal.jpegGray(Multimodal.jpegBytes(id))
      assert(got.isDefined, s"id=$id failed to decode")
      val (gw, gh, px) = got.get
      assert(gw == w && gh == h)
      for (r <- 0 until h; c <- 0 until w) {
        val want = ((id + (r / 8).toLong * wb + (c / 8)) % 256).toInt
        assert(px(r * w + c) == want, s"id=$id pixel ($r,$c): ${px(r * w + c)} != $want")
      }
    }
    // 2. our encoder → ImageIO: the fixture is a real JPEG any decoder
    // reads; DC-only blocks are exact there too
    for (id <- Seq(3L, 111L)) {
      val img = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(Multimodal.jpegBytes(id)))
      assert(img != null, s"ImageIO rejected generated JPEG id=$id")
      val w = Multimodal.fixtureWidth(id); val h = Multimodal.fixtureHeight(id)
      assert(img.getWidth == w && img.getHeight == h)
      val wb = (w + 7) / 8
      // raster samples, NOT getRGB: getRGB on a gray image applies the
      // linear-gray → sRGB color transform and distorts the values
      for (r <- 0 until h by 3; c <- 0 until w by 3) {
        val want = ((id + (r / 8).toLong * wb + (c / 8)) % 256).toInt
        val gotPx = img.getRaster.getSample(c, r, 0)
        assert(gotPx == want, s"id=$id ImageIO pixel ($r,$c): $gotPx != $want")
      }
    }
    // 3. ImageIO encoder → our decoder: general-path check on REAL lossy
    // grayscale JPEGs (standard tables, real quant, full AC runs). Pixel
    // agreement within ±1 (IDCT precision differs between libjpeg-style
    // integer IDCT and the float reference IDCT).
    val rnd = new scala.util.Random(19)
    for (_ <- 0 until 4) {
      val w = 17 + rnd.nextInt(80); val h = 9 + rnd.nextInt(50)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      val bytes = bos.toByteArray
      val dec = Multimodal.jpegGray(bytes)
      assert(dec.isDefined, "failed to decode an ImageIO-encoded JPEG")
      val (gw, gh, px) = dec.get
      assert(gw == w && gh == h)
      val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w)
        maxDiff = math.max(maxDiff,
          math.abs(px(y * w + x) - ref.getRaster.getSample(x, y, 0)))
      assert(maxDiff <= 1, s"decoder diverges from ImageIO by $maxDiff")
    }
    // 4. color (3-component YCbCr, possibly subsampled): luma plane decodes
    // at full resolution; with R=G=B input, Y ≈ the gray value (±2 from
    // the color-convert rounding on top of IDCT precision)
    val wC = 41; val hC = 23
    val cImg = new java.awt.image.BufferedImage(
      wC, hC, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until hC; x <- 0 until wC) {
      val v = (x * 5 + y * 11) % 256
      cImg.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val cBos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(cImg, "jpg", cBos))
    val cDec = Multimodal.jpegGray(cBos.toByteArray)
    assert(cDec.isDefined, "failed to decode a color JPEG's luma plane")
    val (cw, ch, cPx) = cDec.get
    assert(cw == wC && ch == hC)
    val cRef = javax.imageio.ImageIO.read(new ByteArrayInputStream(cBos.toByteArray))
    var cMax = 0
    for (y <- 0 until hC; x <- 0 until wC)
      cMax = math.max(cMax, math.abs(cPx(y * wC + x) - (cRef.getRGB(x, y) & 0xff)))
    assert(cMax <= 2, s"luma plane diverges from ImageIO's gray by $cMax")

    // 5. ahashOf routes JPEG payloads through the decoder
    val hash = Multimodal.ahashOf(3L, Multimodal.jpegBytes(3L))
    assert(hash.isDefined && hash.get.ahash_hi >= 0 && hash.get.ahash_lo >= 0)
    // truncations / corruption never throw
    val seed = Multimodal.jpegBytes(7L)
    (0 until 10).foreach(t => Multimodal.jpegGray(seed.take(seed.length * t / 10)))
    (0 until 200).foreach { _ =>
      val m = seed.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Multimodal.jpegGray(m)
      Multimodal.ahashOf(7L, m)
    }
  }

  test("jpegGray progressive: fixture bit-exact; ImageIO progressive encodes agree; fuzz") {
    // 1. progressive fixture (3 scans: DC Al=1, DC refine, AC EOB-run)
    // decodes to the SAME constant-block formula as the baseline fixture
    for (id <- Seq(3L, 7L, 111L, 499L, 2L, 6L)) {
      val w = Multimodal.fixtureWidth(id); val h = Multimodal.fixtureHeight(id)
      val wb = (w + 7) / 8
      val got = Multimodal.jpegGray(Multimodal.jpegProgressiveBytes(id))
      assert(got.isDefined, s"id=$id progressive fixture failed to decode")
      val (gw, gh, px) = got.get
      assert(gw == w && gh == h)
      for (r <- 0 until h; c <- 0 until w) {
        val want = ((id + (r / 8).toLong * wb + (c / 8)) % 256).toInt
        assert(px(r * w + c) == want, s"id=$id pixel ($r,$c): ${px(r * w + c)} != $want")
      }
      // and ImageIO reads the same fixture identically (it is a real SOF2)
      val img = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(Multimodal.jpegProgressiveBytes(id)))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (r <- 0 until h by 5; c <- 0 until w by 5) {
        val want = ((id + (r / 8).toLong * wb + (c / 8)) % 256).toInt
        assert(img.getRaster.getSample(c, r, 0) == want,
          s"id=$id ImageIO pixel ($r,$c)")
      }
    }
    // 2. ImageIO's own progressive encoder (multi-scan successive
    // approximation, real quant) → our decoder, gray and color
    def progressiveBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    def isSof2(b: Array[Byte]): Boolean =
      b.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val w = 19 + rnd.nextInt(70); val h = 11 + rnd.nextInt(40)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
      val bytes = progressiveBytes(img)
      assert(isSof2(bytes), "ImageIO did not emit a progressive (SOF2) stream")
      val dec = Multimodal.jpegGray(bytes)
      assert(dec.isDefined, s"trial=$trial: failed to decode ImageIO progressive JPEG")
      val (gw, gh, px) = dec.get
      assert(gw == w && gh == h)
      val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w)
        maxDiff = math.max(maxDiff,
          math.abs(px(y * w + x) - ref.getRaster.getSample(x, y, 0)))
      assert(maxDiff <= 1, s"trial=$trial: diverges from ImageIO by $maxDiff")
    }
    // color progressive (3-component: interleaved DC scan + skipped
    // chroma AC scans), R=G=B so luma tracks the gray value
    val wC = 37; val hC = 21
    val cImg = new java.awt.image.BufferedImage(
      wC, hC, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until hC; x <- 0 until wC) {
      val v = (x * 7 + y * 13) % 256
      cImg.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val cBytes = progressiveBytes(cImg)
    assert(isSof2(cBytes))
    val cDec = Multimodal.jpegGray(cBytes)
    assert(cDec.isDefined, "failed to decode a color progressive JPEG")
    val (cw, ch, cPx) = cDec.get
    assert(cw == wC && ch == hC)
    val cRef = javax.imageio.ImageIO.read(new ByteArrayInputStream(cBytes))
    var cMax = 0
    for (y <- 0 until hC; x <- 0 until wC)
      cMax = math.max(cMax, math.abs(cPx(y * wC + x) - (cRef.getRGB(x, y) & 0xff)))
    assert(cMax <= 2, s"progressive luma diverges from ImageIO's gray by $cMax")
    // 3. never-throw fuzz on truncations and random corruption
    val seed = Multimodal.jpegProgressiveBytes(7L)
    (0 until 10).foreach(t => Multimodal.jpegGray(seed.take(seed.length * t / 10)))
    (0 until 200).foreach { _ =>
      val m = seed.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Multimodal.jpegGray(m)
      Multimodal.ahashOf(7L, m)
    }
    val seedIo = progressiveBytes(cImg)
    (0 until 200).foreach { _ =>
      val m = seedIo.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Multimodal.jpegGray(m)
    }
  }

  test("bmpHash: row order matches ImageIO (bottom-up storage un-flipped); top-down BMPs too") {
    // ImageIO honors the BMP spec's bottom-up row order, so hashing ITS
    // pixels in logical (y,x) order must reproduce the engine's hash —
    // this is the independent check that the un-flip is on the right axis.
    def hashOfImage(img: java.awt.image.BufferedImage): (Long, Long) = {
      val w = img.getWidth; val h = img.getHeight
      val cs = new Array[Long](64); val cc = new Array[Long](64); var ts = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        val k = (y * 8 / h) * 8 + x * 8 / w
        cs(k) += lum; cc(k) += 1; ts += lum
      }
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64)
        if (cs(k) * w * h > ts * cc(k)) {
          if (k < 32) hi |= 1L << (31 - k) else lo |= 1L << (63 - k)
        }
      (hi, lo)
    }
    for (id <- Seq(1L, 5L, 77L)) {
      val bytes = Multimodal.bmpBytes(id)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      val got = Multimodal.ahashOf(id, bytes).get
      assert((got.ahash_hi, got.ahash_lo) == hashOfImage(img), s"id=$id")
    }
    // negative biHeight = top-down storage: same logical image, same hash
    val up = Multimodal.bmpBytes(21L)
    val w = Multimodal.fixtureWidth(21L); val h = Multimodal.fixtureHeight(21L)
    val stride = ((w * 3 + 3) / 4) * 4
    val down = up.clone()
    val negH = -h
    down(22) = negH.toByte; down(23) = (negH >> 8).toByte
    down(24) = (negH >> 16).toByte; down(25) = (negH >> 24).toByte
    for (r <- 0 until h)
      System.arraycopy(up, 54 + (h - 1 - r) * stride, down, 54 + r * stride, stride)
    val a = Multimodal.ahashOf(21L, up).get
    val b = Multimodal.ahashOf(21L, down).get
    assert((a.ahash_hi, a.ahash_lo) == ((b.ahash_hi, b.ahash_lo)),
      "top-down re-encode of the same image must hash identically")
  }

  test("pngGray8: real inflate + unfilter matches ImageIO on encoder-produced PNGs") {
    // same image as gray PNG and RGB BMP hashes identically (scale-invariant bits)
    for (id <- Seq(4L, 8L, 100L)) {
      val p = Multimodal.ahashOf(id, Multimodal.pngBytes(id)).get
      val b = Multimodal.ahashOf(id, Multimodal.bmpBytes(id)).get
      assert((p.ahash_hi, p.ahash_lo) == ((b.ahash_hi, b.ahash_lo)), s"id=$id")
    }
    // ImageIO's PNG encoder uses real deflate + its own filter choices;
    // our decoder must reproduce the exact pixels it encoded
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      val w = 17 + rnd.nextInt(90); val h = 9 + rnd.nextInt(60)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val expected = Array.tabulate(h, w) { (r, c) =>
        val v = rnd.nextInt(256)
        img.getRaster.setSample(c, r, 0, v)
        v
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      val got = Multimodal.pngGray8(bos.toByteArray)
      assert(got.isDefined, s"trial $trial: ImageIO png must decode")
      val (gw, gh, px) = got.get
      assert(gw == w && gh == h)
      for (r <- 0 until h; c <- 0 until w)
        assert((px(r * w + c) & 0xff) == expected(r)(c),
          s"trial $trial pixel ($r,$c)")
    }
    // truncated IDAT and wrong color type degrade to None, never throw
    val png = Multimodal.pngBytes(4L)
    assert(Multimodal.pngGray8(png.take(png.length - 20)).isEmpty)
    val rgb = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", bos2)
    assert(Multimodal.pngGray8(bos2.toByteArray).isEmpty,
      "color-type-2 PNG is outside the gray8 decoder's contract")
  }

  test("gifGray: LZW decode matches ImageIO's own GIF encoder pixel-for-pixel") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 5) {
      val w = 13 + rnd.nextInt(80); val h = 11 + rnd.nextInt(50)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val expected = Array.tabulate(h, w) { (r, c) =>
        // long runs + noise exercise dictionary growth and KwKwK
        val v = if (c % 7 < 4) 200 else rnd.nextInt(256)
        img.getRaster.setSample(c, r, 0, v)
        v
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", bos))
      val got = Multimodal.gifGray(bos.toByteArray)
      assert(got.isDefined, s"trial $trial: ImageIO gif must decode")
      val (gw, gh, px) = got.get
      assert(gw == w && gh == h)
      // palette luminance is the channel sum: gray v maps to 3·v
      for (r <- 0 until h; c <- 0 until w)
        assert(px(r * w + c) == 3 * expected(r)(c), s"trial $trial ($r,$c)")
    }
    // truncated stream and fuzz degrade to None, never a throw
    val img = new java.awt.image.BufferedImage(
      30, 20, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val full = bos.toByteArray
    assert(Multimodal.gifGray(full.take(full.length - 10)).isEmpty)
    val fz = new scala.util.Random(5)
    (0 until 100).foreach { _ =>
      val junk = full.clone()
      junk(13 + fz.nextInt(junk.length - 13)) = fz.nextInt(256).toByte
      Multimodal.gifGray(junk) // any result is fine; throwing is not
    }
  }

  test("audioFingerprint: bit-exact vs a sample-formula reference; gain-invariance; bounds") {
    def refPrint(id: Long): (Long, Long) = {
      val n = Multimodal.fixtureSamples(id)
      val e = new Array[Long](64); val c = new Array[Long](64); var te = 0L
      for (j <- 0 until n) {
        val s = Multimodal.fixtureSample(id, j).toLong
        val k = ((j.toLong * 64) / n).toInt
        e(k) += s * s; c(k) += 1; te += s * s
      }
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64) {
        val bit = if (k == 0) e(0) * n > te * c(0)
          else e(k) * c(k - 1) > e(k - 1) * c(k)
        if (bit) { if (k < 32) hi |= 1L << (31 - k) else lo |= 1L << (63 - k) }
      }
      (hi, lo)
    }
    for (id <- Seq(2L, 6L, 102L)) {
      val got = Multimodal.aprintOf(id, Multimodal.wavBytes(id)).get
      assert((got.aprint_hi, got.aprint_lo) == refPrint(id), s"id=$id")
    }
    // halving every sample (gain change) keeps the print: energies scale
    // by 1/4 uniformly and the mean compares are scale-invariant...
    // NOT exactly with integer truncation, so allow tiny Hamming drift
    val base = Multimodal.wavBytes(6L)
    val soft = base.clone()
    var off = 44
    while (off + 1 < soft.length) {
      val s = ((soft(off) & 0xff) | (soft(off + 1) << 8)).toShort / 2
      soft(off) = (s & 0xff).toByte; soft(off + 1) = ((s >> 8) & 0xff).toByte
      off += 2
    }
    val p0 = Multimodal.aprintOf(6L, base).get
    val p1 = Multimodal.aprintOf(6L, soft).get
    val dist = java.lang.Long.bitCount(p0.aprint_hi ^ p1.aprint_hi) +
      java.lang.Long.bitCount(p0.aprint_lo ^ p1.aprint_lo)
    assert(dist <= 2, s"re-leveled copy drifted $dist bits")
    // non-audio and truncated payloads: no row, never a throw
    assert(Multimodal.aprintOf(1L, Multimodal.bmpBytes(1L)).isEmpty)
    assert(Multimodal.aprintOf(6L, base.take(50)).isEmpty)
  }

  test("imageNearDupPairs: edited copies pair up through the Hamming block join") {
    import spark.implicits._
    val base = Multimodal.bmpBytes(9L)
    val tweaked = base.clone()
    var i = 60
    while (i < math.min(base.length, 90)) { tweaked(i) = (tweaked(i) ^ 0x7f).toByte; i += 3 }
    val media = Seq(
      Multimodal.MediaRow(1L, base),
      Multimodal.MediaRow(2L, tweaked),                  // near-dup of 1
      Multimodal.MediaRow(3L, Multimodal.bmpBytes(13L)), // distinct image
      Multimodal.MediaRow(4L, Multimodal.wavBytes(4L)))  // not an image
      .toDS()
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }
}
