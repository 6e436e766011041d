package graft.multimodal

import java.util.zip.{Adler32, CRC32}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio ride along as opaque `binary`
  * columns, and decode / feature-extract / resize / frame-sample run as
  * partition-wise transformations (no shuffle, no driver collect).
  *
  * The codec is a real pure-JVM container parser — PNG IHDR, BMP
  * BITMAPINFOHEADER/BITMAPCOREHEADER, and RIFF/WAVE chunk walking are all
  * fixed-offset byte reads, so metadata extraction never decodes pixels.
  * That is exactly the shape you want at 100 TB: a metadata pass touches
  * ~100 bytes per blob regardless of payload size. Audio feature extraction
  * goes one level deeper and reads the actual 16-bit PCM samples from the
  * `data` chunk.
  *
  * Reference analog: the free-form `blob` metadata column
  * (pinecone-datasets `cfg.py:28`, `MAINTAINERS.md:98`) — the reference
  * stores opaque payloads; this module adds the decode stages a training
  * pipeline needs on top of them.
  */
object Multimodal {

  /** Typed media row: id + opaque container payload. The format is NOT
    * declared — the codec sniffs magic bytes, as a real pipeline must.
    */
  final case class MediaRow(media_id: Long, payload: Array[Byte])

  /** Parsed container metadata. Image rows carry pixel dims and
    * `n_frames = 1`; audio rows carry `n_frames` = PCM sample frames plus
    * rate/channels and zero pixel dims; unparseable payloads come back as
    * `format = "unknown"` with zeros (never an exception — at scale a
    * corrupt blob must not kill the stage).
    */
  final case class DecodedMeta(
      media_id: Long,
      format: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int,
      channels: Int)

  /** Fixed-dim feature vector per media item (chunk means over real PCM). */
  final case class MediaFeature(media_id: Long, feature: Array[Double])

  // ---------------------------------------------------------------- bytes

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def hasPrefix(b: Array[Byte], sig: Array[Byte]): Boolean =
    b.length >= sig.length && {
      var i = 0
      while (i < sig.length && b(i) == sig(i)) i += 1
      i == sig.length
    }

  private def tagAt(b: Array[Byte], i: Int, tag: String): Boolean =
    b.length >= i + 4 && b(i) == tag(0).toByte && b(i + 1) == tag(1).toByte &&
      b(i + 2) == tag(2).toByte && b(i + 3) == tag(3).toByte

  // ---------------------------------------------------------- header codec

  /** Locates the WAV `fmt ` and `data` chunks by walking the RIFF chunk
    * list (chunks are [tag 4][size LE32][payload, padded to even]).
    * Returns (channels, sampleRate, blockAlign, dataOffset, dataLen), or
    * null if the stream is not a well-formed PCM WAV.
    */
  private def wavChunks(b: Array[Byte]): Array[Int] = {
    if (!(hasPrefix(b, "RIFF".getBytes) && tagAt(b, 8, "WAVE"))) return null
    // Long arithmetic throughout: a crafted chunk size near 2^31 must not
    // wrap `off + 8 + size` negative and slip past the bounds check.
    var off = 12L
    var channels, rate, block = -1
    var dataOff, dataLen = -1
    while (off + 8 <= b.length && (block < 0 || dataOff < 0)) {
      val size = le32(b, off.toInt + 4).toLong & 0xffffffffL
      if (off + 8 + size > b.length) return null
      if (tagAt(b, off.toInt, "fmt ") && size >= 16) {
        channels = le16(b, off.toInt + 10)
        rate = le32(b, off.toInt + 12)
        block = le16(b, off.toInt + 20)
      } else if (tagAt(b, off.toInt, "data")) {
        dataOff = off.toInt + 8
        dataLen = size.toInt
      }
      off += 8 + size + (size & 1) // chunks are even-aligned
    }
    // block >= 1 only: metadata extraction never reads samples, so 8-bit
    // mono PCM (blockAlign=1) keeps its header metadata. The 16-bit sample
    // reader in extractAudioFeatures enforces block >= 2 itself — that is
    // where a 1-byte frame would read past the data chunk.
    if (channels <= 0 || rate <= 0 || block < 1 || dataOff < 0 ||
      dataOff.toLong + dataLen > b.length) null
    else Array(channels, rate, block, dataOff, dataLen)
  }

  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i).toLong & 0xffffffffL) << 32) | (be32(b, i + 4).toLong & 0xffffffffL)

  /** ISO-BMFF box walk: boxes are [size BE32][type 4cc][payload]. size==1
    * reads a 64-bit largesize after the type; size==0 extends to the end of
    * the enclosing span (ISO 14496-12 §4.2). Long arithmetic and
    * subtraction-form bounds checks throughout — the same discipline as the
    * RIFF walk: a crafted 2^31 (or 2^63) size must not wrap past the
    * bounds check. Returns the payload span `[start, end)` of the first
    * `tag` box inside `[from, to)`, or null.
    */
  private def findBox(b: Array[Byte], from: Long, to: Long, tag: String): Array[Long] = {
    var off = from
    while (off + 8 <= to) {
      val size32 = be32(b, off.toInt).toLong & 0xffffffffL
      val large = size32 == 1
      if (large && off + 16 > to) return null
      val hdr = if (large) 16L else 8L
      val size =
        if (size32 == 0) to - off
        else if (large) be64(b, off.toInt + 8)
        else size32
      // subtraction form: `size > to - off` cannot overflow, `off + size`
      // with a crafted 2^63 largesize could
      if (size < hdr || size > to - off) return null
      if (tagAt(b, off.toInt + 4, tag)) return Array(off + hdr, off + size)
      off += size
    }
    null
  }

  /** Parses MP4/ISO-BMFF movie metadata by walking
    * `moov/trak/{tkhd, mdia/{mdhd, minf/stbl/stts}}` — all fixed-offset
    * reads once the boxes are located. Picks the first trak with nonzero
    * tkhd dimensions (the video track), falling back to the first trak
    * (audio-only movies). Returns (width, height, nFrames, timescale) or
    * null if the stream is not a well-formed movie. Width/height are the
    * integer part of tkhd's 16.16 fixed-point dims; nFrames is the stts
    * sample-count total; timescale is the track mdhd's (so
    * nFrames · delta / timescale is the duration in seconds — with the
    * fixture's delta = 1, the same `n_frames / sample_rate` convention as
    * WAV rows). Version 0 and version 1 (64-bit time) headers both parse.
    */
  private def mp4Meta(b: Array[Byte]): Array[Int] = {
    val n = b.length.toLong
    if (!(b.length >= 12 && tagAt(b, 4, "ftyp"))) return null
    val moov = findBox(b, 0L, n, "moov")
    if (moov == null) return null
    if (findBox(b, moov(0), moov(1), "mvhd") == null) return null
    var best: Array[Int] = null
    var trakFrom = moov(0)
    var continue = true
    while (continue) {
      val trak = findBox(b, trakFrom, moov(1), "trak")
      if (trak == null) continue = false
      else {
        var w, h = 0
        val tkhd = findBox(b, trak(0), trak(1), "tkhd")
        if (tkhd != null && tkhd(1) - tkhd(0) >= 4) {
          val p = tkhd(0)
          // v1 widens the two times and the duration by 4 bytes each
          val dimOff = if (b(p.toInt) == 1) 88L else 76L
          if (tkhd(1) - p >= dimOff + 8) {
            w = be32(b, (p + dimOff).toInt) >>> 16
            h = be32(b, (p + dimOff + 4).toInt) >>> 16
          }
        }
        var frames, tscale = 0
        val mdia = findBox(b, trak(0), trak(1), "mdia")
        if (mdia != null) {
          val mdhd = findBox(b, mdia(0), mdia(1), "mdhd")
          if (mdhd != null && mdhd(1) - mdhd(0) >= 4) {
            val p = mdhd(0)
            val tsOff = if (b(p.toInt) == 1) 20L else 12L
            if (mdhd(1) - p >= tsOff + 4) tscale = be32(b, (p + tsOff).toInt)
          }
          val minf = findBox(b, mdia(0), mdia(1), "minf")
          val stbl = if (minf == null) null else findBox(b, minf(0), minf(1), "stbl")
          val stts = if (stbl == null) null else findBox(b, stbl(0), stbl(1), "stts")
          if (stts != null && stts(1) - stts(0) >= 8) {
            val p = stts(0)
            val declared = be32(b, (p + 4).toInt).toLong & 0xffffffffL
            // never trust the declared count past the box's actual bytes
            val avail = (stts(1) - p - 8) / 8
            val entries = math.min(declared, avail)
            var i = 0L
            var total = 0L
            while (i < entries) {
              total += be32(b, (p + 8 + i * 8).toInt).toLong & 0xffffffffL
              i += 1
            }
            frames = math.min(total, Int.MaxValue.toLong).toInt
          }
        }
        val cand = Array(w, h, frames, tscale)
        if (w > 0 && h > 0) { best = cand; continue = false } // video track wins
        else if (best == null) best = cand // first trak as fallback
        trakFrom = trak(1)
      }
    }
    best
  }

  /** Walks JPEG segments ([0xFF marker][BE16 length incl. itself]) to the
    * first SOF0–SOF15 frame header (excluding DHT/DNL/DAC 0xC4/C8/CC) and
    * returns (width, height), or null if the stream is not a well-formed
    * JPEG. Dims live at fixed offsets inside SOF: [len 2][precision 1]
    * [height BE16][width BE16].
    */
  private def jpegDims(b: Array[Byte]): Array[Int] = {
    if (!(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)) return null
    var off = 2
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xff) return null
      // Fill bytes: any number of extra 0xFF bytes may pad the gap between
      // segments (ITU T.81 B.1.1.2); skip them so the marker byte and its
      // length field are read from the right offsets.
      while (off + 4 <= b.length && (b(off + 1) & 0xff) == 0xff) off += 1
      if (off + 4 > b.length) return null
      val marker = b(off + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        off += 2 // standalone markers with no payload
      } else if (marker == 0xda || marker == 0xd9) {
        return null // entropy-coded data / EOI before any SOF
      } else {
        val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        if (len < 2 || off + 2 + len > b.length) return null
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 7) return null
          val h = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
          val w = ((b(off + 7) & 0xff) << 8) | (b(off + 8) & 0xff)
          return Array(w, h)
        }
        off += 2 + len
      }
    }
    null
  }

  /** Pure-JVM header codec: sniffs the container by magic bytes and reads
    * the dimensions from the header at fixed offsets — PNG IHDR (big-endian
    * at 16/20), BMP DIB header (little-endian at 18/22, or the legacy
    * 12-byte BITMAPCOREHEADER with 16-bit dims), GIF logical screen
    * (little-endian at 6/8), JPEG SOF frame header (segment walk), WAV
    * fmt/data chunks. Never throws: malformed input degrades to
    * `format = "unknown"`.
    */
  def decodeMeta(id: Long, b: Array[Byte]): DecodedMeta = {
    val n = b.length.toLong
    if (hasPrefix(b, PngSig) && b.length >= 24 && tagAt(b, 12, "IHDR")) {
      DecodedMeta(id, "png", n, be32(b, 16), be32(b, 20), 1, 0, 0)
    } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val dibSize = le32(b, 14)
      if (dibSize == 12) // BITMAPCOREHEADER: 16-bit dims
        DecodedMeta(id, "bmp", n, le16(b, 18), le16(b, 20), 1, 0, 0)
      else if (dibSize >= 40 && b.length >= 14 + dibSize) // BITMAPINFOHEADER+
        DecodedMeta(id, "bmp", n, le32(b, 18), math.abs(le32(b, 22)), 1, 0, 0)
      else DecodedMeta(id, "unknown", n, 0, 0, 0, 0, 0)
    } else if (b.length >= 10 &&
      (hasPrefix(b, "GIF87a".getBytes) || hasPrefix(b, "GIF89a".getBytes))) {
      DecodedMeta(id, "gif", n, le16(b, 6), le16(b, 8), 1, 0, 0)
    } else if (b.length >= 12 && tagAt(b, 4, "ftyp")) {
      val m = mp4Meta(b)
      // sample_rate carries the track timescale; with sample delta = 1,
      // n_frames / sample_rate is the duration in seconds — the same
      // convention as WAV rows
      if (m != null) DecodedMeta(id, "mp4", n, m(0), m(1), m(2), m(3), 0)
      else DecodedMeta(id, "unknown", n, 0, 0, 0, 0, 0)
    } else {
      val j = jpegDims(b)
      if (j != null) DecodedMeta(id, "jpeg", n, j(0), j(1), 1, 0, 0)
      else {
        val w = wavChunks(b)
        if (w != null)
          DecodedMeta(id, "wav", n, 0, 0, w(4) / w(2), w(1), w(0))
        else DecodedMeta(id, "unknown", n, 0, 0, 0, 0, 0)
      }
    }
  }

  /** Decode stage: partition-wise, zero driver involvement; output is a
    * columnar typed Dataset ready for predicate pushdown on metadata.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => decodeMeta(r.media_id, r.payload)))
  }

  /** 8×8 average-hash of an image payload, split into two non-negative
    * 32-bit halves (`hi` = cells 0–31 = bit 31-k within the half, `lo` =
    * cells 32–63) so neither engine in a cross-check touches the sign
    * bit. `None` for non-decodable payloads.
    */
  final case class ImageHash(media_id: Long, ahash_hi: Long, ahash_lo: Long)

  /** Perceptual (average) hash over REAL decoded pixels — the image
    * near-dup primitive: resized re-encodes, recompressions and minor
    * edits keep small Hamming distance while distinct images diverge.
    * Decodes 24-bpp BI_RGB BMP pixel arrays and 8-bit grayscale PNGs
    * (full zlib inflate + all five filter types — see [[pngGray8]]);
    * other formats return no row. Hash bits are scale-invariant, so the
    * same image as gray PNG and as RGB BMP produces the SAME hash —
    * cross-format re-encodes of one image pair up at Hamming 0.
    * Cell (i,j) of the 8×8 grid covers storage rows `floor(r·8/h)=i`
    * / cols `floor(c·8/w)=j`; a cell's bit is set iff its mean luminance
    * strictly exceeds the whole-image mean, compared EXACTLY via
    * cross-multiplied integer sums (`cellSum·w·h > totalSum·cellCnt`) —
    * no FP, so any engine replaying the pixel arithmetic reproduces the
    * hash bit-for-bit. Luminance is the channel sum r+g+b (0..765).
    * All formats are read in LOGICAL (top-down) row order — BMPs with
    * positive biHeight are stored bottom-up and are un-flipped during the
    * read — so the cell grid is anchored to the image, not the container,
    * and the cross-format Hamming-0 guarantee holds.
    *
    * Never throws: bounds-checked like every other codec path, and
    * payloads over 2²⁴ pixels are treated as non-decodable (a crafted
    * header must not allocate/loop unboundedly).
    */
  def averageHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => ahashOf(r.media_id, r.payload)))
  }

  /** Image near-duplicate pairs: [[averageHash]] sketches fed through the
    * same pigeonhole-blocked Hamming join as text simhash
    * ([[graft.operators.TextDedup.hammingPairs]]) — resized/recompressed/
    * lightly-edited copies pair up; the corpus never self-joins.
    * Returns `(id_a, id_b, hamming)`.
    */
  def imageNearDupPairs(
      media: Dataset[MediaRow], maxHamming: Int = 3): org.apache.spark.sql.DataFrame =
    graft.operators.TextDedup.hammingPairs(
      averageHash(media).toDF()
        .select(org.apache.spark.sql.functions.col("media_id").as("doc_id"),
          (org.apache.spark.sql.functions.shiftleft(
            org.apache.spark.sql.functions.col("ahash_hi"), 32)
            .bitwiseOR(org.apache.spark.sql.functions.col("ahash_lo"))).as("sim")),
      maxHamming)

  private[graft] def ahashOf(id: Long, b: Array[Byte]): Option[ImageHash] = {
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') bmpHash(id, b)
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      gifGray(b).map { case (w, h, px) =>
        hashGrid(id, w, h, (r, c) => px(r * w + c))
      }
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      jpegGray(b).map { case (w, h, px) =>
        hashGrid(id, w, h, (r, c) => px(r * w + c))
      }
    else pngGray8(b).map { case (w, h, px) =>
      hashGrid(id, w, h, (r, c) => px(r * w + c) & 0xff)
    }
  }

  /** The 8×8 cell/mean bit grid shared by every pixel source. Bits are
    * scale-invariant (the cross-multiplied compare cancels any positive
    * luminance scaling), so a 3-channel sum and a single gray channel of
    * the same image produce the same hash.
    */
  private def hashGrid(id: Long, w: Int, h: Int, lum: (Int, Int) => Int): ImageHash = {
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var totalSum = 0L
    var r = 0
    while (r < h) {
      val ci = r * 8 / h
      var c = 0
      while (c < w) {
        val v = lum(r, c)
        val cell = ci * 8 + c * 8 / w
        cellSum(cell) += v
        cellCnt(cell) += 1
        totalSum += v
        c += 1
      }
      r += 1
    }
    val total = w.toLong * h
    var hi = 0L
    var lo = 0L
    var k = 0
    while (k < 64) {
      // exact integer compare: cellMean > imageMean
      val bit = cellSum(k) * total > totalSum * cellCnt(k)
      if (bit) {
        if (k < 32) hi |= 1L << (31 - k)
        else lo |= 1L << (63 - k)
      }
      k += 1
    }
    ImageHash(id, hi, lo)
  }

  // 24-bpp BI_RGB BITMAPINFOHEADER BMP (uncompressed pixels). Positive
  // biHeight means rows are stored BOTTOM-UP per the BMP spec, so logical
  // row r lives at storage row h-1-r; a negative biHeight flags the rare
  // top-down layout where storage order IS logical order. Reading in
  // logical order is what makes the hash agree bit-for-bit with the PNG
  // decode of the same image (PNG scanlines are always top-down).
  private def bmpHash(id: Long, b: Array[Byte]): Option[ImageHash] = {
    if (b.length < 54 || le32(b, 14) < 40) return None
    if (le16(b, 28) != 24 || le32(b, 30) != 0) return None
    val w = le32(b, 18)
    val rawH = le32(b, 22)
    val h = math.abs(rawH)
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
    val stride = ((w * 3 + 3) / 4) * 4
    val pixOff = le32(b, 10)
    if (pixOff < 54 || pixOff.toLong + stride.toLong * h > b.length) return None
    val topDown = rawH < 0
    Some(hashGrid(id, w, h, (r, c) => {
      val sr = if (topDown) r else h - 1 - r
      val off = pixOff + sr * stride + c * 3
      (b(off) & 0xff) + (b(off + 1) & 0xff) + (b(off + 2) & 0xff)
    }))
  }

  final case class AudioPrint(media_id: Long, aprint_hi: Long, aprint_lo: Long)

  /** 64-bit audio fingerprint over REAL decoded PCM (Haitsma–Kalker
    * family, simplified to one band): the sample stream splits into 64
    * equal chunks (`floor(j·64/n)`), each chunk's ENERGY is the exact
    * integer sum of squared 16-bit samples (first channel of each
    * frame), and bit k is an exact cross-multiplied mean compare —
    * chunk k's mean energy vs chunk k−1's (bit 0: vs the whole-stream
    * mean). Gain changes scale all energies together, so re-leveled
    * copies keep their print; the bit pattern is integer-exact and
    * replayable by any engine from the same samples. Near-dup pairs go
    * through the same pigeonhole Hamming join as text/image sketches.
    * Never throws; non-PCM/8-bit payloads produce no row.
    */
  def audioFingerprint(media: Dataset[MediaRow]): Dataset[AudioPrint] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => aprintOf(r.media_id, r.payload)))
  }

  private[graft] def aprintOf(id: Long, b: Array[Byte]): Option[AudioPrint] = {
    val w = wavChunks(b)
    if (w == null) return None
    val Array(_, _, block, dataOff, dataLen) = w
    // 2^16-frame cap (first ~4-8 s): keeps the cross-multiplied energy
    // compares exact in a Long (n²·2³⁰/64 must not overflow), and a
    // fingerprint of the opening seconds is the standard matching unit
    val n = math.min(dataLen / block, 1 << 16)
    if (block < 2 || n <= 0) return None
    val eSum = new Array[Long](64)
    val eCnt = new Array[Long](64)
    var total = 0L
    var j = 0
    while (j < n) {
      val off = dataOff + j * block
      val s = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toLong
      val k = ((j.toLong * 64) / n).toInt
      eSum(k) += s * s
      eCnt(k) += 1
      total += s * s
      j += 1
    }
    var hi = 0L
    var lo = 0L
    var k = 0
    while (k < 64) {
      val bit =
        if (k == 0) eSum(0) * n > total * eCnt(0)
        else eSum(k) * eCnt(k - 1) > eSum(k - 1) * eCnt(k)
      if (bit) {
        if (k < 32) hi |= 1L << (31 - k)
        else lo |= 1L << (63 - k)
      }
      k += 1
    }
    Some(AudioPrint(id, hi, lo))
  }

  /** REAL GIF pixel decode (87a/89a, first image frame): palette + LZW.
    * Walks the screen descriptor, global color table, and extension
    * blocks to the first image descriptor; inflates the LZW stream
    * (variable code width 3–12 bits, LSB-first across sub-blocks, clear/
    * EOI handling); maps each palette index to its r+g+b luminance sum —
    * the same channel-sum scale as the BMP path, so cross-format hashes
    * agree. Interlaced frames are supported (4-pass row remap — ImageIO's
    * own encoder emits them); local color tables return None; same
    * never-throw / 2²⁴-pixel contract.
    * Cross-validated against ImageIO's own GIF encoder in MultimodalSpec.
    */
  private[graft] def gifGray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 13 ||
      !(hasPrefix(b, "GIF87a".getBytes) || hasPrefix(b, "GIF89a".getBytes))) return None
    val flags = b(10) & 0xff
    if ((flags & 0x80) == 0) return None // need a global color table
    val gctSize = 2 << (flags & 7)
    var off = 13
    if (off + gctSize * 3 > b.length) return None
    val lum = new Array[Int](gctSize)
    var i = 0
    while (i < gctSize) {
      lum(i) = (b(off) & 0xff) + (b(off + 1) & 0xff) + (b(off + 2) & 0xff)
      off += 3
      i += 1
    }
    // skip extension blocks to the first image descriptor
    while (off < b.length && (b(off) & 0xff) == 0x21) {
      off += 2 // introducer + label
      var bs = if (off < b.length) b(off) & 0xff else -1
      while (bs > 0) {
        off += 1 + bs
        bs = if (off < b.length) b(off) & 0xff else -1
      }
      if (bs < 0) return None
      off += 1 // block terminator
    }
    if (off + 10 > b.length || (b(off) & 0xff) != 0x2c) return None
    val w = le16(b, off + 5)
    val h = le16(b, off + 7)
    val iflags = b(off + 9) & 0xff
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
    val interlaced = (iflags & 0x40) != 0
    if ((iflags & 0x80) != 0) return None // local color table: keep simple
    off += 10
    if (off >= b.length) return None
    val minCode = b(off) & 0xff
    off += 1
    if (minCode < 1 || minCode > 11) return None
    // concatenate LZW sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var bs = if (off < b.length) b(off) & 0xff else -1
    while (bs > 0) {
      if (off + 1 + bs > b.length) return None
      data.write(b, off + 1, bs)
      off += 1 + bs
      bs = if (off < b.length) b(off) & 0xff else -1
    }
    if (bs < 0) return None
    val bytes = data.toByteArray
    val clear = 1 << minCode
    val eoi = clear + 1
    val px = new Array[Int](w * h)
    var nOut = 0
    // LZW dictionary as (prefixCode, appendedIndex) pairs
    val maxDict = 1 << 12
    val prefix = new Array[Int](maxDict)
    val suffix = new Array[Int](maxDict)
    var dictSize = eoi + 1
    var codeWidth = minCode + 1
    var prev = -1
    var acc = 0L
    var accBits = 0
    var pos = 0
    val stack = new Array[Int](maxDict)
    def emit(code: Int): Option[Int] = { // writes the code's string, returns its first index
      var sp = 0
      var c = code
      while (c >= clear) { // walk the chain (codes < clear are literals)
        if (sp >= maxDict || c >= dictSize) return None
        stack(sp) = suffix(c)
        sp += 1
        c = prefix(c)
      }
      val first = c
      if (nOut + sp + 1 > px.length) return None
      px(nOut) = if (first < gctSize) lum(first) else 0
      nOut += 1
      while (sp > 0) {
        sp -= 1
        val idx = stack(sp)
        px(nOut) = if (idx < gctSize) lum(idx) else 0
        nOut += 1
      }
      Some(first)
    }
    var done = false
    while (!done && nOut < px.length) {
      while (accBits < codeWidth && pos < bytes.length) {
        acc |= (bytes(pos) & 0xffL) << accBits
        accBits += 8
        pos += 1
      }
      if (accBits < codeWidth) return None // truncated stream
      val code = (acc & ((1L << codeWidth) - 1)).toInt
      acc >>>= codeWidth
      accBits -= codeWidth
      if (code == clear) {
        dictSize = eoi + 1
        codeWidth = minCode + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        if (code >= dictSize || code >= clear) return None // must be a literal
        if (emit(code).isEmpty) return None
        prev = code
      } else if (code < dictSize) {
        // normal case: output code's string, add (prev, firstIndex(code))
        emit(code) match {
          case None => return None
          case Some(f) =>
            if (dictSize < maxDict) {
              prefix(dictSize) = prev; suffix(dictSize) = f; dictSize += 1
            }
        }
        if (dictSize >= (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        prev = code
      } else if (code == dictSize && dictSize < maxDict) {
        // KwKwK: the new entry is (prev, firstIndex(prev)); add it FIRST,
        // then the just-read code is exactly that entry
        var c = prev
        while (c >= clear) c = prefix(c)
        prefix(dictSize) = prev; suffix(dictSize) = c; dictSize += 1
        if (emit(code).isEmpty) return None
        if (dictSize >= (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        prev = code
      } else return None
    }
    if (nOut != px.length) return None
    if (!interlaced) Some((w, h, px))
    else {
      // GIF interlace: rows arrive in four passes (0,8,16…; 4,12…;
      // 2,6,10…; 1,3,5…) — remap delivery order to display order
      val out = new Array[Int](w * h)
      var d = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
        var r = start
        while (r < h) {
          System.arraycopy(px, d * w, out, r * w, w)
          d += 1
          r += step
        }
      }
      Some((w, h, out))
    }
  }

  /** REAL PNG pixel decode for 8-bit non-interlaced grayscale: IDAT
    * chunks concatenate into one zlib stream (`java.util.zip.Inflater`
    * handles stored and deflated blocks alike), then per-row unfiltering
    * applies all five PNG filter types (None/Sub/Up/Average/Paeth,
    * bpp = 1). Cross-validated against the JDK's own ImageIO decoder in
    * MultimodalSpec. Returns `(w, h, pixels)` row-major, or None for
    * anything the decoder doesn't cover — same never-throw contract and
    * 2²⁴-pixel bound as the rest of the codec.
    */
  private[graft] def pngGray8(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!hasPrefix(b, PngSig) || b.length < 33 || !tagAt(b, 12, "IHDR")) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
    if ((b(24) & 0xff) != 8 || (b(25) & 0xff) != 0) return None // 8-bit gray
    if ((b(28) & 0xff) != 0) return None // no interlace
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    var sawEnd = false
    while (!sawEnd && off + 12 <= b.length) {
      val len = be32(b, off)
      if (len < 0 || off + 12 + len.toLong > b.length) return None
      if (tagAt(b, off + 4, "IDAT")) idat.write(b, off + 8, len)
      if (tagAt(b, off + 4, "IEND")) sawEnd = true
      off += 12 + len
    }
    val expected = h * (w + 1) // filter byte + w gray pixels per row
    val raw = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < expected && !inf.finished()) {
        val n = inf.inflate(raw, got, expected - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        got += n
      }
      if (got < expected) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    val px = new Array[Byte](w * h)
    var r = 0
    while (r < h) {
      val ft = raw(r * (w + 1)) & 0xff
      var c = 0
      while (c < w) {
        val x = raw(r * (w + 1) + 1 + c) & 0xff
        val a = if (c > 0) px(r * w + c - 1) & 0xff else 0
        val up = if (r > 0) px((r - 1) * w + c) & 0xff else 0
        val ul = if (r > 0 && c > 0) px((r - 1) * w + c - 1) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + (a + up) / 2
          case 4 =>
            val p = a + up - ul
            val pa = math.abs(p - a)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul)
          case _ => return None
        }
        px(r * w + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    Some((w, h, px))
  }

  // ------------------------------------------------------------- JPEG
  // Sequential AND progressive DCT decoder (ITU-T T.81): marker walk →
  // DQT/DHT/SOF0-2/DRI/SOS → huffman entropy decode → dequant → float
  // IDCT → luma plane. General: reads whatever quant/huffman tables the
  // file carries (no baked-in spec tables), interleaved multi-component
  // scans with sampling factors, 0xFF00 byte stuffing, restart markers.
  // Progressive (SOF2) frames accumulate coefficients across scans
  // (spectral selection + successive approximation, EOB-run coding) and
  // IDCT once at the end. Chroma blocks are entropy-decoded only where
  // the bitstream position demands it (sequential scans, interleaved DC
  // scans); progressive chroma AC scans are skipped whole — only the
  // luma plane feeds the perceptual hash. Non-8-bit frames return None;
  // so does any malformed stream (never throws).

  private val JpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1)·u·π/16) and the 1/√2 DC factors, shared by every block.
  // For a DC-only block the IDCT reduces to DC/8 + 128 EXACTLY (cos(0)=1,
  // the /8 is a power of two), which is what makes the constant-block
  // fixture SQL-replayable bit-for-bit.
  private lazy val JpegCos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private lazy val JpegC: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Decode a sequential OR progressive JPEG to its luma plane at full
    * resolution: `(width, height, pixels)`, row-major, values 0..255.
    * `None` for 12-bit/lossless/arithmetic/malformed streams — never
    * throws.
    */
  private[graft] def jpegGray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    try jpegGrayParse(b)
    catch { case _: Exception => None } // malformed entropy data / truncation
  }

  private final class JpegHuff(bits: Array[Int], val vals: Array[Int]) {
    // canonical-code decode tables (T.81 F.2.2.3): min/max code per length
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  private def jpegGrayParse(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val quant = Array.ofDim[Int](4, 64)
    val huffs = Array.ofDim[JpegHuff](2, 4)
    var w = 0; var h = 0; var nComp = 0
    val compId = new Array[Int](4); val compH = new Array[Int](4)
    val compV = new Array[Int](4); val compQ = new Array[Int](4)
    var restartInterval = 0
    var off = 2
    var progressive = false
    // current scan's spectral selection + successive approximation
    var ss = 0; var se = 63; var ah = 0; var al = 0

    // ---- marker walk up to (and including) the SOS header
    var scanComps: Array[(Int, Int, Int)] = null // (sofIdx, dcTable, acTable)
    while (scanComps == null) {
      if (off + 4 > b.length) return None
      if ((b(off) & 0xff) != 0xff) return None
      while (off + 4 <= b.length && (b(off + 1) & 0xff) == 0xff) off += 1 // fill bytes
      val marker = b(off + 1) & 0xff
      off += 2
      if (marker == 0xd9) return None // EOI before SOS
      else if (marker >= 0xd0 && marker <= 0xd7) () // stray RST: no payload
      else {
        if (off + 2 > b.length) return None
        val len = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
        if (len < 2 || off + len > b.length) return None
        val end = off + len
        var p = off + 2
        marker match {
          case 0xdb => // DQT: one or more tables
            while (p < end) {
              val pq = (b(p) & 0xff) >> 4; val tq = b(p) & 0x0f
              if (tq > 3) return None
              p += 1
              var i = 0
              while (i < 64) {
                val v =
                  if (pq == 0) { val x = b(p) & 0xff; p += 1; x }
                  else { val x = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff); p += 2; x }
                quant(tq)(JpegZigzag(i)) = v
                i += 1
              }
            }
          case 0xc4 => // DHT: one or more tables
            while (p < end) {
              val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f
              if (tc > 1 || th > 3) return None
              p += 1
              val bits = new Array[Int](16)
              var total = 0
              var i = 0
              while (i < 16) { bits(i) = b(p + i) & 0xff; total += bits(i); i += 1 }
              p += 16
              if (total > 256 || p + total > end) return None
              val vals = new Array[Int](total)
              i = 0
              while (i < total) { vals(i) = b(p + i) & 0xff; i += 1 }
              p += total
              huffs(tc)(th) = new JpegHuff(bits, vals)
            }
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1/2: sequential / progressive
            progressive = marker == 0xc2
            if ((b(p) & 0xff) != 8) return None // 8-bit only
            h = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
            w = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
            nComp = b(p + 5) & 0xff
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
            if (nComp < 1 || nComp > 4) return None
            p += 6
            var c = 0
            while (c < nComp) {
              compId(c) = b(p) & 0xff
              compH(c) = (b(p + 1) & 0xff) >> 4; compV(c) = b(p + 1) & 0x0f
              compQ(c) = b(p + 2) & 0xff
              if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4 ||
                compQ(c) > 3) return None
              p += 3
              c += 1
            }
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // lossless/arithmetic/hierarchical frames
          case 0xdd => // DRI
            restartInterval = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
          case 0xda => // SOS
            if (nComp == 0) return None
            val ns = b(p) & 0xff
            p += 1
            if (ns < 1 || ns > 4) return None
            val sc = new Array[(Int, Int, Int)](ns)
            var i = 0
            while (i < ns) {
              val cid = b(p) & 0xff
              val idx = (0 until nComp).find(compId(_) == cid).getOrElse(return None)
              sc(i) = (idx, (b(p + 1) & 0xff) >> 4, b(p + 1) & 0x0f)
              p += 2
              i += 1
            }
            if (p + 3 > end) return None
            ss = b(p) & 0xff; se = b(p + 1) & 0xff
            ah = (b(p + 2) & 0xff) >> 4; al = b(p + 2) & 0x0f
            scanComps = sc
          case _ => () // APPn / COM / DNL / unknown: skip by length
        }
        if (scanComps == null) off = end
        else off = off + len // entropy data starts here
      }
    }

    // ---- entropy-coded data
    val hmax = (0 until nComp).map(compH).max
    val vmax = (0 until nComp).map(compV).max
    // the hash wants the luma plane at image resolution: the first SOF
    // component must be the max-sampled one (true for every real encoder)
    if (compH(0) != hmax || compV(0) != vmax) return None

    var pos = off
    var bitBuf = 0; var bitCnt = 0
    def readBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= b.length) throw new IllegalStateException("jpeg: eof in scan")
        var by = b(pos) & 0xff; pos += 1
        if (by == 0xff) {
          val nb = if (pos < b.length) b(pos) & 0xff else -1
          if (nb == 0x00) pos += 1
          else throw new IllegalStateException("jpeg: marker in scan")
        }
        bitBuf = by; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def decodeHuff(t: JpegHuff): Int = {
      if (t == null) throw new IllegalStateException("jpeg: missing huff table")
      var code = readBit(); var l = 1
      while (code > t.maxCode(l)) {
        code = (code << 1) | readBit(); l += 1
        if (l > 16) throw new IllegalStateException("jpeg: bad huff code")
      }
      t.vals(t.valPtr(l) + code - t.minCode(l))
    }
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

    val px = new Array[Int](w * h)
    val coef = new Array[Int](64)
    val dcPred = new Array[Int](4)

    def decodeBlock(ci: Int, dcT: Int, acT: Int): Unit = {
      java.util.Arrays.fill(coef, 0)
      val qt = quant(compQ(ci))
      val s = decodeHuff(huffs(0)(dcT))
      if (s > 15) throw new IllegalStateException("jpeg: bad DC category")
      dcPred(ci) += extend(receive(s), s)
      coef(0) = dcPred(ci) * qt(0)
      var k = 1
      while (k < 64) {
        val rs = decodeHuff(huffs(1)(acT))
        val run = rs >> 4; val sz = rs & 15
        if (sz == 0) {
          if (run == 15) k += 16 else k = 64 // ZRL / EOB
        } else {
          k += run
          if (k > 63) throw new IllegalStateException("jpeg: AC index overflow")
          coef(JpegZigzag(k)) = extend(receive(sz), sz) * qt(JpegZigzag(k))
          k += 1
        }
      }
    }
    // place an IDCT'd luma block whose top-left pixel is (py, px0)
    def idctInto(py: Int, px0: Int): Unit = {
      var y = 0
      while (y < 8) {
        val ry = py + y
        if (ry < h) {
          var x = 0
          while (x < 8) {
            val rx = px0 + x
            if (rx < w) {
              var sum = 0.0
              var v = 0
              while (v < 8) {
                var u = 0
                while (u < 8) {
                  val f = coef(v * 8 + u)
                  if (f != 0)
                    sum += JpegC(u) * JpegC(v) * f * JpegCos(x)(u) * JpegCos(y)(v)
                  u += 1
                }
                v += 1
              }
              val p = math.round(sum / 4.0).toInt + 128
              px(ry * w + rx) = if (p < 0) 0 else if (p > 255) 255 else p
            }
            x += 1
          }
        }
        y += 1
      }
    }
    def restartAt(mcu: Int): Unit =
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bitCnt = 0 // byte-align
        if (pos + 2 > b.length || (b(pos) & 0xff) != 0xff ||
          (b(pos + 1) & 0xff) < 0xd0 || (b(pos + 1) & 0xff) > 0xd7)
          throw new IllegalStateException("jpeg: expected restart marker")
        pos += 2
        java.util.Arrays.fill(dcPred, 0)
      }

    if (progressive) {
      // ---- progressive (T.81 annex G): coefficients accumulate across
      // scans — DC first/refine by successive approximation, AC bands by
      // spectral selection with EOB-run coding — and the IDCT runs ONCE at
      // the end over the accumulated (still-quantized) luma coefficients.
      // Luma-only: chroma DC is entropy-decoded where it interleaves with
      // luma bits, but chroma AC scans (always single-component) are
      // skipped by scanning to the next marker — their coefficient
      // history is never needed for the luma plane.
      val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
      val blocksW = mcusX * compH(0)
      val lumaBx = (w + 7) / 8; val lumaBy = (h + 7) / 8
      val coefs = Array.fill(mcusY * compV(0) * blocksW)(new Array[Int](64))
      var eobrun = 0

      def restartProg(unit: Int): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          bitCnt = 0 // byte-align
          if (pos + 2 > b.length || (b(pos) & 0xff) != 0xff ||
            (b(pos + 1) & 0xff) < 0xd0 || (b(pos + 1) & 0xff) > 0xd7)
            throw new IllegalStateException("jpeg: expected restart marker")
          pos += 2
          java.util.Arrays.fill(dcPred, 0)
          eobrun = 0
        }

      def dcUnit(ci: Int, dcT: Int, blockRow: Int, blockCol: Int): Unit =
        if (ah == 0) {
          val s = decodeHuff(huffs(0)(dcT))
          if (s > 15) throw new IllegalStateException("jpeg: bad DC category")
          dcPred(ci) += extend(receive(s), s)
          if (ci == 0) coefs(blockRow * blocksW + blockCol)(0) = dcPred(ci) << al
        } else {
          val bit = readBit()
          // refinement appends the next lower magnitude bit; it is always
          // currently 0 (first pass left bits below the old Al clear), so
          // |= is the spec's += at this bit position
          if (ci == 0 && bit == 1) coefs(blockRow * blocksW + blockCol)(0) |= 1 << al
        }

      // first AC pass over one block's [ss, se] band (T.81 G.1.2.2 /
      // the libjpeg decode_mcu_AC_first shape)
      def acFirst(cf: Array[Int], acT: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        var break = false
        while (k <= se && !break) {
          val rs = decodeHuff(huffs(1)(acT))
          val r = rs >> 4; val s = rs & 15
          if (s == 0) {
            if (r < 15) {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += receive(r)
              break = true
            } else k += 16 // ZRL
          } else {
            k += r
            if (k > 63) throw new IllegalStateException("jpeg: AC index overflow")
            cf(JpegZigzag(k)) = extend(receive(s), s) << al
            k += 1
          }
        }
      }

      // AC refinement pass (G.1.2.3 / decode_mcu_AC_refine): every
      // nonzero-history coefficient in the band consumes a correction
      // bit; new coefficients appear with magnitude 1 at this bit
      def acRefine(cf: Array[Int], acT: Int): Unit = {
        val bit = 1 << al
        def correct(idx: Int): Unit =
          if (readBit() == 1 && (cf(idx) & bit) == 0)
            cf(idx) += (if (cf(idx) > 0) bit else -bit)
        var k = ss
        if (eobrun > 0) {
          eobrun -= 1
          while (k <= se) {
            val idx = JpegZigzag(k)
            if (cf(idx) != 0) correct(idx)
            k += 1
          }
        } else {
          while (k <= se) {
            val rs = decodeHuff(huffs(1)(acT))
            var r = rs >> 4; val s = rs & 15
            var sVal = 0
            if (s == 0) {
              if (r < 15) {
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += receive(r)
                // no new coefficient: r = 64 makes the advance below walk
                // the REST of the band correcting nonzero-history
                // coefficients (they still consume bits in an EOB block),
                // then k > se ends the scan of this block
                r = 64
              } // r == 15 (ZRL): pass over 16 zero-history coefficients
            } else {
              if (s != 1) throw new IllegalStateException("jpeg: bad AC refine size")
              sVal = if (readBit() == 1) bit else -bit
            }
            var placed = false
            while (k <= se && !placed) {
              val idx = JpegZigzag(k); k += 1
              if (cf(idx) != 0) correct(idx)
              else if (r == 0) {
                if (sVal != 0) cf(idx) = sVal
                placed = true
              } else r -= 1
            }
          }
        }
      }

      // first 0xFF-marker position at/after `from`, skipping stuffed
      // 0xFF00 data bytes, fill bytes, and in-scan restart markers —
      // how a scan whose bits we do not need (chroma AC) is stepped over
      def nextMarker(from: Int): Int = {
        var p = from
        while (p + 1 < b.length) {
          if ((b(p) & 0xff) == 0xff) {
            val m = b(p + 1) & 0xff
            if (m == 0x00) p += 2
            else if (m == 0xff) p += 1
            else if (m >= 0xd0 && m <= 0xd7) p += 2
            else return p
          } else p += 1
        }
        b.length
      }

      var done = false
      while (!done) {
        // ---- decode the current scan (entropy data starts at `off`)
        pos = off; bitBuf = 0; bitCnt = 0
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
        if (ss == 0) {
          if (se != 0) return None // DC scan must not carry AC band
          if (scanComps.length > 1) {
            // interleaved DC: MCU walk, all listed components in order
            var mcu = 0; var my = 0
            while (my < mcusY) {
              var mx = 0
              while (mx < mcusX) {
                restartProg(mcu)
                var i = 0
                while (i < scanComps.length) {
                  val (ci, dcT, _) = scanComps(i)
                  var bv = 0
                  while (bv < compV(ci)) {
                    var bh = 0
                    while (bh < compH(ci)) {
                      dcUnit(ci, dcT, my * compV(ci) + bv, mx * compH(ci) + bh)
                      bh += 1
                    }
                    bv += 1
                  }
                  i += 1
                }
                mcu += 1; mx += 1
              }
              my += 1
            }
          } else {
            // single-component DC scan: the component's own block grid
            val (ci, dcT, _) = scanComps(0)
            val cw = (w * compH(ci) + hmax - 1) / hmax
            val ch = (h * compV(ci) + vmax - 1) / vmax
            val bx = (cw + 7) / 8; val by = (ch + 7) / 8
            var unit = 0; var yB = 0
            while (yB < by) {
              var xB = 0
              while (xB < bx) {
                restartProg(unit)
                dcUnit(ci, dcT, yB, xB)
                unit += 1; xB += 1
              }
              yB += 1
            }
          }
        } else {
          // AC scan: T.81 requires non-interleaved
          if (scanComps.length != 1 || se > 63 || ss > se) return None
          val (ci, _, acT) = scanComps(0)
          if (ci == 0) {
            var unit = 0; var yB = 0
            while (yB < lumaBy) {
              var xB = 0
              while (xB < lumaBx) {
                restartProg(unit)
                val cf = coefs(yB * blocksW + xB)
                if (ah == 0) acFirst(cf, acT) else acRefine(cf, acT)
                unit += 1; xB += 1
              }
              yB += 1
            }
          }
          // chroma AC: bits unread — nextMarker below steps over them
        }

        // ---- walk to the next scan (DHT/DQT/DRI may redefine between)
        var p = nextMarker(if (ss > 0 && scanComps(0)._1 != 0) off else pos)
        var nextScan: Array[(Int, Int, Int)] = null
        while (nextScan == null && !done) {
          if (p + 2 > b.length) return None
          val marker = b(p + 1) & 0xff
          p += 2
          if (marker == 0xd9) done = true // EOI: all scans accumulated
          else {
            if (p + 2 > b.length) return None
            val len = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
            if (len < 2 || p + len > b.length) return None
            val end = p + len
            var q = p + 2
            marker match {
              case 0xdb =>
                while (q < end) {
                  val pq = (b(q) & 0xff) >> 4; val tq = b(q) & 0x0f
                  if (tq > 3) return None
                  q += 1
                  var i = 0
                  while (i < 64) {
                    val v =
                      if (pq == 0) { val x = b(q) & 0xff; q += 1; x }
                      else { val x = ((b(q) & 0xff) << 8) | (b(q + 1) & 0xff); q += 2; x }
                    quant(tq)(JpegZigzag(i)) = v
                    i += 1
                  }
                }
              case 0xc4 =>
                while (q < end) {
                  val tc = (b(q) & 0xff) >> 4; val th = b(q) & 0x0f
                  if (tc > 1 || th > 3) return None
                  q += 1
                  val bits = new Array[Int](16)
                  var total = 0
                  var i = 0
                  while (i < 16) { bits(i) = b(q + i) & 0xff; total += bits(i); i += 1 }
                  q += 16
                  if (total > 256 || q + total > end) return None
                  val vals = new Array[Int](total)
                  i = 0
                  while (i < total) { vals(i) = b(q + i) & 0xff; i += 1 }
                  q += total
                  huffs(tc)(th) = new JpegHuff(bits, vals)
                }
              case 0xdd =>
                restartInterval = ((b(q) & 0xff) << 8) | (b(q + 1) & 0xff)
              case 0xda =>
                val ns = b(q) & 0xff
                q += 1
                if (ns < 1 || ns > 4) return None
                val sc = new Array[(Int, Int, Int)](ns)
                var i = 0
                while (i < ns) {
                  val cid = b(q) & 0xff
                  val idx = (0 until nComp).find(compId(_) == cid).getOrElse(return None)
                  sc(i) = (idx, (b(q + 1) & 0xff) >> 4, b(q + 1) & 0x0f)
                  q += 2
                  i += 1
                }
                if (q + 3 > end) return None
                ss = b(q) & 0xff; se = b(q + 1) & 0xff
                ah = (b(q + 2) & 0xff) >> 4; al = b(q + 2) & 0x0f
                nextScan = sc
              case _ => () // APPn / COM / DNL: skip
            }
            if (nextScan == null && !done) p = end
            else if (nextScan != null) off = end // entropy data of next scan
          }
        }
        if (nextScan != null) scanComps = nextScan
      }

      // ---- dequantize + IDCT the accumulated luma blocks
      val qt = quant(compQ(0))
      var yB = 0
      while (yB < lumaBy) {
        var xB = 0
        while (xB < lumaBx) {
          val cf = coefs(yB * blocksW + xB)
          var i = 0
          while (i < 64) { coef(i) = cf(i) * qt(i); i += 1 }
          idctInto(yB * 8, xB * 8)
          xB += 1
        }
        yB += 1
      }
    } else if (scanComps.length > 1) {
      // interleaved scan: MCU = one v×h block grid per component
      val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
      var mcu = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          restartAt(mcu)
          var i = 0
          while (i < scanComps.length) {
            val (ci, dcT, acT) = scanComps(i)
            var bv = 0
            while (bv < compV(ci)) {
              var bh = 0
              while (bh < compH(ci)) {
                decodeBlock(ci, dcT, acT)
                if (ci == 0)
                  idctInto((my * vmax + bv) * 8, (mx * hmax + bh) * 8)
                bh += 1
              }
              bv += 1
            }
            i += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved scan: data units walk the component's own grid
      val (ci, dcT, acT) = scanComps(0)
      val cw = (w * compH(ci) + hmax - 1) / hmax
      val ch = (h * compV(ci) + vmax - 1) / vmax
      val bx = (cw + 7) / 8; val by = (ch + 7) / 8
      var mcu = 0
      var yB = 0
      while (yB < by) {
        var xB = 0
        while (xB < bx) {
          restartAt(mcu)
          decodeBlock(ci, dcT, acT)
          if (ci == 0) idctInto(yB * 8, xB * 8)
          mcu += 1
          xB += 1
        }
        yB += 1
      }
    }
    Some((w, h, px))
  }

  /** Frame-sampling stage: one row per sampled frame index, `stride`
    * apart — images contribute their single frame, audio contributes every
    * stride-th PCM frame. The row-explosion shape of real frame extraction.
    */
  def sampleFrames(decoded: Dataset[DecodedMeta], stride: Int): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.flatMap { m =>
      (0 until m.n_frames by stride).map(f => (m.media_id, f, m.width, m.height))
    }.toDF("media_id", "frame_idx", "width", "height")
  }

  /** One sampled frame with its REAL timing/size coordinates. `frame_time`
    * is in the track's native clock (mdhd timescale ticks for MP4, the
    * sample index for PCM, 0 for stills); `frame_bytes` is the stored
    * sample size (stsz for MP4, block align for PCM, 0 for stills).
    */
  final case class FrameRow(
      media_id: Long, frame_idx: Int, width: Int, height: Int,
      frame_time: Long, frame_bytes: Long)

  /** [[sampleFrames]] upgraded to read the REAL sample tables: MP4 frame
    * times come from walking the `stts` duration runs (variable per-frame
    * durations — cumulative delta sum up to each sampled index) and frame
    * sizes from `stsz` (per-sample or constant form), not from header
    * arithmetic. This is the lookup a video pipeline does before issuing
    * byte-range reads for the sampled frames (`stsz`/`stco` offsets), so
    * the positions must come from the tables the reads would use. WAV
    * frames tick the PCM sample clock with block-align bytes; stills are
    * one frame at time 0. Runs partition-wise over the payload bytes —
    * no shuffle, no driver collection; malformed tables degrade to
    * time/bytes 0 for the header-derived frame count, never a throw.
    */
  def sampleFramesWithTables(media: Dataset[MediaRow], stride: Int): Dataset[FrameRow] = {
    require(stride > 0, "stride must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val m = decodeMeta(r.media_id, r.payload)
      m.format match {
        case "mp4" =>
          mp4FrameSamples(r.payload, stride) match {
            case Some(rows) =>
              rows.map { case (i, t, sz) => FrameRow(m.media_id, i, m.width, m.height, t, sz) }
            case None => // header-count fallback for broken sample tables
              (0 until m.n_frames by stride)
                .map(f => FrameRow(m.media_id, f, m.width, m.height, 0L, 0L))
          }
        case "wav" =>
          val blockAlign = 2L * math.max(m.channels, 1)
          (0 until m.n_frames by stride)
            .map(f => FrameRow(m.media_id, f, m.width, m.height, f.toLong, blockAlign))
        case _ =>
          (0 until m.n_frames by stride)
            .map(f => FrameRow(m.media_id, f, m.width, m.height, 0L, 0L))
      }
    })
  }

  /** Walk the first trak-with-stbl's `stts`/`stsz` and return the sampled
    * `(frame_idx, cumulative_time_ticks, sample_bytes)` triples at
    * `stride`. Both stts forms of truth are honored: multiple runs with
    * different deltas accumulate run by run (never `idx · delta`);
    * `stsz.sample_size != 0` is the constant-size form, else the
    * per-sample table is read at its exact offset. Declared counts are
    * clamped to the box's actual bytes (crafted headers must not read
    * past a box). `None` if there is no usable stts.
    */
  private[graft] def mp4FrameSamples(
      b: Array[Byte], stride: Int): Option[IndexedSeq[(Int, Long, Long)]] = {
    val n = b.length.toLong
    if (!(b.length >= 12 && tagAt(b, 4, "ftyp"))) return None
    val moov = findBox(b, 0L, n, "moov")
    if (moov == null) return None
    var trakFrom = moov(0)
    var stbl: Array[Long] = null
    while (stbl == null) {
      val trak = findBox(b, trakFrom, moov(1), "trak")
      if (trak == null) return None
      val mdia = findBox(b, trak(0), trak(1), "mdia")
      val minf = if (mdia == null) null else findBox(b, mdia(0), mdia(1), "minf")
      stbl = if (minf == null) null else findBox(b, minf(0), minf(1), "stbl")
      trakFrom = trak(1)
    }
    val stts = findBox(b, stbl(0), stbl(1), "stts")
    if (stts == null || stts(1) - stts(0) < 8) return None
    val sttsP = stts(0)
    val declared = be32(b, (sttsP + 4).toInt).toLong & 0xffffffffL
    val entries = math.min(declared, (stts(1) - sttsP - 8) / 8).toInt
    if (entries <= 0) return None
    val runCount = new Array[Long](entries)
    val runDelta = new Array[Long](entries)
    var total = 0L
    var e = 0
    while (e < entries) {
      runCount(e) = be32(b, (sttsP + 8 + e * 8L).toInt).toLong & 0xffffffffL
      runDelta(e) = be32(b, (sttsP + 12 + e * 8L).toInt).toLong & 0xffffffffL
      total += runCount(e)
      e += 1
    }
    val nFrames = math.min(total, (1L << 24)).toInt // bound crafted counts
    // stsz: constant-size form or per-sample table (sizes clamp to 0 when
    // the box lies about its count)
    val stsz = findBox(b, stbl(0), stbl(1), "stsz")
    val (constSize, szP, szEnd) =
      if (stsz == null || stsz(1) - stsz(0) < 12) (0L, -1L, -1L)
      else {
        val p = stsz(0)
        val cs = be32(b, (p + 4).toInt).toLong & 0xffffffffL
        (cs, p + 12, stsz(1))
      }
    def sizeOf(i: Int): Long =
      if (szP < 0) 0L
      else if (constSize != 0) constSize
      else {
        val off = szP + i * 4L
        if (off + 4 <= szEnd) be32(b, off.toInt).toLong & 0xffffffffL else 0L
      }
    // sampled indices ascend, so one forward walk through the runs gives
    // every cumulative time in O(entries + samples)
    val out = IndexedSeq.newBuilder[(Int, Long, Long)]
    var run = 0
    var runStartIdx = 0L // first sample index of the current run
    var runStartTime = 0L // cumulative ticks at the start of the current run
    var i = 0
    while (i < nFrames) {
      while (run < entries - 1 && i >= runStartIdx + runCount(run)) {
        runStartTime += runCount(run) * runDelta(run)
        runStartIdx += runCount(run)
        run += 1
      }
      val t = runStartTime + (i - runStartIdx) * runDelta(run)
      out += ((i, t, sizeOf(i)))
      i += stride
    }
    Some(out.result())
  }

  /** Resize stage: fit image dims into a `maxW`×`maxH` box preserving
    * aspect ratio; audio/unknown rows (zero dims) pass through untouched.
    * Metadata-only here, but the dataflow shape (typed in, typed out, no
    * shuffle) is exactly the production pixel-resize one.
    */
  def resize(decoded: Dataset[DecodedMeta], maxW: Int, maxH: Int): Dataset[DecodedMeta] = {
    import decoded.sparkSession.implicits._
    decoded.map { m =>
      if (m.width <= 0 || m.height <= 0) m
      else {
        val scale = math.min(1.0,
          math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
        m.copy(
          width = math.max(1, math.round(m.width * scale).toInt),
          height = math.max(1, math.round(m.height * scale).toInt))
      }
    }
  }

  /** Audio feature extraction over REAL bytes: walks to the WAV `data`
    * chunk, reads the 16-bit little-endian PCM samples, and emits `dim`
    * chunk means (sample j of n lands in chunk j*dim/n). Batched per
    * partition like a real model-server call (`grouped(batchSize)` is the
    * inference batch shape). Non-WAV payloads are skipped.
    */
  def extractAudioFeatures(
      media: Dataset[MediaRow],
      dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real pipeline would run one model inference on `batch` here
        batch.flatMap { row =>
          val w = wavChunks(row.payload)
          if (w == null) None
          else {
            val Array(_, _, block, dataOff, dataLen) = w
            val nFrames = dataLen / block
            // block >= 2: this reader consumes 2 bytes (one 16-bit sample)
            // per frame; a blockAlign=1 stream would read one byte past the
            // data chunk, so 8-bit audio is metadata-only (see wavChunks)
            if (block < 2 || nFrames <= 0) None
            else {
              val sums = new Array[Double](dim)
              val counts = new Array[Long](dim)
              var j = 0
              while (j < nFrames) {
                // first channel of frame j, signed 16-bit LE
                val s = le16(row.payload, dataOff + j * block).toShort.toDouble
                val c = ((j.toLong * dim) / nFrames).toInt
                sums(c) += s
                counts(c) += 1
                j += 1
              }
              val f = Array.tabulate(dim)(i =>
                if (counts(i) == 0) 0.0 else sums(i) / counts(i))
              Some(MediaFeature(row.media_id, f))
            }
          }
        }
      }
    }
  }

  // ------------------------------------------------- fixture construction
  // Real container bytes with dimensions that are pure arithmetic over the
  // id — so an external oracle can verify the parsed headers by replaying
  // the same arithmetic in SQL while Spark parses the actual bytes.

  /** PNG fixture dims: w in [16, 332], h in [16, 112] (raw scanline bytes
    * stay under one 64 KiB zlib stored block).
    */
  def fixtureWidth(id: Long): Int = 16 + (id % 317).toInt
  def fixtureHeight(id: Long): Int = 16 + ((id * 7) % 97).toInt
  def fixtureSampleRate(id: Long): Int = 8000 + (id % 5).toInt * 4000
  def fixtureSamples(id: Long): Int = 64 + (id % 937).toInt

  /** Deterministic PCM sample j for media `id` (signed 16-bit range). */
  def fixtureSample(id: Long, j: Int): Short =
    (math.floorMod(id * 31 + j.toLong * 2654435761L, 65536L) - 32768L).toShort

  private def crcChunk(out: java.io.ByteArrayOutputStream, tag: String, data: Array[Byte]): Unit = {
    val len = data.length
    out.write(Array[Byte](
      (len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
    val tb = tag.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new CRC32
    crc.update(tb)
    crc.update(data)
    val c = crc.getValue
    out.write(Array[Byte](
      (c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
  }

  /** A fully valid 8-bit grayscale PNG: signature, IHDR, one IDAT holding
    * a single zlib STORED block (so the byte count is closed-form:
    * 68 + h*(w+1)), IEND. Decodable by any PNG reader.
    */
  def pngBytes(id: Long): Array[Byte] = {
    val w = fixtureWidth(id); val h = fixtureHeight(id)
    val raw = new Array[Byte](h * (w + 1)) // per row: filter byte 0 + w pixels
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        raw(r * (w + 1) + 1 + c) = ((id + r * w + c) % 256).toByte
        c += 1
      }
      r += 1
    }
    // zlib stream: 0x78 0x01 header, one final stored block, Adler-32
    val z = new java.io.ByteArrayOutputStream(raw.length + 11)
    z.write(0x78); z.write(0x01)
    z.write(0x01) // BFINAL=1, BTYPE=00 (stored)
    z.write(raw.length & 0xff); z.write((raw.length >>> 8) & 0xff)
    val nlen = raw.length ^ 0xffff
    z.write(nlen & 0xff); z.write((nlen >>> 8) & 0xff)
    z.write(raw, 0, raw.length)
    val ad = new Adler32; ad.update(raw)
    val a = ad.getValue
    z.write(Array[Byte](
      (a >>> 24).toByte, (a >>> 16).toByte, (a >>> 8).toByte, a.toByte))

    val out = new java.io.ByteArrayOutputStream(raw.length + 80)
    out.write(PngSig)
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    // 10..12: compression 0, filter 0, interlace 0
    crcChunk(out, "IHDR", ihdr)
    crcChunk(out, "IDAT", z.toByteArray)
    crcChunk(out, "IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** A valid 24-bpp BI_RGB BMP: BITMAPFILEHEADER + BITMAPINFOHEADER +
    * 4-byte-aligned pixel rows. Byte count is closed-form:
    * 54 + ((w*3+3)/4*4) * h.
    */
  def bmpBytes(id: Long): Array[Byte] = {
    val w = fixtureWidth(id); val h = fixtureHeight(id)
    val stride = ((w * 3 + 3) / 4) * 4
    val total = 54 + stride * h
    val b = new Array[Byte](total)
    def putLe32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
      b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    putLe32(2, total)
    putLe32(10, 54) // pixel-data offset
    putLe32(14, 40) // BITMAPINFOHEADER size
    putLe32(18, w)
    putLe32(22, h)
    b(26) = 1 // planes
    b(28) = 24 // bpp
    putLe32(34, stride * h) // image size
    putLe32(38, 2835); putLe32(42, 2835) // 72 DPI
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val v = ((id + r * w + c) % 256).toByte
        // positive biHeight ⇒ bottom-up storage: logical row r at h-1-r
        val off = 54 + (h - 1 - r) * stride + c * 3
        b(off) = v; b(off + 1) = v; b(off + 2) = v
        c += 1
      }
      r += 1
    }
    b
  }

  /** A valid 16-bit mono PCM WAV: RIFF/WAVE + fmt + data. Byte count is
    * closed-form: 44 + 2*nSamples. Samples follow `fixtureSample`.
    */
  def wavBytes(id: Long): Array[Byte] = {
    val rate = fixtureSampleRate(id)
    val n = fixtureSamples(id)
    val dataLen = 2 * n
    val b = new Array[Byte](44 + dataLen)
    def putTag(i: Int, t: String): Unit = { var k = 0; while (k < 4) { b(i + k) = t(k).toByte; k += 1 } }
    def putLe32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
      b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
    }
    def putLe16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte }
    putTag(0, "RIFF"); putLe32(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1) // PCM
    putLe16(22, 1) // mono
    putLe32(24, rate)
    putLe32(28, rate * 2) // byte rate
    putLe16(32, 2) // block align
    putLe16(34, 16) // bits per sample
    putTag(36, "data"); putLe32(40, dataLen)
    var j = 0
    while (j < n) {
      putLe16(44 + 2 * j, fixtureSample(id, j) & 0xffff)
      j += 1
    }
    b
  }

  /** First-run length of the fixture's two-run stts: the first
    * `ceil(nf/2)` samples tick delta 1, the rest delta 2 — VARIABLE frame
    * durations, so a reader that multiplies `index · delta` instead of
    * walking the runs gets every second-half timestamp wrong.
    */
  def fixtureSttsRun1(id: Long): Int = (fixtureSamples(id) + 1) / 2

  /** Stored size of fixture sample `i`: `100 + (i mod 7)` — per-sample
    * stsz entries (sample_size = 0 form), formula-replayable.
    */
  def fixtureSampleBytes(i: Int): Int = 100 + (i % 7)

  /** A valid minimal MP4: ftyp + moov(mvhd + trak(tkhd + mdia(mdhd +
    * minf(stbl(stts + stsz))))) + empty mdat — every box v0, byte count
    * closed-form: 352 + 4·nf (the stsz per-sample table). Dims reuse the
    * PNG arithmetic (fixtureWidth/Height), the frame count reuses
    * fixtureSamples, the mdhd timescale reuses fixtureSampleRate. The
    * sample tables are REAL: stts carries TWO runs (delta 1 then delta 2
    * — see [[fixtureSttsRun1]]) and stsz per-sample sizes
    * ([[fixtureSampleBytes]]), so frame timestamps/sizes must come from
    * walking the tables, not from header arithmetic.
    */
  def mp4Bytes(id: Long): Array[Byte] = {
    val w = fixtureWidth(id); val h = fixtureHeight(id)
    val nf = fixtureSamples(id); val ts = fixtureSampleRate(id)
    val r1 = fixtureSttsRun1(id); val r2 = nf - r1
    val dur = r1 + 2 * r2 // true tick duration of the two runs
    val stszLen = 20 + 4 * nf
    val total = 352 + 4 * nf
    val b = new Array[Byte](total)
    var p = 0
    def be32(v: Int): Unit = {
      b(p) = (v >>> 24).toByte; b(p + 1) = (v >>> 16).toByte
      b(p + 2) = (v >>> 8).toByte; b(p + 3) = v.toByte; p += 4
    }
    def tag(t: String): Unit = { var i = 0; while (i < 4) { b(p) = t(i).toByte; p += 1; i += 1 } }
    def skip(nBytes: Int): Unit = p += nBytes // already zeroed
    // ftyp: major 'isom', minor 0, one compatible brand
    be32(20); tag("ftyp"); tag("isom"); be32(0); tag("isom")
    be32(324 + 4 * nf); tag("moov")
    //   mvhd v0: ver/flags, 2 times, timescale, duration, rate 1.0,
    //   volume 1.0, 10 reserved, unity matrix, 24 predefined, next track
    be32(108); tag("mvhd"); be32(0); skip(8); be32(ts); be32(dur)
    be32(0x00010000); b(p) = 0x01; skip(12) // rate 1.0, volume 1.0, 10 reserved
    be32(0x00010000); skip(12); be32(0x00010000); skip(12); be32(0x40000000)
    skip(24); be32(2)
    //   trak
    be32(208 + 4 * nf); tag("trak")
    //     tkhd v0: ver/flags(enabled), 2 times, track id, reserved,
    //     duration, 8 reserved, layer/alt/volume/reserved, matrix, w, h
    be32(92); tag("tkhd"); be32(7); skip(8); be32(1); skip(4); be32(dur)
    skip(8 + 8) // reserved + layer/alternate/volume/reserved
    be32(0x00010000); skip(12); be32(0x00010000); skip(12); be32(0x40000000)
    be32(w << 16); be32(h << 16) // 16.16 fixed
    //     mdia
    be32(108 + 4 * nf); tag("mdia")
    //       mdhd v0: ver/flags, 2 times, timescale, duration, lang, pre
    be32(32); tag("mdhd"); be32(0); skip(8); be32(ts); be32(dur); skip(4)
    //       minf/stbl: real sample tables
    be32(68 + 4 * nf); tag("minf")
    be32(60 + 4 * nf); tag("stbl")
    //         stts: two runs — (r1 × delta 1), (r2 × delta 2)
    be32(32); tag("stts"); be32(0); be32(2); be32(r1); be32(1); be32(r2); be32(2)
    //         stsz: per-sample sizes (sample_size = 0 form)
    be32(stszLen); tag("stsz"); be32(0); be32(0); be32(nf)
    var i = 0
    while (i < nf) { be32(fixtureSampleBytes(i)); i += 1 }
    // empty mdat
    be32(8); tag("mdat")
    require(p == total, s"mp4 fixture layout drifted: wrote $p of $total")
    b
  }

  /** A valid baseline-sequential grayscale JPEG whose every 8×8 block is a
    * CONSTANT: block (br,bc) holds `(id + br·wb + bc) mod 256` where
    * `wb = ceil(w/8)`. A constant block's DCT has exactly one nonzero
    * coefficient (DC = 8·(v−128)), and with an all-ones quant table the
    * decode round-trips EXACTLY (IDCT of a DC-only block is DC/8 + 128 —
    * a power-of-two division, float-exact), so the decoded pixels are a
    * pure formula a SQL oracle can replay bit-for-bit while the engine
    * runs its full general decoder (real huffman tables in DHT, real
    * entropy coding with 0xFF00 stuffing) over real bytes. Custom minimal
    * huffman tables (12 DC categories at 4/5 bits; a 1-bit AC EOB) keep
    * the encoder small; any spec-conformant decoder — ImageIO included —
    * reads them from the DHT segment like any other tables.
    */
  def jpegBytes(id: Long): Array[Byte] = {
    val w = fixtureWidth(id); val h = fixtureHeight(id)
    val wb = (w + 7) / 8; val hb = (h + 7) / 8
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(67); u8(0x00) // DQT table 0, 8-bit, all ones
    (0 until 64).foreach(_ => u8(1))
    marker(0xc0); u16(11) // SOF0: 8-bit, h, w, 1 component, 1x1, quant 0
    u8(8); u16(h); u16(w); u8(1); u8(1); u8(0x11); u8(0)
    marker(0xc4); u16(2 + 1 + 16 + 12); u8(0x00) // DHT DC 0
    val dcBits = Array(0, 0, 0, 11, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcBits.foreach(u8); (0 to 11).foreach(u8)
    marker(0xc4); u16(2 + 1 + 16 + 1); u8(0x10) // DHT AC 0: one 1-bit EOB
    val acBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acBits.foreach(u8); u8(0x00)
    marker(0xda); u16(8); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0) // SOS
    var bitBuf = 0; var nBits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = ((bitBuf << 1) | ((v >> i) & 1)) & 0xff; nBits += 1
        if (nBits == 8) {
          u8(bitBuf)
          if (bitBuf == 0xff) u8(0x00) // byte stuffing
          bitBuf = 0; nBits = 0
        }
        i -= 1
      }
    }
    def category(v: Int): Int = {
      var a = math.abs(v); var s = 0
      while (a != 0) { a >>= 1; s += 1 }
      s
    }
    var pred = 0
    var br = 0
    while (br < hb) {
      var bc = 0
      while (bc < wb) {
        val v = ((id + br.toLong * wb + bc) % 256).toInt
        val dc = (v - 128) * 8
        val diff = dc - pred; pred = dc
        val s = category(diff)
        // canonical DC codes: cats 0-10 = their own value at 4 bits,
        // cat 11 = 10110 at 5 bits
        if (s <= 10) putBits(s, 4) else putBits(0x16, 5)
        if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        putBits(0, 1) // AC: EOB
        bc += 1
      }
      br += 1
    }
    if (nBits > 0) putBits((1 << (8 - nBits)) - 1, 8 - nBits) // pad with 1s
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** The PROGRESSIVE (SOF2) twin of [[jpegBytes]]: the same constant-block
    * image, delivered as three real progressive scans —
    *
    *   1. DC first pass at Al=1 (diff-coded `dc >> 1`, shifted back on
    *      decode),
    *   2. DC refinement Ah=1→Al=0 (one raw bit per block; the fixture's
    *      DC values are multiples of 8, so every bit is 0 but still
    *      consumed from the stream),
    *   3. one AC first scan covering band 1–63 whose ENTIRE block
    *      sequence is a single EOB-run code (exercising the EOBn path),
    *      with its DHT arriving BETWEEN scans (exercising inter-scan
    *      table redefinition).
    *
    * The accumulated coefficients equal the baseline fixture's exactly,
    * so decoded pixels follow the same `(id + br·wb + bc) mod 256`
    * formula and the q95/q96 oracles replay progressive ids with the
    * same SQL arithmetic as baseline ids.
    */
  def jpegProgressiveBytes(id: Long): Array[Byte] = {
    val w = fixtureWidth(id); val h = fixtureHeight(id)
    val wb = (w + 7) / 8; val hb = (h + 7) / 8
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    var bitBuf = 0; var nBits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = ((bitBuf << 1) | ((v >> i) & 1)) & 0xff; nBits += 1
        if (nBits == 8) {
          u8(bitBuf)
          if (bitBuf == 0xff) u8(0x00)
          bitBuf = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flushBits(): Unit =
      if (nBits > 0) putBits((1 << (8 - nBits)) - 1, 8 - nBits)
    def category(v: Int): Int = {
      var a = math.abs(v); var s = 0
      while (a != 0) { a >>= 1; s += 1 }
      s
    }
    marker(0xd8) // SOI
    marker(0xdb); u16(67); u8(0x00) // DQT table 0, all ones
    (0 until 64).foreach(_ => u8(1))
    marker(0xc2); u16(11) // SOF2: 8-bit, 1 component, 1x1, quant 0
    u8(8); u16(h); u16(w); u8(1); u8(1); u8(0x11); u8(0)
    marker(0xc4); u16(2 + 1 + 16 + 12); u8(0x00) // DHT DC 0 (as baseline)
    val dcBits = Array(0, 0, 0, 11, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcBits.foreach(u8); (0 to 11).foreach(u8)
    // ---- scan 1: DC first, Ah=0, Al=1
    marker(0xda); u16(8); u8(1); u8(1); u8(0x00); u8(0); u8(0); u8(0x01)
    var pred = 0
    var br = 0
    while (br < hb) {
      var bc = 0
      while (bc < wb) {
        val v = ((id + br.toLong * wb + bc) % 256).toInt
        val dcShifted = ((v - 128) * 8) >> 1
        val diff = dcShifted - pred; pred = dcShifted
        val s = category(diff)
        if (s <= 10) putBits(s, 4) else putBits(0x16, 5)
        if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        bc += 1
      }
      br += 1
    }
    flushBits()
    // ---- scan 2: DC refinement, Ah=1, Al=0 — one raw 0 bit per block
    marker(0xda); u16(8); u8(1); u8(1); u8(0x00); u8(0); u8(0); u8(0x10)
    (0 until wb * hb).foreach(_ => putBits(0, 1))
    flushBits()
    // ---- inter-scan DHT: AC table 0 with the 15 EOBn symbols (r<<4)
    marker(0xc4); u16(2 + 1 + 16 + 15); u8(0x10)
    val acBits = Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acBits.foreach(u8); (0 until 15).foreach(r => u8(r << 4))
    // ---- scan 3: AC first, band 1..63, one EOB-run covering every block
    marker(0xda); u16(8); u8(1); u8(1); u8(0x00); u8(1); u8(63); u8(0x00)
    var n = wb * hb
    while (n > 0) {
      var r = 0
      while (r < 14 && (1 << (r + 1)) <= n) r += 1
      val extra = math.min(n - (1 << r), (1 << r) - 1)
      putBits(r, 4) // the EOBn symbol's canonical 4-bit code is its index
      if (r > 0) putBits(extra, r)
      n -= (1 << r) + extra
    }
    flushBits()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Container for media `id`: ids cycle png / bmp / wav / mp4 by `id % 4`. */
  def fixturePayload(id: Long): Array[Byte] = (id % 4) match {
    case 0 => pngBytes(id)
    case 1 => bmpBytes(id)
    case 2 => wavBytes(id)
    case _ => mp4Bytes(id)
  }

  /** Fixture source: one real container payload per id in `df(idCol)`,
    * built partition-wise (the generator itself is distributed — no driver
    * materialization of payload bytes).
    */
  def syntheticMedia(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, fixturePayload(id))))
  }

  /** Same distributed fixture source, but every id gets a [[jpegBytes]]
    * payload — the JPEG arm of the image-hash queries (q95/q96).
    */
  def syntheticJpegMedia(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, jpegBytes(id))))
  }

  /** [[syntheticJpegMedia]]'s progressive twin: every id gets a
    * [[jpegProgressiveBytes]] payload — the SOF2 arm of q95/q96.
    */
  def syntheticProgressiveJpegMedia(df: DataFrame, idCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, jpegProgressiveBytes(id))))
  }
}
