package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video ride along as opaque
  * `binary` columns with typed metadata, and the decode / feature-extract /
  * resize / frame-sample stages run as partition-wise transformations.
  *
  * The Spark-side plumbing here is real — schemas, encoders, partition
  * iteration, batch shapes — while the codec itself is a STUB (this
  * container ships no image/audio libraries): `decodeStub` derives
  * deterministic pseudo-metadata from the bytes. Swapping in a real codec
  * is a one-function change inside `mapPartitions`; everything around it
  * (the expensive-to-get-right part at 100 TB: per-partition batching, no
  * driver collect, columnar output schema) stays as-is.
  */
object Multimodal {

  /** Typed media row: id + opaque payload + declared modality. */
  final case class MediaRow(media_id: Long, modality: String, payload: Array[Byte])

  /** Decoded metadata the stub "codec" produces. */
  final case class DecodedMeta(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** Feature vector row: fixed-dim embedding per media item. */
  final case class MediaFeature(media_id: Long, feature: Array[Float])

  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xff); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** STUB codec: deterministic pseudo-decode of an opaque payload.
    * A real implementation would parse the container format here.
    */
  private[multimodal] def decodeStub(row: MediaRow): DecodedMeta = {
    val h = fnv1a(row.payload)
    val w = 320 + (math.floorMod(h, 1601L)).toInt          // 320..1920
    val ht = 240 + (math.floorMod(h >>> 17, 841L)).toInt   // 240..1080
    val frames = row.modality match {
      case "video" => 1 + (math.floorMod(h >>> 31, 300L)).toInt
      case "audio" => 1 + (math.floorMod(h >>> 31, 48L)).toInt
      case _ => 1
    }
    DecodedMeta(row.media_id, row.modality, row.payload.length.toLong, w, ht, frames, h)
  }

  /** Decode stage: partition-wise, zero driver involvement, output is a
    * columnar typed Dataset ready for predicate pushdown on metadata.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Frame-sampling stage (STUB): emits one row per sampled frame index,
    * `stride` apart — the row-explosion shape of real frame extraction.
    */
  def sampleFrames(decoded: Dataset[DecodedMeta], stride: Int): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.flatMap { m =>
      (0 until m.n_frames by stride).map(f => (m.media_id, f, m.width, m.height))
    }.toDF("media_id", "frame_idx", "width", "height")
  }

  /** Resize stage (STUB): fit into a `maxW`×`maxH` box preserving aspect
    * ratio. Partition-wise like a real pixel resize; with the codec stubbed
    * only the metadata dims change, but the dataflow shape (typed in, typed
    * out, no shuffle) is exactly the production one.
    */
  def resize(decoded: Dataset[DecodedMeta], maxW: Int, maxH: Int): Dataset[DecodedMeta] = {
    import decoded.sparkSession.implicits._
    decoded.map { m =>
      val scale = math.min(1.0,
        math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      m.copy(
        width = math.max(1, math.round(m.width * scale).toInt),
        height = math.max(1, math.round(m.height * scale).toInt))
    }
  }

  /** Feature-extraction stage (STUB): fixed-dim deterministic pseudo
    * embedding per item, batched per partition like a real model server
    * call would be (`grouped(batchSize)` = the inference batch shape).
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real pipeline would run one model inference on `batch` here
        batch.map { row =>
          val h = fnv1a(row.payload)
          val f = Array.tabulate(dim) { i =>
            val x = h * (2 * i + 1) + 0x9e3779b97f4a7c15L * i
            (math.floorMod(x, 2048L).toFloat / 1024f) - 1f
          }
          MediaFeature(row.media_id, f)
        }
      }
    }
  }

  /** Lift a text table into a pseudo-media table (payload = UTF-8 bytes);
    * lets the full pipeline run against the synthetic corpus.
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
