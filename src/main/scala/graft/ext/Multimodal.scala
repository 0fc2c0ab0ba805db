package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` payloads
 * plus typed metadata, processed batch-wise in executors.
 *
 * The Spark-side plumbing is real and tested — schema, partitioning, the
 * per-partition batch loop, output shapes. The codec calls themselves are
 * STUBBED with deterministic fakes (this container ships no image/audio
 * libraries): `FakeCodec` derives all "decoded" values from the payload
 * bytes alone, so tests are exact and reproducible. Swap `Codec` for a real
 * implementation (JavaCV, TwelveMonkeys, ffmpeg-cli) in production — the
 * dataflow does not change.
 *
 * Scale posture: payloads never pass through a shuffle (decode/feature ops
 * are narrow mapPartitions); partition sizing is byte-based (`maxRecordsPer
 * Batch` × payload size), not row-count-based; feature vectors (small) are
 * what flows into joins/ANN downstream, never the raw bytes.
 */
object Multimodal {

  /** A stored media object: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,             // image | audio | video
      payload: Array[Byte],
      width: Int, height: Int,  // images/video
      sample_rate: Int,         // audio
      duration_ms: Long)        // audio/video

  final case class ImageFeatures(
      media_id: Long, width: Int, height: Int, embedding: Array[Float])

  final case class AudioFeatures(
      media_id: Long, n_windows: Int, embedding: Array[Float])

  final case class VideoFrame(
      media_id: Long, frame_no: Int, ts_ms: Long, payload: Array[Byte])

  /** The codec seam. Production would bind real decoders here. */
  trait Codec extends Serializable {
    def decodeImage(payload: Array[Byte]): (Int, Int, Array[Float])
    def decodeAudioWindows(payload: Array[Byte], windowMs: Int, durationMs: Long): Array[Array[Float]]
    def extractFrame(payload: Array[Byte], tsMs: Long): Array[Byte]
  }

  /** Deterministic fake codec: every output derives from a rolling hash of
   * the payload — stable across runs/JVMs, no native libs. */
  object FakeCodec extends Codec {
    private def rollingSeed(payload: Array[Byte]): Long =
      payload.foldLeft(1125899906842597L)((h, b) => 31 * h + b)

    def decodeImage(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val seed = rollingSeed(payload)
      val w = 16 + math.floorMod(seed, 16).toInt
      val h = 16 + math.floorMod(seed >> 8, 16).toInt
      (w, h, featureVec(seed, 8))
    }

    def decodeAudioWindows(payload: Array[Byte], windowMs: Int, durationMs: Long): Array[Array[Float]] = {
      val seed = rollingSeed(payload)
      val n = math.max(1, (durationMs / windowMs).toInt)
      Array.tabulate(n)(i => featureVec(seed + i, 8))
    }

    def extractFrame(payload: Array[Byte], tsMs: Long): Array[Byte] = {
      val seed = rollingSeed(payload) ^ tsMs
      Array.tabulate(32)(i => ((seed >> (i % 8)) & 0xff).toByte)
    }

    private def featureVec(seed: Long, dim: Int): Array[Float] = {
      var s = seed
      Array.fill(dim) {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 33).toInt % 1000) / 1000.0f
      }
    }
  }

  /** Image decode + feature extraction, batch-wise per partition. */
  def imageFeatures(media: Dataset[MediaRecord], codec: Codec = FakeCodec)(
      implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.map { m =>
        val (w, h, emb) = codec.decodeImage(m.payload)
        ImageFeatures(m.media_id, w, h, emb)
      }
    }
  }

  /** Audio windowed feature extraction: one row per media, embedding = mean
   * of window vectors (batch shape: window matrix reduced in-executor). */
  def audioFeatures(media: Dataset[MediaRecord], windowMs: Int = 1000,
      codec: Codec = FakeCodec)(
      implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.map { m =>
        val wins = codec.decodeAudioWindows(m.payload, windowMs, m.duration_ms)
        val dim = wins.head.length
        val mean = Array.tabulate(dim)(d => wins.map(_(d)).sum / wins.length)
        AudioFeatures(m.media_id, wins.length, mean)
      }
    }
  }

  /** Video frame sampling: one row per sampled frame at `everyMs` cadence. */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long = 5000,
      codec: Codec = FakeCodec)(
      implicit spark: SparkSession): Dataset[VideoFrame] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      (0L until m.duration_ms by everyMs).zipWithIndex.map { case (ts, i) =>
        VideoFrame(m.media_id, i, ts, codec.extractFrame(m.payload, ts))
      }
    }
  }

  /** Metadata-only resize plan: records the target geometry without touching
   * payloads (the real resize happens at decode time in the codec). */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")))
    media.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }
}
