package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` payloads
 * plus typed metadata, processed batch-wise in executors.
 *
 * The Spark-side plumbing is real and tested — schema, partitioning, the
 * per-partition batch loop, output shapes. IMAGE decode is real: the
 * `JdkImageCodec` below reads PNG/BMP/GIF/JPEG through the JDK's built-in
 * `javax.imageio` (zero external dependencies). Audio/video decode remains
 * STUBBED with a deterministic fake (`FakeCodec` — this container ships no
 * audio/video libraries): all "decoded" values derive from the payload
 * bytes alone, so tests are exact and reproducible. Swap the codec seam for
 * JavaCV/ffmpeg-cli in production — the dataflow does not change.
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

  /** Real image decode on the JDK's built-in `javax.imageio` readers
   * (PNG/BMP/GIF/JPEG — no external libraries): actual pixel dimensions and
   * a deterministic 8-dim pixel-statistics embedding (2×2 quadrant mean
   * luma, global mean R/G/B, aspect ratio). Pixels are sampled on a bounded
   * stride so decode feature cost is O(4096) samples regardless of image
   * size. Payloads imageio cannot parse fall back to the deterministic fake
   * (keeps the plumbing total); audio/video stay on the fake codec — the
   * container ships no media libraries for those (declared stub). */
  object JdkImageCodec extends Codec {
    def decodeImage(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null) FakeCodec.decodeImage(payload)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val stepX = math.max(1, w / 64)
        val stepY = math.max(1, h / 64)
        val quadSum = new Array[Double](4)
        val quadN = new Array[Long](4)
        var sr, sg, sb = 0.0
        var n = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            val q = (if (y >= h / 2) 2 else 0) + (if (x >= w / 2) 1 else 0)
            quadSum(q) += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            quadN(q) += 1
            sr += r / 255.0; sg += g / 255.0; sb += b / 255.0
            n += 1
            x += stepX
          }
          y += stepY
        }
        val feats = Array(
          (quadSum(0) / math.max(1L, quadN(0))).toFloat,
          (quadSum(1) / math.max(1L, quadN(1))).toFloat,
          (quadSum(2) / math.max(1L, quadN(2))).toFloat,
          (quadSum(3) / math.max(1L, quadN(3))).toFloat,
          (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
          w.toFloat / h.toFloat)
        (w, h, feats)
      }
    }

    def decodeAudioWindows(payload: Array[Byte], windowMs: Int, durationMs: Long): Array[Array[Float]] =
      FakeCodec.decodeAudioWindows(payload, windowMs, durationMs)

    def extractFrame(payload: Array[Byte], tsMs: Long): Array[Byte] =
      FakeCodec.extractFrame(payload, tsMs)
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
