package graft

import graft.ext.Multimodal
import graft.ext.Multimodal._

/** Multimodal plumbing tests: schema/shape/determinism of the batch-wise
 * decode pipeline over opaque binary payloads (codec stubbed — see
 * Multimodal.FakeCodec). */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private def media(id: Long, kind: String, durationMs: Long = 12000) =
    MediaRecord(id, kind, Array.tabulate(64)(i => (id + i).toByte),
      width = 640, height = 360, sample_rate = 16000, duration_ms = durationMs)

  private val ds = Seq(
    media(1, "image"), media(2, "image"),
    media(3, "audio"), media(4, "video")).toDS()

  test("image features: one row per image, fixed-dim embedding, deterministic") {
    val out = Multimodal.imageFeatures(ds).collect()
    assert(out.length == 2)
    assert(out.forall(_.embedding.length == 8))
    val again = Multimodal.imageFeatures(ds).collect()
    assert(out.map(_.embedding.toSeq).toSet == again.map(_.embedding.toSeq).toSet)
  }

  test("resizeImages downscales real pixels, passes small/opaque payloads through") {
    implicit val s = spark
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, 0x3070b0)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val big = MediaRecord(1L, "image", png(40, 16), 40, 16, 0, 0)
    val small = MediaRecord(2L, "image", png(6, 4), 6, 4, 0, 0)
    val opaque = MediaRecord(3L, "image", Array[Byte](1, 2, 3), 0, 0, 0, 0)
    val out = Multimodal.resizeImages(Seq(big, small, opaque).toDS(), maxSide = 10)
      .collect().map(m => m.media_id -> m).toMap
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).payload))
    assert(resized.getWidth == 10 && resized.getHeight == 4)  // ceil(16*0.25)
    // metadata follows the pixels
    assert(out(1L).width == 10 && out(1L).height == 4)
    // small + undecodable payloads untouched (no re-encode)
    assert(out(2L).payload.sameElements(small.payload))
    assert(out(3L).payload.sameElements(opaque.payload))
  }

  test("JdkCodec decodes a real PNG to its true dimensions") {
    // Encode an actual 24x10 PNG in-memory: left half black, right half white.
    val img = new java.awt.image.BufferedImage(
      24, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 24)
      img.setRGB(x, y, if (x < 12) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rec = MediaRecord(9L, "image", bos.toByteArray,
      width = 24, height = 10, sample_rate = 0, duration_ms = 0)

    val out = Multimodal.imageFeatures(
      Seq(rec).toDS(), Multimodal.JdkCodec).collect()
    assert(out.length == 1)
    val f = out.head
    assert(f.width == 24 && f.height == 10)  // REAL decoded dims, not stored
    assert(f.embedding.length == 8)
    // Quadrant luma: left quadrants black (0), right quadrants white (1).
    assert(f.embedding(0) == 0.0f && f.embedding(2) == 0.0f)
    assert(f.embedding(1) == 1.0f && f.embedding(3) == 1.0f)
    assert(math.abs(f.embedding(7) - 2.4f) < 1e-6)  // aspect 24/10
  }

  test("aHash: near-identical images within Hamming 3, different images far") {
    implicit val s = spark
    // A structured 64x64 gradient-with-blocks pattern; `variant` flips a
    // single 8x8 block — a small edit that must move only a few aHash bits.
    def png(variant: Boolean, invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val bright = ((x / 8) + (y / 8)) % 2 == 0
        val base = if (bright ^ invert) 0xe0e0e0 else 0x202020
        img.setRGB(x, y, base)
      }
      if (variant)
        for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def rec(id: Long, p: Array[Byte]) =
      MediaRecord(id, "image", p, 64, 64, 0, 0)
    val ds2 = Seq(
      rec(1L, png(variant = false, invert = false)),
      rec(2L, png(variant = true, invert = false)),   // near-dup of 1
      rec(3L, png(variant = false, invert = true))).toDS() // inverse of 1
    val hashes = Multimodal.imageAHash(ds2, Multimodal.JdkCodec)
    val hs = hashes.collect().map(h => h.media_id -> h.ahash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(2L)) <= 3, s"near-dup drifted: ${ham(hs(1L), hs(2L))}")
    assert(ham(hs(1L), hs(3L)) > 30, s"inverse too close: ${ham(hs(1L), hs(3L))}")

    val pairs = Multimodal.imageDupPairs(hashes.toDF(), maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("dHash survives a vertical luma gradient that flips aHash; " +
    "a real edit moves both") {
    implicit val s = spark
    // base: an 8-col alternating stripe pattern; `ramp` adds a row-constant
    // vertical luma gradient (a vignette/exposure ramp) — per-row
    // horizontal ordering is untouched, so dHash must be identical while
    // aHash's global-mean thresholds flip; `edit` swaps the stripe phase
    // of the top row block — a real content change both hashes must see.
    def png(ramp: Boolean, edit: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val phase = if (edit && y < 8) 1 else 0
        val bright = ((x / 8) + phase) % 2 == 0
        // moderate stripe contrast (0x60 vs 0x30) + a strong row ramp
        // (+18/block-row): the ramp dwarfs the global mean shift, so
        // top bright cells sink below it and bottom dark cells rise
        // above — many aHash bits flip while every in-row comparison
        // (hence every dHash bit) is untouched
        var lum = if (bright) 0x60 else 0x30
        if (ramp) lum = lum + (y / 8) * 18
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def rec(id: Long, p: Array[Byte]) =
      MediaRecord(id, "image", p, 64, 64, 0, 0)
    val ds = Seq(
      rec(1L, png(ramp = false, edit = false)),
      rec(2L, png(ramp = true, edit = false)),  // graded copy of 1
      rec(3L, png(ramp = false, edit = true))   // edited copy of 1
    ).toDS()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dh = Multimodal.imageDHash(ds, Multimodal.JdkCodec)
      .collect().map(h => h.media_id -> h.ahash).toMap
    val ah = Multimodal.imageAHash(ds, Multimodal.JdkCodec)
      .collect().map(h => h.media_id -> h.ahash).toMap
    assert(dh(1L) == dh(2L), "dHash must be invariant to the row ramp")
    assert(ham(ah(1L), ah(2L)) > 3,
      s"the ramp must flip aHash bits: ${ham(ah(1L), ah(2L))}")
    assert(dh(1L) != dh(3L), "a content edit must move dHash")
    // the dup-pair machinery consumes dHash rows unchanged
    val pairs = Multimodal.imageDupPairs(
        Multimodal.imageDHash(ds, Multimodal.JdkCodec).toDF(),
        maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), pairs.toString)
  }

  test("pHash ignores pixel-grain noise that flips aHash; low-frequency " +
    "structure changes move it") {
    implicit val s = spark
    // base: left half bright, right half dark (pure low-frequency
    // structure). `noisy` overlays a per-pixel checkerboard (+/-10 luma)
    // — the highest spatial frequency there is: every 8x8 grid cell's
    // mean is unchanged on average but cell samples jitter enough to
    // flip aHash threshold bits, while the 6x6 low-frequency DCT block
    // barely moves. `flipped` swaps the bright side — a structural
    // change pHash must see.
    def png(noise: Boolean, flip: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val bright = if (flip) x >= 32 else x < 32
        var lum = if (bright) 0x90 else 0x50
        if (noise) lum += (if ((x + y) % 2 == 0) 10 else -10)
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def rec(id: Long, p: Array[Byte]) =
      MediaRecord(id, "image", p, 64, 64, 0, 0)
    val ds = Seq(
      rec(1L, png(noise = false, flip = false)),
      rec(2L, png(noise = true, flip = false)),
      rec(3L, png(noise = false, flip = true))).toDS()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val ph = Multimodal.imagePHash(ds, Multimodal.JdkCodec)
      .collect().map(h => h.media_id -> h.ahash).toMap
    // the per-pixel checkerboard cancels exactly inside every 8x8 block
    // mean, and coefficient micro-quantization absorbs the remaining
    // summation-order ulps — the hash must be IDENTICAL
    assert(ham(ph(1L), ph(2L)) == 0,
      s"checkerboard noise must not move pHash: ${ham(ph(1L), ph(2L))}")
    assert(ph(1L) != ph(3L), "mirrored structure must move pHash")
    assert(ph.values.forall(b => (b >> 35) == 0L), "35-bit domain")
    // determinism across partitionings
    val ph2 = Multimodal.imagePHash(ds.repartition(3), Multimodal.JdkCodec)
      .collect().map(h => h.media_id -> h.ahash).toMap
    assert(ph2 == ph)
  }

  test("JdkCodec falls back deterministically on undecodable payloads") {
    val junk = Array.tabulate[Byte](64)(i => i.toByte)
    val a = Multimodal.JdkCodec.decodeImage(junk)
    val b = Multimodal.FakeCodec.decodeImage(junk)
    assert(a._1 == b._1 && a._2 == b._2 && a._3.toSeq == b._3.toSeq)
  }

  test("JdkCodec decodes a real WAV: window count and RMS from actual samples") {
    // Synthesize 1 second of 8 kHz 16-bit mono: constant amplitude 0.5.
    val rate = 8000f
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](8000 * 2)
    val amp = (0.5 * 32767).toInt
    for (i <- 0 until 8000) {
      val v = if (i % 2 == 0) amp else -amp  // square wave, |x| = 0.5
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 8000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)

    val wins = Multimodal.JdkCodec.decodeAudioWindows(
      bos.toByteArray, windowMs = 250, durationMs = 1000)
    assert(wins.length == 4)                      // 1s / 250ms windows
    assert(wins.forall(_.length == 8))
    assert(wins.forall(w => math.abs(w(0) - 0.5f) < 0.01f))  // true RMS
    assert(wins.forall(w => w(3) > 0.9f))         // square wave: ~every step crosses
  }

  test("header-only WAV (zero data frames) yields a zero-window row, not a crash") {
    // A structurally valid 44-byte WAV — header, no data frames. The JDK
    // parses it fine; the decode yields zero windows, and audioFeatures must
    // emit an honest 0-window zero-vector row instead of killing the stage.
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array.emptyByteArray), fmt, 0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val emptyWav = bos.toByteArray

    assert(Multimodal.JdkCodec
      .decodeAudioWindows(emptyWav, windowMs = 250, durationMs = 0).isEmpty)

    val one = Seq(MediaRecord(9L, "audio", emptyWav, width = 0, height = 0,
      sample_rate = 8000, duration_ms = 0)).toDS()
    val out = Multimodal.audioFeatures(one, windowMs = 250,
      codec = Multimodal.JdkCodec).collect()
    assert(out.length == 1)
    assert(out.head.n_windows == 0)
    assert(out.head.embedding.toSeq == Seq.fill(8)(0f))
  }

  test("audio features: windows counted from duration, mean-pooled embedding") {
    val out = Multimodal.audioFeatures(ds, windowMs = 1000).collect()
    assert(out.length == 1)
    assert(out.head.n_windows == 12)
    assert(out.head.embedding.length == 8)
  }

  test("frame sampling: cadence rows with increasing timestamps") {
    val frames = Multimodal.sampleFrames(ds, everyMs = 5000).collect()
      .sortBy(_.frame_no)
    assert(frames.map(_.ts_ms).toSeq == Seq(0L, 5000L, 10000L))
    assert(frames.forall(_.payload.length == 32))
  }

  test("feature extraction composes under structured streaming (stateless map)") {
    // imageFeatures/imageAHash are stateless per-partition maps, so the
    // same operators run unchanged over a stream — the multimodal ingest
    // path (decode at arrival, store features not payloads) needs no
    // batch/stream fork.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[MediaRecord]
    val q = Multimodal.imageFeatures(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("mm_stream").start()
    input.addData(media(21, "image"), media(22, "audio"), media(23, "image"))
    q.processAllAvailable()
    input.addData(media(24, "image"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("mm_stream")
      .select("media_id").as[Long].collect().toSet
    assert(out == Set(21L, 23L, 24L))  // images only, across batches
  }

  test("resize plan preserves aspect ratio, only shrinks") {
    val plan = Multimodal.resizePlan(ds.toDF(), maxSide = 320)
      .select("media_id", "target_width", "target_height")
      .as[(Long, Int, Int)].collect().map { case (i, w, h) => i -> (w, h) }.toMap
    assert(plan(1L) == (320, 180))
  }
}
