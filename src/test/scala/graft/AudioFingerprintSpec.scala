package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.ext.Multimodal.MediaRecord

/** The perceptual audio fingerprint (r10 verdict #6): lag-band energy
 * semantics on hand signals, exact amplitude invariance, real-WAV decode
 * exactness, near-dup robustness under dither, and the pigeonhole pair
 * path end-to-end over real WAV payloads. */
class AudioFingerprintSpec extends SparkTestBase {
  import spark.implicits._

  private val Amp = 8192

  /** Square wave of the given half-period, `n` samples. */
  private def square(halfPeriod: Int, n: Int = 8192,
      amp: Int = Amp): Array[Int] =
    Array.tabulate(n)(i => if ((i / halfPeriod) % 2 == 0) amp else -amp)

  /** 16-bit mono little-endian WAV bytes of an integer signal. */
  private def wav(x: Array[Int], rate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](x.length * 2)
    for (i <- x.indices) {
      pcm(2 * i) = (x(i) & 0xff).toByte
      pcm(2 * i + 1) = ((x(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, x.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("fingerprintPcm16: lag-band semantics on a period-2 square wave " +
    "(all energy in band 0, every window)") {
    // period-2 square: lag-1 diff is ±2A every sample, every other lag
    // sees an identical sample -> only the 8 (w, b=0) cells are hot
    val fp = Multimodal.fingerprintPcm16(square(1))
    assert(fp == 0x0101010101010101L,
      s"expected band-0 bits only, got ${fp.toHexString}")
    // signals shorter than 256 samples degrade honestly to 0
    assert(Multimodal.fingerprintPcm16(Array.fill(100)(5)) == 0L)
  }

  test("fingerprintPcm16: exact amplitude scaling leaves the " +
    "fingerprint untouched; different band structure reads far") {
    val p4 = square(2)  // energy in bands 0-1
    val p16 = square(8) // energy spread over bands 1-3
    val fpA = Multimodal.fingerprintPcm16(p4)
    val fpB = Multimodal.fingerprintPcm16(p16)
    // halving every sample scales every cell and the mean by exactly
    // 1/4 -> identical bits (gain invariance, the aHash mean-threshold
    // property)
    assert(Multimodal.fingerprintPcm16(p4.map(_ / 2)) == fpA)
    assert(Multimodal.fingerprintPcm16(p16.map(_ / 2)) == fpB)
    assert(hamming(fpA, fpB) >= 8,
      s"different band profiles must read far: ${hamming(fpA, fpB)}")
  }

  test("fingerprintPcm16: sparse dither moves at most a few bits " +
    "(the near-dup robustness claim)") {
    val base = square(2)
    val dithered = base.clone()
    var i = 50
    while (i < dithered.length) { dithered(i) = -dithered(i); i += 101 }
    val d = hamming(Multimodal.fingerprintPcm16(base),
      Multimodal.fingerprintPcm16(dithered))
    assert(d <= 3, s"1% sign dither must stay within Hamming 3, got $d")
  }

  test("JdkCodec.decodePcm16 reads exact sample values back from a " +
    "real WAV; fingerprint via the WAV path matches the array path") {
    val x = square(2, n = 4096)
    val decoded = Multimodal.JdkCodec.decodePcm16(wav(x))
    assert(decoded.length == x.length)
    assert(decoded.sameElements(x), "16-bit LE WAV decode must be exact")
    assert(Multimodal.fingerprintPcm16(decoded) ==
      Multimodal.fingerprintPcm16(x))
  }

  test("audioFingerprint + audioDupPairs over real WAV payloads: " +
    "dithered twins pair up, different content does not") {
    implicit val s = spark
    def rec(id: Long, x: Array[Int]) = MediaRecord(id, "audio", wav(x),
      0, 0, 8000, x.length / 8)
    val a = square(2)
    val aDit = a.clone()
    var i = 50
    while (i < aDit.length) { aDit(i) = -aDit(i); i += 101 }
    val b = square(8)
    val bDit = b.clone()
    i = 70
    while (i < bDit.length) { bDit(i) = -bDit(i); i += 101 }
    val media = Seq(rec(1L, a), rec(2L, aDit), rec(3L, b), rec(4L, bDit),
      // a non-audio record must be ignored by the fingerprint path
      MediaRecord(5L, "image", Array[Byte](1, 2, 3), 2, 2, 0, 0)).toDS()
    val fps = Multimodal.audioFingerprint(media, Multimodal.JdkCodec)
    assert(fps.count() == 4L)
    val pairs = Multimodal.audioDupPairs(fps.toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)),
      s"exactly the dithered twins must pair, got $pairs")
  }
}
