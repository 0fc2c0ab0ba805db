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

  test("resize plan preserves aspect ratio, only shrinks") {
    val plan = Multimodal.resizePlan(ds.toDF(), maxSide = 320)
      .select("media_id", "target_width", "target_height")
      .as[(Long, Int, Int)].collect().map { case (i, w, h) => i -> (w, h) }.toMap
    assert(plan(1L) == (320, 180))
  }
}
