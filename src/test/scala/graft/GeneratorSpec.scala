package graft

import java.nio.file.Files
import java.sql.Date

import graft.ops.Transforms
import graft.sources.EnvelopeGenerator
import graft.streaming.StreamingEtl

/** The deterministic producer stand-in: same seed → same docs; file-source
 * streaming ingestion end-to-end through the spine. */
class GeneratorSpec extends SparkTestBase {
  import spark.implicits._

  test("generator is deterministic per seed") {
    assert(EnvelopeGenerator.generate(50, seed = 7) ==
      EnvelopeGenerator.generate(50, seed = 7))
    assert(EnvelopeGenerator.generate(50, seed = 7) !=
      EnvelopeGenerator.generate(50, seed = 8))
  }

  test("generated envelopes flow through the batch spine") {
    val docs = EnvelopeGenerator.generate(200, seed = 42)
    val raw = docs.toDF("value").select($"value".cast("binary").as("value"))
    val out = Transforms.etlSpine(raw, Date.valueOf("2026-01-01"))
    val n = out.count()
    assert(n > 0 && n <= 200)  // some rows fall to the age filter
    assert(out.columns.toSeq == Seq("id", "username", "gender", "title",
      "age", "email", "inscription", "full_name", "full_address"))
  }

  test("file-source streaming ingestion (S2 stand-in end-to-end)") {
    val dir = Files.createTempDirectory("gen").toString
    EnvelopeGenerator.writeFiles(dir, n = 120, perFile = 40)
    val cp = Files.createTempDirectory("gencp").toString
    val outDir = Files.createTempDirectory("genout").toString

    val raw = StreamingEtl.FileLinesSource(dir).load(spark)
    val profiles = StreamingEtl.profileStream(raw, Date.valueOf("2026-01-01"))
    val q = StreamingEtl.start(profiles, cp,
      Seq(StreamingEtl.parquetKeyedSink(outDir)))
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(outDir)
    assert(got.count() > 0)
    assert(got.select("age").as[Int].collect().forall(_ > 18))
  }
}
