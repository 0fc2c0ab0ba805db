package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{EntityResolution, Incremental}
import graft.streaming.StreamingEntityResolution

/** The incremental golden-record table must equal the one-shot
 * [[EntityResolution.resolveEntities]] on the accumulated corpus after
 * every batch (r7 verdict #7) — including the hard deltas: a new record
 * JOINING an existing entity, FLIPPING its keeper, and BRIDGING two
 * existing entities (which retires the absorbed entity id via a `D` row).
 *
 * Name geometry (blockPrefix 5 = "alpha"/"betaX" blocks, minSim 0.85):
 * "alphaAAAAA" ~ "alphaAABBB" (jw 0.88) and "alphaAABBB" ~ "alphaBBBBB"
 * (jw 0.92) but "alphaAAAAA" !~ "alphaBBBBB" (jw 0.80) — so ids 1 and 2
 * start as separate entities and id 3 bridges them. */
class StreamingEntityResolutionSpec extends SparkTestBase {
  import spark.implicits._

  private val carry = Seq("seg")

  private def recs(rows: (Long, String, Double, String)*): DataFrame =
    rows.toDF("id", "nm", "q", "seg")

  private val batch1 = recs(
    (1L, "alphaAAAAA", 10.0, "a"),
    (2L, "alphaBBBBB", 20.0, "b"),
    (4L, "betaXYZ-04", 5.0, "c"))
  private val batch2 = recs(
    (5L, "alphaAABBB", 99.0, "d"),   // bridges 1 and 2, top quality
    (6L, "gammaZZ-06", 1.0, "e"))
  private val batch3 = recs(
    (7L, "betaXYZ-07", 50.0, "f"))   // joins entity 4, flips its keeper

  private def batchResolve(union: DataFrame): Seq[String] =
    EntityResolution.resolveEntities(union, "id", "nm", "q", carry,
      blockPrefix = 5, minSim = 0.85)
      .collect().map(_.toString).sorted.toSeq

  private def tableRows(dir: String): Seq[String] =
    Incremental.currentBase(spark, dir)
      .collect().map(_.toString).sorted.toSeq

  test("incremental golden records equal the batch resolve after every " +
    "batch; bridge merges retire the absorbed entity via D") {
    val root = java.nio.file.Files.createTempDirectory("ser").toString
    val tableDir = s"$root/table"
    val stateDir = s"$root/state"
    val sink = StreamingEntityResolution.goldenSink(tableDir, stateDir,
      "id", "nm", "q", carry, blockPrefix = 5, minSim = 0.85)

    sink.write(batch1, 0L)
    assert(tableRows(tableDir) == batchResolve(batch1))
    // three singleton entities so far
    assert(Incremental.currentBase(spark, tableDir).count() == 3)

    sink.write(batch2, 1L)
    val u12 = batch1.unionByName(batch2)
    assert(tableRows(tableDir) == batchResolve(u12))
    val after2 = Incremental.currentBase(spark, tableDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), r.getLong(6))).toMap
    // the bridge merged {1, 2, 5} under entity 1; entity 2 was absorbed
    // (the D row), and the keeper flipped to the new top-quality record
    assert(after2.keySet == Set(1L, 4L, 6L))
    assert(after2(1L) == ((5L, 99.0, 3L)),
      s"bridged entity must keep record 5 (q=99) over 3 members: $after2")

    sink.write(batch3, 2L)
    val u123 = u12.unionByName(batch3)
    assert(tableRows(tableDir) == batchResolve(u123))
    val after3 = Incremental.currentBase(spark, tableDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after3(4L) == 7L, "joining record must flip entity 4's keeper")

    // foreachBatch replay of the LAST batch is a no-op (batch-keyed legs
    // overwrite, version v=2 re-derives from v=1)
    sink.write(batch3, 2L)
    assert(tableRows(tableDir) == batchResolve(u123))
  }

  test("state-leg compaction mid-stream preserves the table and later " +
    "increments (the curation compactState generalizes to ER state)") {
    val root = java.nio.file.Files.createTempDirectory("ser_compact").toString
    val tableDir = s"$root/table"
    val stateDir = s"$root/state"
    val sink = StreamingEntityResolution.goldenSink(tableDir, stateDir,
      "id", "nm", "q", carry, blockPrefix = 5, minSim = 0.85)
    sink.write(batch1, 0L)
    sink.write(batch2, 1L)
    sink.write(batch3, 2L)
    val before = tableRows(tableDir)
    val folded = graft.streaming.StreamingCuration
      .compactState(spark, stateDir)
    assert(folded.values.sum > 0, s"expected legs to fold, got $folded")
    assert(tableRows(tableDir) == before, "compaction must not touch the table")
    // a further batch over the compacted state still equals the batch
    // resolve on the full accumulated corpus (joins entity 6, flips its
    // keeper: jw(gammaZZ-06, gammaZZ-08) = 0.96)
    val batch4 = recs((8L, "gammaZZ-08", 77.0, "g"))
    sink.write(batch4, 3L)
    val all = batch1.unionByName(batch2).unionByName(batch3)
      .unionByName(batch4)
    assert(tableRows(tableDir) == batchResolve(all))
  }

  test("jw geometry sanity: the bridge pairs exist, the direct pair " +
    "does not") {
    val pairs = graft.ext.Dedup.jaroWinklerPairs(
      batch1.unionByName(batch2), "id", "nm", blockPrefix = 5,
      minSim = 0.85)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)) && pairs.contains((2L, 5L)),
      s"bridge pairs missing: $pairs")
    assert(!pairs.contains((1L, 2L)), s"direct pair must be sub-threshold")
  }
}
