package graft

import graft.ext.EntityResolution

/** Semantics locks for the record-linkage → golden-record composition
 * (`pipe4_entity_resolution` carries the oracle gate; these pin the
 * contract on constructed corners the gate data may not exercise). */
class EntityResolutionSpec extends SparkTestBase {
  import spark.implicits._

  // ids 1-3: one match cluster (same block, pairwise JW ≥ 0.9);
  // id 4: same block, dissimilar (below threshold);
  // id 5: different block entirely.
  private def records = Seq(
    (1L, "alpha-record-001", 10.0, "a"),
    (2L, "alpha-record-002", 30.0, "b"),
    (3L, "alpha-record-013", 30.0, "c"),
    (4L, "alpha-XXYYZZ-999", 5.5, "d"),
    (5L, "beta-solo-record", -2.25, "e")
  ).toDF("id", "nm", "q", "seg")

  private def resolve(df: org.apache.spark.sql.DataFrame) =
    EntityResolution.resolveEntities(df, "id", "nm", "q",
      carryCols = Seq("seg"), blockPrefix = 5, minSim = 0.9)

  test("matched records collapse to the component-min entity; " +
    "survivor = max quality with min-id tie-break; carry cols ride along") {
    val out = resolve(records).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 4L, 5L))

    val ent1 = out(1L)
    // q=30.0 tie between ids 2 and 3 → smaller id keeps
    assert(ent1.getLong(1) == 2L, "keeper should be id 2")
    assert(ent1.getString(2) == "alpha-record-002")
    assert(ent1.getDouble(3) == 30.0)
    assert(ent1.getString(4) == "b", "carry col must come from the keeper")
    assert(ent1.getLong(5) == 7000L, "total_q100 = 1000 + 3000 + 3000")
    assert(ent1.getLong(6) == 3L)
  }

  test("unmatched records pass through as single-record entities") {
    val out = resolve(records).collect()
      .map(r => r.getLong(0) -> r).toMap
    val solo = out(5L)
    assert(solo.getLong(1) == 5L)
    assert(solo.getDouble(3) == -2.25)
    // floor(-225 + 0.5) = -225 exactly (negative micro-quantization)
    assert(solo.getLong(5) == -225L)
    assert(solo.getLong(6) == 1L)
    assert(out(4L).getLong(6) == 1L,
      "same-block below-threshold record stays its own entity")
  }

  test("the maxBlock hot-block cap is live: cap=1 suppresses every pair") {
    val out = EntityResolution.resolveEntities(records, "id", "nm", "q",
      carryCols = Seq("seg"), blockPrefix = 5, minSim = 0.9, maxBlock = 1)
      .collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(6) == 1L),
      "with every block over the cap, all records stay singleton entities")
  }

  test("jwBlockStats sizes the blocking decision before the join") {
    // blocks at prefix 5: "alpha" holds 4 records, "beta-" holds 1
    val r = graft.ext.Dedup.jwBlockStats(records, "nm",
      blockPrefix = 5, maxBlock = 3).collect().head
    assert(r.getLong(0) == 2L, "n_blocks")
    assert(r.getLong(1) == 4L, "max_block")
    assert(r.getLong(2) == 6L, "candidate_pairs = C(4,2) + C(1,2)")
    assert(r.getLong(3) == 1L, "blocks_over_cap: the alpha block")
    assert(r.getLong(4) == 0L, "pairs_after_cap: only the singleton block")
  }

  test("reserved-name guard covers idCol/nameCol/qualityCol and " +
    "duplicate carryCols (r7 advice #3)") {
    val df = records.withColumnRenamed("id", "entity_id")
    intercept[IllegalArgumentException] {
      EntityResolution.resolveEntities(df, "entity_id", "nm", "q",
        carryCols = Seq("seg"), blockPrefix = 5, minSim = 0.9)
    }
    intercept[IllegalArgumentException] { // carryCol duplicating nameCol
      EntityResolution.resolveEntities(records, "id", "nm", "q",
        carryCols = Seq("nm"), blockPrefix = 5, minSim = 0.9)
    }
    intercept[IllegalArgumentException] { // duplicate carryCols
      EntityResolution.resolveEntities(records, "id", "nm", "q",
        carryCols = Seq("seg", "seg"), blockPrefix = 5, minSim = 0.9)
    }
  }

  test("a corpus with no matches at all resolves to all singletons") {
    val distinct = Seq(
      (1L, "aaaaa-one", 1.0, "x"),
      (2L, "bbbbb-two", 2.0, "y")
    ).toDF("id", "nm", "q", "seg")
    val out = resolve(distinct).collect()
    assert(out.length == 2)
    assert(out.forall(_.getLong(6) == 1L))
  }
}
