package graft

import graft.ext.Incremental

/** MERGE/CDC apply semantics on crafted fixtures (value-level parity on the
 * real tables is covered by the i1/i2 DuckDB oracle gate). */
class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
    .toDF("k", "val")

  test("latestPerKey keeps the max-version row per key") {
    val ch = Seq(
      (1L, 1L, "U", "a"), (1L, 3L, "U", "c"), (1L, 2L, "D", "b"),
      (2L, 1L, "D", "x"))
      .toDF("k", "ver", "op", "val")
    val out = Incremental.latestPerKey(ch, "k", "ver", "op", Seq("val"))
      .as[(Long, Long, String, String)].collect().toSet
    assert(out == Set((1L, 3L, "U", "c"), (2L, 1L, "D", "x")))
  }

  test("latestPerKey version ties resolve by op precedence, deterministically") {
    val ch = Seq((1L, 1L, "D", "x"), (1L, 1L, "U", "y"))
      .toDF("k", "ver", "op", "val")
    val out = Incremental.latestPerKey(ch, "k", "ver", "op", Seq("val"))
      .as[(Long, Long, String, String)].collect().toSeq
    assert(out == Seq((1L, 1L, "U", "y")))  // 'U' > 'D' in the struct order
  }

  test("apply: delete drops, update wins, insert adds, unmatched base survives") {
    val ch = Seq(
      (2L, "D", "ignored"),   // delete an existing key
      (3L, "U", "THREE"),     // update an existing key
      (9L, "I", "nine"),      // insert a new key
      (99L, "D", "absent"))   // delete for an absent key -> no-op
      .toDF("k", "op", "val")
    val out = Incremental.apply(base, ch, "k", "op", Seq("val"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "one", 3L -> "THREE", 4L -> "four", 9L -> "nine"))
  }

  test("apply with an empty change set is the identity") {
    val ch = Seq.empty[(Long, String, String)].toDF("k", "op", "val")
    val out = Incremental.apply(base, ch, "k", "op", Seq("val"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "one", 2L -> "two", 3L -> "three", 4L -> "four"))
  }
}
