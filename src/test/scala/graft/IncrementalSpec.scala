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

  test("mergeSink: versioned streaming upsert, idempotent under batch replay") {
    val dir = java.nio.file.Files.createTempDirectory("merge_sink").toString
    val sink = Incremental.mergeSink(dir, "k", "ver", "op", Seq("val"))

    val b0 = Seq((1L, 1L, "I", "one"), (2L, 1L, "I", "two"), (3L, 1L, "I", "three"))
      .toDF("k", "ver", "op", "val")
    val b1 = Seq((2L, 2L, "D", "x"), (3L, 2L, "U", "THREE"), (9L, 2L, "I", "nine"))
      .toDF("k", "ver", "op", "val")
    sink.write(b0, 0)
    sink.write(b1, 1)
    val expected = Map(1L -> "one", 3L -> "THREE", 9L -> "nine")
    def current = Incremental.currentBase(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(current == expected)
    // checkpoint replay of batch 1 rewrites v=1 from v=0 — same result
    sink.write(b1, 1)
    assert(current == expected)
    // and the pre-replay version is still readable (snapshot isolation)
    assert(spark.read.parquet(s"$dir/v=0").count() == 3)
    // time travel: AS OF version 0 sees the pre-merge table; AS OF a
    // version id between commits resolves to the newest committed <= it
    assert(Incremental.baseAsOf(spark, dir, 0L)
      .as[(Long, String)].collect().toMap
      == Map(1L -> "one", 2L -> "two", 3L -> "three"))
    assert(Incremental.baseAsOf(spark, dir, 99L)
      .as[(Long, String)].collect().toMap == expected)
    assert(Incremental.listVersions(spark, dir) == Seq(0L, 1L))
    assertThrows[IllegalArgumentException](
      Incremental.baseAsOf(spark, dir, -1L))
  }

  test("vacuum: old versions go, retained horizon and replay stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("merge_vacuum").toString
    val sink = Incremental.mergeSink(dir, "k", "ver", "op", Seq("val"))
    sink.write(Seq((1L, 1L, "I", "one"), (2L, 1L, "I", "two"))
      .toDF("k", "ver", "op", "val"), 0)
    sink.write(Seq((3L, 2L, "I", "three")).toDF("k", "ver", "op", "val"), 1)
    sink.write(Seq((2L, 3L, "D", "x")).toDF("k", "ver", "op", "val"), 2)
    sink.write(Seq((1L, 4L, "U", "ONE")).toDF("k", "ver", "op", "val"), 3)
    def current = Incremental.currentBase(spark, dir)
      .as[(Long, String)].collect().toMap
    val expected = Map(1L -> "ONE", 3L -> "three")
    assert(current == expected)

    assert(Incremental.vacuum(spark, dir, keepLast = 2) == Seq(0L, 1L))
    assert(Incremental.listVersions(spark, dir) == Seq(2L, 3L))
    // current and in-horizon AS-OF reads resolve exactly as before
    assert(current == expected)
    assert(Incremental.baseAsOf(spark, dir, 2L)
      .as[(Long, String)].collect().toMap
      == Map(1L -> "one", 3L -> "three"))
    // below-horizon reads fail loudly instead of serving a wrong snapshot
    assertThrows[IllegalArgumentException](Incremental.baseAsOf(spark, dir, 1L))
    // checkpoint replay of the last batch after vacuum: v=3 re-derives from
    // the surviving v=2 predecessor — identical result (idempotent)
    sink.write(Seq((1L, 4L, "U", "ONE")).toDF("k", "ver", "op", "val"), 3)
    assert(current == expected)
    // keeping only the latest would break replay idempotence — rejected
    assertThrows[IllegalArgumentException](
      Incremental.vacuum(spark, dir, keepLast = 1))
    // idempotent vacuum: nothing left to remove
    assert(Incremental.vacuum(spark, dir, keepLast = 2).isEmpty)
  }

  test("mergeSink end-to-end through a real streaming query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("merge_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("merge_ckpt").toString
    val input = MemoryStream[(Long, Long, String, String)]
    val changes = input.toDF().toDF("k", "ver", "op", "val")
    val q = changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Incremental.mergeSink(dir, "k", "ver", "op", Seq("val")).write(b, id); ()
      }
      .start()
    input.addData((1L, 1L, "I", "one"), (2L, 1L, "I", "two"))
    q.processAllAvailable()
    input.addData((1L, 2L, "U", "ONE"), (2L, 2L, "D", "x"), (5L, 2L, "I", "five"))
    q.processAllAvailable()
    q.stop()
    val out = Incremental.currentBase(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "ONE", 5L -> "five"))
  }
}
