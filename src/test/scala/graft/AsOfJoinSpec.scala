package graft

import graft.operators.AsOfJoin

/** AsOfJoin semantics on crafted interleaved data: backward match, inclusive
 * equality, no match before first right row, per-key isolation. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("backward as-of picks latest right row at-or-before left time") {
    val left = Seq(
      (1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 20L, "e3"),
      (2L, 10L, "e4"),
      (3L, 1L, "e5")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 5L, "r@5"), (1L, 15L, "r@15"),
      (2L, 2L, "r@2"),
      (3L, 9L, "r@9")).toDF("k", "t", "rv")

    val out = AsOfJoin.asofBackward(
      left.select($"ev", $"k".as("key"), $"t".as("ts")),
      right.select($"k".as("key"), $"t".as("ts"), $"rv"),
      key = "key", time = "ts", rightVals = Seq("rv"))
      .select("ev", "rv").as[(String, String)].collect().toMap

    assert(out("e1") == "r@5")   // inclusive: equal time matches
    assert(out("e2") == "r@5")   // not yet r@15
    assert(out("e3") == "r@15")  // latest at-or-before
    assert(out("e4") == "r@2")   // per-key isolation
    assert(out("e5") == null)    // left row before any right row
  }

  test("forward as-of picks earliest right row at-or-after left time") {
    val left = Seq(
      (1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 20L, "e3"),
      (2L, 10L, "e4"),
      (3L, 99L, "e5")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 5L, "r@5"), (1L, 15L, "r@15"),
      (2L, 2L, "r@2"),
      (3L, 9L, "r@9")).toDF("k", "t", "rv")

    val out = AsOfJoin.asofForward(
      left.select($"ev", $"k".as("key"), $"t".as("ts")),
      right.select($"k".as("key"), $"t".as("ts"), $"rv"),
      key = "key", time = "ts", rightVals = Seq("rv"))
      .select("ev", "rv").as[(String, String)].collect().toMap

    assert(out("e1") == "r@5")   // inclusive: equal time matches
    assert(out("e2") == "r@15")  // next following, not the earlier r@5
    assert(out("e3") == null)    // nothing after t=20
    assert(out("e4") == null)    // r@2 is before, never after
    assert(out("e5") == null)    // left row after every right row
  }

  test("backward tolerance drops stale matches, keeps rows") {
    val left = Seq(
      (1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 30L, "e3"),
      (2L, 10L, "e4")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 5L, "r@5"), (1L, 15L, "r@15"),
      (2L, 2L, "r@2")).toDF("k", "t", "rv")

    val out = AsOfJoin.asofBackward(
      left.select($"ev", $"k".as("key"), $"t".as("ts")),
      right.select($"k".as("key"), $"t".as("ts"), $"rv"),
      key = "key", time = "ts", rightVals = Seq("rv"),
      tolerance = Some(8L))
      .select("ev", "rv").as[(String, String)].collect().toMap

    assert(out.size == 4)          // rows kept, values nulled
    assert(out("e1") == "r@5")     // distance 0 <= 8
    assert(out("e2") == "r@5")     // distance 5 <= 8
    assert(out("e3") == null)      // r@15 is 15 back — stale
    assert(out("e4") == "r@2")     // distance 8, boundary inclusive
  }

  test("forward tolerance drops far-future matches, keeps rows") {
    val left = Seq(
      (1L, 5L, "e1"), (1L, 10L, "e2"), (2L, 0L, "e3")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 15L, "r@15"), (2L, 50L, "r@50")).toDF("k", "t", "rv")

    val out = AsOfJoin.asofForward(
      left.select($"ev", $"k".as("key"), $"t".as("ts")),
      right.select($"k".as("key"), $"t".as("ts"), $"rv"),
      key = "key", time = "ts", rightVals = Seq("rv"),
      tolerance = Some(10L))
      .select("ev", "rv").as[(String, String)].collect().toMap

    assert(out("e1") == "r@15")    // 10 ahead, boundary inclusive
    assert(out("e2") == "r@15")    // 5 ahead
    assert(out("e3") == null)      // 50 ahead — beyond tolerance
  }

  test("a matched right row with a NULL value yields null (row semantics)") {
    // The latest at-or-before right ROW is the match, even when its value
    // column is null — a stale non-null value must NOT leak through (DuckDB
    // ASOF / pandas merge_asof row semantics; round-4 review finding).
    val left = Seq((1L, 105L, "e1")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 0L, Option("old")), (1L, 100L, Option.empty[String]))
      .toDF("k", "t", "rv")
    for (tol <- Seq(None, Some(10L), Some(1000L))) {
      val out = AsOfJoin.asofBackward(
        left.select($"ev", $"k".as("key"), $"t".as("ts")),
        right.select($"k".as("key"), $"t".as("ts"), $"rv"),
        key = "key", time = "ts", rightVals = Seq("rv"), tolerance = tol)
        .select("ev", "rv").as[(String, String)].collect().toMap
      assert(out("e1") == null, s"tolerance $tol leaked a stale value")
    }
  }

  test("property: both directions and tolerances match a brute-force reference") {
    // Random interleavings (duplicate left times, null right values, keys
    // with no right rows) against an in-memory reference of the contract:
    // match = nearest right ROW at-or-before (after), value nulled when
    // the row is farther than the tolerance. Fixed seeds, exact replay.
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.tabulate(60)(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, s"e$i"))
      val right = Seq.tabulate(40)(i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(100).toLong,
          if (rnd.nextInt(4) == 0) None else Some(s"v$i")))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, time)
      val leftDf = left.toDF("key", "ts", "ev")
      val rightDf = right.toDF("key", "ts", "rv")

      for (forward <- Seq(false, true); tol <- Seq(None, Some(7L), Some(30L))) {
        def reference(lk: Long, lt: Long): Option[String] = {
          val cands = right.filter(r => r._1 == lk &&
            (if (forward) r._2 >= lt else r._2 <= lt))
          if (cands.isEmpty) None
          else {
            val m = if (forward) cands.minBy(_._2) else cands.maxBy(_._2)
            val dist = if (forward) m._2 - lt else lt - m._2
            if (tol.exists(dist > _)) None else m._3
          }
        }
        val op =
          if (forward) AsOfJoin.asofForward(leftDf, rightDf,
            "key", "ts", Seq("rv"), tol)
          else AsOfJoin.asofBackward(leftDf, rightDf,
            "key", "ts", Seq("rv"), tol)
        val got = op.select("ev", "rv").as[(String, String)].collect().toMap
        assert(got.size == left.size, s"seed $seed fwd=$forward tol=$tol")
        for ((lk, lt, ev) <- left) {
          assert(Option(got(ev)) == reference(lk, lt),
            s"seed $seed fwd=$forward tol=$tol $ev: " +
              s"got ${got(ev)}, want ${reference(lk, lt)}")
        }
      }
    }
  }

  test("row count preserved (left join semantics)") {
    val left = (1 to 100).map(i => (i.toLong % 5, i.toLong, s"e$i"))
      .toDF("key", "ts", "ev")
    val right = Seq((0L, 50L, "x")).toDF("key", "ts", "rv")
    val out = AsOfJoin.asofBackward(left, right, "key", "ts", Seq("rv"))
    assert(out.count() == 100)
  }
}
