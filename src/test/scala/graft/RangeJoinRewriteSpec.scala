package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** RangeJoinRewrite optimizer rule: a NAIVE non-equi interval join written
 * by a user re-plans as a hash join (no BroadcastNestedLoopJoin), results
 * identical; the rule stays out of the way for equi joins, non-integral
 * bounds, and when disabled. */
class RangeJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private val intervals = Seq(
    (0, -20L, 0L), (1, 0L, 10L), (2, 5L, 25L), (3, 25L, 30L), (4, 100L, 140L))
    .toDF("iv_id", "lo", "hi")
  private val points = Seq(-20L, -1L, 0L, 4L, 5L, 9L, 24L, 25L, 29L, 30L,
    99L, 100L, 139L, 140L, 500L).toDF("p")

  private def naive = points.join(intervals,
    col("p") >= col("lo") && col("p") < col("hi"))

  private def withRule[T](enabled: Boolean, width: Long = 10L)(body: => T): T = {
    spark.conf.set("spark.graft.rangeJoinRewrite.enabled", enabled.toString)
    spark.conf.set("spark.graft.rangeJoinRewrite.binWidth", width.toString)
    try body
    finally {
      spark.conf.unset("spark.graft.rangeJoinRewrite.enabled")
      spark.conf.unset("spark.graft.rangeJoinRewrite.binWidth")
    }
  }

  test("naive interval join re-plans as a hash join with identical results") {
    val expected = withRule(enabled = false) {
      val plan = naive.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
      naive.select("p", "iv_id").as[(Long, Int)].collect().toSet
    }
    withRule(enabled = true) {
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val got = naive.select("p", "iv_id").as[(Long, Int)].collect()
      assert(got.length == got.toSet.size, "rewrite must not duplicate pairs")
      assert(got.toSet == expected)
      // and matches the explicit operator form
      val op = RangeJoin.binnedRangeJoin(points, "p", intervals,
        "lo", "hi", 10L).select("p", "iv_id").as[(Long, Int)].collect().toSet
      assert(got.toSet == op)
    }
  }

  test("auto width (default) derives from sampled interval spans") {
    val expected = withRule(enabled = false) {
      naive.select("p", "iv_id").as[(Long, Int)].collect().toSet
    }
    // enabled but NO binWidth set -> the "auto" default: the rule samples
    // the interval side (median span here = 20) and still rewrites
    spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "true")
    try {
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(naive.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      val got = naive.select("p", "iv_id").as[(Long, Int)].collect()
      assert(got.length == got.toSet.size, "rewrite must not duplicate pairs")
      assert(got.toSet == expected)
      // degenerate interval side (no positive span anywhere): derivation
      // yields nothing -> rule stands down instead of guessing a width
      val degenerate = Seq((0, 10L, 10L), (1, 30L, 20L)).toDF("iv_id", "lo", "hi")
      val dj = points.join(degenerate,
        col("p") >= col("lo") && col("p") < col("hi"))
      assert(!dj.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(dj.count() == 0)
    } finally spark.conf.unset("spark.graft.rangeJoinRewrite.enabled")
  }

  test("inclusive upper bound (BETWEEN) also rewrites, bounds preserved") {
    withRule(enabled = true) {
      val between = points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!between.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      val got = between.select("p", "iv_id").as[(Long, Int)].collect().toSet
      val expected = withRule(enabled = false) {
        points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
          .select("p", "iv_id").as[(Long, Int)].collect().toSet
      }
      assert(got == expected)
      assert(got.contains((0L, 0)))  // p == hi kept under <=
    }
  }

  test("timestamp intervals rewrite too; sub-second exclusive bounds survive") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ivs = Seq(
      (0, ts("2026-01-01 10:00:00.5"), ts("2026-01-01 10:00:02.5")),
      (1, ts("2026-01-01 10:00:02.5"), ts("2026-01-01 10:01:00")),
      (2, ts("2026-01-02 00:00:00"), ts("2026-01-02 00:00:10")))
      .toDF("iv_id", "lo", "hi")
    val pts = Seq(
      ts("2026-01-01 10:00:00.4"), ts("2026-01-01 10:00:00.5"),
      ts("2026-01-01 10:00:02.4"), ts("2026-01-01 10:00:02.5"),
      ts("2026-01-01 10:00:59.9"), ts("2026-01-02 00:00:09.9"))
      .toDF("p")
    def q = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .select(col("p").cast("string"), col("iv_id"))
    val expected = withRule(enabled = false) {
      q.as[(String, Int)].collect().toSet
    }
    assert(expected.contains(("2026-01-01 10:00:02.4", 0)))
    // width=1: second-granularity bins — the sub-second `< hi` bound sits
    // INSIDE the top second, the case where an integral-style (hi_s - 1)
    // top bin would drop the 10:00:02.4 match
    withRule(enabled = true, width = 1L) {
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("__graft_bin"), plan)
      assert(q.as[(String, Int)].collect().toSet == expected)
    }
    // auto width: derived from the timestamp spans in cast units (seconds)
    spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "true")
    try {
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(q.as[(String, Int)].collect().toSet == expected)
    } finally spark.conf.unset("spark.graft.rangeJoinRewrite.enabled")
  }

  test("joins with an equi key are left alone (any key type)") {
    withRule(enabled = true) {
      val l = Seq((1L, 5L), (2L, 15L)).toDF("k", "v")
      val r = Seq((1L, 0L, 10L), (2L, 10L, 20L)).toDF("k", "lo", "hi")
      val j = l.join(r, l("k") === r("k") && l("v") >= r("lo") && l("v") < r("hi"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bin"), plan)
      assert(j.count() == 2)
      // non-integral equi key (string): hash join already available — the
      // guard must see it even though the key itself can't be binned
      val ls = Seq(("a", 5L), ("b", 15L)).toDF("k", "v")
      val rs = Seq(("a", 0L, 10L), ("b", 10L, 20L)).toDF("k", "lo", "hi")
      val js = ls.join(rs,
        ls("k") === rs("k") && ls("v") >= rs("lo") && ls("v") < rs("hi"))
      assert(!js.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(js.count() == 2)
    }
  }

  test("empty and inverted intervals do not crash, just match nothing") {
    withRule(enabled = true, width = 10L) {
      val r = Seq((0, 10L, 10L), (1, 30L, 20L), (2, 0L, 5L))
        .toDF("iv_id", "lo", "hi")  // empty, inverted, normal
      val got = points.join(r, col("p") >= col("lo") && col("p") < col("hi"))
        .select("p", "iv_id").as[(Long, Int)].collect().toSet
      assert(got.forall(_._2 == 2))
      assert(got.map(_._1) == Set(0L, 4L))
    }
  }

  test("non-positive binWidth stands down instead of corrupting the join") {
    for (w <- Seq(0L, -5L)) {
      withRule(enabled = true, width = w) {
        val plan = naive.queryExecution.optimizedPlan.toString
        assert(!plan.contains("__graft_bin"), s"width $w must disable: $plan")
        assert(naive.count() > 0)
      }
    }
  }

  test("non-integral bounds are left alone") {
    withRule(enabled = true) {
      val l = Seq(1.5, 2.5).toDF("p")
      val r = Seq((0.0, 2.0)).toDF("lo", "hi")
      val j = l.join(r, col("p") >= col("lo") && col("p") < col("hi"))
      assert(!j.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(j.count() == 1)
    }
  }

  test("negative domains and width larger than every span stay correct") {
    val expected = withRule(enabled = false) {
      naive.select("p", "iv_id").as[(Long, Int)].collect().toSet
    }
    for (w <- Seq(1L, 7L, 1000L)) {
      withRule(enabled = true, width = w) {
        assert(naive.select("p", "iv_id").as[(Long, Int)].collect().toSet
          == expected, s"width $w")
      }
    }
  }

  test("auto width survives a span-ORDERED relation with a wide outlier") {
    // The round-4 advice failure mode: 20k intervals sorted by span, all
    // narrow except a 2e9-wide outlier at the very end. A prefix
    // executeTake(10001) sample sees only span-1 rows -> width 1 -> the
    // outlier would replicate into 2e9 bins (runtime Sequence-length
    // failure). The partition-spread sample + the max-replication clamp
    // must keep the rewrite both ALIVE and correct.
    val ivs = spark.range(20000).selectExpr("cast(id as int) as iv_id",
        "id * 3 as lo",
        // last row: span 2_000_000_000; everything else span 1
        "case when id = 19999 then id * 3 + 2000000000 else id * 3 + 1 end as hi")
      .orderBy("hi")
    val pts = Seq(0L, 3L, 4L, 30000L, 59998L, 1000000000L).toDF("p")
    val expected = withRule(enabled = false) {
      pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
        .select("p", "iv_id").as[(Long, Int)].collect().toSet
    }
    spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "true")
    try {
      val j = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      assert(j.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(j.select("p", "iv_id").as[(Long, Int)].collect().toSet == expected)
    } finally spark.conf.unset("spark.graft.rangeJoinRewrite.enabled")
  }

  test("narrow projection over a hybrid rewrite does not re-split the residual") {
    // The residual guard recurses through interposed Project/SubqueryAlias
    // nodes (round-5 advice) so a fixpoint where ColumnPruning separates
    // the wide Join from its span Filter cannot re-derive and re-split the
    // residual. This shape does not currently provoke the interposition
    // (pruning lands BELOW the Filter), so the recursion is
    // belt-and-braces; the test pins the observable invariant either way:
    // exactly one hybrid Union in the optimized plan under a narrow
    // projection, with results unchanged.
    val ivs = spark.range(2000).selectExpr("cast(id as int) as iv_id",
        "id * 3 as lo",
        "case when id = 1999 then id * 3 + 2000000000 else id * 3 + 1 end as hi")
    val pts = Seq(0L, 3L, 4L, 3000L, 5998L, 1000000000L).toDF("p")
    val expected = withRule(enabled = false) {
      pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
        .select("iv_id").as[Int].collect().sorted.toSeq
    }
    spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "true")
    try {
      // the narrow projection is what invites ColumnPruning in
      val j = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
        .select("iv_id")
      val optimized = j.queryExecution.optimizedPlan
      assert(optimized.toString.contains("__graft_bin"))
      val unions = optimized.collect {
        case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
      }
      assert(unions.length == 1,
        s"expected exactly one hybrid Union, got ${unions.length}:\n$optimized")
      assert(j.as[Int].collect().sorted.toSeq == expected)
    } finally spark.conf.unset("spark.graft.rangeJoinRewrite.enabled")
  }

  test("property: rewrite equals the naive join on random interval relations") {
    // Seeded randomized equivalence (SpineProperties pattern — plain
    // ScalaCheck generators, deterministic replay): random points and
    // random intervals including negatives, empties, inversions,
    // duplicates and the occasional huge span, across manual widths AND
    // the auto-derivation path.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](gen: Gen[T], seed: Long): T =
      gen.apply(Gen.Parameters.default, Seed(seed)).get
    val genIv = for {
      lo <- Gen.chooseNum(-1000L, 1000L)
      span <- Gen.frequency(
        5 -> Gen.chooseNum(0L, 50L),       // typical
        2 -> Gen.const(0L),                // empty
        2 -> Gen.chooseNum(-40L, -1L),     // inverted
        1 -> Gen.chooseNum(100000L, 500000L)) // huge outlier
    } yield (lo, lo + span)
    val genCase = for {
      n <- Gen.chooseNum(1, 40)
      ivs <- Gen.listOfN(n, genIv)
      m <- Gen.chooseNum(1, 60)
      pts <- Gen.listOfN(m, Gen.chooseNum(-1200L, 1200L))
    } yield (ivs, pts)
    for (seed <- 1L to 8L) {
      val (ivs, ptsList) = sample(genCase, seed)
      val intervals = ivs.zipWithIndex
        .map { case ((lo, hi), i) => (i, lo, hi) }.toDF("iv_id", "lo", "hi")
      val pts = ptsList.toDF("p")
      def j = pts.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      val expected = withRule(enabled = false) {
        j.select("p", "iv_id").as[(Long, Int)].collect().sorted.toSeq
      }
      for (width <- Seq(Some(1L), Some(17L), None)) {
        width match {
          case Some(w) => withRule(enabled = true, width = w) {
            assert(j.select("p", "iv_id").as[(Long, Int)].collect().sorted.toSeq
              == expected, s"seed=$seed width=$w")
          }
          case None =>
            spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "true")
            try assert(
              j.select("p", "iv_id").as[(Long, Int)].collect().sorted.toSeq
                == expected, s"seed=$seed width=auto")
            finally spark.conf
              .unset("spark.graft.rangeJoinRewrite.enabled")
        }
      }
    }
  }

  test("overflow-wide interval (hi - lo > Long.MaxValue) stays correct") {
    // A legal interval whose span overflows Long: under ANSI (the Spark 4
    // default) a plain hi - lo in the hybrid's span filters would THROW at
    // runtime, and a wrapped negative span would misroute the row into the
    // binned Generate (a ~1e19-bin sequence). The TRY-mode span must send
    // it to the nested-loop branch, where it simply matches every point in
    // range, exactly like the un-rewritten join.
    val wild = Seq((0, -6000000000000000000L, 6000000000000000000L),
      (1, 0L, 10L)).toDF("iv_id", "lo", "hi")
    val pts = Seq(-100L, 0L, 5L, 100L).toDF("p")
    def j = pts.join(wild, col("p") >= col("lo") && col("p") < col("hi"))
    val expected = withRule(enabled = false) {
      j.select("p", "iv_id").as[(Long, Int)].collect().toSet
    }
    withRule(enabled = true, width = 5L) {
      assert(j.select("p", "iv_id").as[(Long, Int)].collect().toSet
        == expected)
    }
    // auto-width path too (derivation samples the overflow span in TRY
    // mode server-side; a thrown sampling job would stand the rule down,
    // which is also acceptable — correctness is what is asserted)
    spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "true")
    try assert(j.select("p", "iv_id").as[(Long, Int)].collect().toSet
      == expected)
    finally spark.conf.unset("spark.graft.rangeJoinRewrite.enabled")
  }

  test("rule fires twice on one session with a CACHED interval side") {
    // Cached-plan re-optimization is the re-entrancy path the derivation
    // latch guards: width sampling executes a plan during optimization,
    // and with an InMemoryRelation child that execution re-enters the
    // optimizer on this same thread. Two consecutive runs must both
    // rewrite, return identical results, and hit the width cache (no
    // second sampling job is observable as: same plan, same results).
    val expected = withRule(enabled = false) {
      naive.select("p", "iv_id").as[(Long, Int)].collect().toSet
    }
    intervals.persist()
    try {
      intervals.count()
      spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "true")
      try {
        for (run <- 1 to 2) {
          val j = naive
          assert(j.queryExecution.optimizedPlan.toString.contains("__graft_bin"),
            s"run $run did not rewrite")
          // NOTE the hybrid's wide-outlier branch legitimately remains a
          // nested-loop join over the cached relation (runtime-empty here;
          // over a plain LocalRelation Catalyst folds the span filter and
          // drops the branch entirely, which is what the uncached tests
          // assert) — so the check is the binned branch's presence plus
          // results, not BNLJ absence.
          assert(j.select("p", "iv_id").as[(Long, Int)].collect().toSet
            == expected, s"run $run")
        }
      } finally spark.conf.unset("spark.graft.rangeJoinRewrite.enabled")
    } finally intervals.unpersist()
  }
}
