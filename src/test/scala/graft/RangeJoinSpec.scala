package graft

import org.apache.spark.sql.functions._

import graft.ext.TimeSeries
import graft.operators.RangeJoin

/** RangeJoin bin-replication semantics (≡ the naive non-equi join, no pair
 * duplication, negative domains, no-BNLJ plan lock) and TimeSeries.gapFill
 * (dense grid, zero-fill, carry-forward). */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val intervals = Seq(
    // overlapping + adjacent + negative-lo intervals, spans 5..40
    (0, -20L, 0L), (1, 0L, 10L), (2, 5L, 25L), (3, 25L, 30L), (4, 100L, 140L))
    .toDF("iv_id", "lo", "hi")

  private val points = Seq(-20L, -1L, 0L, 4L, 5L, 9L, 24L, 25L, 29L, 30L,
    99L, 100L, 139L, 140L, 500L).toDF("p")

  test("binned range join matches the naive non-equi join for every bin width") {
    val expected = points.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iv_id").as[(Long, Int)].collect().toSet

    for (w <- Seq(1L, 3L, 7L, 64L)) {
      val got = RangeJoin.binnedRangeJoin(points, "p", intervals,
          "lo", "hi", binWidth = w)
        .select("p", "iv_id").as[(Long, Int)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at w=$w")
      assert(got.toSet == expected, s"pair set mismatch at w=$w")
    }
  }

  test("point in overlapping intervals matches each exactly once") {
    val out = RangeJoin.binnedRangeJoin(Seq(7L).toDF("p"), "p", intervals,
        "lo", "hi", binWidth = 10L)
      .select("iv_id").as[Int].collect().sorted
    assert(out.toSeq == Seq(1, 2))
  }

  test("plan lock: no BroadcastNestedLoopJoin, equi-join on the bin") {
    val plan = RangeJoin.binnedRangeJoin(points, "p", intervals,
        "lo", "hi", binWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the naive spelling IS the nested loop this operator avoids — visible
    // with the RangeJoinRewrite optimizer rule held off (it rewrites the
    // naive form to this operator's plan by default; RangeJoinRewriteSpec)
    spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "false")
    try {
      val naive = points.join(intervals,
          col("p") >= col("lo") && col("p") < col("hi"))
        .queryExecution.executedPlan.toString
      assert(naive.contains("BroadcastNestedLoopJoin"),
        "naive form should be the nested loop this operator avoids")
    } finally spark.conf.unset("spark.graft.rangeJoinRewrite.enabled")
  }

  test("property: random intervals/points/widths always match the naive join") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](gen: Gen[T], seed: Long): T =
      gen.apply(Gen.Parameters.default, Seed(seed)).get

    val genCase = for {
      nIv <- Gen.choose(1, 12)
      ivs <- Gen.listOfN(nIv, for {
        lo <- Gen.choose(-50L, 50L)
        span <- Gen.choose(1L, 40L)
      } yield (lo, lo + span))
      nPts <- Gen.choose(1, 40)
      pts <- Gen.listOfN(nPts, Gen.choose(-60L, 100L))
      w <- Gen.oneOf(1L, 2L, 5L, 13L, 64L)
    } yield (ivs, pts, w)

    (1L to 12L).foreach { seed =>
      val (ivs, pts, w) = sample(genCase, seed)
      val ivDf = ivs.zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
        .toDF("iv_id", "lo", "hi")
      val pDf = pts.toDF("p")
      // expected via the true nested loop — rewrite rule held off so the
      // reference computation is independent of the code under test
      spark.conf.set("spark.graft.rangeJoinRewrite.enabled", "false")
      val expected =
        try pDf.join(ivDf, col("p") >= col("lo") && col("p") < col("hi"))
          .select("p", "iv_id").as[(Long, Int)].collect()
          .groupBy(identity).view.mapValues(_.length).toMap
        finally spark.conf.unset("spark.graft.rangeJoinRewrite.enabled")
      val got = RangeJoin.binnedRangeJoin(pDf, "p", ivDf, "lo", "hi", w)
        .select("p", "iv_id").as[(Long, Int)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got == expected, s"seed=$seed w=$w")
    }
  }

  test("gapFill densifies, zero-fills counts, carries gauges forward") {
    val observed = Seq(
      // key "a": days 1,2,5 observed — 3,4 missing; gauge null on day 2
      ("a", "2024-03-01", 2L, Some(10L)),
      ("a", "2024-03-02", 1L, None),
      ("a", "2024-03-05", 4L, Some(50L)),
      // key "b": single day — no gap rows generated
      ("b", "2024-03-09", 7L, Some(90L)))
      .toDF("k", "day", "n", "gauge")
      .withColumn("day", to_date(col("day")))

    val out = TimeSeries.gapFill(observed, key = "k", period = "day",
        step = "1 day", zeroFill = Seq("n"), carryForward = Seq("gauge"))
      .orderBy("k", "day")
      .select(col("k"), date_format(col("day"), "MM-dd"), col("n"),
        col("gauge"))
      .as[(String, String, Long, Option[Long])].collect().toSeq

    assert(out == Seq(
      ("a", "03-01", 2L, Some(10L)),
      ("a", "03-02", 1L, Some(10L)),  // gauge null observed → carried
      ("a", "03-03", 0L, Some(10L)),  // gap: zero-filled + carried
      ("a", "03-04", 0L, Some(10L)),
      ("a", "03-05", 4L, Some(50L)),
      ("b", "03-09", 7L, Some(90L))))
  }
}
