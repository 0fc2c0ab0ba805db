package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-14 fixes and operators: the s13 one-pass funnel-delta plan
 * (r13 verdict #1 — no Union re-executing the stage-time chain), the
 * Friedman joint product bound (r13 ADVICE: the k/n box missed q_num's
 * ×(k−1) multiplication), the kendallTau gated pair expansion +
 * maxPoints ≤ 1e7 cap, Nemenyi post-hoc (ab12), Cochran's Q (ab13),
 * grouped Kendall τ-b (x21), and the grouped bucket histogram seam
 * under dq37. */
class Round14Spec extends SparkTestBase {
  import spark.implicits._

  private def loudMsg(e: Throwable): String = {
    def walk(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ walk(t.getCause)
    walk(e).mkString(" | ")
  }

  test("funnelStageDeltas: the optimized plan has NO Union — both stage " +
    "rows derive from ONE evaluation of the stage-time chain (r13 " +
    "verdict #1: the union form executed the 3-scan/3-agg/2-join chain " +
    "twice)") {
    val M = 1000000L
    val ev = Seq((1L, 10 * M, "view"), (1L, 13 * M, "click"),
      (1L, 18 * M, "purchase"), (2L, 10 * M, "view"))
      .toDF("user_id", "tsu", "event_type")
      .select(col("user_id"), (col("tsu") * 1000L).as("ts"),
        col("event_type"))
    val plan = Attribution.funnelStageDeltas(ev)
      .queryExecution.optimizedPlan
    val unions = plan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }
    assert(unions.isEmpty,
      s"funnelStageDeltas must not union two chain evaluations: $plan")
    val gens = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
    assert(gens.nonEmpty, "expected the explode(array(struct...)) form")
  }

  test("nemenyi: hand 3-treatment panel — pair rows, exact diff2 off " +
    "the same midranks friedman reads, fixed-shape q") {
    // blocks b1..b4, treatments A/B/C; A always lowest, C always
    // highest => per-block x2 midranks A=2, B=4, C=6 (no ties).
    val rows = Seq(
      ("b1", "A", 1L), ("b1", "B", 2L), ("b1", "C", 3L),
      ("b2", "A", 0L), ("b2", "B", 5L), ("b2", "C", 9L),
      ("b3", "A", 2L), ("b3", "B", 4L), ("b3", "C", 8L),
      ("b4", "A", 1L), ("b4", "B", 3L), ("b4", "C", 7L))
    val got = Experiment.nemenyi(rows.toDF("b", "j", "v"), "b", "j", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    // R2: A = 4*2 = 8, B = 16, C = 24; n = 4, k = 3.
    val ab = got(("A", "B"))
    assert(ab.getLong(2) == 4L && ab.getLong(3) == 3L)
    assert(ab.getLong(4) == 8L && ab.getLong(5) == 16L &&
      ab.getLong(6) == -8L)
    // q = diff2 * sqrt(3/(n k (k+1))) = -8 * sqrt(3/48) = -2.0
    assert(ab.getLong(7) == -2000000L, s"q ${ab.getLong(7)}")
    assert(got(("A", "C")).getLong(6) == -16L &&
      got(("A", "C")).getLong(7) == -4000000L)
    // n < 10 => the studentized-range read is out of regime
    assert(ab.getLong(8) == 0L)
  }

  test("nemenyi: k = 1 and empty inputs yield an EMPTY pair relation, " +
    "and the complete-block refusal carries the nemenyi name") {
    val one = Seq(("b1", "A", 1L), ("b2", "A", 2L)).toDF("b", "j", "v")
    assert(Experiment.nemenyi(one, "b", "j", "v").collect().isEmpty)
    assert(Experiment.nemenyi(
      Seq.empty[(String, String, Long)].toDF("b", "j", "v"),
      "b", "j", "v").collect().isEmpty)
    val incomplete = Seq(("b1", "A", 1L), ("b1", "B", 2L),
      ("b2", "A", 3L)).toDF("b", "j", "v")
    val e = intercept[Exception] {
      Experiment.nemenyi(incomplete, "b", "j", "v").collect()
    }
    assert(loudMsg(e).contains("nemenyi: blocks must be COMPLETE"))
  }

  test("cochranQ: hand binary panel equals the textbook statistic, " +
    "exact num/den") {
    // 5 blocks x 3 treatments. C_A = 4, C_B = 2, C_C = 1; T = 7.
    // Row sums: 3, 2, 1, 1, 0 => sum Ri^2 = 9+4+1+1 = 15.
    val rows = Seq(
      ("b1", "A", 1L), ("b1", "B", 1L), ("b1", "C", 1L),
      ("b2", "A", 1L), ("b2", "B", 1L), ("b2", "C", 0L),
      ("b3", "A", 1L), ("b3", "B", 0L), ("b3", "C", 0L),
      ("b4", "A", 1L), ("b4", "B", 0L), ("b4", "C", 0L),
      ("b5", "A", 0L), ("b5", "B", 0L), ("b5", "C", 0L))
    val got = Experiment.cochranQ(rows.toDF("b", "j", "v"), "b", "j", "v")
      .collect().head
    assert(got.getLong(0) == 5L && got.getLong(1) == 3L &&
      got.getLong(2) == 7L)
    // q_num = (k-1)(k*sum Cj^2 - T^2) = 2*(3*21 - 49) = 28
    // q_den = k*T - sum Ri^2 = 21 - 15 = 6
    assert(got.getLong(3) == 28L && got.getLong(4) == 6L)
    assert(got.getLong(5) == math.floor(28.0 / 6.0 * 1e6 + 0.5).toLong)
    // n*k = 15 < 24 => chi2 read out of regime
    assert(got.getLong(6) == 0L)
  }

  test("cochranQ: all-0/all-1 blocks only => q_den = 0 and NULL " +
    "q_micro; refusals are loud (non-binary value, incomplete block, " +
    "dup cell)") {
    val degenerate = Seq(
      ("b1", "A", 1L), ("b1", "B", 1L),
      ("b2", "A", 0L), ("b2", "B", 0L)).toDF("b", "j", "v")
    val d = Experiment.cochranQ(degenerate, "b", "j", "v").collect().head
    assert(d.getLong(4) == 0L && d.isNullAt(5))
    val nonBinary = Seq(("b1", "A", 1L), ("b1", "B", 2L))
      .toDF("b", "j", "v")
    val e1 = intercept[Exception] {
      Experiment.cochranQ(nonBinary, "b", "j", "v").collect()
    }
    assert(loudMsg(e1).contains("binary 0/1"), loudMsg(e1))
    val incomplete = Seq(("b1", "A", 1L), ("b1", "B", 0L),
      ("b2", "A", 1L)).toDF("b", "j", "v")
    val e2 = intercept[Exception] {
      Experiment.cochranQ(incomplete, "b", "j", "v").collect()
    }
    assert(loudMsg(e2).contains("COMPLETE"), loudMsg(e2))
    val dup = Seq(("b1", "A", 1L), ("b1", "A", 0L), ("b1", "B", 1L),
      ("b2", "A", 0L), ("b2", "B", 0L), ("b2", "B", 1L))
      .toDF("b", "j", "v")
    val e3 = intercept[Exception] {
      Experiment.cochranQ(dup, "b", "j", "v").collect()
    }
    assert(loudMsg(e3).contains("more than one"), loudMsg(e3))
  }

  test("kendallTauBy: hand groups — opposed-sign segments, a " +
    "one-point group surfaces with 0 pairs and NULL tau") {
    val rows = Seq(
      // g up: strictly concordant (tau = 1)
      ("up", 1L, 1L, 10L), ("up", 2L, 2L, 20L), ("up", 3L, 3L, 30L),
      // g dn: strictly discordant (tau = -1)
      ("dn", 1L, 1L, 30L), ("dn", 2L, 2L, 20L), ("dn", 3L, 3L, 10L),
      // g one: single point
      ("one", 1L, 5L, 5L))
    val got = Experiment.kendallTauBy(rows.toDF("g", "t", "x", "y"),
        "g", "t", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("up", "dn", "one"))
    assert(got("up").getLong(1) == 3L && got("up").getLong(2) == 3L &&
      got("up").getLong(3) == 0L && got("up").getLong(6) == 1000000L)
    assert(got("dn").getLong(3) == 3L &&
      got("dn").getLong(6) == -1000000L)
    assert(got("one").getLong(1) == 1L && got("one").getLong(2) == 0L &&
      got("one").getLong(3) == 0L && got("one").isNullAt(6))
  }

  test("kendallTauBy: a single-group relation matches the global " +
    "kendallTau row exactly; per-group grain refusal is loud") {
    val series = Seq((1L, 3L, 9L), (2L, 1L, 4L), (3L, 3L, 2L),
      (4L, 7L, 2L), (5L, 2L, 8L))
    val g = Experiment.kendallTau(series.toDF("t", "x", "y"),
      "t", "x", "y").collect().head
    val b = Experiment.kendallTauBy(
        series.map { case (t, x, y) => ("only", t, x, y) }
          .toDF("g", "t", "x", "y"),
        "g", "t", "x", "y")
      .collect().head
    assert((1 to 5).forall(i => b.getLong(i) == g.getLong(i - 1)))
    assert(b.getLong(6) == g.getLong(5))
    val dupOrd = Seq(("a", 1L, 1L, 1L), ("a", 1L, 2L, 2L))
      .toDF("g", "t", "x", "y")
    val e = intercept[Exception] {
      Experiment.kendallTauBy(dupOrd, "g", "t", "x", "y").collect()
    }
    assert(loudMsg(e).contains("(ord) grain"), loudMsg(e))
  }

  test("kendallTau / kendallTauBy: maxPoints beyond 1e7 is refused at " +
    "call time (n0-derived doubles would leave the exact-< 2^53 claim)") {
    val df = Seq((1L, 1L, 1L)).toDF("t", "x", "y")
    val e1 = intercept[IllegalArgumentException] {
      Experiment.kendallTau(df, "t", "x", "y", maxPoints = 20000000L)
    }
    assert(e1.getMessage.contains("1e7"))
    val e2 = intercept[IllegalArgumentException] {
      Experiment.kendallTauBy(df.withColumn("g", lit("g")),
        "g", "t", "x", "y", maxPoints = 20000000L)
    }
    assert(e2.getMessage.contains("1e7"))
  }

  test("friedman joint product bound: the SQL gate's conservative " +
    "threshold never admits a (k, n) whose exact q_num peak " +
    "n^2 k(k+1)(k-1)^2 / 3 leaves BIGINT (r13 ADVICE)") {
    val M = BigInt(Long.MaxValue)
    (2 to 100).foreach { k =>
      val x = k.toLong * (k + 1L) * (k - 1L) * (k - 1L)
      // the gate admits n iff n*n <= (maxLong div X) * 3
      val admitted = (Long.MaxValue / x) * 3L
      // exact peak of q_num at the largest admitted n^2:
      val peak = BigInt(admitted) * BigInt(x) / 3
      assert(peak <= M,
        s"k=$k: gate admits n^2=$admitted but peak $peak > 2^63-1")
      // and the gate is not absurdly loose NOR tighter than 1/4 of the
      // true bound (sanity that the div-then-multiply slack is tiny)
      val exactBound = (M * 3) / BigInt(x)
      assert(BigInt(admitted) * 4 >= exactBound,
        s"k=$k: gate admits $admitted, exact bound $exactBound")
    }
  }

  test("bucketCountsBy: per-group histograms equal the global " +
    "bucketCounts of each group's slice; null keys dropped") {
    val df = Seq(("a", 3L), ("a", 9L), ("a", 12L), ("b", -1L),
      ("b", 3L), (null.asInstanceOf[String], 5L)).toDF("g", "v")
    val got = Profile.bucketCountsBy(df, "g", "v", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("a", 0L) -> 2L, ("a", 1L) -> 1L,
      ("b", -1L) -> 1L, ("b", 0L) -> 1L))
    Seq("a", "b").foreach { g =>
      val whole = Profile.bucketCounts(
          df.filter(col("g") === g).select("v"), "v", 10L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(whole == got.collect { case ((gg, b), n) if gg == g =>
        b -> n })
    }
  }

  test("ksFromBucketsBy: per-group bucket-grain D is a lower bound of " +
    "that group's value-grain D, tight at width 1") {
    val ref = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 1L), ("b", 9L))
      .toDF("g", "v")
    val cur = Seq(("a", 7L), ("a", 8L), ("a", 9L), ("b", 1L), ("b", 9L))
      .toDF("g", "v")
    def grouped(width: Long) = Profile.ksFromBucketsBy(
        Profile.bucketCountsBy(ref, "g", "v", width)
          .toDF("group", "bucket", "n_ref"),
        Profile.bucketCountsBy(cur, "g", "v", width)
          .toDF("group", "bucket", "n_cur"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    val value = Profile.ksTwoSampleBy(ref, cur, "g", "v")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(grouped(1L) == value, s"${grouped(1L)} vs $value")
    val coarse = grouped(100L)
    assert(value.forall { case (g, d) => coarse(g) <= d },
      s"coarse $coarse must lower-bound value-grain $value")
  }
}
