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

  test("cvmTwoSample: hand pin + exact agreement with a BigInt brute " +
    "reference on a pseudo-random tied sample; grain refusal is loud") {
    // ref {1,2}, cur {2,3}: t_num = 12, T = 12/(2*2*16) = 0.1875
    val got = Profile.cvmTwoSample(Seq(1L, 2L).toDF("v"),
      Seq(2L, 3L).toDF("v"), "v").collect().head
    assert(got.getLong(0) == 2L && got.getLong(1) == 2L &&
      got.getLong(2) == 3L && got.getLong(3) == 187500L)
    // brute: merged cumulative in BigInt, the documented readout shape
    val a = (1 to 37).map(i => ((i * 2654435761L) % 11 + 11) % 11)
    val b = (1 to 29).map(i => ((i * 40503L) % 11 + 11) % 11)
    def brute(xs: Seq[Long], ys: Seq[Long]): Long = {
      val vs = (xs ++ ys).distinct.sorted
      val (na, nb) = (xs.size.toLong, ys.size.toLong)
      var (ca, cb) = (0L, 0L)
      var t = BigInt(0)
      vs.foreach { v =>
        val (cr, cc) = (xs.count(_ == v).toLong, ys.count(_ == v).toLong)
        ca += cr; cb += cc
        val d = BigInt(ca * nb - cb * na)
        t += d * d * (cr + cc)
      }
      math.floor(t.toDouble * 1e6 /
        (na.toDouble * nb.toDouble *
          ((na.toDouble + nb.toDouble) * (na.toDouble + nb.toDouble))) +
        0.5).toLong
    }
    val r = Profile.cvmTwoSample(a.toDF("v"), b.toDF("v"), "v")
      .collect().head
    assert(r.getLong(3) == brute(a, b), s"${r.getLong(3)} vs brute")
    val e = intercept[Exception] {
      Profile.cvmTwoSample(Seq(1L, 2L).toDF("v"), Seq(3L).toDF("v"),
        "v", maxDistinct = 2L).collect()
    }
    assert(loudMsg(e).contains("cvmTwoSample"), loudMsg(e))
  }

  test("wassersteinTwoSample: hand pin, exact shift reads as the shift " +
    "in micro value units, identical samples read 0") {
    // ref {1,2} vs cur {2,3}: a pure +1 shift => W1 = 1
    val got = Profile.wassersteinTwoSample(Seq(1L, 2L).toDF("v"),
      Seq(2L, 3L).toDF("v"), "v").collect().head
    assert(got.getLong(3) == 1000000L, s"w1 ${got.getLong(3)}")
    val xs = (1 to 41).map(i => ((i * 2654435761L) % 97 + 97) % 97)
    val shifted = Profile.wassersteinTwoSample(xs.toDF("v"),
      xs.map(_ + 7L).toDF("v"), "v").collect().head
    assert(shifted.getLong(3) == 7000000L, s"${shifted.getLong(3)}")
    val same = Profile.wassersteinTwoSample(xs.toDF("v"),
      xs.toDF("v"), "v").collect().head
    assert(same.getLong(3) == 0L)
    // KS of the shifted pair is tiny while W1 reads the full 7 units —
    // the "magnitude member of the trio" claim on data
    val ks = Profile.ksTwoSample(xs.toDF("v"),
      xs.map(_ + 7L).toDF("v"), "v").collect().head
    assert(ks.getLong(3) < 200000L, s"ks_ppm ${ks.getLong(3)}")
  }

  test("cliffsDelta: hand pin + the exact mannWhitney bridge " +
    "u1_doubled = 2*n_gt + n_tie on a pseudo-random tied panel") {
    // arm0 = {100, 300}, arm1 = {200, 400}: gt 3, lt 1, tie 0
    val ev = Seq((0L, 1.0), (1L, 2.0), (2L, 3.0), (3L, 4.0))
      .toDF("user_id", "value")
    val got = Experiment.cliffsDelta(ev).collect().head
    assert(got.getLong(0) == 2L && got.getLong(1) == 2L &&
      got.getLong(2) == 3L && got.getLong(3) == 1L &&
      got.getLong(4) == 0L && got.getLong(5) == 500000L)
    // pseudo-random heavy-tie panel: brute pair loop + the U bridge
    val users = (0L until 40L).map(u => (u, (((u * 31L) % 7) - 3).toDouble))
    val df = users.toDF("user_id", "value")
    val d = Experiment.cliffsDelta(df).collect().head
    val arm0 = users.filter(_._1 % 2 == 0).map(u => (u._2 * 100).round)
    val arm1 = users.filter(_._1 % 2 == 1).map(u => (u._2 * 100).round)
    val gt = (for (x <- arm1; y <- arm0) yield ()).size -
      (for (x <- arm1; y <- arm0 if x <= y) yield ()).size
    val tie = (for (x <- arm1; y <- arm0 if x == y) yield ()).size
    val lt = arm1.size * arm0.size - gt - tie
    assert(d.getLong(2) == gt && d.getLong(3) == lt &&
      d.getLong(4) == tie,
      s"got (${d.getLong(2)},${d.getLong(3)},${d.getLong(4)}) " +
        s"brute ($gt,$lt,$tie)")
    assert(d.getLong(5) == math.floor((gt - lt).toDouble /
      (arm1.size * arm0.size).toDouble * 1e6 + 0.5).toLong)
    // mannWhitney's u1_doubled rides the U = n1·n0 + n1(n1+1)/2 − R1
    // convention, i.e. it counts arm-0-dominates pairs: 2·n_lt + n_tie
    val mw = Experiment.mannWhitney(df).collect().head
    assert(mw.getLong(2) == 2L * d.getLong(3) + d.getLong(4),
      s"u1_doubled ${mw.getLong(2)} != 2*lt+tie")
  }

  test("pageTrend: perfect ascending panel pins l2/e_l2/z; reversing " +
    "the label order mirrors l2 and negates z; refusal is loud") {
    val rows = for (b <- 1 to 3; (t, v) <- Seq(("A", 1L), ("B", 2L),
      ("C", 3L))) yield (s"b$b", t, v)
    val got = Experiment.pageTrend(rows.toDF("b", "t", "v"),
      "b", "t", "v").collect().head
    // per-block doubled ranks 2/4/6 => l2 = 1*6 + 2*12 + 3*18 = 84;
    // e_l2 = 3*3*16/2 = 72; Var(L2) = 3*9*4*8/36 = 24; z = 12/sqrt(24)
    assert(got.getLong(0) == 3L && got.getLong(1) == 3L &&
      got.getLong(2) == 84L && got.getLong(3) == 72L &&
      got.getLong(4) == 0L)
    assert(got.getLong(5) ==
      math.floor(12.0 / math.sqrt(24.0) * 1e6 + 0.5).toLong)
    assert(got.getLong(6) == 0L) // n < 10
    // relabel so the hypothesized (lexical) order reverses the trend:
    // l2_rev = (k+1)*sum(R2) - l2 = 4*36 - 84 = 60, z negated
    val rev = rows.map { case (b, t, v) =>
      (b, Map("A" -> "C", "B" -> "B", "C" -> "A")(t), v) }
    val g2 = Experiment.pageTrend(rev.toDF("b", "t", "v"),
      "b", "t", "v").collect().head
    assert(g2.getLong(2) == 60L && g2.getLong(5) == -got.getLong(5))
    val e = intercept[Exception] {
      Experiment.pageTrend(Seq(("b1", "A", 1L), ("b1", "B", 2L),
        ("b2", "A", 3L)).toDF("b", "t", "v"), "b", "t", "v").collect()
    }
    assert(loudMsg(e).contains("pageTrend: blocks must be COMPLETE"),
      loudMsg(e))
  }

  test("pageTrend: within-block ties surface ties_present = 1 with the " +
    "midrank l2 still exact") {
    // b1: A=1, B=1, C=2 -> doubled midranks: ties at 1 share (2+4)/2*2=3
    val rows = Seq(("b1", "A", 1L), ("b1", "B", 1L), ("b1", "C", 2L),
      ("b2", "A", 1L), ("b2", "B", 2L), ("b2", "C", 3L))
    val got = Experiment.pageTrend(rows.toDF("b", "t", "v"),
      "b", "t", "v").collect().head
    // b1 r2: A=3, B=3, C=6; b2 r2: 2, 4, 6
    // l2 = 1*(3+2) + 2*(3+4) + 3*(6+6) = 5 + 14 + 36 = 55
    assert(got.getLong(2) == 55L && got.getLong(4) == 1L)
  }

  test("cvmTwoSampleBy / wassersteinTwoSampleBy: each group's row " +
    "equals the global operator on that group's slice; one-sided " +
    "groups surface with NULL micro") {
    val ref = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 5L), ("b", 9L),
      ("only_ref", 3L)).toDF("g", "v")
    val cur = Seq(("a", 2L), ("a", 3L), ("b", 5L), ("b", 7L), ("b", 8L))
      .toDF("g", "v")
    val cvmBy = Profile.cvmTwoSampleBy(ref, cur, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val w1By = Profile.wassersteinTwoSampleBy(ref, cur, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(cvmBy.keySet == Set("a", "b", "only_ref"))
    Seq("a", "b").foreach { g =>
      val rs = ref.filter(col("g") === g).select("v")
      val cs = cur.filter(col("g") === g).select("v")
      val cg = Profile.cvmTwoSample(rs, cs, "v").collect().head
      val wg = Profile.wassersteinTwoSample(rs, cs, "v").collect().head
      (1 to 3).foreach { i =>
        assert(cvmBy(g).getLong(i) == cg.getLong(i - 1), s"cvm $g col $i")
        assert(w1By(g).getLong(i) == wg.getLong(i - 1), s"w1 $g col $i")
      }
      assert(cvmBy(g).getLong(4) == cg.getLong(3))
      assert(w1By(g).getLong(4) == wg.getLong(3))
    }
    assert(cvmBy("only_ref").isNullAt(4) && w1By("only_ref").isNullAt(4))
  }

  test("energyDistance: hand pin, identity 0, point masses read " +
    "2·separation (the D = 2∫(F−G)² identity), and D <= 2·W1 always") {
    // {1,2} vs {2,3}: E|XY| = 1, E|XX| = E|YY| = 0.5 => D = 1
    val got = Profile.energyDistance(Seq(1L, 2L).toDF("v"),
      Seq(2L, 3L).toDF("v"), "v").collect().head
    assert(got.getLong(3) == 1000000L, s"D ${got.getLong(3)}")
    val same = Profile.energyDistance(Seq(1L, 5L, 9L).toDF("v"),
      Seq(1L, 5L, 9L).toDF("v"), "v").collect().head
    assert(same.getLong(3) == 0L)
    // point masses at 0 and 1000: D = 2E|X−Y| = 2000 (and the ∫(F−G)²
    // reading: (F−G)² = 1 over the 1000-wide separation, doubled)
    val pm = Profile.energyDistance(Seq(0L).toDF("v"),
      Seq(1000L).toDF("v"), "v").collect().head
    assert(pm.getLong(3) == 2000000000L, s"point-mass D ${pm.getLong(3)}")
    val xs = (1 to 31).map(i => ((i * 2654435761L) % 50 + 50) % 50)
    val ys = (1 to 23).map(i => ((i * 40503L) % 50 + 50) % 50)
    val d = Profile.energyDistance(xs.toDF("v"), ys.toDF("v"), "v")
      .collect().head.getLong(3)
    val w1 = Profile.wassersteinTwoSample(xs.toDF("v"), ys.toDF("v"),
      "v").collect().head.getLong(3)
    assert(d <= 2L * w1 + 1L, s"D $d must be <= 2*W1 ${2 * w1} (+1 ulp)")
  }

  test("jonckheereTerpstra: ascending hand pin (exact j2/e_j2/var18), " +
    "label reversal mirrors j2 about e_j2 and negates z; within- and " +
    "cross-group ties flag; refusals are loud") {
    val asc = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L),
      ("C", 5L), ("C", 6L)).toDF("g", "v")
    val got = Experiment.jonckheereTerpstra(asc, "g", "v").collect().head
    // gt = 12 (every cross pair ordered), j2 = 24; e_j2 = (36-12)/2 =
    // 12; var18 = 36*15 - 3*(4*7) = 456
    assert(got.getLong(0) == 6L && got.getLong(1) == 3L &&
      got.getLong(2) == 24L && got.getLong(3) == 12L &&
      got.getLong(4) == 456L && got.getLong(5) == 0L)
    assert(got.getLong(6) == math.floor(12.0 /
      math.sqrt(456.0 / 18.0) * 1e6 + 0.5).toLong)
    assert(got.getLong(7) == 0L) // nmin = 2 < 8
    val rev = Seq(("C", 1L), ("C", 2L), ("B", 3L), ("B", 4L),
      ("A", 5L), ("A", 6L)).toDF("g", "v")
    val g2 = Experiment.jonckheereTerpstra(rev, "g", "v").collect().head
    assert(g2.getLong(2) == 0L && g2.getLong(6) == -got.getLong(6))
    // a cross-group tie contributes tie (not gt) and flags ties_present
    val tied = Seq(("A", 1L), ("A", 5L), ("B", 5L), ("B", 9L))
      .toDF("g", "v")
    val g3 = Experiment.jonckheereTerpstra(tied, "g", "v").collect().head
    // pairs (A,B): 1<5 gt, 1<9 gt, 5=5 tie, 5<9 gt => gt 3, tie 1,
    // j2 = 7
    assert(g3.getLong(2) == 7L && g3.getLong(5) == 1L)
    val e1 = intercept[IllegalArgumentException] {
      Experiment.jonckheereTerpstra(asc, "g", "v",
        maxDistinct = 1000000L, maxGroups = 100L)
    }
    assert(e1.getMessage.contains("1e7"))
    val e2 = intercept[Exception] {
      Experiment.jonckheereTerpstra(asc, "g", "v", maxDistinct = 3L)
        .collect()
    }
    assert(loudMsg(e2).contains("merged distinct"), loudMsg(e2))
  }

  test("jonckheereTerpstra: brute-force pair-count equality on a " +
    "pseudo-random tied 4-group panel") {
    val rows = (0 until 48).map { i =>
      (s"g${i % 4}", ((i * 2654435761L) % 9 + 9) % 9)
    }
    val got = Experiment.jonckheereTerpstra(rows.toDF("g", "v"),
      "g", "v").collect().head
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val gs = byG.keys.toSeq.sorted
    var (gt, tie) = (0L, 0L)
    for {
      i <- gs.indices; j <- (i + 1) until gs.size
      x <- byG(gs(i)); y <- byG(gs(j))
    } {
      if (x < y) gt += 1
      else if (x == y) tie += 1
    }
    assert(got.getLong(2) == 2 * gt + tie,
      s"j2 ${got.getLong(2)} != ${2 * gt + tie}")
    val n = 48L
    val sn2 = byG.values.map(v => v.size.toLong * v.size).sum
    assert(got.getLong(3) == (n * n - sn2) / 2)
  }
}
