package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-12 operators: Theil–Sen robust slope (floor-division micro
 * convention, outlier immunity, refusal legs) and Spearman rank
 * correlation (midrank ×2 convention, perfect/inverse/tied cases,
 * degeneracy). The signed quantile sketch lives in QuantileSketchSpec;
 * the streaming funnel-latency twin pins in StreamingSpec; the envelope
 * fuzz generalization in EnvelopeFuzzSpec. */
class Round12Spec extends SparkTestBase {
  import spark.implicits._

  private def loudMsg(e: Throwable): String = {
    def walk(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ walk(t.getCause)
    walk(e).mkString(" | ")
  }

  test("theilSen: the median pairwise slope shrugs off the outlier an " +
    "OLS fit would chase") {
    // key a: a clean slope-10 line with one wild final point — 5 of the
    // 6 pairwise slopes involve the outlier's pull, but the median
    // stays at the line's 10/step (10e6 micro)
    val rows = Seq(
      ("a", 0L, 0L), ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 1000L))
    val got = TimeSeries.theilSen(rows.toDF("k", "t", "v"), "k", "t", "v")
      .collect().head
    assert(got.getLong(1) == 4L && got.getLong(2) == 6L)
    assert(got.getLong(3) == 10000000L,
      s"median slope ${got.getLong(3)} != 10e6")
  }

  test("theilSen: negative slopes TRUNCATE toward zero (Spark div ≡ " +
    "DuckDB integer //, probed — the sign-symmetric convention)") {
    // pairs: (0,1) -> -7e6 exact; (0,3) -> -10e6/3 = -3333333.33…,
    // TRUNC -3333333 (floor would say -3333334); (1,3) -> -1.5e6
    // exact. Lower median (rank 2 of 3) = -3333333.
    val rows = Seq(("a", 0L, 10L), ("a", 1L, 3L), ("a", 3L, 0L))
    val got = TimeSeries.theilSen(rows.toDF("k", "t", "v"), "k", "t", "v")
      .collect().head
    assert(got.getLong(3) == -3333333L,
      s"median slope ${got.getLong(3)} != trunc(-10e6/3)")
    // sign symmetry: mirroring the series negates every pair slope
    val mirrored = TimeSeries.theilSen(
        rows.map { case (k, t, v) => (k, t, -v) }.toDF("k", "t", "v"),
        "k", "t", "v")
      .collect().head
    assert(mirrored.getLong(3) == 3333333L)
  }

  test("theilSen: single-point keys yield 0 pairs + NULL slope; " +
    "duplicate ord and oversized magnitude refuse loudly") {
    val one = TimeSeries.theilSen(
        Seq(("solo", 5L, 42L)).toDF("k", "t", "v"), "k", "t", "v")
      .collect().head
    assert(one.getLong(2) == 0L && one.isNullAt(3))
    val dup = Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 2L, 3L))
    val e1 = intercept[Exception] {
      TimeSeries.theilSen(dup.toDF("k", "t", "v"), "k", "t", "v")
        .collect()
    }
    assert(loudMsg(e1).contains("grain"))
    val big = Seq(("a", 1L, 0L), ("a", 2L, 2000000000001L))
    val e2 = intercept[Exception] {
      TimeSeries.theilSen(big.toDF("k", "t", "v"), "k", "t", "v")
        .collect()
    }
    assert(loudMsg(e2).contains("2e12"))
  }

  test("spearman: +1e6 on perfect monotone, -1e6 on perfect inverse, " +
    "exact micro on a hand case") {
    val up = Experiment.spearman(
        Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y"), "x", "y")
      .collect().head
    assert(up.getLong(0) == 3L && up.getLong(1) == 0L &&
      up.getLong(2) == 1000000L)
    val down = Experiment.spearman(
        Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y"), "x", "y")
      .collect().head
    // ranks x 1,2,3 vs y 3,2,1: d = ±2, 0 -> Σd² = 8, ×4-scaled 32;
    // ρ = 1 − 6·8/(3·8) = −1
    assert(down.getLong(1) == 32L && down.getLong(2) == -1000000L)
    // one swap among 4: ranks x 1,2,3,4 vs y 2,1,3,4 -> Σd² = 2,
    // ρ = 1 − 12/60 = 0.8
    val swap = Experiment.spearman(
        Seq((1L, 20L), (2L, 10L), (3L, 30L), (4L, 40L)).toDF("x", "y"),
        "x", "y")
      .collect().head
    assert(swap.getLong(2) == 800000L, s"rho ${swap.getLong(2)} != 0.8e6")
  }

  test("spearman: ties take exact x2 midranks (co-tied pairs stay " +
    "rho = +1e6); n < 2 yields NULL, never NaN") {
    // x's two 1s midrank 1.5 (r2 = 3), its 2 ranks 3 (r2 = 6); y has
    // the same tie structure at the same rows -> every d = 0
    val tied = Experiment.spearman(
        Seq((1L, 5L), (1L, 5L), (2L, 9L)).toDF("x", "y"), "x", "y")
      .collect().head
    assert(tied.getLong(1) == 0L && tied.getLong(2) == 1000000L)
    val solo = Experiment.spearman(
        Seq((7L, 7L)).toDF("x", "y"), "x", "y")
      .collect().head
    assert(solo.getLong(0) == 1L && solo.isNullAt(2))
  }

  test("kruskalWallis: the textbook {1,2} vs {3,4} case gives H = 2.4 " +
    "exactly; three groups reproduce the rank-sum identity") {
    val two = Experiment.kruskalWallis(
        Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v"),
        "g", "v")
      .collect().head
    // ranks 1..4, S_a = 3, S_b = 7: H = 12/20·(2·1² + 2·1²) = 2.4;
    // no ties so the corrected H is identical
    assert(two.getLong(0) == 4L && two.getLong(1) == 2L &&
      two.getLong(2) == 0L)
    assert(two.getLong(3) == 2400000L, s"H ${two.getLong(3)} != 2.4e6")
    assert(two.getLong(4) == 2400000L)
    // three groups with a cross-group tie: hand-computed midranks
    // a: {1, 2} ranks 1, 2.5(tie) -> S_a = 3.5; b: {2} rank 2.5 ->
    // S_b = 2.5; c: {5} rank 4 -> S_c = 4; N = 4,
    // H = 12/20·(3.5²/2 + 2.5² + 4²) − 15 = 0.6·28.375 − 15 = 2.025;
    // tie term 2³−2 = 6, C = 1 − 6/60 = 0.9, H' = 2.25
    val three = Experiment.kruskalWallis(
        Seq(("a", 1L), ("a", 2L), ("b", 2L), ("c", 5L)).toDF("g", "v"),
        "g", "v")
      .collect().head
    assert(three.getLong(2) == 6L)
    assert(three.getLong(3) == 2025000L,
      s"H ${three.getLong(3)} != 2.025e6")
    assert(three.getLong(4) == 2250000L,
      s"H' ${three.getLong(4)} != 2.25e6")
  }

  test("kruskalWallis: an all-tied column degenerates to H = 0 with a " +
    "NULL corrected H (zero tie-correction denominator), never NaN") {
    val got = Experiment.kruskalWallis(
        Seq(("a", 7L), ("a", 7L), ("b", 7L)).toDF("g", "v"), "g", "v")
      .collect().head
    assert(got.getLong(3) == 0L && got.isNullAt(4))
  }

  test("wilcoxonSignedRank: zero diffs drop, hand z on distinct and " +
    "tied |d|, all-zero degenerates to NULL") {
    // d = +1, +2, +3, -4 (and one zero pair that must drop): |d| ranks
    // 1..4 (r2 2,4,6,8), W2+ = 12, E = 10, Var = 30,
    // z = 2/sqrt(30) = 0.36514837 -> 365148 micro
    val a = Experiment.wilcoxonSignedRank(
        Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 0L), (5L, 5L))
          .toDF("x", "y"), "x", "y")
      .collect().head
    assert(a.getLong(0) == 4L && a.getLong(1) == 12L &&
      a.getLong(2) == 0L)
    assert(a.getLong(3) == 365148L, s"z ${a.getLong(3)} != 365148")
    // tied |d|: d = +1, -1, +2 — the two 1s midrank 1.5 (r2 = 3),
    // W2+ = 3 + 6 = 9, tie term 6, Var = 14 - 0.5 = 13.5,
    // z = 3/sqrt(13.5) = 0.81649658 -> 816497 micro (half-up)
    val b = Experiment.wilcoxonSignedRank(
        Seq((0L, 1L), (1L, 0L), (0L, 2L)).toDF("x", "y"), "x", "y")
      .collect().head
    assert(b.getLong(1) == 9L && b.getLong(2) == 6L)
    assert(b.getLong(3) == 816497L, s"z ${b.getLong(3)} != 816497")
    val none = Experiment.wilcoxonSignedRank(
        Seq((1L, 1L), (2L, 2L)).toDF("x", "y"), "x", "y")
      .collect().head
    assert(none.getLong(0) == 0L && none.isNullAt(3))
  }

  test("quantileSketchSignedBy: a single-group relation is " +
    "bucket-identical to quantileSketchSigned; groups don't bleed") {
    val a = Seq(-500L, -1L, 0L, 7L, 4096L).map(("a", _))
    val b = Seq(-4096L, 3L).map(("b", _))
    val df = (a ++ b).toDF("g", "v")
    val grouped = Sketches.quantileSketchSignedBy(df, "g", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val single = Sketches.quantileSketchSigned(
        df.filter(col("g") === "a").select("v"), "v")
      .collect().map(r => ("a", r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(grouped.filter(_._1 == "a").toSet == single.toSet)
    // b's buckets contain only b's values
    grouped.filter(_._1 == "b").foreach { case (_, lo, hi, _) =>
      assert(b.map(_._2).exists(v => v >= lo && v <= hi))
    }
  }

  test("ksTwoSample: exact integer D — hand overlap case, identical " +
    "-> 0, disjoint -> 1e6 ppm, empty side -> NULL") {
    import spark.implicits._
    // ref {1,2,3} vs cur {2,3,4}: ECDF gap 1/3 everywhere except the
    // top — d_num = 3 (of 9), d_ppm = 333333
    val a = Profile.ksTwoSample(
        Seq(1L, 2L, 3L).toDF("v"), Seq(2L, 3L, 4L).toDF("v"), "v")
      .collect().head
    assert(a.getLong(0) == 3L && a.getLong(1) == 3L &&
      a.getLong(2) == 3L && a.getLong(3) == 333333L)
    val same = Profile.ksTwoSample(
        Seq(5L, 5L, 9L).toDF("v"), Seq(5L, 5L, 9L).toDF("v"), "v")
      .collect().head
    assert(same.getLong(2) == 0L && same.getLong(3) == 0L)
    val disjoint = Profile.ksTwoSample(
        Seq(1L, 2L).toDF("v"), Seq(10L, 11L).toDF("v"), "v")
      .collect().head
    assert(disjoint.getLong(3) == 1000000L)
    val empty = Profile.ksTwoSample(
        Seq(1L, 2L).toDF("v"),
        Seq.empty[Long].toDF("v"), "v")
      .collect().head
    assert(empty.getLong(1) == 0L && empty.isNullAt(3))
  }

  test("funnelStageDeltas: strict-after chain anchors on FIRST " +
    "qualifying steps; incomplete chains emit only completed stages") {
    val M = 1000000L
    // u1 full chain 3 s + 5 s; u2 click at t_view rejected, later click
    // counts; u3 purchase before its click never counts; u4 view-only
    val rows = Seq(
      (1L, 10 * M, "view"), (1L, 13 * M, "click"),
      (1L, 18 * M, "purchase"),
      (2L, 10 * M, "view"), (2L, 10 * M, "click"), (2L, 12 * M, "click"),
      (3L, 10 * M, "view"), (3L, 11 * M, "purchase"),
      (3L, 12 * M, "click"),
      (4L, 10 * M, "view"))
    val got = graft.ext.Attribution.funnelStageDeltas(
        rows.toDF("user_id", "tsu", "event_type")
          .select(col("user_id"), (col("tsu") * 1000L).as("ts"),
            col("event_type")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == Seq(
      (1L, "click->purchase", 5L), (1L, "view->click", 3L),
      (2L, "view->click", 2L), (3L, "view->click", 2L)),
      s"got $got")
  }
}
