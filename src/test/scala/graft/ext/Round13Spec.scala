package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-13 fixes and operators: the grouped exact KS drift
 * ([[Profile.ksTwoSampleBy]] — dq35), the empty-input NULL rows the
 * r12 advice flagged (ksTwoSample / kruskalWallis crashed with the
 * WRONG bound message on sum-over-zero-rows NULLs), the
 * approximation-regime flags on the rank tests (a 3-row audit slice
 * must not silently read as significant), the wilcoxon value-magnitude
 * gate, and the theilSen abs(Long.MinValue) gate hole. The
 * funnel-stage helper unification (s2 ≡ funnelStageDeltas source) pins
 * here too. */
class Round13Spec extends SparkTestBase {
  import spark.implicits._

  private def loudMsg(e: Throwable): String = {
    def walk(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ walk(t.getCause)
    walk(e).mkString(" | ")
  }

  test("ksTwoSampleBy: per-group exact D — hand overlap / identical / " +
    "one-side-only groups in ONE relation") {
    val ref = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 5L), ("b", 5L), ("b", 9L), ("c", 1L), ("c", 2L))
      .toDF("g", "v")
    val cur = Seq(("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 5L), ("b", 5L), ("b", 9L)).toDF("g", "v")
    val got = Profile.ksTwoSampleBy(ref, cur, "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    // a: ref {1,2,3} vs cur {2,3,4} — gap 1/3, d_num 3 of 9
    assert(got("a") == ((3L, 3L, 3L, 333333L)), s"a: ${got("a")}")
    // b: identical samples — zero distance
    assert(got("b") == ((3L, 3L, 0L, 0L)), s"b: ${got("b")}")
    // c: present only in ref — NULL d_ppm, zero cross-product numerator
    assert(got("c") == ((2L, 0L, 0L, -1L)), s"c: ${got("c")}")
  }

  test("ksTwoSampleBy: a single-group relation matches the global " +
    "ksTwoSample row exactly") {
    val ref = Seq(1L, 2L, 2L, 7L, 9L).toDF("v")
    val cur = Seq(2L, 3L, 9L, 9L).toDF("v")
    val g = Profile.ksTwoSample(ref, cur, "v").collect().head
    val b = Profile.ksTwoSampleBy(
        ref.withColumn("g", lit("only")),
        cur.withColumn("g", lit("only")), "g", "v")
      .collect().head
    assert(b.getLong(1) == g.getLong(0) && b.getLong(2) == g.getLong(1) &&
      b.getLong(3) == g.getLong(2) && b.getLong(4) == g.getLong(3))
  }

  test("ksTwoSample: BOTH sides empty yields the documented all-NULL " +
    "row, not a misleading 2e6-bound crash (r12 advice)") {
    val empty = Seq.empty[Long].toDF("v")
    val got = Profile.ksTwoSample(empty, empty, "v").collect().head
    assert(got.isNullAt(0) && got.isNullAt(1) && got.isNullAt(2) &&
      got.isNullAt(3))
  }

  test("kruskalWallis: EMPTY (all-NULL) input yields the documented " +
    "NULL-valued row (n = 0), not a misleading 1e6-bound crash " +
    "(r12 advice)") {
    val got = Experiment.kruskalWallis(
        Seq.empty[(String, Long)].toDF("g", "v"), "g", "v")
      .collect().head
    assert(got.getLong(0) == 0L && got.getLong(1) == 0L &&
      got.getLong(2) == 0L && got.isNullAt(3) && got.isNullAt(4) &&
      got.getLong(5) == 0L)
  }

  test("kruskalWallis: approx_ok flags the χ² regime — 1 iff every " +
    "group has ≥ 5 points and k ≥ 2; H itself stays exact either way") {
    def kw(rows: Seq[(String, Long)]) =
      Experiment.kruskalWallis(rows.toDF("g", "v"), "g", "v")
        .collect().head
    val small = kw(Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)))
    assert(small.getLong(3) == 2400000L && small.getLong(5) == 0L,
      "2-per-group textbook case keeps exact H but flags the regime")
    val ok = kw((1 to 5).map(i => ("a", i.toLong)) ++
      (6 to 10).map(i => ("b", i.toLong)))
    assert(ok.getLong(5) == 1L, "5 per group is inside the regime")
    val edge = kw((1 to 4).map(i => ("a", i.toLong)) ++
      (5 to 10).map(i => ("b", i.toLong)))
    assert(edge.getLong(5) == 0L, "one group of 4 flags the regime")
    val oneGroup = kw((1 to 9).map(i => ("a", i.toLong)))
    assert(oneGroup.getLong(5) == 0L, "k = 1 can never be ok")
  }

  test("wilcoxonSignedRank: approx_ok flags the normal regime — 1 iff " +
    "n_nonzero ≥ 10; z itself stays exact either way") {
    def wx(n: Int) = Experiment.wilcoxonSignedRank(
        (1 to n).map(i => (0L, i.toLong)).toDF("x", "y"), "x", "y")
      .collect().head
    val nine = wx(9)
    assert(nine.getLong(0) == 9L && nine.getLong(4) == 0L)
    val ten = wx(10)
    assert(ten.getLong(0) == 10L && ten.getLong(4) == 1L)
    assert(!ten.isNullAt(3), "z still reported inside the regime")
  }

  test("wilcoxonSignedRank: value magnitudes past 2^62 − 1 refuse " +
    "loudly (y − x would wrap and flip the sign), incl. Long.MinValue; " +
    "the rim itself stays exact") {
    Seq(Long.MinValue, -(1L << 62), 1L << 62, Long.MaxValue).foreach { p =>
      val e = intercept[Exception] {
        Experiment.wilcoxonSignedRank(
            Seq((p, 0L), (1L, 2L)).toDF("x", "y"), "x", "y")
          .collect()
      }
      assert(loudMsg(e).contains("2^62"),
        s"poison $p must hit the documented magnitude message")
      val e2 = intercept[Exception] {
        Experiment.wilcoxonSignedRank(
            Seq((0L, p), (1L, 2L)).toDF("x", "y"), "x", "y")
          .collect()
      }
      assert(loudMsg(e2).contains("2^62"), s"poison $p on y must refuse")
    }
    // rim: d = -(2^63 - 2) is representable — one pair, W2+ = 0, z = -1
    val top = (1L << 62) - 1L
    val rim = Experiment.wilcoxonSignedRank(
        Seq((top, -top)).toDF("x", "y"), "x", "y")
      .collect().head
    assert(rim.getLong(0) == 1L && rim.getLong(1) == 0L &&
      rim.getLong(3) == -1000000L)
  }

  test("theilSen: Long.MinValue (the abs-overflow hole, r12 advice) " +
    "and every other out-of-envelope magnitude refuse loudly") {
    Seq(Long.MinValue, -2000000000001L, 2000000000001L, Long.MaxValue)
      .foreach { p =>
        val e = intercept[Exception] {
          TimeSeries.theilSen(
              Seq(("k", 1L, p), ("k", 2L, 0L)).toDF("k", "t", "v"),
              "k", "t", "v")
            .collect()
        }
        assert(loudMsg(e).contains("2e12"),
          s"poison $p must hit the documented 2e12 message")
      }
    // the envelope edge itself is in-domain
    val edge = TimeSeries.theilSen(
        Seq(("k", 1L, -2000000000000L), ("k", 2L, 2000000000000L))
          .toDF("k", "t", "v"), "k", "t", "v")
      .collect().head
    assert(edge.getLong(2) == 1L)
  }

  test("spearmanBy: sign-opposed segments a pooled rho averages away " +
    "read ±1e6 per group; a single-group relation matches the global " +
    "spearman row exactly") {
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 1L, 30L), ("b", 2L, 20L), ("b", 3L, 10L))
    val got = Experiment.spearmanBy(rows.toDF("g", "x", "y"),
        "g", "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == Map("a" -> 1000000L, "b" -> -1000000L), s"got $got")
    val pairs = Seq((1L, 5L), (2L, 9L), (2L, 7L), (4L, 1L))
    val g = Experiment.spearman(pairs.toDF("x", "y"), "x", "y")
      .collect().head
    val b = Experiment.spearmanBy(
        pairs.map(p => ("only", p._1, p._2)).toDF("g", "x", "y"),
        "g", "x", "y")
      .collect().head
    assert(b.getLong(1) == g.getLong(0) && b.getLong(2) == g.getLong(1) &&
      b.getLong(3) == g.getLong(2))
  }

  test("ksFromBuckets is the certified lower bound of the value-grain " +
    "KS: bucketing can hide gap inside a bucket, never invent one") {
    import spark.implicits._
    // values 0-19 vs 10-29: value-grain D = 1/2; at width 10 the two
    // histograms are (b0: 10, b1: 10) vs (b1: 10, b2: 10) -> bucket D
    // still 1/2; at width 100 everything shares bucket 0 -> D = 0
    val ref = (0L until 20L).toDF("v")
    val cur = (10L until 30L).toDF("v")
    def ks(width: Long): Long = graft.ext.Profile.ksFromBuckets(
        graft.ext.Profile.bucketCounts(ref, "v", width)
          .toDF("bucket", "n_ref"),
        graft.ext.Profile.bucketCounts(cur, "v", width)
          .toDF("bucket", "n_cur"))
      .collect().head.getLong(3)
    val exact = graft.ext.Profile.ksTwoSample(ref, cur, "v")
      .collect().head.getLong(3)
    assert(exact == 500000L)
    assert(ks(10L) == 500000L && ks(100L) == 0L)
    assert(ks(10L) <= exact && ks(100L) <= exact)
  }

  test("kendallTau: hand concordance cases — clean 1/3 mix, tau-b tie " +
    "normalization, perfect/inverse, degenerate constant column") {
    def kt(rows: Seq[(Long, Long, Long)]) =
      Experiment.kendallTau(rows.toDF("t", "x", "y"), "t", "x", "y")
        .collect().head
    // x=(1,2,3), y=(1,3,2): pairs C,C,D -> tau = (2-1)/3
    val a = kt(Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, 3L, 2L)))
    assert(a.getLong(1) == 2L && a.getLong(2) == 1L &&
      a.getLong(3) == 0L && a.getLong(4) == 0L)
    assert(a.getLong(5) == 333333L, s"tau ${a.getLong(5)}")
    // ties on both sides: x=(1,1,2), y=(1,2,2) -> C=1, D=0,
    // tie pairs 1 each, tau-b = 1/sqrt((3-1)(3-1)) = 0.5
    val b = kt(Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 2L, 2L)))
    assert(b.getLong(1) == 1L && b.getLong(2) == 0L &&
      b.getLong(3) == 1L && b.getLong(4) == 1L)
    assert(b.getLong(5) == 500000L, s"tau-b ${b.getLong(5)}")
    // perfect / inverse monotone
    assert(kt(Seq((1L, 1L, 10L), (2L, 2L, 20L), (3L, 3L, 30L)))
      .getLong(5) == 1000000L)
    assert(kt(Seq((1L, 1L, 30L), (2L, 2L, 20L), (3L, 3L, 10L)))
      .getLong(5) == -1000000L)
    // constant x: every pair ties in x -> denominator 0 -> NULL
    val c = kt(Seq((1L, 7L, 1L), (2L, 7L, 2L)))
    assert(c.getLong(3) == 1L && c.isNullAt(5))
    // extreme magnitudes are IN-domain (comparisons only, no envelope)
    val d = kt(Seq((1L, Long.MinValue, Long.MinValue),
      (2L, Long.MaxValue, Long.MaxValue)))
    assert(d.getLong(5) == 1000000L)
  }

  test("kendallTau: the (ord)-grain bound refuses loudly on duplicate " +
    "ords and on > maxPoints series") {
    val dup = Seq((1L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 3L))
    val e = intercept[Exception] {
      Experiment.kendallTau(dup.toDF("t", "x", "y"), "t", "x", "y")
        .collect()
    }
    assert(loudMsg(e).contains("(ord) grain"))
    val big = (1L to 6L).map(i => (i, i, i))
    val e2 = intercept[Exception] {
      Experiment.kendallTau(big.toDF("t", "x", "y"), "t", "x", "y",
          maxPoints = 5)
        .collect()
    }
    assert(loudMsg(e2).contains("pair expansion"))
  }

  test("friedman: textbook no-tie case Q = 6 exactly; within-block tie " +
    "takes midranks; all-tied blocks degenerate to NULL, never NaN") {
    def fr(rows: Seq[(String, String, Long)]) =
      Experiment.friedman(rows.toDF("b", "j", "v"), "b", "j", "v")
        .collect().head
    // 3 blocks, treatments always ranked A<B<C: R = (3,6,9),
    // Q = 12/(3·3·4)·126 − 36 = 6; exact integer form num/den = 144/24
    val a = fr(for {
      b <- Seq("b1", "b2", "b3"); (j, v) <- Seq(("A", 1L), ("B", 2L),
        ("C", 3L))
    } yield (b, j, v))
    assert(a.getLong(0) == 3L && a.getLong(1) == 3L)
    assert(a.getLong(2) == 144L && a.getLong(3) == 24L,
      s"num/den ${a.getLong(2)}/${a.getLong(3)}")
    assert(a.getLong(4) == 6000000L)
    assert(a.getLong(5) == 0L, "3 blocks is below the χ² regime floor")
    // one block ties A and B at 1: midranks 1.5, 1.5, 3 (x2: 3, 3, 6)
    val t = fr(Seq(("b1", "A", 1L), ("b1", "B", 1L), ("b1", "C", 2L),
      ("b2", "A", 1L), ("b2", "B", 2L), ("b2", "C", 3L)))
    // R2: A=3+2=5, B=3+4=7, C=6+6=12 -> sum sq = 25+49+144 = 218
    // num = 2·(218 − 4·3·16) = 2·26 = 52
    // S2 = 9+9+36 + 4+16+36 = 110; den = 110 − 2·3·16 = 14
    assert(t.getLong(2) == 52L && t.getLong(3) == 14L)
    assert(t.getLong(4) == math.floor(52.0 / 14.0 * 1e6 + 0.5).toLong)
    // every block internally constant -> zero rank variance -> NULL
    val z = fr(Seq(("b1", "A", 5L), ("b1", "B", 5L),
      ("b2", "A", 9L), ("b2", "B", 9L)))
    assert(z.getLong(3) == 0L && z.isNullAt(4))
  }

  test("friedman: the complete-block contract refuses loudly — missing " +
    "cell, duplicate cell") {
    val missing = Seq(("b1", "A", 1L), ("b1", "B", 2L), ("b2", "A", 1L))
    val e = intercept[Exception] {
      Experiment.friedman(missing.toDF("b", "j", "v"), "b", "j", "v")
        .collect()
    }
    assert(loudMsg(e).contains("COMPLETE"))
    // dup cell + missing cell keeps k·n == rows: the CELL gate catches it
    val swapped = Seq(("b1", "A", 1L), ("b1", "A", 2L),
      ("b2", "A", 1L), ("b2", "B", 2L))
    val e2 = intercept[Exception] {
      Experiment.friedman(swapped.toDF("b", "j", "v"), "b", "j", "v")
        .collect()
    }
    assert(loudMsg(e2).contains("more than one"))
  }

  test("funnelStageTimes is THE shared chain: s13's deltas relation " +
    "derives row-for-row from the same stage-time rows s2 reads") {
    val M = 1000000L
    val rows = Seq(
      (1L, 10 * M, "view"), (1L, 13 * M, "click"),
      (1L, 18 * M, "purchase"),
      (2L, 10 * M, "view"), (2L, 10 * M, "click"), (2L, 12 * M, "click"),
      (4L, 10 * M, "view"))
    val ev = rows.toDF("user_id", "tsu", "event_type")
      .select(col("user_id"), (col("tsu") * 1000L).as("ts"),
        col("event_type"))
    val st = Attribution.funnelStageTimes(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(st.keySet == Set(1L, 2L, 4L))
    assert(st(1L).getLong(1) == 10 * M && st(1L).getLong(2) == 13 * M &&
      st(1L).getLong(3) == 18 * M)
    assert(st(2L).getLong(2) == 12 * M && st(2L).isNullAt(3))
    assert(st(4L).isNullAt(2) && st(4L).isNullAt(3))
    val deltas = Attribution.funnelStageDeltas(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(deltas == Seq((1L, "click->purchase", 5L),
      (1L, "view->click", 3L), (2L, "view->click", 2L)))
  }
}
