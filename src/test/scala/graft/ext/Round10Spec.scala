package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand-derived cases for the round-10 concentration / association /
 * rank-test family: Lorenz curve (tied-group interpolation), Mann-Whitney
 * (doubled ranks, tie degeneracy), chi-squared (zero-cell contribution),
 * HHI, JSD (identity and symmetry), and the Markov stationary
 * distribution (exact-ppm conservation). */
class Round10Spec extends SparkTestBase {
  import spark.implicits._

  test("lorenzCurve: exact shares, tied-group interpolation") {
    // per-key values 1, 1, 2, 6 (total 10); quartile cuts at ranks
    // 1, 2, 3, 4 -> bottom values 1, 2, 4, 10. Rank 1 falls INSIDE the
    // tied {1, 1} group: the interpolation takes one copy of the group
    // value, exactly.
    val df = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 6L)).toDF("k", "v")
    val m = Profile.lorenzCurve(df, "k", "v", k = 4)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(m(1) == ((1L, 1L, 100000L)))
    assert(m(2) == ((2L, 2L, 200000L)))
    assert(m(3) == ((3L, 4L, 400000L)))
    assert(m(4) == ((4L, 10L, 1000000L)))
  }

  test("lorenzCurve: loud bound on negative values") {
    val df = Seq((1L, -5L), (2L, 3L)).toDF("k", "v")
    val e = intercept[Exception] {
      Profile.lorenzCurve(df, "k", "v", k = 2).collect()
    }
    assert(e.getMessage.contains("nonnegative") ||
      Option(e.getCause).exists(_.getMessage.contains("nonnegative")))
  }

  test("mannWhitney: hand z on distinct values; all-tied is NULL") {
    // users 0,2 -> arm0 with totals 100, 200 centi; users 1,3 -> arm1
    // with 300, 400: ranks 1..4, R1 = 7 (doubled 14), U1d = 0,
    // sigma² = 5/3, z = -4 / (2·sqrt(5/3)) = -1.549193...
    def ev(vals: (Long, Double)*) = vals.zipWithIndex.map {
      case ((uid, v), i) => (i.toLong, 1000000L + i, uid, "purchase", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Experiment.mannWhitney(
      ev((0L, 1.0), (2L, 2.0), (1L, 3.0), (3L, 4.0))).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 0L, "U1 doubled")
    assert(r.getLong(3) == 0L, "no ties")
    assert(r.getLong(4) == -1549193L)
    // all four users tied -> sigma = 0 -> NULL z, tie term 4³-4 = 60
    val t = Experiment.mannWhitney(
      ev((0L, 5.0), (2L, 5.0), (1L, 5.0), (3L, 5.0))).collect().head
    assert(t.getLong(3) == 60L)
    assert(t.get(4) == null)
  }

  test("chi2Independence: zero-observed cells contribute their E") {
    // 10×(a,x) + 10×(b,y): every E = 5, the two ZERO cells contribute
    // (0-5)²/5 = 5 each -> chi2 = 20 exactly, V = 1
    val df = ((1 to 10).map(_ => ("a", "x")) ++
      (1 to 10).map(_ => ("b", "y"))).toDF("u", "w")
    val r = Profile.chi2Independence(df, "u", "w").collect().head
    assert(r.getLong(0) == 20L)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 4L, "the full grid, zero cells included")
    assert(r.getLong(4) == 1L, "dof")
    assert(r.getLong(5) == 20000000L, "chi2 micro")
    assert(r.getLong(6) == 1000000L, "Cramér's V micro")
    // independent columns -> chi2 0
    val ind = ((1 to 5).flatMap(_ =>
      Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))))
      .toDF("u", "w")
    assert(Profile.chi2Independence(ind, "u", "w")
      .collect().head.getLong(5) == 0L)
  }

  test("hhi: exact ppm concentration and loud bound") {
    val df = ((1 to 8).map(_ => ("en", "s1")) ++
      (1 to 2).map(_ => ("en", "s2"))).toDF("lang", "source")
    val r = Profile.hhi(df, "lang", "source").collect().head
    assert(r.getLong(1) == 10L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 800000L, "top share")
    assert(r.getLong(4) == 680000L, "(64+4)·1e6 div 100")
    val e = intercept[Exception] {
      Profile.hhi(df, "lang", "source", maxN = 5L).collect()
    }
    assert(e.getMessage.contains("group row count") ||
      Option(e.getCause).exists(_.getMessage.contains("group row count")))
  }

  test("jsd: zero on identical histograms, symmetric, ≤ ln 2") {
    val h1 = Seq((0L, 5L), (1L, 5L)).toDF("bucket", "n_ref")
    val h1c = h1.toDF("bucket", "n_cur")
    assert(Profile.jsdFromBuckets(h1, h1c)
      .agg(sum("jsd_micro")).head.getLong(0) == 0L)
    // disjoint masses: positive, bounded by ln 2, and SYMMETRIC
    val a = Seq((0L, 100L)).toDF("bucket", "n_ref")
    val b = Seq((1L, 100L)).toDF("bucket", "n_cur")
    val ab = Profile.jsdFromBuckets(a, b)
      .agg(sum("jsd_micro")).head.getLong(0)
    val ba = Profile.jsdFromBuckets(
        Seq((1L, 100L)).toDF("bucket", "n_ref"),
        Seq((0L, 100L)).toDF("bucket", "n_cur"))
      .agg(sum("jsd_micro")).head.getLong(0)
    assert(ab > 0L && ab <= 693148L)
    assert(ab == ba, "JSD is symmetric")
  }

  test("orderStatQuantilesTwoLevel: bit-identical to the one-level " +
    "selection, and succeeds where the global grain bound refuses") {
    // integer-valued doubles 0..999 -> vq 0, 100, ..., 99900 (1000
    // distinct). shift 16 -> 65536-wide buckets -> 2 buckets.
    val df = (0 until 1000).map(i => i.toDouble).toDF("v")
    val one = Profile.orderStatQuantiles(df, "v", k = 7)
      .orderBy("q").collect().map(r => (r.getInt(0), r.getLong(1),
        r.getLong(2))).toSeq
    val two = Profile.orderStatQuantilesTwoLevel(df, "v", k = 7,
        bucketShift = 16)
      .orderBy("q").collect().map(r => (r.getInt(0), r.getLong(1),
        r.getLong(2))).toSeq
    assert(one == two, s"one-level $one != two-level $two")
    // the caveat lift: global distinct (1000) exceeds maxGrain 700, so
    // the one-level form MUST refuse — and the two-level form (2
    // buckets, <= 656 distinct per bucket) still selects exactly
    intercept[Exception] {
      Profile.orderStatQuantiles(df, "v", k = 7, maxDistinct = 700L)
        .collect()
    }
    val lifted = Profile.orderStatQuantilesTwoLevel(df, "v", k = 7,
        bucketShift = 16, maxGrain = 700L)
      .orderBy("q").collect().map(r => (r.getInt(0), r.getLong(1),
        r.getLong(2))).toSeq
    assert(lifted == one, "the lifted bound changes nothing but the plan")
  }

  test("orderStatQuantilesTwoLevel: SIGNED values select exactly (the " +
    "r11 shift-to-nonnegative lift of the r10 nonnegativity caveat)") {
    // values -999..1000 (mixed sign): the kernel shifts by the global
    // min before range-bucketing and shifts the selected statistic
    // back — results must equal the one-level selection, which never
    // had the sign restriction
    val df = (-999 to 1000).map(i => i.toDouble).toDF("v")
    val one = Profile.orderStatQuantiles(df, "v", k = 5)
      .orderBy("q").collect().map(r => (r.getInt(0), r.getLong(1),
        r.getLong(2))).toSeq
    val two = Profile.orderStatQuantilesTwoLevel(df, "v", k = 5,
        bucketShift = 14)
      .orderBy("q").collect().map(r => (r.getInt(0), r.getLong(1),
        r.getLong(2))).toSeq
    assert(one == two, s"signed one-level $one != two-level $two")
    // the selected order statistics include genuinely negative values
    assert(two.head._3 < 0L)
  }

  test("rocAuc: perfect separation, half-credit ties, degenerate NULL") {
    // positives score 3,4 above negatives 1,2 -> AUC exactly 1
    val perfect = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("s", "y")
    val p = Experiment.rocAuc(perfect, "s", "y").collect().head
    assert(p.getLong(0) == 2L && p.getLong(1) == 2L)
    assert(p.getLong(2) == 1000000L)
    // one tied pair -> the classic 0.5 credit, exactly 500000 ppm
    val tied = Seq((2L, 0L), (2L, 1L)).toDF("s", "y")
    assert(Experiment.rocAuc(tied, "s", "y")
      .collect().head.getLong(2) == 500000L)
    // anti-predictive score -> 0
    val anti = Seq((4L, 0L), (3L, 0L), (2L, 1L), (1L, 1L)).toDF("s", "y")
    assert(Experiment.rocAuc(anti, "s", "y")
      .collect().head.getLong(2) == 0L)
    // one-class label -> NULL, never NaN
    val onecls = Seq((1L, 1L), (2L, 1L)).toDF("s", "y")
    assert(Experiment.rocAuc(onecls, "s", "y")
      .collect().head.get(2) == null)
  }

  test("assortativity: star graph is exactly -1, regular graph NULL") {
    // K1,3: hub deg 3, leaves deg 1 -> m=3, s1=12, s2=30, sp=9 -> r=-1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val r = Graph.assortativity(star).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 12L)
    assert(r.getLong(2) == 30L && r.getLong(3) == 9L)
    assert(r.getLong(4) == -1000000L)
    // triangle: every degree 2 -> zero degree variance -> NULL, not NaN
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    assert(Graph.assortativity(tri).collect().head.get(4) == null)
  }

  test("percentileRanks: exact cume_dist ppm with shared tie ranks") {
    // key a: values 1,1,2,3 -> pct(1)=2/4, pct(2)=3/4, pct(3)=4/4
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 9L)).toDF("k", "v")
    val m = Profile.percentileRanks(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(4)))).toMap
    assert(m(("a", 1L)) == ((2L, 500000L)))
    assert(m(("a", 2L)) == ((1L, 750000L)))
    assert(m(("a", 3L)) == ((1L, 1000000L)))
    assert(m(("b", 9L)) == ((1L, 1000000L)))
  }

  test("keyedTrendFull: exact line recovers slope/intercept/R²=1; " +
    "constant series R² NULL") {
    // y = 3t + 7 exactly
    val s = (0L to 9L).map(t0 => ("up", t0, 3 * t0 + 7)).toDF("k", "ord", "v")
    val r = TimeSeries.keyedTrendFull(s, "k", "ord", "v").collect().head
    assert(r.getLong(1) == 10L)
    assert(r.getLong(2) == 3000L, "slope milli")
    assert(r.getLong(3) == 7000000L, "intercept micro")
    assert(r.getLong(4) == 1000000L, "R² micro")
    // constant series: slope 0, intercept = the constant, R² NULL (0/0)
    val flat = (0L to 5L).map(t0 => ("f", t0, 4L)).toDF("k", "ord", "v")
    val fr = TimeSeries.keyedTrendFull(flat, "k", "ord", "v")
      .collect().head
    assert(fr.getLong(2) == 0L && fr.getLong(3) == 4000000L)
    assert(fr.get(4) == null)
  }

  test("stratumTopK: exactly k per stratum, deterministic, growth-stable") {
    val df = ((1 to 30).map(i => (i.toLong, "a")) ++
      (31 to 33).map(i => (i.toLong, "b"))).toDF("id", "s")
    val out = Sampling.stratumTopK(df, "id", "s", k = 5).collect()
      .map(r => r.getString(1) -> r.getLong(0))
    assert(out.count(_._1 == "a") == 5, "exactly k from the big stratum")
    assert(out.count(_._1 == "b") == 3, "under-k strata keep everything")
    // determinism + stability: adding a NEW stratum never perturbs picks
    val out2 = Sampling.stratumTopK(
      df.unionByName(Seq((99L, "c")).toDF("id", "s")), "id", "s", k = 5)
      .collect().map(r => r.getString(1) -> r.getLong(0))
    assert(out2.filter(_._1 != "c").sorted.sameElements(out.sorted))
  }

  test("logRank: hand O/E/V on a censored two-arm fixture") {
    // arm1: die at t=1 and t=2; arm0: die at t=2, censored at t=3.
    // t=1: nr=4, n1r=2, d=1, d1=1 -> E += 1·2/4 = 0.5, V += 0.25
    // t=2: nr=3, n1r=1, d=2, d1=1 -> E += 2/3,        V += 2/9
    // t=3: nr=1 -> both 0 (whole risk set leaves)
    val lt = Seq((1L, 1L, 1L), (2L, 1L, 1L), (2L, 1L, 0L), (3L, 0L, 0L))
      .toDF("t", "death", "arm")
    val r = Attribution.logRank(lt, "t", "death", "arm").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2L, "O1")
    assert(r.getLong(3) == 500000L + 666667L, "E1 micro (0.5 + 2/3)")
    assert(r.getLong(4) == 250000L + 222222L, "V micro (1/4 + 2/9)")
    val e1 = r.getLong(3).toDouble / 1e6
    val v = r.getLong(4).toDouble / 1e6
    val expChi = math.floor((2.0 - e1) * (2.0 - e1) / v * 1e6 + 0.5).toLong
    assert(r.getLong(5) == expChi)
    // identical curves (arms mirror each other) -> chi2 near zero
    val same = Seq((1L, 1L, 0L), (1L, 1L, 1L), (2L, 1L, 0L), (2L, 1L, 1L))
      .toDF("t", "death", "arm")
    val s0 = Attribution.logRank(same, "t", "death", "arm").collect().head
    assert(s0.getLong(2) == 2L && math.abs(s0.getLong(5)) < 5L,
      s"mirrored arms must read ~0: ${s0.getLong(5)}")
  }

  test("two-level quantile plan: the value-grain window is PARTITIONED " +
    "(the single-partition sweep stays at bucket grain)") {
    val d = (1L to 2000L).map(v => v.toDouble).toDF("v")
    val opt = Profile.orderStatQuantilesTwoLevel(d, "v", k = 4,
        bucketShift = 16)
      .queryExecution.optimizedPlan
    val wins = opt.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty, "expected windows in the plan")
    // exactly the shape the caveat-lift claims: the distinct-VALUE
    // cumulative (level 2) partitions by target cut, so the only
    // unpartitioned window left is the BUCKET-grain one the loud bound
    // covers
    assert(wins.exists(_.partitionSpec.nonEmpty),
      s"expected a partitioned level-2 window:\n$opt")
    assert(wins.count(_.partitionSpec.isEmpty) <= 1,
      s"more than one single-partition window:\n$opt")
  }

  test("survivalSummary: hand median + RMST on the KM step curve") {
    // lifetimes (1,d), (2,d), (2,d), (3,censored):
    // S(1)=0.75, S(2)=0.25, S(3)=0.25 -> median t=2 (first S<=0.5);
    // RMST = 1 (S=1 on [0,1)) + 0.75·1 + 0.25·1 = 2.0 exactly
    val lt = Seq((1L, 1L), (2L, 1L), (2L, 1L), (3L, 0L))
      .toDF("t", "death")
    val r = Attribution.survivalSummary(lt, "t", "death").collect().head
    assert(r.getLong(0) == 2L, "median")
    assert(r.getLong(1) == 2000000L, "RMST micro")
    assert(r.getLong(2) == 3L, "horizon")
    // a curve that never crosses 0.5: median NULL, RMST still defined
    val hardy = Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 0L))
      .toDF("t", "death") // one death among four -> S stays >= 0.66
    val h = Attribution.survivalSummary(hardy, "t", "death")
      .collect().head
    assert(h.get(0) == null, "median undefined when S never crosses 0.5")
    assert(h.getLong(1) > 0L)
  }

  test("markovStationary: exact-ppm conservation, absorbing state wins") {
    // a->b (2), b->a (1), b->c (1); c absorbing: mass drains to c
    val trans = Seq(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L))
      .toDF("e_from", "e_to", "n")
    val rows = Graph.markovStationary(trans, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.values.sum == 1000000L,
      s"mass conserves to exactly 1e6: $rows")
    assert(rows.contains("(lost)") && rows("(lost)") >= 0L)
    assert(rows("c") > rows("b") && rows("b") >= rows("a"),
      s"mass drains toward the absorbing state: $rows")
  }
}
