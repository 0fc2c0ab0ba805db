package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Experimentation analytics: variance-reduced A/B readouts over the
 * event stream. Reference scope: the dashboard layer's aggregate
 * analytics (`/root/reference/dashbord/dashbord.py`) reads counts and
 * distributions; an experimentation readout is the same scan shape with
 * a pre-period covariate folded in.
 */
object Experiment {

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013 —
   * "Improving the Sensitivity of Online Controlled Experiments by
   * Utilizing Pre-Experiment Data"): adjust each user's experiment-period
   * metric y by their PRE-period metric x,
   *
   *   θ        = cov(x, y) / var(x)          (pooled, as published)
   *   y_cuped  = y − θ·(x − mean(x))
   *
   * which removes the x-explained variance component (1 − ρ²) and leaves
   * every arm's MEAN unbiased (the θ·mean-centering cancels in
   * expectation). The experiment split point is self-calibrating — the
   * midpoint of the observed time range — so the operator has no
   * data-dependent constants to tune.
   *
   * Determinism: per-event values centi-quantize to BIGINT
   * (`floor(100·v + 0.5)`), so every per-user x/y and every pooled sum
   * (Σx, Σy, Σx², Σxy) is an exact integer. The per-user products x·x
   * and x·y are taken IN BIGINT — that is what makes the pooled moments
   * exact and the DuckDB replay bit-identical — which bounds the
   * per-user period totals at |x|,|y| ≤ 3 037 000 499 centi-units
   * (≈30.4M metric units per user per period, √Long.MaxValue). The
   * bound is ENFORCED with an `assert_true` on the user-grain relation:
   * a corpus that exceeds it fails loudly on both engines (DuckDB
   * raises on BIGINT overflow natively) instead of corrupting θ via
   * silent non-ANSI wraparound. θ and the arm means are then
   * fixed-shape double expressions over the exact integer sums
   * (n·Σxy − Σx·Σy over n·Σx² − Σx·Σx, with the int→double conversion
   * at the final ratio so both engines round identically).
   * Arms derive as `user_id % 2` — the deterministic hash-assignment
   * stand-in for a real arm column.
   *
   * Scale shape: one scan + crossJoin of the broadcast 1-row midpoint,
   * ONE user-grain conditional agg (pre/post in the same pass — no
   * second scan, no join of two period aggregates), one 1-row pooled
   * agg, one arm-grain agg. Everything after the user grain is
   * arm-cardinality-sized. Output: (arm, n_users, mean_y, mean_y_cuped,
   * theta) — mean_y in the value column's units, rounded to 6. */
  def cuped(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val vQ = floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
    // integer midpoint — a double (min+max)/2 would round off nanosecond
    // epochs (3.4e18 needs 62 mantissa bits)
    val mid = events.agg(
      expr(s"(min($tsCol) + max($tsCol)) div 2").as("t_mid"))
    // √Long.MaxValue: the largest |total| whose square still fits a
    // BIGINT. Enforced so the exact-integer-moment contract can never
    // silently wrap (see docstring).
    val maxAbs = 3037000499L
    val users = Dedup.materialize(
      events.crossJoin(broadcast(mid))
        .groupBy(col(userCol).as("user"))
        .agg(
          sum(when(col(tsCol) < col("t_mid"), vQ).otherwise(lit(0L)))
            .as("x"),
          sum(when(col(tsCol) >= col("t_mid"), vQ).otherwise(lit(0L)))
            .as("y"))
        .withColumn("_bound", assert_true(
          abs(col("x")) <= maxAbs && abs(col("y")) <= maxAbs,
          lit(s"cuped: per-user period total exceeds ±$maxAbs " +
            "centi-units; integer moments would overflow")))
        .where(col("_bound").isNull).drop("_bound"))
    val pooled = users.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    // θ and mean(x) as fixed-shape doubles over the exact pooled sums;
    // a zero variance (every user identical in the pre-period) degrades
    // to θ = 0, i.e. the unadjusted readout, rather than NaN.
    val theta = when(
      col("n").cast("double") * col("sxx") -
        col("sx").cast("double") * col("sx") === 0.0, lit(0.0))
      .otherwise(
        (col("n").cast("double") * col("sxy") -
          col("sx").cast("double") * col("sy")) /
        (col("n").cast("double") * col("sxx") -
          col("sx").cast("double") * col("sx")))
    users
      .groupBy(pmod(col("user"), lit(2L)).as("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum("x").as("asx"), sum("y").as("asy"))
      .crossJoin(broadcast(pooled.select(
        col("n"), col("sx"), theta.as("th"))))
      .select(col("arm"), col("n_users"),
        round(col("asy").cast("double") / col("n_users") / lit(100.0), 6)
          .as("mean_y"),
        round((col("asy").cast("double") / col("n_users") -
          col("th") * (col("asx").cast("double") / col("n_users") -
            col("sx").cast("double") / col("n"))) / lit(100.0), 6)
          .as("mean_y_cuped"),
        round(col("th"), 6).as("theta"))
  }

  /** Difference-in-differences readout: the pre/post × control/treat
   * double difference (m̄_y,1 − m̄_x,1) − (m̄_y,0 − m̄_x,0) — the
   * causal estimate when assignment isn't randomized but trends are
   * parallel (the natural-experiment workhorse; [[cuped]] assumes
   * randomization and uses the pre-period only to shrink variance —
   * DiD uses it to REMOVE the selection gap). Same machinery end to
   * end: per-user centi totals under the ±√Long.Max bound, the
   * self-calibrating integer midpoint split, arms by `user % 2`, ONE
   * conditional user-grain agg, exact BIGINT cell sums, fixed-shape
   * double means (the oracle replays the identical shape). Output
   * 1 row: (n0, n1, pre0, post0, pre1, post1 — round-6 value-unit
   * means — did_micro in value-unit micros). */
  def diffInDiff(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value"): DataFrame = {
    val vQ = floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
    val mid = events.agg(
      expr(s"(min($tsCol) + max($tsCol)) div 2").as("t_mid"))
    val maxAbs = 3037000499L
    val users = events.crossJoin(broadcast(mid))
      .groupBy(col(userCol).as("user"))
      .agg(
        sum(when(col(tsCol) < col("t_mid"), vQ).otherwise(lit(0L)))
          .as("x"),
        sum(when(col(tsCol) >= col("t_mid"), vQ).otherwise(lit(0L)))
          .as("y"))
      .withColumn("_b", assert_true(
        abs(col("x")) <= maxAbs && abs(col("y")) <= maxAbs,
        lit(s"diffInDiff: per-user period total exceeds ±$maxAbs " +
          "centi-units")))
      .where(col("_b").isNull).drop("_b")
    val cells = users.groupBy(pmod(col("user"), lit(2L)).as("arm"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"))
    val one = cells.agg(
      max(when(col("arm") === 0L, col("n"))).as("n0"),
      max(when(col("arm") === 0L, col("sx"))).as("sx0"),
      max(when(col("arm") === 0L, col("sy"))).as("sy0"),
      max(when(col("arm") === 1L, col("n"))).as("n1"),
      max(when(col("arm") === 1L, col("sx"))).as("sx1"),
      max(when(col("arm") === 1L, col("sy"))).as("sy1"))
    def m(s: String, n: String) =
      col(s).cast("double") / col(n).cast("double")
    val did = (m("sy1", "n1") - m("sx1", "n1")) -
      (m("sy0", "n0") - m("sx0", "n0"))
    val ok = col("n0") >= 1L && col("n1") >= 1L
    one.select(col("n0"), col("n1"),
      round(m("sx0", "n0") / lit(100.0), 6).as("pre0"),
      round(m("sy0", "n0") / lit(100.0), 6).as("post0"),
      round(m("sx1", "n1") / lit(100.0), 6).as("pre1"),
      round(m("sy1", "n1") / lit(100.0), 6).as("post1"),
      when(ok, floor(did * lit(1e4) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("did_micro"))
  }

  /** Split-conformal coverage audit (Vovk et al.; the
   * distribution-free prediction-interval recipe): the calibration
   * split's ⌈(n+1)·α/100⌉-th order statistic of |residual| is the
   * conformal radius q; on the DISJOINT test split, P(|resid| ≤ q) ≥
   * α% holds with no distributional assumption — so measured coverage
   * far from α% means the splits aren't exchangeable (drift, leakage,
   * or a broken predictor), which is exactly what this audits. The
   * selection is an EXACT order statistic at distinct-|residual| grain
   * through the shared TWO-LEVEL kernel
   * ([[Profile.twoLevelRankSelect]] — r10 verdict #2: the radius rank
   * ⌈(n+1)·α/100⌉ capped at n is exactly the kernel's
   * `least(n, (α·n + α + 99) div 100)` family, and the loud grain
   * bounds now sit at bucket + per-target-bucket grain instead of one
   * global single-partition window), never an interpolating percentile
   * two engines disagree on.
   *
   * `scored` carries an integer residual column and a boolean
   * calibration-split flag. One distinct-value hash-agg + the two-level
   * selection for q, one test-split agg for coverage. Output 1 row:
   * (n_cal, n_test, q_resid, n_covered, coverage_ppm). */
  def conformalCoverage(scored: DataFrame, residCol: String,
      calCol: String, alphaPct: Int = 90,
      maxDistinct: Long = 100000L): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 99,
      s"alphaPct must be in [1, 99], got $alphaPct")
    val absR = abs(col(residCol))
    val counts = scored.filter(col(calCol)).select(absR.as("vq"))
      .groupBy("vq").agg(count(lit(1)).as("c"))
    val q = graft.ext.Profile.twoLevelRankSelect(counts, Seq(alphaPct),
        addNum = alphaPct + 99L, divisor = 100L, bucketShift = 20,
        maxGrain = maxDistinct, opName = "conformalCoverage")
      .agg(min("vq").as("q_resid"), max("n").as("n_cal"))
    scored.filter(!col(calCol)).select(absR.as("r"))
      .crossJoin(broadcast(q))
      .agg(max("n_cal").as("n_cal"), count(lit(1)).as("n_test"),
        max("q_resid").as("q_resid"),
        sum(when(col("r") <= col("q_resid"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("n_cal"), col("n_test"), col("q_resid"),
        col("n_covered"),
        expr("(n_covered * 1000000) div n_test").as("coverage_ppm"))
  }

  /** Reliability-diagram calibration bins: equal-width bins over an
   * integer score's observed range, per bin the exact mean score and
   * positive rate — the readout that tells you whether a score's
   * MAGNITUDE means anything (a ranking metric like AUC can be perfect
   * while the probabilities are nonsense). Bin index
   * `((score − lo)·nBins) div (hi − lo + 1)` lands in [0, nBins) by
   * construction with pure integer arithmetic; a constant score
   * degenerates to one bin, not a division by zero. Mean score is the
   * floor of an exact integer division; positive rate is exact ppm.
   * One 1-row bounds agg (broadcast) + one bin-grain hash-agg; output ≤
   * nBins rows. Output: (bin, n, mean_score, pos_ppm). */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1 && nBins <= 100000,
      s"nBins must be in [1, 100000], got $nBins")
    // loud bound: (hi − lo)·nBins must fit a BIGINT — a 2^60-range
    // score column would otherwise wrap the bin product silently in
    // non-ANSI Spark (the cuped assert discipline)
    val bounds = df.agg(min(col(scoreCol)).cast("long").as("__lo"),
      max(col(scoreCol)).cast("long").as("__hi"))
      .withColumn("__g", assert_true(
        col("__hi") - col("__lo") <= Long.MaxValue / nBins,
        lit(s"calibrationBins: score range x $nBins bins would " +
          "overflow BIGINT — rescale the score")))
      .where(col("__g").isNull).drop("__g")
    df.select(col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("long").as("__y"))
      .crossJoin(broadcast(bounds))
      .select(
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(expr(s"((__s - __lo) * $nBins) div (__hi - __lo + 1)"))
          .as("bin"),
        col("__s"), col("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__s").as("__ss"),
        sum("__y").as("__pos"))
      .select(col("bin"), col("n"),
        expr("__ss div n").as("mean_score"),
        expr("(__pos * 1000000) div n").as("pos_ppm"))
  }

  /** Isotonic (PAV) score calibration at BIN grain — the monotone map
   * that turns a well-RANKING score (ml5's AUC) into well-CALIBRATED
   * probabilities (what [[calibrationBins]] measures but does not fix):
   * the weighted isotonic regression of per-bin positive rates, via the
   * exact MINIMAX characterization (Ayer et al. 1955; Robertson, Wright
   * & Dykstra 1988) instead of the sequential pool-adjacent-violators
   * sweep —
   *
   *   iso(j) = max_{i ≤ j} min_{k ≥ j}  (Σ_{i..k} pos) / (Σ_{i..k} n)
   *
   * — which is pure relational algebra: prefix sums over the ≤ nBins
   * bin relation, a bin-pair ratio grid, and two grouped aggs. EXACT:
   * each candidate average floors to ppm BEFORE the minimax, and since
   * floor is monotone nondecreasing, max/min of floored ratios equals
   * the floor of the true rational minimax — bit-stable in both
   * engines, no doubles anywhere. The j-expansion is O(nBins³) rows
   * (`require`d ≤ 100 bins → ≤ 1e6 tiny rows, broadcast-grade); the
   * only window is the bin-grain prefix sum, bounded by construction.
   * A loud bound keeps `pos·1e6` inside BIGINT (n ≤ 9e12, the
   * percentileRanks envelope discipline). Same binning contract as
   * [[calibrationBins]] (equal-width over the observed integer score
   * range; empty bins simply absent — isotonicity is over present bins
   * in bin order). Output: (bin, n, pos, raw_ppm, iso_ppm), iso_ppm
   * monotone nondecreasing in bin. */
  def isotonicCalibration(df: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 1 && nBins <= 100,
      s"nBins must be in [1, 100], got $nBins (the j-expansion is " +
        "nBins³)")
    val bounds = df.agg(min(col(scoreCol)).cast("long").as("__lo"),
      max(col(scoreCol)).cast("long").as("__hi"))
      .withColumn("__g", assert_true(
        col("__hi") - col("__lo") <= Long.MaxValue / nBins,
        lit(s"isotonicCalibration: score range x $nBins bins would " +
          "overflow BIGINT — rescale the score")))
      .where(col("__g").isNull).drop("__g")
    val bins = df.select(col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("long").as("__y"))
      .crossJoin(broadcast(bounds))
      .select(
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(expr(s"((__s - __lo) * $nBins) div (__hi - __lo + 1)"))
          .as("bin"),
        col("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("w"), sum("__y").as("y"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val pre = Dedup.materialize(bins
      .withColumn("sw", sum("w").over(wCum))
      .withColumn("sy", sum("y").over(wCum))
      .withColumn("__g", assert_true(col("sw") <= 9000000000000L,
        lit("isotonicCalibration: row count exceeds 9e12 — pos·1e6 " +
          "would leave BIGINT (bounded-moment contract)")))
      .where(col("__g").isNull).drop("__g"))
    val a = pre.select(col("bin").as("i"),
      (col("sw") - col("w")).as("swi"), (col("sy") - col("y")).as("syi"))
    val b = pre.select(col("bin").as("k"), col("sw").as("swk"),
      col("sy").as("syk"))
    val ratios = a.join(b, col("i") <= col("k"))
      .select(col("i"), col("k"),
        expr("((syk - syi) * 1000000) div (swk - swi)").as("r"))
    val iso = ratios
      .join(broadcast(pre.select(col("bin").as("j"))),
        col("i") <= col("j") && col("j") <= col("k"))
      .groupBy("j", "i").agg(min("r").as("mr"))
      .groupBy("j").agg(max("mr").as("iso_ppm"))
    pre.join(iso, pre("bin") === iso("j"))
      .select(col("bin"), col("w").as("n"), col("y").as("pos"),
        expr("(y * 1000000) div w").as("raw_ppm"), col("iso_ppm"))
  }

  /** Empirical-Bayes beta-binomial shrinkage of per-key rates (Robbins
   * 1956; the method-of-moments Beta prior fit of Morris 1983, the
   * standard "batting average" recipe): a per-source quality rate with
   * n = 30 should not outrank one with n = 30,000 on raw proportion —
   * the EB estimate `(pos + α)/(n + α + β)` pulls small-n keys toward
   * the prior mean exactly in proportion to their evidence, which is
   * the ranking a curation policy should threshold.
   *
   * Prior fit: μ and population variance of the per-key ppm rates as
   * fixed-shape doubles over EXACT BIGINT moment sums (the cuped
   * discipline), α = μ·(μ(1−μ)/σ² − 1), β = (1−μ)·(same factor),
   * CENTI-quantized half-up — after which the per-key shrinkage is
   * pure integer arithmetic: `((pos·100 + α_c)·1e6) div
   * (n·100 + α_c + β_c)`, exact and engine-identical. Degenerate
   * priors (one key, zero rate variance, a non-positive fitted α/β, or
   * a fitted α/β above 9e7 pseudo-counts — a near-point prior whose
   * shrinkage is just the mean, and whose centi form would push
   * `(pos·100 + α_c)·1e6` past BIGINT where Spark raises but DuckDB
   * silently widens to HUGEINT) yield NULL eb_ppm, never NaN — the
   * caller keeps the raw rate. A loud bound keeps `pos·1e8` inside
   * BIGINT (per-key n ≤ 9e10, the bounded-moment contract).
   *
   * One key-grain hash-agg, one 1-row moment agg (broadcast), one
   * narrow projection. Output: (key, n, pos, raw_ppm, eb_ppm). */
  def ebBetaShrink(df: DataFrame, keyCol: String,
      labelCol: String): DataFrame = {
    val keys = df
      .select(col(keyCol).as("key"), col(labelCol).cast("long").as("__y"))
      .groupBy("key").agg(count(lit(1)).as("n"), sum("__y").as("pos"))
      .withColumn("__g", assert_true(col("n") <= 90000000000L,
        lit("ebBetaShrink: per-key count exceeds 9e10 — pos·1e8 would " +
          "leave BIGINT; pre-aggregate (bounded-moment contract)")))
      .where(col("__g").isNull).drop("__g")
      .withColumn("raw_ppm", expr("(pos * 1000000) div n"))
    val mom = keys.agg(count(lit(1)).as("kn"),
      sum("raw_ppm").as("sp"),
      sum(col("raw_ppm") * col("raw_ppm")).as("spp"))
    // fixed-shape doubles over the exact sums; the oracle writes the
    // literally identical shapes
    val mu = col("sp").cast("double") / col("kn").cast("double") /
      lit(1e6)
    val v = (col("spp").cast("double") / col("kn").cast("double") -
      (col("sp").cast("double") / col("kn").cast("double")) *
        (col("sp").cast("double") / col("kn").cast("double"))) / lit(1e12)
    val inner = mu * (lit(1.0) - mu) / v - lit(1.0)
    val fit = mom.select(
      when(col("kn") >= 2L && v > 0.0,
        floor(mu * inner * lit(100) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("__ac"),
      when(col("kn") >= 2L && v > 0.0,
        floor((lit(1.0) - mu) * inner * lit(100) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("__bc"))
    keys.crossJoin(broadcast(fit))
      .select(col("key"), col("n"), col("pos"), col("raw_ppm"),
        when(col("__ac").isNotNull && col("__ac") >= 1L &&
             col("__bc") >= 1L && col("__ac") <= 9000000000L &&
             col("__bc") <= 9000000000L,
          expr("((pos * 100 + __ac) * 1000000) div " +
            "(n * 100 + __ac + __bc)"))
          .otherwise(lit(null).cast("long")).as("eb_ppm"))
  }

  /** Two-proportion z-test on per-user CONVERSION — the canonical A/B
   * readout for rates, completing the family ([[welch]] compares arm
   * MEANS, [[mannWhitney]] arm distributions; this compares the share
   * of users who converted at all, which is what most product
   * experiments actually ship on). Unit = user, converted = the user
   * has ≥ 1 event of `convEventType`; arms by `user % 2` (the shared
   * welch/cuped convention — nonnegative user ids, see
   * [[mannWhitney]]). Pooled z = (p₁ − p₀) / √(p̂(1−p̂)(1/n₀ + 1/n₁))
   * with exact BIGINT counts, conversion shares in exact ppm, the z as
   * ONE fixed-shape double micro-quantized half-up (the cuped
   * discipline — oracle writes the literally identical shape).
   * Degenerate inputs (an empty arm, or pooled conversion at exactly
   * 0 or 1 ⇒ zero variance) yield NULL z, never NaN.
   *
   * One user-grain hash-agg + one 2-row arm agg + a 1-row pivot.
   * Output 1 row: (n0, c0, n1, c1, p0_ppm, p1_ppm, z_micro). */
  def twoProportionZ(events: DataFrame, userCol: String = "user_id",
      convEventType: String = "purchase",
      typeCol: String = "event_type"): DataFrame = {
    val users = events.groupBy(col(userCol).as("user"))
      .agg(max(when(col(typeCol) === convEventType, 1L).otherwise(0L))
        .as("conv"))
    val one = users.groupBy(pmod(col("user"), lit(2L)).as("arm"))
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      .agg(
        max(when(col("arm") === 0L, col("n"))).as("n0"),
        max(when(col("arm") === 0L, col("c"))).as("c0"),
        max(when(col("arm") === 1L, col("n"))).as("n1"),
        max(when(col("arm") === 1L, col("c"))).as("c1"))
    def d(c: String) = col(c).cast("double")
    val pp = (d("c0") + d("c1")) / (d("n0") + d("n1"))
    val z = (d("c1") / d("n1") - d("c0") / d("n0")) /
      sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / d("n0") + lit(1.0) / d("n1")))
    val ok = col("n0") >= 1L && col("n1") >= 1L &&
      col("c0") + col("c1") > 0L &&
      col("c0") + col("c1") < col("n0") + col("n1")
    one.select(col("n0"), col("c0"), col("n1"), col("c1"),
      expr("(c0 * 1000000) div n0").as("p0_ppm"),
      expr("(c1 * 1000000) div n1").as("p1_ppm"),
      when(ok, floor(z * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("z_micro"))
  }

  /** Sample-ratio-mismatch guardrail (the first check any experiment
   * readout must pass — Fabijan et al., "Diagnosing Sample Ratio
   * Mismatch", KDD 2019): a Pearson χ² of the observed arm counts
   * against the intended 50/50 split. An SRM means the assignment or
   * logging pipeline is broken and EVERY downstream metric (including
   * [[cuped]]'s) is untrustworthy — which is why the flag rides the
   * same readout rather than living in a notebook. Counts are exact
   * BIGINTs (users counted once each, first-seen arm); χ² is one
   * fixed-shape double over them; the 3.841 cutoff (95th percentile of
   * χ²₁) is a literal both plans share. One user-grain distinct + one
   * 2-row agg. Output: (n_arm0, n_arm1, chi2, srm_flag). */
  /** Poisson-bootstrap thresholds for the deterministic resample weights:
   * `PoissonCdf48(k)` = ⌊CDF_Poisson(1)(k) · 2^48⌋, so a 48-bit uniform
   * `u` draws weight `w = min{k : u < PoissonCdf48(k)}` (capped at 8 —
   * P(w > 8) ≈ 1e-6). Shared verbatim by the Spark expression and the
   * oracle SQL so the two engines draw the SAME weights. */
  val PoissonCdf48: Array[Long] = {
    val pdf = (0 to 7).scanLeft(math.exp(-1.0)) { case (p, k) =>
      p / (k + 1)
    }.take(8) // pdf(k) = e^-1 / k!
    pdf.scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c * (1L << 48).toDouble).toLong).toArray
  }

  /**
   * Poisson bootstrap confidence interval (Chamandy, Muralidharan,
   * Najmi & Naidu 2012 — the bootstrap that works on massive data: each
   * unit receives an independent Poisson(1) resample WEIGHT instead of
   * the classical with-replacement draw, so one scan serves all `b`
   * resamples and no resample ever materializes). Weights are
   * deterministic — a seeded 48-bit md5 uniform inverted through the
   * exact [[PoissonCdf48]] thresholds — so the whole release replays
   * byte-for-byte (the [[Privacy]] discipline).
   *
   * Metric: per-user sum of `valueCol` (micro-quantized). Each resample
   * mean is the exact integer ratio `Σ w·x div Σ w` (floor); the interval
   * is the (⌊α·b⌋, ⌊(1−α)·b⌋) order statistics of the `b` resample means
   * — b is a constant (default 40), so the final sort is b rows.
   *
   * Shape: one user-grain agg, a ×b narrow explode of the USER-grain
   * relation (never the event grain), one (replicate)-grain agg, one
   * b-row fold. Output: one row (n_users, mean_micro, lo_micro,
   * hi_micro, b_resamples).
   */
  def bootstrapCi(events: DataFrame, userCol: String, valueCol: String,
      b: Int = 40, alphaPct: Int = 5, seed: Long = 0L): DataFrame = {
    require(b >= 4, s"b must be >= 4, got $b")
    require(alphaPct >= 1 && alphaPct < 50,
      s"alphaPct must be in [1, 50), got $alphaPct")
    val perUser = events.groupBy(col(userCol).as("u"))
      .agg(sum(floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long"))
        .as("x"))
    val replicated = perUser
      .select(col("u"), col("x"),
        explode(sequence(lit(0), lit(b - 1))).as("r"))
    val u48 = conv(substring(md5(
      concat(lit(s"boot:$seed:"), col("u").cast("string"),
        lit(":"), col("r").cast("string"))), 1, 12), 16, 10).cast("long")
    // w = number of thresholds the uniform clears (exact CASE-free form:
    // sum of indicator comparisons against the 8 shared constants)
    val w = PoissonCdf48.map(t => when(u48 >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val means = replicated
      .withColumn("w", w)
      .groupBy("r")
      .agg(sum(col("w") * col("x")).as("num"), sum("w").as("den"))
      .select(col("r"),
        when(col("den") > 0, expr("num div den")).otherwise(lit(0L))
          .as("mean_micro"))
    val loIdx = math.max(1, alphaPct * b / 100)
    val hiIdx = math.min(b, b - alphaPct * b / 100 + 1)
    val ranked = means.select(col("mean_micro"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("mean_micro"), col("r"))).as("rk"))
    val ci = ranked.agg(
      max(when(col("rk") === loIdx, col("mean_micro"))).as("lo_micro"),
      max(when(col("rk") === hiIdx, col("mean_micro"))).as("hi_micro"))
    // bound tripwire (the cuped discipline): every replicate numerator is
    // Σ w·x with w ≤ 8, so the weighted sums stay exact iff the plain
    // metric total stays under Long.Max/16 — asserted on the same agg
    // that feeds the point estimate, loud on both engines (ANSI overflow
    // raises anyway; this names the contract before arithmetic trips it)
    val point = perUser.agg(count(lit(1)).as("n_users"),
      expr("sum(x) div count(1)").as("mean_micro"),
      sum("x").as("__tot"))
      .withColumn("__g", assert_true(
        abs(col("__tot")) <= lit(Long.MaxValue / 16),
        lit("bootstrapCi: metric total exceeds the exact-weighted-sum " +
          "bound (Long.Max/16 micro-units) — quantize coarser")))
      .where(col("__g").isNull).drop("__tot", "__g")
    point.crossJoin(broadcast(ci))
      .select(col("n_users"), col("mean_micro"), col("lo_micro"),
        col("hi_micro"), lit(b).as("b_resamples"))
  }

  /** Welch two-sample t readout (the unequal-variance t-test — the
   * default experiment significance readout; Student's equal-variance
   * form is wrong the moment a treatment changes variance, which
   * treatments do): per-user value totals (the experiment unit — never
   * event-grain, events within a user are correlated), arms by
   * `user % 2` (the [[cuped]]/[[srmCheck]] assignment convention),
   * then t = (m̄₀−m̄₁)/√(s₀²/n₀+s₁²/n₁) and the Welch–Satterthwaite
   * effective df. All corpus-sized sums are exact BIGINTs under the
   * same ±√Long.Max per-user bound as [[cuped]]; t and df are ONE
   * fixed-shape double expression each over those sums (micro-quantized
   * half-up), means ride along in value units. Degenerate inputs
   * (an arm with < 2 users, or zero pooled variance) yield NULL t/df,
   * never NaN/Inf. One user-grain agg + one 2-row agg + one 1-row
   * reshape — nothing beyond user grain ever crosses the wire.
   * Output: (n0, n1, mean0, mean1, t_micro, df_micro). */
  def welch(events: DataFrame, userCol: String = "user_id",
      valCol: String = "value"): DataFrame = {
    val vQ = floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
    val maxAbs = 3037000499L // √Long.Max, the cuped bound
    val users = events.groupBy(col(userCol).as("user"))
      .agg(sum(vQ).as("x"))
      .withColumn("_b", assert_true(abs(col("x")) <= maxAbs,
        lit(s"welch: per-user total exceeds ±$maxAbs centi-units; " +
          "integer moments would overflow")))
      .where(col("_b").isNull).drop("_b")
    val arms = users.groupBy(pmod(col("user"), lit(2L)).as("arm"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val one = arms.agg(
      max(when(col("arm") === 0L, col("n"))).as("n0"),
      max(when(col("arm") === 0L, col("sx"))).as("sx0"),
      max(when(col("arm") === 0L, col("sxx"))).as("sxx0"),
      max(when(col("arm") === 1L, col("n"))).as("n1"),
      max(when(col("arm") === 1L, col("sx"))).as("sx1"),
      max(when(col("arm") === 1L, col("sxx"))).as("sxx1"))
    // fixed-shape doubles over the exact sums (the cuped discipline);
    // every sub-expression below is written with the literally identical
    // shape in the oracle SQL
    def nD(i: Int) = col(s"n$i").cast("double")
    def m(i: Int) = col(s"sx$i").cast("double") / nD(i)
    def v(i: Int) =
      (col(s"sxx$i").cast("double") - nD(i) * m(i) * m(i)) /
        (nD(i) - lit(1.0))
    val se2 = v(0) / nD(0) + v(1) / nD(1)
    val t = (m(0) - m(1)) / sqrt(se2)
    val df = se2 * se2 /
      (v(0) / nD(0) * (v(0) / nD(0)) / (nD(0) - lit(1.0)) +
        v(1) / nD(1) * (v(1) / nD(1)) / (nD(1) - lit(1.0)))
    val ok = col("n0") >= 2L && col("n1") >= 2L && !(se2 === 0.0)
    one.select(col("n0"), col("n1"),
      round(m(0) / lit(100.0), 6).as("mean0"),
      round(m(1) / lit(100.0), 6).as("mean1"),
      when(ok, floor(t * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("t_micro"),
      when(ok, floor(df * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("df_micro"))
  }

  /** Mann–Whitney U / Wilcoxon rank-sum readout (Mann & Whitney 1947) —
   * the DISTRIBUTION-FREE sibling of [[welch]] for the same experiment
   * question: revenue-per-user metrics are heavy-tailed enough that a
   * t-statistic rides a handful of whales; the rank-sum asks "does one
   * arm stochastically dominate" and no single whale can move it by
   * more than one rank. Same experiment conventions as welch: the unit
   * is the USER (per-user centi-quantized value totals under the same
   * ±√Long.Max loud bound), arms by `user % 2`. The arm convention
   * assumes NONNEGATIVE user ids (the welch/cuped/srm convention across
   * this file): Spark's `pmod` and SQL's truncating `%` agree only
   * there — a signed key (pmod(−3,2)=1 vs −3%2=−1) would land in
   * different arms across engines (r10 ADVICE; testdata ids are
   * generated nonnegative, so this is a documented contract, not a
   * live divergence).
   *
   * Exactness: ranks are handled at DISTINCT-VALUE grain through the
   * shared enforced kernel ([[Profile.boundedCumCounts]]): a tied group
   * ending at inclusive cumulative count `cum` with multiplicity `c`
   * has DOUBLED average rank `2·(cum − c) + c + 1` — an exact integer,
   * so the arm-1 rank sum and U statistic stay exact BIGINTs in DOUBLED
   * units (`u1_doubled = 2·n1·n0 + n1·(n1+1) − r1_doubled`). The
   * normal-approximation z uses the standard tie-corrected variance
   * `σ² = n1·n0/12 · ((n+1) − T/(n·(n−1)))`, T = Σ(c³ − c), as ONE
   * fixed-shape double expression over the exact sums (the cuped
   * discipline), micro-quantized half-up. Degenerate inputs (an empty
   * arm, or all values tied ⇒ σ = 0) yield NULL z, never NaN. A loud
   * per-value bound keeps each c³ inside BIGINT; the tie-sum overflow
   * beyond that is the same ANSI-raises exposure class as cuped's
   * pooled moments.
   *
   * One user-grain agg, one distinct-value agg + the bounded kernel
   * window, one 1-row agg. Output: (n0, n1, u1_doubled, tie_term,
   * z_micro). */
  def mannWhitney(events: DataFrame, userCol: String = "user_id",
      valCol: String = "value", maxDistinct: Long = 100000L): DataFrame = {
    val vQ = floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
    val maxAbs = 3037000499L // √Long.Max, the cuped bound
    val users = events.groupBy(col(userCol).as("user"))
      .agg(sum(vQ).as("x"))
      .withColumn("_b", assert_true(abs(col("x")) <= maxAbs,
        lit(s"mannWhitney: per-user total exceeds ±$maxAbs centi-units; " +
          "integer moments would overflow")))
      .where(col("_b").isNull).drop("_b")
    val counts = users
      .select(pmod(col("user"), lit(2L)).as("__a"), col("x"))
      .groupBy(col("x").as("vq"))
      .agg(sum(when(col("__a") === 1L, 1L).otherwise(0L)).as("c1"),
        count(lit(1)).as("c"))
    val ranked = graft.ext.Profile.boundedCumCounts(counts, "vq", "c",
        maxDistinct,
        s"mannWhitney: distinct-value cardinality exceeds $maxDistinct " +
          "— quantize the metric coarser (bounded-grain contract, see " +
          "Profile.boundedCumCounts)")
      .withColumn("__gt", assert_true(col("c") <= 2000000L,
        lit("mannWhitney: a single tied value holds > 2e6 users — its " +
          "cubed tie term would leave BIGINT; quantize coarser")))
      .where(col("__gt").isNull)
    val r2 = lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L)
    val agg = ranked
      .select(col("n"), col("c1"), (col("c1") * r2).as("__r1d"),
        (col("c") * col("c") * col("c") - col("c")).as("__tt"))
      .agg(max("n").as("n"), sum("c1").as("n1"),
        sum("__r1d").as("r1_doubled"), sum("__tt").as("tie_term"))
    // fixed-shape doubles over the exact sums (the cuped discipline);
    // the oracle writes the literally identical shapes
    val n0c = col("n") - col("n1")
    val u1d = lit(2L) * col("n1") * n0c + col("n1") * (col("n1") + 1L) -
      col("r1_doubled")
    val nD = col("n").cast("double")
    val n1D = col("n1").cast("double")
    val n0D = n0c.cast("double")
    val sigma2 = n1D * n0D / lit(12.0) *
      ((nD + lit(1.0)) - col("tie_term").cast("double") /
        (nD * (nD - lit(1.0))))
    val z = (u1d.cast("double") - n1D * n0D) / (lit(2.0) * sqrt(sigma2))
    val ok = col("n1") >= 1L && n0c >= 1L && !(sigma2 === 0.0)
    agg.select(n0c.as("n0"), col("n1"), u1d.as("u1_doubled"),
      col("tie_term"),
      when(ok, floor(z * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("z_micro"))
  }

  /** Cliff's delta (Cliff 1993) — the EFFECT-SIZE companion the rank
   * family's significance tests have been missing: [[mannWhitney]]'s z
   * says "arm 1 stochastically dominates, p < ε" but at experiment
   * scale EVERYTHING is significant; δ = P(x₁ > x₀) − P(x₁ < x₀) says
   * by HOW MUCH, on the [−1, 1] dominance scale (|δ| ≳ 0.33 is
   * Romano 2006's "medium"), immune to the same whale-rides-the-mean
   * failure that motivates the rank tests. Same experiment conventions
   * as [[welch]]/[[mannWhitney]]: unit is the USER, per-user
   * centi-quantized totals under the ±√Long.Max loud bound, arms by
   * `user % 2` (nonnegative-id contract).
   *
   * Fully exact pair counts with NO O(n²) pair join: at distinct-value
   * grain with per-arm cumulative counts, the dominance counts are
   *   n_gt = Σ_v c1_v · below0(v),  n_tie = Σ_v c1_v · c0_v,
   *   n_lt = n1·n0 − n_gt − n_tie
   * — exact BIGINTs off the same [[graft.ext.Profile.boundedCumCounts]]
   * kernel as mannWhitney (one extra running sum on the same bounded
   * ordering). The pair moments ride a GATED relation: arm sizes are
   * asserted ≤ 2e6 each BEFORE the per-value products are built (the
   * [[kendallTau]] gate-the-expansion posture), so n1·n0 ≤ 4e12 and
   * every product stays far inside BIGINT. δ is ONE fixed-shape double
   * (n_gt − n_lt ≤ 4e12 < 2^53, exactly representable),
   * micro-quantized half-up; NULL when an arm is empty. Output 1 row:
   * (n0, n1, n_gt, n_lt, n_tie, delta_micro). */
  def cliffsDelta(events: DataFrame, userCol: String = "user_id",
      valCol: String = "value", maxDistinct: Long = 100000L): DataFrame = {
    val vQ = floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
    val maxAbs = 3037000499L // √Long.Max, the cuped bound
    val users = events.groupBy(col(userCol).as("user"))
      .agg(sum(vQ).as("x"))
      .withColumn("_b", assert_true(abs(col("x")) <= maxAbs,
        lit(s"cliffsDelta: per-user total exceeds ±$maxAbs " +
          "centi-units; integer moments would overflow")))
      .where(col("_b").isNull).drop("_b")
    val counts = users
      .select(pmod(col("user"), lit(2L)).as("__a"), col("x"))
      .groupBy(col("x").as("vq"))
      .agg(sum(when(col("__a") === 1L, 1L).otherwise(0L)).as("c1"),
        count(lit(1)).as("c"))
    // Arm-size gate asserted BEFORE the per-value pair products are
    // built (the kendallTau posture): per-side ≤ 2e6 keeps n1·n0 ≤
    // 4e12, so the dominance sums and the ·1e6-free delta factors all
    // stay far inside BIGINT — and the gate's own arithmetic cannot
    // overflow on inputs it refuses.
    val gate = counts
      .agg(coalesce(sum("c1"), lit(0L)).as("__n1t"),
        coalesce(sum("c"), lit(0L)).as("__nt"))
      .withColumn("__g", assert_true(
        col("__n1t") <= 2000000L &&
          col("__nt") - col("__n1t") <= 2000000L,
        lit("cliffsDelta: an arm exceeds 2e6 users — the exact pair " +
          "moments would leave the documented envelope " +
          "(bounded-moment contract); sample the audit slice")))
      .where(col("__g").isNull).select(lit(1L).as("__ok"))
    val ranked = graft.ext.Profile.boundedCumCounts(counts, "vq", "c",
        maxDistinct,
        s"cliffsDelta: distinct-value cardinality exceeds $maxDistinct " +
          "— quantize the metric coarser (bounded-grain contract, see " +
          "Profile.boundedCumCounts)")
      .crossJoin(broadcast(gate))
    val w = org.apache.spark.sql.expressions.Window.orderBy("vq")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // below0(v) = arm-0 mass strictly below v = (cum − c) − (cum1 − c1)
    val agg = ranked.withColumn("cum1", sum("c1").over(w))
      .select(col("n"), col("c1"),
        (col("c1") * ((col("cum") - col("c")) -
          (col("cum1") - col("c1")))).as("__gt"),
        (col("c1") * (col("c") - col("c1"))).as("__tie"))
      .agg(max("n").as("n"), coalesce(sum("c1"), lit(0L)).as("n1"),
        coalesce(sum("__gt"), lit(0L)).as("n_gt"),
        coalesce(sum("__tie"), lit(0L)).as("n_tie"))
    val n0c = col("n") - col("n1")
    val nLt = col("n1") * n0c - col("n_gt") - col("n_tie")
    val delta = (col("n_gt") - nLt).cast("double") /
      (col("n1") * n0c).cast("double")
    agg.select(n0c.as("n0"), col("n1"), col("n_gt"), nLt.as("n_lt"),
      col("n_tie"),
      when(col("n1") >= 1L && n0c >= 1L,
        floor(delta * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("delta_micro"))
  }

  /** EXACT ROC-AUC of an integer score against a binary label — the
   * ranking-quality number missing between [[calibrationBins]] (is the
   * magnitude meaningful) and the retrieval rank metrics (per-query):
   * AUC = P(score⁺ > score⁻) + ½·P(tie), which is exactly the
   * Mann–Whitney U of the positive class over n_pos·n_neg — so it rides
   * the same enforced kernel and DOUBLED-rank discipline as
   * [[mannWhitney]], making the classic 0.5-for-ties convention an
   * exact integer: `auc_ppm = ((r1d − n_pos·(n_pos+1)) · 1e6) div
   * (2·n_pos·n_neg)` with no doubles anywhere. A degenerate label (one
   * class empty) yields NULL, never NaN; a loud bound keeps
   * `u·1e6` inside BIGINT (n_pos·n_neg ≤ 4e12 — far above any eval
   * set). `scoreCol` must already be an integer (the caller owns
   * quantization, the [[graft.ext.Profile.groupedOrderStats]]
   * contract). One distinct-score hash-agg + the bounded kernel window
   * + one 1-row agg. Output: (n_pos, n_neg, auc_ppm). */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String,
      maxDistinct: Long = 4000000L): DataFrame = {
    val counts = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("long").as("vq"),
        col(labelCol).cast("long").as("__y"))
      .groupBy("vq")
      .agg(sum("__y").as("c1"), count(lit(1)).as("c"))
    val ranked = graft.ext.Profile.boundedCumCounts(counts, "vq", "c",
      maxDistinct,
      s"rocAuc: distinct-score cardinality exceeds $maxDistinct — " +
        "quantize the score coarser (bounded-grain contract, see " +
        "Profile.boundedCumCounts)")
    val r2 = lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L)
    val agg = ranked
      .select(col("n"), col("c1"), (col("c1") * r2).as("__r1d"))
      .agg(max("n").as("n"), sum("c1").as("n1"),
        sum("__r1d").as("r1d"))
      .withColumn("__g", assert_true(
        col("n1") * (col("n") - col("n1")) <= 4000000000000L,
        lit("rocAuc: n_pos·n_neg exceeds the exact-ppm envelope " +
          "(4e12) — evaluate on a sample (bounded-moment contract)")))
      .where(col("__g").isNull)
    agg.select(col("n1").as("n_pos"), (col("n") - col("n1")).as("n_neg"),
      when(col("n1") >= 1L && col("n") - col("n1") >= 1L,
        expr("((r1d - n1 * (n1 + 1)) * 1000000) div " +
          "(2 * n1 * (n - n1))"))
        .otherwise(lit(null).cast("long")).as("auc_ppm"))
  }

  /** Spearman rank correlation between two columns (Spearman 1904) —
   * the distribution-free co-movement readout the experiment family
   * lacked: Pearson (x15's R² machinery) is dragged by outliers and
   * only sees LINEAR association; this ranks both variables and asks
   * "do they move together monotonically at all".
   *
   * Convention (documented, deterministic): ties take MIDRANKS held as
   * exact integers via the ×2 trick (r2 = 2·cum − c + 1, always an
   * integer — the midrank doubled), and ρ is the classic d² formula
   * `1 − 6·Σd²/(n(n²−1))` on those midranks — exact for tie-free data,
   * the standard midrank approximation under ties (the tie-free
   * Pearson-on-ranks identity; both engines replay it bit-identically
   * because Σd² is an exact BIGINT and the final ρ is one fixed-shape
   * double expression over two exact scalars). `sum_d2q` carries the
   * ×4-scaled Σd² (the doubled-rank square), so Σd² = sum_d2q/4.
   *
   * Bounds, loud: n ≤ 1e6 (Σd² ≤ 4n³ must stay inside BIGINT — the
   * audit-slice contract; pre-aggregate to series grain like the
   * x18 daily query) and each variable's distinct-value grain rides
   * [[graft.ext.Profile.boundedCumCounts]]. Two value-grain rank
   * joins + one 1-row agg; nothing corpus-sized crosses the driver.
   * Output 1 row: (n, sum_d2q, rho_micro — NULL when n < 2). */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    def ranks2(c: String, out: String): DataFrame =
      graft.ext.Profile.boundedCumCounts(
          d.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__c")),
          "__v", "__c", 1000000L,
          s"spearman: more than 1e6 distinct $c values — rank moments " +
            "would leave the exact envelope (bounded-grain contract)")
        .select(col("__v"),
          (lit(2L) * col("cum") - col("__c") + lit(1L)).as(out))
    val j = d
      .join(ranks2("__x", "__r2x").withColumnRenamed("__v", "__x"), "__x")
      .join(ranks2("__y", "__r2y").withColumnRenamed("__v", "__y"), "__y")
    val agg = j.agg(count(lit(1)).as("n"),
        sum((col("__r2x") - col("__r2y")) *
          (col("__r2x") - col("__r2y"))).as("sum_d2q"))
      .withColumn("__g", assert_true(col("n") <= 1000000L,
        lit("spearman: row count exceeds 1e6 — Σd² would leave BIGINT " +
          "(bounded-moment contract); pre-aggregate to series grain")))
      .where(col("__g").isNull)
    val nD = col("n").cast("double")
    agg.select(col("n"), col("sum_d2q"),
      when(col("n") >= 2L,
        floor((lit(1.0) - lit(1.5) * col("sum_d2q").cast("double") /
          (nD * (nD * nD - lit(1.0)))) * lit(1e6) + lit(0.5))
          .cast("long"))
        .otherwise(lit(null).cast("long")).as("rho_micro"))
  }

  /** GROUPED Spearman — [[spearman]] per key, the "does the monotone
   * co-movement hold in THIS segment" readout (a pooled ρ famously
   * averages away sign-opposed segments — Simpson's classic): one
   * (n, Σd², ρ) row per group, midranks taken WITHIN the group.
   *
   * Scale posture: both rank relations come from (group, value)-grain
   * hash-aggs with the cumulative partitioned BY GROUP (the
   * [[graft.ext.Profile.ksTwoSampleBy]] posture — no global
   * single-partition sweep at any group count), then two (group, value)
   * equi-joins and one group-grain agg. The n ≤ 1e6 BIGINT envelope for
   * Σd² applies PER GROUP, asserted on that group's own 1-row total.
   * Output: (group as string, n, sum_d2q, rho_micro — NULL when the
   * group has n < 2). */
  def spearmanBy(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d = df.filter(col(groupCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__g")
      .orderBy("__v")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    def ranks2(c: String, out: String): DataFrame =
      d.groupBy(col("__g"), col(c).as("__v"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("cum", sum("__c").over(w))
        .select(col("__g"), col("__v").as(c),
          (lit(2L) * col("cum") - col("__c") + lit(1L)).as(out))
    val j = d.join(ranks2("__x", "__r2x"), Seq("__g", "__x"))
      .join(ranks2("__y", "__r2y"), Seq("__g", "__y"))
    val agg = j.groupBy("__g").agg(count(lit(1)).as("n"),
        sum((col("__r2x") - col("__r2y")) *
          (col("__r2x") - col("__r2y"))).as("sum_d2q"))
      .withColumn("__gd", assert_true(col("n") <= 1000000L,
        lit("spearmanBy: a group's row count exceeds 1e6 — Σd² would " +
          "leave BIGINT (bounded-moment contract); pre-aggregate to " +
          "series grain")))
      .where(col("__gd").isNull)
    val nD = col("n").cast("double")
    agg.select(col("__g").as("group"), col("n"), col("sum_d2q"),
      when(col("n") >= 2L,
        floor((lit(1.0) - lit(1.5) * col("sum_d2q").cast("double") /
          (nD * (nD * nD - lit(1.0)))) * lit(1e6) + lit(0.5))
          .cast("long"))
        .otherwise(lit(null).cast("long")).as("rho_micro"))
  }

  /** Kendall rank correlation τ-b (Kendall 1938) — the PAIR-based
   * monotone-association reading beside [[spearman]]'s rank-distance
   * one: over all C(n,2) ordered pairs of a series, count concordant
   * (x and y move the same way) vs discordant, with the τ-b tie
   * normalization √((n₀−n₁)(n₀−n₂)) so heavily tied columns can still
   * reach ±1. [[graft.ext.TimeSeries.mannKendall]] IS this statistic's
   * S = C − D against time; this is the x-vs-y generalization, sharing
   * the pair-expansion audit-slice contract.
   *
   * Exactness: the statistic needs ONLY comparisons — sx/sy come from
   * `when(xb > xa, 1)(xb < xa, −1)(0)`, never a subtraction — so unlike
   * theilSen/wilcoxon there is NO value-magnitude envelope at all: any
   * long is in-domain, nothing can wrap. C, D and the per-column tie
   * pair counts are exact BIGINTs; with the loud n ≤ `maxPoints` (ord)-
   * grain bound and `maxPoints` itself capped at 1e7, every factor of
   * the one double expression — n₀ = n(n−1)/2 ≤ ~5e13, n₀−n₁, n₀−n₂ —
   * is an exactly-representable integer < 2^53 (the product is one
   * correctly-rounded multiply feeding sqrt, fixed shape on both
   * engines). τ micro-quantizes half-up; NULL (never NaN) when either
   * tie factor degenerates or n < 2.
   *
   * Same O(n²)-behind-a-loud-grain-assert contract as
   * [[graft.ext.TimeSeries.theilSen]]: the input is a pre-aggregated
   * series at (ord) grain (daily volumes, hourly rates), never raw
   * events. Output 1 row: (n_points, n_conc, n_disc, tie_x_pairs,
   * tie_y_pairs, tau_micro). */
  def kendallTau(series: DataFrame, ordCol: String, xCol: String,
      yCol: String, maxPoints: Long = 10000L): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    // n₀ = n(n−1)/2 ≤ ~5e13 < 2^53 keeps every n₀-derived double term
    // exactly representable; a caller-raised maxPoints beyond 1e7 would
    // silently void that claim (r13 ADVICE), so refuse it here.
    require(maxPoints <= 10000000L,
      s"maxPoints must be <= 1e7 so n0 = n(n-1)/2 stays exactly " +
        s"representable as a double (< 2^53), got $maxPoints")
    val s = series.filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(ordCol).isNotNull)
      .select(col(ordCol).cast("long").as("__t"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val n = s.agg(count(lit(1)).as("n_points"),
        countDistinct("__t").as("__nd"))
      .withColumn("__g", assert_true(
        col("n_points") <= maxPoints && col("__nd") === col("n_points"),
        lit(s"kendallTau: series must be at (ord) grain with at most " +
          s"$maxPoints points — the pair expansion is O(n²) " +
          "(bounded-grain contract; pre-aggregate to a coarser ord)")))
      .where(col("__g").isNull).select("n_points")
    def sgn(b: org.apache.spark.sql.Column,
        a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(b > a, lit(1L)).when(b < a, lit(-1L)).otherwise(lit(0L))
    // The pair expansion rides the GATED relation (r13 ADVICE): the
    // 1-row asserted n is broadcast-crossJoined into s BEFORE the
    // self-join, so the broadcast build side — and its assert —
    // materializes before any pair is expanded. Previously the gate was
    // a separate 1-row agg crossJoined with the O(n²) aggregate, and an
    // over-bound series could pay much of the quadratic expansion
    // before the loud refusal landed (the agg-gate race wilcoxon gates
    // per row; here the hazard is cost, not overflow, so gating the
    // expansion's input suffices).
    val sg = s.crossJoin(broadcast(n)).drop("n_points")
    val pairs = sg.toDF("__ta", "__xa", "__ya")
      .join(sg.toDF("__tb", "__xb", "__yb"), col("__ta") < col("__tb"))
      .select((sgn(col("__xb"), col("__xa")) *
        sgn(col("__yb"), col("__ya"))).as("__s"))
      .agg(coalesce(sum(when(col("__s") === 1L, 1L).otherwise(0L)),
          lit(0L)).as("n_conc"),
        coalesce(sum(when(col("__s") === -1L, 1L).otherwise(0L)),
          lit(0L)).as("n_disc"))
    def tiePairs(c: String, out: String): DataFrame =
      s.groupBy(col(c)).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(expr("__c * (__c - 1) div 2")), lit(0L)).as(out))
    val joined = n.crossJoin(pairs)
      .crossJoin(tiePairs("__x", "tie_x_pairs"))
      .crossJoin(tiePairs("__y", "tie_y_pairs"))
      .withColumn("__n0", expr("n_points * (n_points - 1) div 2"))
    val denom = (col("__n0") - col("tie_x_pairs")).cast("double") *
      (col("__n0") - col("tie_y_pairs")).cast("double")
    val tau = (col("n_conc") - col("n_disc")).cast("double") / sqrt(denom)
    joined.select(col("n_points"), col("n_conc"), col("n_disc"),
      col("tie_x_pairs"), col("tie_y_pairs"),
      when(col("n_points") >= 2L && denom > lit(0.0),
        floor(tau * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("tau_micro"))
  }

  /** GROUPED Kendall τ-b — [[kendallTau]] per key, the "WHICH segment's
   * x tracks its y" readout beside [[spearmanBy]]'s rank-distance one
   * (a pooled τ averages away sign-opposed segments exactly like a
   * pooled ρ does). Same comparison-only exactness — sx/sy are
   * `when(>)(<)(0)` signs, never a subtraction, so NO value-magnitude
   * envelope exists by construction — and the same maxPoints ≤ 1e7 cap
   * keeping every n₀-derived double factor exactly representable.
   *
   * Scale posture: the O(n²) pair expansion is PER GROUP — an equi-join
   * on the group key with the `ord` inequality inside it, so work is
   * Σ_g n_g² with each n_g behind the loud per-group (ord)-grain bound
   * (asserted on that group's count row, the [[graft.ext.Profile
   * .ksTwoSampleBy]] posture), never a global cross product. The
   * expansion rides the GATED per-group counts relation (joined into
   * the series before the self-join), so an over-bound group refuses
   * before its quadratic expansion completes. Groups with one point
   * surface with 0 pairs and NULL tau_micro.
   *
   * Output: one [[kendallTau]]-shaped row per group —
   * (group as string, n_points, n_conc, n_disc, tie_x_pairs,
   * tie_y_pairs, tau_micro). */
  def kendallTauBy(series: DataFrame, groupCol: String, ordCol: String,
      xCol: String, yCol: String, maxPoints: Long = 10000L): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    require(maxPoints <= 10000000L,
      s"maxPoints must be <= 1e7 so n0 = n(n-1)/2 stays exactly " +
        s"representable as a double (< 2^53), got $maxPoints")
    val s = series.filter(col(groupCol).isNotNull &&
        col(ordCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(groupCol).cast("string").as("__gk"),
        col(ordCol).cast("long").as("__t"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val n = s.groupBy("__gk").agg(count(lit(1)).as("n_points"),
        countDistinct("__t").as("__nd"))
      .withColumn("__g", assert_true(
        col("n_points") <= maxPoints && col("__nd") === col("n_points"),
        lit(s"kendallTauBy: a group's series must be at (ord) grain " +
          s"with at most $maxPoints points — the pair expansion is " +
          "O(n²) per group (bounded-grain contract; pre-aggregate to " +
          "a coarser ord)")))
      .where(col("__g").isNull).select(col("__gk"), col("n_points"))
    def sgn(b: org.apache.spark.sql.Column,
        a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(b > a, lit(1L)).when(b < a, lit(-1L)).otherwise(lit(0L))
    val sg = s.join(n.select("__gk"), Seq("__gk"))
    val pairs = sg.toDF("__gk", "__ta", "__xa", "__ya")
      .join(sg.toDF("__gkb", "__tb", "__xb", "__yb"),
        col("__gk") === col("__gkb") && col("__ta") < col("__tb"))
      .select(col("__gk"), (sgn(col("__xb"), col("__xa")) *
        sgn(col("__yb"), col("__ya"))).as("__s"))
      .groupBy("__gk")
      .agg(sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("n_conc"),
        sum(when(col("__s") === -1L, 1L).otherwise(0L)).as("n_disc"))
    def tiePairs(c: String, out: String): DataFrame =
      s.groupBy(col("__gk"), col(c)).agg(count(lit(1)).as("__c"))
        .groupBy("__gk")
        .agg(coalesce(sum(expr("__c * (__c - 1) div 2")), lit(0L)).as(out))
    val joined = n.join(pairs, Seq("__gk"), "left")
      .join(tiePairs("__x", "tie_x_pairs"), Seq("__gk"))
      .join(tiePairs("__y", "tie_y_pairs"), Seq("__gk"))
      .select(col("__gk"), col("n_points"),
        coalesce(col("n_conc"), lit(0L)).as("n_conc"),
        coalesce(col("n_disc"), lit(0L)).as("n_disc"),
        col("tie_x_pairs"), col("tie_y_pairs"))
      .withColumn("__n0", expr("n_points * (n_points - 1) div 2"))
    val denom = (col("__n0") - col("tie_x_pairs")).cast("double") *
      (col("__n0") - col("tie_y_pairs")).cast("double")
    val tau = (col("n_conc") - col("n_disc")).cast("double") / sqrt(denom)
    joined.select(col("__gk").as("group"), col("n_points"),
      col("n_conc"), col("n_disc"),
      col("tie_x_pairs"), col("tie_y_pairs"),
      when(col("n_points") >= 2L && denom > lit(0.0),
        floor(tau * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("tau_micro"))
  }

  /** Friedman test (Friedman 1937) — the k-treatment PAIRED rank test,
   * completing the family's 2×2: Mann–Whitney (two arms, independent),
   * Kruskal–Wallis (k arms, independent), Wilcoxon signed-rank (two
   * treatments, paired) — and this, k treatments ranked WITHIN each
   * block (user, day, site), "did any treatment consistently rank
   * higher", with block effects cancelled by construction.
   *
   * Exact moments, one double at the end: per-block midranks on the ×2
   * integer scale (r2 = 2·cum − c + 1 over the block's value-grain
   * counts — the cumulative partitions BY BLOCK, the
   * [[graft.ext.Profile.ksTwoSampleBy]] posture, so there is no global
   * single-partition sweep at any block count); per-treatment rank sums
   * R2_j and the cell square sum Σr2² are exact BIGINTs, and the
   * tie-corrected statistic (Conover's form)
   *   Q = (k−1)·(ΣR_j² − n²k(k+1)²/4) / (Σr² − nk(k+1)²/4)
   * becomes, on the ×2 scale where every term is ×4,
   *   Q = (k−1)·(ΣR2_j² − n²k(k+1)²) / (S2 − nk(k+1)²)
   * — an exact integer ratio both engines agree on term-for-term; the
   * artifact carries q_num/q_den as BIGINTs beside the micro readout.
   * Ties-free this reduces to the textbook 12/(nk(k+1))·ΣR_j² − 3n(k+1).
   *
   * Contract, loud: COMPLETE blocks only (every block exactly one
   * observation of every treatment — assert, not silent skip), k ≤ 100,
   * n_blocks ≤ 1e6, AND the joint product bound
   * n² · k(k+1)(k−1)² ≤ 3·(2^63−1): the box alone bounds
   * ΣR2_j² ≤ 4k³n² but q_num multiplies the bracket by (k−1), and the
   * bracket's true maximum (consistent tie-free rankings — ties only
   * shrink per-block rank spread) is n²k(k+1)(k−1)/3, so q_num peaks at
   * exactly n²·k(k+1)(k−1)²/3 — past BIGINT at k = 100 once
   * n_blocks ≳ 5.3e5, which the joint gate refuses loudly. Under both
   * gates the largest intermediate, ΣR2_j² ≤ 2n²k(k+1)(2k+1)/3
   * ≤ ~1.36e18 at (k, n) = (100, 1e6), stays inside BIGINT. The χ²_{k−1}
   * readout is the large-sample approximation — `approx_ok` (BIGINT 1/0)
   * = 1 iff n_blocks ≥ 10 (Friedman 1937's exact small-n tables exist
   * because the χ² read is unsafe below that), the [[kruskalWallis]]/
   * [[wilcoxonSignedRank]] regime-flag convention. Output 1 row:
   * (n_blocks, k_treatments, q_num, q_den, q_micro — NULL when every
   * block is internally all-tied — approx_ok). */
  def friedman(df: DataFrame, blockCol: String, treatCol: String,
      valCol: String): DataFrame = {
    val (kAll, cells) =
      friedmanRankedCells(df, blockCol, treatCol, valCol, "friedman")
    val byTreat = cells.groupBy("__j").agg(sum("__r2").as("__s2j"))
      .agg(coalesce(sum(col("__s2j") * col("__s2j")), lit(0L))
        .as("__sr2sq"))
    val sq = cells.agg(coalesce(sum(col("__r2") * col("__r2")), lit(0L))
      .as("__s2"))
    kAll.crossJoin(byTreat).crossJoin(sq)
      .withColumn("q_num", (col("k_treatments") - lit(1L)) *
        (col("__sr2sq") - col("n_blocks") * col("n_blocks") *
          col("k_treatments") * (col("k_treatments") + lit(1L)) *
          (col("k_treatments") + lit(1L))))
      .withColumn("q_den", col("__s2") - col("n_blocks") *
        col("k_treatments") * (col("k_treatments") + lit(1L)) *
        (col("k_treatments") + lit(1L)))
      .select(col("n_blocks"), col("k_treatments"), col("q_num"),
        col("q_den"),
        when(col("q_den") > 0L,
          floor(col("q_num").cast("double") / col("q_den").cast("double")
            * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(null).cast("long")).as("q_micro"),
        when(col("n_blocks") >= 10L, lit(1L)).otherwise(lit(0L))
          .as("approx_ok"))
  }

  /** THE complete-block rank machinery shared by [[friedman]] and
   * [[nemenyi]] — one copy of the contract and the per-block midranks
   * so the omnibus test and its post-hoc cannot drift: null-dropped
   * (block, treatment, value) at string/long grain, the loud
   * complete-block assert at ROW grain (row count = k·n), the k ≤ 100 /
   * n ≤ 1e6 box, the joint product bound n²·k(k+1)(k−1)² ≤ 3·(2^63−1)
   * (the exact peak of Friedman's q_num under consistent rankings — see
   * [[friedman]]'s envelope derivation), the CELL-grain dup assert, and
   * ×2-scale midranks from a BY-BLOCK partitioned cumulative (no global
   * single-partition sweep at any block count). Returns
   * (gated 1-row (n_blocks, k_treatments),
   *  cells (__b, __j, __r2) riding the cell-grain gate). */
  private def friedmanRankedCells(df: DataFrame, blockCol: String,
      treatCol: String, valCol: String, opName: String)
      : (DataFrame, DataFrame) = {
    val d = df.filter(col(blockCol).isNotNull && col(treatCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(blockCol).cast("string").as("__b"),
        col(treatCol).cast("string").as("__j"),
        col(valCol).cast("long").as("__v"))
    val kAll = d.agg(countDistinct("__j").as("k_treatments"),
        count(lit(1)).as("__nr"), countDistinct("__b").as("n_blocks"))
      .withColumn("__g1", assert_true(
        coalesce(col("__nr") ===
          col("k_treatments") * col("n_blocks"), lit(true)),
        lit(s"$opName: blocks must be COMPLETE — every block exactly " +
          "one observation per treatment (complete-block contract; " +
          "fill or drop incomplete blocks explicitly)")))
      .where(col("__g1").isNull)
      .withColumn("__g2", assert_true(
        coalesce(col("k_treatments") <= 100L &&
          col("n_blocks") <= 1000000L, lit(true)),
        lit(s"$opName: k > 100 or blocks > 1e6 — rank moments would " +
          "leave BIGINT (bounded-moment contract); sample the audit " +
          "slice")))
      .where(col("__g2").isNull)
      // Joint product bound (r13 ADVICE): the k/n box above bounds
      // ΣR2_j² ≤ 4k³n² but misses q_num's ×(k−1) multiplication — with
      // consistent tie-free rankings ΣR2_j² peaks at 2n²k(k+1)(2k+1)/3
      // (ties only pull the per-block rank spread toward its mean, and
      // Σ of squares is convex, so the untied extreme IS the maximum),
      // making q_num's exact peak n²·k(k+1)(k−1)²/3 — past BIGINT at
      // k = 100 once n_blocks ≳ 5.3e5. Gate n² against
      // (maxLong div k(k+1)(k−1)²)·3 ≤ 3·maxLong/X (conservative);
      // k is clamped to ≤ 101 inside X so the gate's own arithmetic
      // cannot overflow even on inputs __g2 refuses, and k ≤ 1 (where
      // q_num = 0 identically) passes trivially.
      .withColumn("__kc", least(col("k_treatments"), lit(101L)))
      .withColumn("__g3", assert_true(
        col("k_treatments") <= 1L ||
          col("n_blocks") * col("n_blocks") <=
            expr("(9223372036854775807L div (__kc * (__kc + 1L) * " +
              "(__kc - 1L) * (__kc - 1L))) * 3L"),
        lit(s"$opName: n_blocks² · k(k+1)(k−1)² exceeds 3·(2^63−1) — " +
          "q_num would leave BIGINT at this (k, n_blocks) " +
          "(bounded-moment contract); sample the audit slice")))
      .where(col("__g3").isNull).select("n_blocks", "k_treatments")
    // completeness at CELL grain too: k·n row-count equality above can't
    // see a (dup cell + missing cell) swap — assert max cell count == 1
    val cellsOk = d.groupBy("__b", "__j").agg(count(lit(1)).as("__c"))
      .agg(coalesce(max("__c"), lit(1L)).as("__mx"))
      .withColumn("__g", assert_true(col("__mx") <= 1L,
        lit(s"$opName: a (block, treatment) cell holds more than one " +
          "observation (complete-block contract; pre-aggregate cells)")))
      .where(col("__g").isNull).select(lit(1).as("__ok"))
    val bc = d.groupBy("__b", "__v").agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__b")
      .orderBy("__v")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val mr = bc.withColumn("cum", sum("__c").over(w))
      .select(col("__b"), col("__v"),
        (lit(2L) * col("cum") - col("__c") + lit(1L)).as("__r2"))
    val cells = d.join(mr, Seq("__b", "__v"))
      .crossJoin(broadcast(cellsOk))
    (kAll, cells)
  }

  /** Nemenyi post-hoc (Nemenyi 1963) over [[friedman]]'s per-treatment
   * rank sums — the "WHICH pairs differ" readout after the omnibus
   * "do ANY treatments differ": for every unordered treatment pair, the
   * studentized-range-scale statistic
   *   q = (R̄_a − R̄_b) / √(k(k+1)/(12n))
   * that Demšar 2006 popularized for classifier comparison (|q| is
   * compared against q_{α,k,∞}; the critical value is the caller's
   * table lookup — the engine ships the exact statistic, not a
   * p-value). A k²-row relation off the aggregates friedman already
   * computes — same scan, same midranks, no new corpus pass.
   *
   * Exactness: rides [[friedmanRankedCells]] (one copy of the
   * complete-block contract, the k/n box, the joint product bound, and
   * the ×2-scale by-block midranks), so r2_sum_a/b and
   * diff2 = R2_a − R2_b are exact BIGINTs (|diff2| ≤ 2nk ≤ 2e8 — far
   * inside BIGINT under the gates). With R̄ = R2/(2n) the statistic is
   * q = diff2 · √(3/(n·k(k+1))) — ONE fixed-shape double whose integer
   * factors (diff2, n·k(k+1) ≤ ~1.01e10) are all exactly representable
   * < 2^53, micro-quantized half-up. `approx_ok` carries friedman's
   * n_blocks ≥ 10 regime flag (the q_{α,k,∞} read is the same
   * large-sample approximation as the omnibus χ²).
   *
   * Output: one row per pair with treat_a < treat_b (string order),
   * (treat_a, treat_b, n_blocks, k_treatments, r2_sum_a, r2_sum_b,
   * diff2, q_micro, approx_ok); empty when k < 2 or the input is
   * empty. */
  def nemenyi(df: DataFrame, blockCol: String, treatCol: String,
      valCol: String): DataFrame = {
    val (kAll, cells) =
      friedmanRankedCells(df, blockCol, treatCol, valCol, "nemenyi")
    val byTreat = cells.groupBy("__j").agg(sum("__r2").as("__s2j"))
    val pairs = byTreat
      .select(col("__j").as("treat_a"), col("__s2j").as("r2_sum_a"))
      .join(byTreat
          .select(col("__j").as("treat_b"), col("__s2j").as("r2_sum_b")),
        col("treat_a") < col("treat_b"))
      .crossJoin(broadcast(kAll))
    val nD = col("n_blocks").cast("double")
    val kD = col("k_treatments").cast("double")
    val q = col("diff2").cast("double") *
      sqrt(lit(3.0) / (nD * kD * (kD + lit(1.0))))
    pairs.withColumn("diff2", col("r2_sum_a") - col("r2_sum_b"))
      .select(col("treat_a"), col("treat_b"), col("n_blocks"),
        col("k_treatments"), col("r2_sum_a"), col("r2_sum_b"),
        col("diff2"),
        when(col("n_blocks") >= 1L,
          floor(q * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(null).cast("long")).as("q_micro"),
        when(col("n_blocks") >= 10L, lit(1L)).otherwise(lit(0L))
          .as("approx_ok"))
  }

  /** Cochran's Q test (Cochran 1950) — the BINARY corner of the paired
   * k-treatment family: with every (block, treatment) cell a 0/1
   * outcome (converted, passed, flagged), "do ANY treatments differ in
   * success rate with block effects cancelled" — McNemar's k-treatment
   * generalization, and exactly what [[friedman]] degenerates to on
   * binary data.
   *
   * Fully exact integer statistic — no doubles anywhere in the moments:
   * with column (treatment) totals C_j, row (block) totals R_i and
   * grand total T = ΣC_j = ΣR_i,
   *   Q = (k−1)·(k·ΣC_j² − T²) / (k·T − ΣR_i²)
   * — numerator ≥ 0 by Cauchy–Schwarz, denominator = ΣR_i(k−R_i) ≥ 0,
   * both exact BIGINTs the artifact carries beside the micro readout.
   *
   * Contract, loud: values must be EXACTLY 0 or 1 — asserted PER ROW
   * (a silent !=0→1 coercion would fabricate successes; the
   * refuse-don't-wrap convention applied to domain, not overflow);
   * COMPLETE blocks at row and cell grain (the [[friedman]] asserts);
   * k ≤ 100, n_blocks ≤ 1e6. No joint product gate is needed: the box
   * alone bounds q_num ≤ (k−1)·k²n² ≤ 9.9e17 and every intermediate
   * (ΣC_j² ≤ kn² ≤ 1e14, T² ≤ 1e16, ΣR_i² ≤ nk² ≤ 1e10) far inside
   * BIGINT. `approx_ok` (BIGINT 1/0) = 1 iff n·k ≥ 24 (Tate & Brown
   * 1970's adequacy rule for the χ²_{k−1} read — the statistic stays
   * exact either way). Output 1 row: (n_blocks, k_treatments, t_total,
   * q_num, q_den, q_micro — NULL when q_den = 0, i.e. every block is
   * all-0 or all-1 — approx_ok). */
  def cochranQ(df: DataFrame, blockCol: String, treatCol: String,
      valCol: String): DataFrame = {
    val d = df.filter(col(blockCol).isNotNull && col(treatCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(blockCol).cast("string").as("__b"),
        col(treatCol).cast("string").as("__j"),
        col(valCol).cast("long").as("__v"))
      .withColumn("__g", assert_true(
        col("__v") === 0L || col("__v") === 1L,
        lit("cochranQ: values must be binary 0/1 — a non-binary " +
          "outcome would silently fabricate successes " +
          "(binary-outcome contract; threshold upstream explicitly)")))
      .where(col("__g").isNull).drop("__g")
    val kAll = d.agg(countDistinct("__j").as("k_treatments"),
        count(lit(1)).as("__nr"), countDistinct("__b").as("n_blocks"))
      .withColumn("__g1", assert_true(
        coalesce(col("__nr") ===
          col("k_treatments") * col("n_blocks"), lit(true)),
        lit("cochranQ: blocks must be COMPLETE — every block exactly " +
          "one observation per treatment (complete-block contract; " +
          "fill or drop incomplete blocks explicitly)")))
      .where(col("__g1").isNull)
      .withColumn("__g2", assert_true(
        coalesce(col("k_treatments") <= 100L &&
          col("n_blocks") <= 1000000L, lit(true)),
        lit("cochranQ: k > 100 or blocks > 1e6 — moments would leave " +
          "the documented envelope (bounded-moment contract); sample " +
          "the audit slice")))
      .where(col("__g2").isNull).select("n_blocks", "k_treatments")
    val cellsOk = d.groupBy("__b", "__j").agg(count(lit(1)).as("__c"))
      .agg(coalesce(max("__c"), lit(1L)).as("__mx"))
      .withColumn("__g", assert_true(col("__mx") <= 1L,
        lit("cochranQ: a (block, treatment) cell holds more than one " +
          "observation (complete-block contract; pre-aggregate cells)")))
      .where(col("__g").isNull).select(lit(1).as("__ok"))
    val colSums = d.groupBy("__j").agg(sum("__v").as("__cj"))
      .agg(coalesce(sum(col("__cj") * col("__cj")), lit(0L)).as("__sc2"),
        coalesce(sum("__cj"), lit(0L)).as("t_total"))
    val rowSums = d.groupBy("__b").agg(sum("__v").as("__ri"))
      .agg(coalesce(sum(col("__ri") * col("__ri")), lit(0L)).as("__sr2"))
    kAll.crossJoin(colSums).crossJoin(rowSums)
      .crossJoin(broadcast(cellsOk))
      .withColumn("q_num", (col("k_treatments") - lit(1L)) *
        (col("k_treatments") * col("__sc2") -
          col("t_total") * col("t_total")))
      .withColumn("q_den", col("k_treatments") * col("t_total") -
        col("__sr2"))
      .select(col("n_blocks"), col("k_treatments"), col("t_total"),
        col("q_num"), col("q_den"),
        when(col("q_den") > 0L,
          floor(col("q_num").cast("double") / col("q_den").cast("double")
            * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(null).cast("long")).as("q_micro"),
        when(col("n_blocks") * col("k_treatments") >= 24L, lit(1L))
          .otherwise(lit(0L)).as("approx_ok"))
  }

  /** Page's trend test (Page 1963) — the ORDERED-alternative member of
   * the paired k-treatment family: [[friedman]] asks "do ANY treatments
   * differ" and is blind to direction; Page asks "do the treatments
   * trend in THIS hypothesized order" (dose levels, model sizes,
   * curriculum stages) and concentrates all its power on the monotone
   * alternative,
   *   L = Σ_j pos_j · R_j
   * over the same per-block (mid)ranks. The hypothesized order is the
   * LEXICAL treatment order — encode the hypothesis in the labels
   * (`1_ctrl`, `2_low`, `3_high`), the same caller-owns-encoding
   * contract as the family's string group keys.
   *
   * Exactness: rides [[friedmanRankedCells]] (one copy of the
   * complete-block contract, the k/n box, the joint product bound, and
   * the ×2-scale by-block midranks), so l2 = Σ pos_j·R2_j (DOUBLED
   * Page L, ≤ n·k²(k+1) ≤ ~1e12 under the gates) and its null mean
   * e_l2 = n·k(k+1)²/2 (k(k+1) even ⇒ exact integer) are exact
   * BIGINTs. The z readout uses Page's null variance on the ×2 scale,
   * Var(L2) = n·k²(k+1)(k²−1)/36, as ONE fixed-shape double over the
   * exact integers, micro-quantized half-up — NULL when k < 2 or
   * n = 0. That variance is the NO-TIES form (the standard Page
   * statistic); `ties_present` (exact BIGINT 1/0 — any (block, value)
   * cell with multiplicity > 1) flags when midranks make the z an
   * approximation, the [[kruskalWallis]] honesty convention.
   * `approx_ok` = 1 iff n_blocks ≥ 10 (Page 1963's exact tables cover
   * the small-n regime), the family's regime flag. Output 1 row:
   * (n_blocks, k_treatments, l2, e_l2, ties_present, z_micro,
   * approx_ok). */
  def pageTrend(df: DataFrame, blockCol: String, treatCol: String,
      valCol: String): DataFrame = {
    val (kAll, cells) =
      friedmanRankedCells(df, blockCol, treatCol, valCol, "pageTrend")
    val ordW = org.apache.spark.sql.expressions.Window.orderBy("__j")
    // k ≤ 100 rows by the gate: the single-partition rank window is a
    // treatment-count-sized relation, never data-sized
    val lsum = cells.groupBy("__j").agg(sum("__r2").as("__s2j"))
      .withColumn("__pos", row_number().over(ordW).cast("long"))
      .agg(coalesce(sum(col("__pos") * col("__s2j")), lit(0L)).as("l2"))
    val ties = df.filter(col(blockCol).isNotNull &&
        col(treatCol).isNotNull && col(valCol).isNotNull)
      .select(col(blockCol).cast("string").as("__b"),
        col(valCol).cast("long").as("__v"))
      .groupBy("__b", "__v").agg(count(lit(1)).as("__c"))
      .agg(when(coalesce(max("__c"), lit(0L)) > 1L, lit(1L))
        .otherwise(lit(0L)).as("ties_present"))
    val nD = col("n_blocks").cast("double")
    val kD = col("k_treatments").cast("double")
    val varL2 = nD * kD * kD * (kD + lit(1.0)) *
      (kD * kD - lit(1.0)) / lit(36.0)
    val z = (col("l2") - col("e_l2")).cast("double") / sqrt(varL2)
    kAll.crossJoin(lsum).crossJoin(broadcast(ties))
      .withColumn("e_l2", expr("(n_blocks * k_treatments * " +
        "(k_treatments + 1) * (k_treatments + 1)) div 2"))
      .select(col("n_blocks"), col("k_treatments"), col("l2"),
        col("e_l2"), col("ties_present"),
        when(col("k_treatments") >= 2L && col("n_blocks") >= 1L,
          floor(z * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(null).cast("long")).as("z_micro"),
        when(col("n_blocks") >= 10L, lit(1L)).otherwise(lit(0L))
          .as("approx_ok"))
  }

  /** Kruskal–Wallis H test (Kruskal & Wallis 1952) — the k-group
   * extension of Mann–Whitney's two arms: "do ANY of these groups'
   * value distributions differ", rank-based so outliers and
   * non-normality don't poison it (the one-way-ANOVA question the
   * experiment family answers without ANOVA's assumptions).
   *
   * Exact moments, fixed-shape doubles: global ×2-integer midranks
   * (r2 = 2·cum − c + 1, the [[spearman]] convention) via the shared
   * bounded cumulative; per-group n_g and rank sums S2_g are exact
   * BIGINTs; the tie term Σ(t³ − t) is an exact BIGINT. H needs
   * Σ_g S_g²/n_g — a cross-group DOUBLE sum, which is order-dependent,
   * so it folds LEFT over the group relation sorted by group key
   * (`array_sort(collect_list(...))` + `aggregate`), replaying as
   * DuckDB's in-aggregate `ORDER BY` — one documented deterministic
   * summation order on both engines, never a parallel-reduction race.
   * With S_g = S2_g/2: H = 3·Σ(S2_g²/n_g)/(N(N+1)) − 3(N+1), then the
   * standard tie correction H/(1 − Σ(t³−t)/(N³−N)).
   *
   * Bounds, loud: N ≤ 1e6 (the spearman audit-slice envelope — rank
   * moments stay exact BIGINTs) and value grain rides
   * [[graft.ext.Profile.boundedCumCounts]]. The group relation is
   * k rows (one per group) — collect_list state is k-bounded, never
   * corpus-sized.
   *
   * Approximation regime, flagged loudly: H's χ²_{k−1} reference
   * distribution is the LARGE-SAMPLE approximation (Kruskal & Wallis
   * 1952 tabulate exact small-sample critical values precisely because
   * the χ² read is unsafe there); the classic rule is every group
   * n_g ≥ 5. `approx_ok` (BIGINT 1/0) carries that regime check so a
   * 3-row audit slice cannot silently read as significant — the H value
   * itself stays exact either way (it is a statistic, not a p-value).
   * Output 1 row: (n, k_groups, tie_sum, h_micro, h_tie_micro — NULL
   * when every value ties or n < 2 — approx_ok = 1 iff k_groups ≥ 2
   * and min group size ≥ 5). */
  def kruskalWallis(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val d = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(valCol).cast("long").as("__v"))
    val mr = graft.ext.Profile.boundedCumCounts(
        d.groupBy("__v").agg(count(lit(1)).as("__c")),
        "__v", "__c", 1000000L,
        "kruskalWallis: more than 1e6 distinct values — rank moments " +
          "would leave the exact envelope (bounded-grain contract)")
      .select(col("__v"),
        (lit(2L) * col("cum") - col("__c") + lit(1L)).as("__r2"),
        (col("__c") * col("__c") * col("__c") - col("__c")).as("__t3"))
    val sg = d.join(mr.select("__v", "__r2"), "__v")
      .groupBy("__g")
      .agg(count(lit(1)).as("__ng"), sum("__r2").as("__s2"))
    // Both 1-row relations coalesce their sums: on an EMPTY (or
    // all-NULL) input, sum over zero rows is NULL and assert_true(NULL)
    // would crash with the (wrong) 1e6-bound message instead of the
    // documented NULL-valued output row.
    val tie = mr.agg(coalesce(sum("__t3"), lit(0L)).as("tie_sum"))
    val agg = sg.agg(coalesce(sum("__ng"), lit(0L)).as("n"),
        count(lit(1)).as("k_groups"), min("__ng").as("__nmin"),
        array_sort(collect_list(struct(col("__g"), col("__s2"),
          col("__ng")))).as("__a"))
      .withColumn("__gd", assert_true(col("n") <= 1000000L,
        lit("kruskalWallis: row count exceeds 1e6 — rank moments would " +
          "leave BIGINT (bounded-moment contract); sample the audit " +
          "slice")))
      .where(col("__gd").isNull)
      .withColumn("__ssq", aggregate(col("__a"), lit(0.0),
        (acc, x) => acc + x.getField("__s2").cast("double") *
          x.getField("__s2").cast("double") /
          x.getField("__ng").cast("double")))
      .crossJoin(tie)
    val nD = col("n").cast("double")
    val h = lit(3.0) * col("__ssq") / (nD * (nD + lit(1.0))) -
      lit(3.0) * (nD + lit(1.0))
    val corr = lit(1.0) - col("tie_sum").cast("double") /
      (nD * nD * nD - nD)
    agg.select(col("n"), col("k_groups"), col("tie_sum"),
      when(col("n") >= 2L,
        floor(h * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("h_micro"),
      when(col("n") >= 2L && corr > lit(0.0),
        floor(h / corr * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("h_tie_micro"),
      when(col("k_groups") >= 2L && col("__nmin") >= 5L, lit(1L))
        .otherwise(lit(0L)).as("approx_ok"))
  }

  /** Jonckheere–Terpstra trend test (Jonckheere 1954; Terpstra 1952) —
   * the ORDERED-alternative member of the INDEPENDENT k-group family,
   * completing the rank-test 2×3 grid: MW/Wilcoxon (two arms),
   * KW/Friedman (k arms, any alternative), this/[[pageTrend]] (k arms,
   * MONOTONE alternative) — independent × paired. "Does the metric
   * increase across dose levels" concentrates all power on the ordered
   * hypothesis KW spreads over every permutation. The hypothesized
   * order is the LEXICAL group order (the [[pageTrend]] caller-encodes-
   * the-hypothesis contract: label groups `1_ctrl`, `2_low`, ...).
   *
   * Exactness: J = Σ_{a<b} U_ab over ordered group pairs, computed with
   * NO pair explosion: on the completed (value × group) grid, per-cell
   * `below_g(v)` (that group's mass strictly below v, an exclusive
   * BY-GROUP window) and the exclusive BY-VALUE prefix over groups give
   *   gt = Σ_cells c_g(v) · Σ_{a<g} below_a(v),
   *   tie = Σ_cells c_g(v) · Σ_{a<g} c_a(v),
   * both exact BIGINTs, and j2 = 2·gt + tie is the DOUBLED J (the
   * family's ×2 tie convention). Null moments are exact integers:
   * e_j2 = (N² − Σn_g²) div 2 (always even), and the no-ties variance
   * numerator var18 = N²(2N+3) − Σn_g²(2n_g+3) with Var(J2) = var18/18
   * — the z is ONE fixed-shape double over exact BIGINTs,
   * `ties_present` (any merged value with total multiplicity > 1)
   * flags when that variance is an approximation (the [[pageTrend]]
   * honesty convention). `approx_ok` = 1 iff k ≥ 2 and every group
   * ≥ 8 (the standard normal-approximation floor for J).
   *
   * Scale posture: the grid is (merged distinct values) × (groups) —
   * `require(maxDistinct·maxGroups ≤ 1e7)` keeps it audit-slice-sized
   * by construction, both dims loudly gated, N ≤ 1e6 moment bound (so
   * every integer above stays far inside BIGINT). Output 1 row:
   * (n, k_groups, j2, e_j2, var18, ties_present, z_micro, approx_ok). */
  def jonckheereTerpstra(df: DataFrame, groupCol: String,
      valCol: String, maxDistinct: Long = 100000L,
      maxGroups: Long = 100L): DataFrame = {
    require(maxGroups >= 2, s"maxGroups must be >= 2, got $maxGroups")
    require(maxDistinct >= 1 && maxDistinct * maxGroups <= 10000000L,
      s"maxDistinct * maxGroups must be <= 1e7 (grid bound), got " +
        s"$maxDistinct * $maxGroups")
    val d = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(valCol).cast("long").as("__v"))
    val counts = d.groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
    val sizes = counts.groupBy("__g").agg(sum("__c").as("__ng"))
    val kAll = sizes
      .agg(coalesce(sum("__ng"), lit(0L)).as("n"),
        count(lit(1)).as("k_groups"),
        coalesce(min("__ng"), lit(0L)).as("__nmin"),
        coalesce(sum(col("__ng") * col("__ng")), lit(0L)).as("__sn2"),
        coalesce(sum(col("__ng") * col("__ng") *
          (lit(2L) * col("__ng") + lit(3L))), lit(0L)).as("__sn23"))
      .withColumn("__g1", assert_true(
        col("n") <= 1000000L && col("k_groups") <= maxGroups,
        lit(s"jonckheereTerpstra: rows > 1e6 or groups > $maxGroups — " +
          "pair moments would leave the documented envelope " +
          "(bounded-moment contract); sample the audit slice")))
      .where(col("__g1").isNull).drop("__g1")
    val vals = counts.select("__v").distinct()
    val nd = vals.agg(count(lit(1)).as("__nd"))
      .withColumn("__g2", assert_true(col("__nd") <= maxDistinct,
        lit(s"jonckheereTerpstra: more than $maxDistinct merged " +
          "distinct values — quantize coarser (bounded-grain " +
          "contract, see Profile.boundedCumCounts)")))
      .where(col("__g2").isNull).select(lit(1L).as("__ok"))
    // completed grid: every (value, group) cell, zero-count where
    // absent. BOTH dims ride their gated 1-row asserts (broadcast
    // build sides materialize — and refuse — BEFORE the cross
    // expands: the kendallTau gate-the-expansion posture), so an
    // over-bound value grain or group count cannot pay the grid cost.
    val gatedVals = vals.crossJoin(broadcast(nd)).drop("__ok")
    val gatedGroups = counts.select("__g").distinct()
      .crossJoin(broadcast(kAll.select(lit(1L).as("__okk"))))
      .drop("__okk")
    val grid = gatedVals.crossJoin(gatedGroups)
      .join(counts, Seq("__g", "__v"), "left")
      .select(col("__g"), col("__v"),
        coalesce(col("__c"), lit(0L)).as("__c"))
    val byG = org.apache.spark.sql.expressions.Window
      .partitionBy("__g").orderBy("__v")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val byV = org.apache.spark.sql.expressions.Window
      .partitionBy("__v").orderBy("__g")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cells = grid
      .withColumn("__below", coalesce(sum("__c").over(byG), lit(0L)))
      .withColumn("__sBelow", coalesce(sum("__below").over(byV), lit(0L)))
      .withColumn("__sTie", coalesce(sum("__c").over(byV), lit(0L)))
    val sums = cells
      .agg(coalesce(sum(col("__c") * col("__sBelow")), lit(0L)).as("__gt"),
        coalesce(sum(col("__c") * col("__sTie")), lit(0L)).as("__tie"))
    val ties = counts.groupBy("__v").agg(sum("__c").as("__cv"))
      .agg(when(coalesce(max("__cv"), lit(0L)) > 1L, lit(1L))
        .otherwise(lit(0L)).as("ties_present"))
    val j2 = lit(2L) * col("__gt") + col("__tie")
    val eJ2 = expr("(n * n - __sn2) div 2")
    val var18 = col("n") * col("n") * (lit(2L) * col("n") + lit(3L)) -
      col("__sn23")
    val z = (col("j2") - col("e_j2")).cast("double") /
      sqrt(col("var18").cast("double") / lit(18.0))
    kAll.crossJoin(sums).crossJoin(broadcast(ties))
      .withColumn("j2", j2).withColumn("e_j2", eJ2)
      .withColumn("var18", var18)
      .select(col("n"), col("k_groups"), col("j2"), col("e_j2"),
        col("var18"), col("ties_present"),
        when(col("k_groups") >= 2L && col("var18") > 0L,
          floor(z * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(null).cast("long")).as("z_micro"),
        when(col("k_groups") >= 2L && col("__nmin") >= 8L, lit(1L))
          .otherwise(lit(0L)).as("approx_ok"))
  }

  /** Wilcoxon signed-rank test (Wilcoxon 1945) — the PAIRED complement
   * of mannWhitney's independent arms: per unit a before/after (or
   * A/B-on-the-same-unit) pair, "did the distribution of within-unit
   * CHANGES shift from zero", rank-based so one whale's delta can't
   * buy the result.
   *
   * Convention (the standard reduced-sample form): zero differences
   * DROP (n counts nonzero pairs), |d| takes exact ×2-integer midranks
   * (r2 = 2·cum − c + 1, the [[spearman]]/[[kruskalWallis]] machinery),
   * `w2_pos` = Σ r2 over positive differences (an exact BIGINT, twice
   * the classic W⁺), tie term Σ(t³ − t) exact. The normal
   * approximation rides the ×2 scale end-to-end — E[W2⁺] = n(n+1)/2,
   * Var[W2⁺] = n(n+1)(2n+1)/6 − Σ(t³−t)/12 — as ONE fixed-shape double
   * expression micro-quantized; NULL (never NaN) when n < 1 (the
   * tie-corrected variance is strictly positive for any n ≥ 1, but the
   * guard stays in the expression so a future convention change cannot
   * surface a NaN).
   *
   * Bounds, loud: n ≤ 1e6 nonzero pairs, distinct-|d| grain via
   * [[graft.ext.Profile.boundedCumCounts]] (the spearman audit-slice
   * envelope), and |x|,|y| ≤ 2^62 − 1 (so y − x cannot wrap BIGINT —
   * the family's refuse-don't-wrap convention, matching
   * theilSen/ksTwoSample; asserted PER ROW strictly below the
   * subtraction so the documented refusal deterministically beats
   * ANSI's own overflow error, and on raw values, never abs, because
   * abs(Long.MinValue) itself wraps).
   *
   * Approximation regime, flagged loudly: the z readout is the
   * large-sample NORMAL approximation (Wilcoxon 1945's exact
   * small-sample tables exist precisely because it is unsafe below
   * n ≈ 10); `approx_ok` (BIGINT 1/0) = 1 iff n_nonzero ≥ 10, so a
   * 3-pair audit slice cannot silently read as significant. W2⁺ and
   * the tie term stay exact either way.
   *
   * Input at UNIT grain: one row per unit, two numeric columns (caller
   * owns quantization). Output 1 row:
   * (n_nonzero, w2_pos, tie_sum, z_micro, approx_ok). */
  def wilcoxonSignedRank(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val bnd = 4611686018427387903L // 2^62 − 1: |y − x| ≤ 2^63 − 2
    // The magnitude gate is PER ROW, asserted strictly below the
    // subtraction (a filter the projection pipelines after), not a
    // 1-row agg like the grain bounds: under ANSI the y − x overflow
    // itself throws, and an agg-side gate only RACES it (concurrent
    // stage materialization), so the documented message would win
    // nondeterministically. The row-level assert is one codegen'd long
    // comparison; the violating row hits it before its subtraction runs.
    val d0 = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .withColumn("__g", assert_true(
        col("__x") >= -bnd && col("__x") <= bnd &&
          col("__y") >= -bnd && col("__y") <= bnd,
        lit("wilcoxonSignedRank: a value's magnitude exceeds 2^62 − 1 " +
          "— y − x would wrap BIGINT and flip the difference sign " +
          "(bounded-moment contract); rescale the inputs")))
      .where(col("__g").isNull)
      .select((col("__y") - col("__x")).as("__d"))
      .filter(col("__d") =!= 0L)
      .select(col("__d"), abs(col("__d")).as("__a"))
    val mr = graft.ext.Profile.boundedCumCounts(
        d0.groupBy("__a").agg(count(lit(1)).as("__c")),
        "__a", "__c", 1000000L,
        "wilcoxonSignedRank: more than 1e6 distinct |d| values — rank " +
          "moments would leave the exact envelope (bounded-grain " +
          "contract)")
      .select(col("__a"),
        (lit(2L) * col("cum") - col("__c") + lit(1L)).as("__r2"),
        (col("__c") * col("__c") * col("__c") - col("__c")).as("__t3"))
    val tie = mr.agg(coalesce(sum("__t3"), lit(0L)).as("tie_sum"))
    val agg = d0.join(mr.select("__a", "__r2"), "__a")
      .agg(count(lit(1)).as("n_nonzero"),
        coalesce(sum(when(col("__d") > 0L, col("__r2"))
          .otherwise(lit(0L))), lit(0L)).as("w2_pos"))
      .withColumn("__g", assert_true(col("n_nonzero") <= 1000000L,
        lit("wilcoxonSignedRank: nonzero-pair count exceeds 1e6 — rank " +
          "moments would leave BIGINT (bounded-moment contract); " +
          "sample the audit slice")))
      .where(col("__g").isNull)
      .crossJoin(tie)
    val nD = col("n_nonzero").cast("double")
    val varW2 = nD * (nD + lit(1.0)) * (lit(2.0) * nD + lit(1.0)) /
      lit(6.0) - col("tie_sum").cast("double") / lit(12.0)
    val z = (col("w2_pos").cast("double") -
      nD * (nD + lit(1.0)) / lit(2.0)) / sqrt(varW2)
    agg.select(col("n_nonzero"), col("w2_pos"), col("tie_sum"),
      when(col("n_nonzero") >= 1L && varW2 > lit(0.0),
        floor(z * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("z_micro"),
      when(col("n_nonzero") >= 10L, lit(1L)).otherwise(lit(0L))
        .as("approx_ok"))
  }

  def srmCheck(events: DataFrame, userCol: String = "user_id"): DataFrame =
    events.select(col(userCol).as("user")).distinct()
      .agg(
        sum(when(pmod(col("user"), lit(2L)) === 0L, 1L).otherwise(0L))
          .as("n_arm0"),
        sum(when(pmod(col("user"), lit(2L)) === 1L, 1L).otherwise(0L))
          .as("n_arm1"))
      .select(col("n_arm0"), col("n_arm1"),
        round(
          (col("n_arm0").cast("double") -
            (col("n_arm0") + col("n_arm1")).cast("double") / 2) *
          (col("n_arm0").cast("double") -
            (col("n_arm0") + col("n_arm1")).cast("double") / 2) /
            ((col("n_arm0") + col("n_arm1")).cast("double") / 2) * 2, 6)
          .as("chi2"))
      .withColumn("srm_flag", col("chi2") > lit(3.841))
}
