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
