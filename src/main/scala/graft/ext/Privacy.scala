package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Differential-privacy release mechanisms (Dwork et al. 2006) over
 * grouped aggregates — the privacy layer a user-profile pipeline needs
 * before count panels leave the trust boundary (the reference's
 * dashboard ships RAW per-nationality/per-source counts,
 * `dashbord/dashbord.py:104-119`; k-anonymity auditing is already in
 * [[Profile.kAnonymityAudit]] — this is the release side).
 *
 * Noise is PSEUDO-random: Laplace via inverse-CDF over a uniform drawn
 * from a seeded md5 hash of the group key. That keeps every release
 * deterministic and byte-replayable (the audit property the whole gate
 * is built on: the DuckDB oracle replays the exact noise), while the
 * DP guarantee holds against any observer who cannot compute the hash —
 * i.e. ONLY while the release seed is secret, and a seed must never be
 * reused across releases of the same statistic (two releases with one
 * seed share noise and average it away). Operationally: draw a fresh
 * secret seed per release, store it with the release audit record.
 *
 * Scale posture: one hash-agg to the group grain, then per-GROUP-row
 * scalar noise arithmetic — output-sized compute, nothing corpus-sized,
 * no second pass. All fixed-point: the uniform is a 48-bit integer, the
 * Laplace quantile is micro-quantized at the same `floor(x·1e6 + 0.5)`
 * grid every log-domain operator in the repo uses, and the released
 * value stays in micro-units (pure integer addition — no negative
 * integer division, whose truncation direction is an engine quirk).
 */
object Privacy {

  /** 48-bit uniform for the noise draw — [0, 2^48), exact in BIGINT and
   * in a double's 53-bit mantissa. */
  private def u48(key: Column, seed: Long): Column =
    conv(substring(md5(concat(lit(s"dp:$seed:"), key)), 1, 12), 16, 10)
      .cast("long")

  /**
   * ε-DP noisy counts per group: `count + Laplace(Δ/ε)` with sensitivity
   * Δ = 1 (add/remove one row changes one group's count by one —
   * contribution-bound upstream if an entity can occupy many rows).
   *
   * Inverse-CDF: with u uniform on (−½, ½), noise = −(Δ/ε)·sgn(u)·
   * ln(1 − 2|u|). The uniform is `(u48 + ½)/2^48 − ½` — the half-step
   * offset keeps u strictly inside the open interval, so `ln` never sees
   * 0 and the quantile is finite for every group. Output per group:
   * `n_released_micro` (noisy count in micro-units) and `noise_micro` —
   * callers round/clamp as post-processing (DP is closed under it).
   *
   * `epsilonMicro` is ε in micro-units (1e6 = ε 1.0) so the noise scale
   * `1e6/ε_micro · 1e6` micro-units is itself exact integer input.
   */
  def noisyCounts(df: DataFrame, groupCols: Seq[String], epsilonMicro: Long,
      seed: Long): DataFrame = {
    require(groupCols.nonEmpty, "noisyCounts needs at least one group col")
    require(epsilonMicro >= 1, s"epsilonMicro must be >= 1, got $epsilonMicro")
    val key = concat_ws("", groupCols.map(col): _*)
    val counted = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    // u in (-1/2, 1/2): (u48 + 0.5)/2^48 - 0.5, exact double arithmetic
    val u = (u48(key, seed).cast("double") + lit(0.5)) /
      lit((1L << 48).toDouble) - lit(0.5)
    // |noise| = (1e6/eps) * -ln(1 - 2|u|)   [micro-units when *1e6]
    val scaleMicro = lit(1e12) / lit(epsilonMicro.toDouble)
    val mag = floor(-log(lit(1.0) - lit(2.0) * abs(u)) * scaleMicro +
      lit(0.5)).cast("long")
    val noise = when(u < 0, -col("__mag")).otherwise(col("__mag"))
    counted
      .withColumn("__mag", mag)
      .withColumn("noise_micro", noise)
      .withColumn("n_released_micro",
        col("n") * lit(1000000L) + col("noise_micro"))
      .drop("__mag", "n")
  }
}
