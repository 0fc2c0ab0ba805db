package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality profiling: per-column null count, exact distinct count, and
 * min/max — the first thing a pipeline runs against a new 100-TB drop
 * before any transform trusts the data.
 *
 * Plan shape: one union branch per profiled column, each branch a
 * scan→aggregate with NO grouping key. That looks like "N passes" but is
 * the RIGHT distributed plan: parquet column pruning means each branch
 * reads exactly one column's pages (verified by the engine's PushdownSpec
 * posture), the branches run as independent stages, and exact
 * count(DISTINCT) per branch avoids the single-pass multi-distinct
 * `Expand` blowup (which multiplies the scan by the number of profiled
 * columns). Min/max aggregate on the NATIVE type and cast the scalar
 * result to string — casting before aggregating would give lexicographic
 * order on numbers.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).minus(count(col(c))).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("col_name"), col("n_null"), col("n_distinct"),
          col("min_s"), col("max_s"))
    }.reduce(_.unionByName(_))

  /** Population-stability-index (PSI) drift monitor: bucket a numeric
   * column into fixed-width bins on BOTH relations and score the
   * distribution shift `Σ_b (p_b − q_b)·ln(p_b/q_b)` — the standard
   * between-snapshot drift gate a pipeline runs when a new corpus drop
   * lands (PSI ≲ 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted: the usual
   * credit-scoring rule-of-thumb bands). Buckets are Laplace-smoothed
   * (`p_b = (c_b + 1)/(N + B)` with `B` = observed bucket count across
   * both sides), so one-sided buckets contribute finite, exact terms
   * instead of ±∞ — and every input to the log is a ratio of exact
   * integers, making the replay engine-independent. Per-bucket
   * contributions micro-quantize the moment they leave `ln` (the same
   * discipline as BM25's idf): totals are then exact BIGINT sums.
   *
   * Cost shape: one narrow scan + hash-agg per side at bucket grain
   * (buckets-sized output), a full-outer join of two bucket relations,
   * and a 1-row broadcast of the totals. Nothing corpus-sized survives
   * the aggregates. Output: (bucket, n_ref, n_cur, psi_micro, psi),
   * one row per observed bucket. */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    psiFromBuckets(
      bucketCounts(ref, valueCol, bucketWidth).toDF("bucket", "n_ref"),
      bucketCounts(cur, valueCol, bucketWidth).toDF("bucket", "n_cur"))
  }

  /** Fixed-width bucket histogram `(bucket, n)` of a numeric column — the
   * input grain of [[psiFromBuckets]]. Works unchanged as a STREAMING
   * aggregation (complete/update-mode `groupBy(bucket).count` — Spark
   * maintains the running counts as keyed state, so the per-batch cost
   * touches only the batch's buckets), which is how the streaming drift
   * monitor keeps "today's" histogram current without corpus replay. */
  def bucketCounts(df: DataFrame, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    df.select(floor(col(valueCol).cast("double") / bucketWidth)
        .cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** [[bucketCounts]] per key — the GROUPED histogram-maintenance seam
   * [[ksFromBucketsBy]]/per-segment PSI compose over: ONE keyed
   * hash-agg (`groupBy(group, bucket).count` — in streaming
   * complete/update mode this is the same keyed state as the global
   * form with one more key column), null-keyed rows dropped. Output:
   * (group as string, bucket, n) at distinct-(group, bucket) grain. */
  def bucketCountsBy(df: DataFrame, groupCol: String, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"),
        floor(col(valueCol).cast("double") / bucketWidth)
          .cast("long").as("bucket"))
      .groupBy("group", "bucket").agg(count(lit(1)).as("n"))
  }

  /** [[psiDrift]] over pre-bucketed histograms `(bucket, n_ref)` /
   * `(bucket, n_cur)` — the composition seam the streaming monitor uses
   * (reference histogram frozen once, current histogram maintained
   * incrementally as streaming state). */
  def psiFromBuckets(refBuckets: DataFrame,
      curBuckets: DataFrame): DataFrame = {
    val joined = refBuckets.join(curBuckets, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum("n_ref").as("__nr"), sum("n_cur").as("__nc"),
      count(lit(1)).as("__b"))
    val p = (col("n_ref") + lit(1L)).cast("double") /
      (col("__nr") + col("__b")).cast("double")
    val q = (col("n_cur") + lit(1L)).cast("double") /
      (col("__nc") + col("__b")).cast("double")
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        floor((p - q) * log(p / q) * lit(1e6) + lit(0.5)).cast("long")
          .as("psi_micro"))
      .withColumn("psi", round(col("psi_micro").cast("double") / 1e6, 6))
  }

  /** Jensen-Shannon divergence between two bucket histograms — the
   * SYMMETRIC, bounded (≤ ln 2) sibling of [[psiFromBuckets]] for the
   * same drift question: PSI blows up on one-sided buckets even
   * smoothed, JSD by construction cannot, so it is the saner number to
   * threshold when snapshots can gain or lose whole modes. Same Laplace
   * smoothing and totals as PSI (`p_b = (c_b + 1)/(N + B)`), M =
   * (P + Q)/2, per-bucket term `(p·ln(p/m) + q·ln(q/m))/2`
   * micro-quantized the moment it leaves `ln` (the PSI per-term
   * discipline) so the total is an exact BIGINT both engines agree on.
   * Same cost shape as PSI: two bucket-grain hash-aggs, a full-outer
   * bucket join, a 1-row broadcast.
   * Output: (bucket, n_ref, n_cur, jsd_micro), one row per bucket. */
  def jsdFromBuckets(refBuckets: DataFrame,
      curBuckets: DataFrame): DataFrame = {
    val joined = refBuckets.join(curBuckets, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum("n_ref").as("__nr"), sum("n_cur").as("__nc"),
      count(lit(1)).as("__b"))
    val p = (col("n_ref") + lit(1L)).cast("double") /
      (col("__nr") + col("__b")).cast("double")
    val q = (col("n_cur") + lit(1L)).cast("double") /
      (col("__nc") + col("__b")).cast("double")
    val m = (p + q) / lit(2.0)
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        floor((p * log(p / m) + q * log(q / m)) / lit(2.0) * lit(1e6) +
          lit(0.5)).cast("long").as("jsd_micro"))
  }

  /** [[jsdFromBuckets]] over fixed-width buckets of a numeric column on
   * both snapshots — the drop-in JSD drift monitor. */
  def jsdDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    jsdFromBuckets(
      bucketCounts(ref, valueCol, bucketWidth).toDF("bucket", "n_ref"),
      bucketCounts(cur, valueCol, bucketWidth).toDF("bucket", "n_cur"))
  }

  /** Two-sample Kolmogorov–Smirnov distance — the EXACT drift test the
   * bucket family can't be: PSI/JSD (dq20/dq21/dq28) quantize into
   * buckets first and answer "how much mass moved between buckets";
   * KS works at full value grain and answers "the largest ECDF gap
   * anywhere", the classic distribution-shift statistic. And unlike
   * the textbook double-valued form, this one is integer-EXACT end to
   * end: D = max_v |F_ref(v) − F_cur(v)| has numerator
   * max |cum_ref·n_cur − cum_cur·n_ref| — a BIGINT both engines agree
   * on bit-for-bit — and the readout is its exact ppm
   * `(d_num·1e6) div (n_ref·n_cur)`.
   *
   * Plan: two value-grain hash-aggs, a full-outer value join, ONE
   * single-partition cumulative over merged distinct values (the
   * boundedCumCounts posture with two running sums — loud `maxDistinct`
   * grain bound), a 1-row max-agg. Loud 2e6-rows-per-side bound keeps
   * `d_num·1e6` inside BIGINT (the rocAuc exact-ppm discipline); at
   * corpus scale, pre-quantize values (the caller owns quantization)
   * or sample the audit slice. Output 1 row:
   * (n_ref, n_cur, d_num, d_ppm — NULL when either side is empty). */
  def ksTwoSample(ref: DataFrame, cur: DataFrame, valCol: String,
      maxDistinct: Long = MaxOrderStatDistinct): DataFrame =
    ksFromCounts(
      ref.filter(col(valCol).isNotNull)
        .groupBy(col(valCol).cast("long").as("v"))
        .agg(count(lit(1)).as("cr")),
      cur.filter(col(valCol).isNotNull)
        .groupBy(col(valCol).cast("long").as("v"))
        .agg(count(lit(1)).as("cc")),
      maxDistinct, "ksTwoSample")

  /** [[ksTwoSample]] over pre-bucketed histograms `(bucket, n_ref)` /
   * `(bucket, n_cur)` — the composition seam the STREAMING drift
   * monitor uses, exactly like [[psiFromBuckets]]/[[jsdFromBuckets]]:
   * reference histogram frozen once, current histogram maintained
   * incrementally as streaming state ([[bucketCounts]] in
   * complete/update mode), and this readout is BUCKET-GRAIN KS — the
   * largest ECDF gap measured at bucket boundaries, identically
   * ksTwoSample on floor(v/width)-quantized values (documented as such
   * vs dq33's full value grain: quantization can only HIDE gap inside
   * a bucket, never invent one). Input grain: one row per distinct
   * bucket per side (the [[bucketCounts]] output — positive counts).
   * Output 1 row, same shape as [[ksTwoSample]]. */
  def ksFromBuckets(refBuckets: DataFrame, curBuckets: DataFrame,
      maxDistinct: Long = MaxOrderStatDistinct): DataFrame =
    ksFromCounts(
      refBuckets.select(col("bucket").cast("long").as("v"),
        col("n_ref").cast("long").as("cr")),
      curBuckets.select(col("bucket").cast("long").as("v"),
        col("n_cur").cast("long").as("cc")),
      maxDistinct, "ksFromBuckets")

  /** THE merged-cumulative ECDF kernel shared by every two-sample
   * ECDF-comparison statistic in the family — [[ksTwoSample]] (largest
   * gap), [[cvmTwoSample]] (mean squared gap), and
   * [[wassersteinTwoSample]] (area between the curves): full-outer-
   * merges two distinct-`v`-grain count relations `(v, cr)` / `(v, cc)`,
   * asserts the loud `maxDistinct` grain bound and the 2e6-rows-per-side
   * moment bound on the 1-row totals, and returns the merged rows with
   * both INCLUSIVE cumulative counts and the broadcast totals:
   * (v, cr, cc, cum_a, cum_b, na, nb). The scaled ECDF gap at any row
   * is the exact BIGINT `cum_a·nb − cum_b·na` (ECDF difference times
   * na·nb); each statistic is one aggregate over it. */
  private def mergedCumCounts(ca: DataFrame, cb: DataFrame,
      maxDistinct: Long, opName: String): DataFrame = {
    val m = ca.join(cb, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cc"), lit(0L)).as("cc"))
    // Coalesce the side totals: with BOTH inputs empty, sum over zero
    // rows is NULL and assert_true(NULL) would crash with the (wrong)
    // 2e6-bound message instead of the documented NULL-valued row.
    val tot = m.agg(coalesce(sum("cr"), lit(0L)).as("na"),
        coalesce(sum("cc"), lit(0L)).as("nb"),
        count(lit(1)).as("__nd"))
      .withColumn("__g", assert_true(col("__nd") <= maxDistinct,
        lit(s"$opName: more than $maxDistinct merged distinct " +
          "values — quantize coarser (bounded-grain contract, see " +
          "Profile.boundedCumCounts)")))
      .where(col("__g").isNull)
      .withColumn("__g2", assert_true(
        col("na") <= 2000000L && col("nb") <= 2000000L,
        lit(s"$opName: a side exceeds 2e6 rows — the statistic's " +
          "integer moments would leave the documented envelope " +
          "(bounded-moment contract); sample the audit slice")))
      .where(col("__g2").isNull).select("na", "nb")
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    m.crossJoin(broadcast(tot))
      .withColumn("cum_a", sum("cr").over(w))
      .withColumn("cum_b", sum("cc").over(w))
  }

  /** THE exact-KS readout over [[mergedCumCounts]], shared by
   * [[ksTwoSample]] (value-grain counts) and [[ksFromBuckets]]
   * (maintained bucket histograms). */
  private def ksFromCounts(ca: DataFrame, cb: DataFrame,
      maxDistinct: Long, opName: String): DataFrame =
    mergedCumCounts(ca, cb, maxDistinct, opName)
      .agg(max("na").as("n_ref"), max("nb").as("n_cur"),
        max(abs(col("cum_a") * col("nb") - col("cum_b") * col("na")))
          .as("d_num"))
      .select(col("n_ref"), col("n_cur"), col("d_num"),
        when(col("n_ref") > 0L && col("n_cur") > 0L,
          expr("(d_num * 1000000) div (n_ref * n_cur)"))
          .otherwise(lit(null).cast("long")).as("d_ppm"))

  /** Two-sample Cramér–von Mises statistic (Anderson 1962's two-sample
   * form) — the WHOLE-CURVE sibling of [[ksTwoSample]] on the same
   * merged-ECDF kernel: KS reads the single largest ECDF gap and is
   * famously blind to tail and spread differences that never produce
   * one big gap; CvM integrates the SQUARED gap over the combined
   * sample,
   *   T = n·m/(n+m)² · Σ_{x in both samples} (F_n(x) − G_m(x))²,
   * so many small systematic gaps accumulate. The complement makes
   * KS+CvM the standard drift pair (a shift moves both; a variance or
   * tail change moves CvM long before KS).
   *
   * Exactness: at distinct-value grain with gap numerator
   * d_v = cum_ref·m − cum_cur·n (the kernel's exact BIGINT),
   *   T = t_num / (n·m·(n+m)²),   t_num = Σ_v (cr_v + cc_v)·d_v².
   * Under the kernel's 2e6-per-side bound |d| ≤ n·m ≤ 4e12, so d² can
   * reach 1.6e25 — past BIGINT, and why t_num is summed as
   * DECIMAL(38,0): exact, order-independent, bounded by
   * (n+m)·(n·m)² ≤ 6.4e31 < 10³⁸ (both engines carry it exactly —
   * DuckDB sums to HUGEINT). The readout is ONE fixed-shape double off
   * the exact t_num (the [[graft.ext.Experiment.mannWhitney]]
   * discipline), micro-quantized half-up; the H0 5% critical value of
   * the limiting distribution is ≈ 0.461, i.e. t_micro ≈ 461000.
   * Same plan shape as KS: two value-grain hash-aggs, the kernel's
   * bounded single-partition cumulative, one 1-row agg. Output 1 row:
   * (n_ref, n_cur, n_distinct, t_micro — NULL when either side is
   * empty). */
  def cvmTwoSample(ref: DataFrame, cur: DataFrame, valCol: String,
      maxDistinct: Long = MaxOrderStatDistinct): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val d = (col("cum_a") * col("nb") - col("cum_b") * col("na"))
      .cast(dec)
    val agg = mergedCumCounts(
        ref.filter(col(valCol).isNotNull)
          .groupBy(col(valCol).cast("long").as("v"))
          .agg(count(lit(1)).as("cr")),
        cur.filter(col(valCol).isNotNull)
          .groupBy(col(valCol).cast("long").as("v"))
          .agg(count(lit(1)).as("cc")),
        maxDistinct, "cvmTwoSample")
      .agg(max("na").as("n_ref"), max("nb").as("n_cur"),
        count(lit(1)).as("n_distinct"),
        sum(d * d * (col("cr") + col("cc")).cast(dec)).as("__t"))
    val naD = col("n_ref").cast("double")
    val nbD = col("n_cur").cast("double")
    val t = col("__t").cast("double") * lit(1e6) /
      (naD * nbD * ((naD + nbD) * (naD + nbD)))
    agg.select(col("n_ref"), col("n_cur"), col("n_distinct"),
      when(col("n_ref") > 0L && col("n_cur") > 0L,
        floor(t + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("t_micro"))
  }

  /** Two-sample 1-Wasserstein (earth-mover) distance — the
   * MAGNITUDE-carrying member of the ECDF trio: KS says "the largest
   * gap", CvM says "the accumulated squared gap", both in probability
   * units; W₁ = ∫|F_ref − F_cur| dx is in VALUE units — "the mean
   * amount each unit of mass moved" — so a 3-cent price shift reads as
   * W₁ ≈ 3 regardless of sample size, the number a drift runbook can
   * threshold in domain terms.
   *
   * Exactness: over merged distinct values with gaps
   * g_i = v_{i+1} − v_i,
   *   W₁ = w_num / (n·m),   w_num = Σ_i |d_i| · g_i
   * with d_i the kernel's exact BIGINT scaled gap. |d| ≤ n·m ≤ 4e12
   * and g can span the full long range, so w_num (≤ n·m·range
   * ≤ 7.4e31) is summed as DECIMAL(38,0) — exact at ANY value range,
   * no range gate needed (the gap subtraction itself is decimal so
   * even v spanning the whole long line cannot wrap). The readout is
   * ONE fixed-shape double off the exact w_num, micro-quantized
   * half-up: w1_micro = micro-units of the value column. Same plan as
   * [[cvmTwoSample]] plus a `lead` over the same bounded ordering (one
   * sort serves both windows). Output 1 row:
   * (n_ref, n_cur, n_distinct, w1_micro — NULL when either side is
   * empty). */
  def wassersteinTwoSample(ref: DataFrame, cur: DataFrame,
      valCol: String, maxDistinct: Long = MaxOrderStatDistinct)
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ord = org.apache.spark.sql.expressions.Window.orderBy("v")
    val gap = lead(col("v").cast(dec), 1).over(ord) -
      col("v").cast(dec)
    val d = (col("cum_a") * col("nb") - col("cum_b") * col("na"))
      .cast(dec)
    val agg = mergedCumCounts(
        ref.filter(col(valCol).isNotNull)
          .groupBy(col(valCol).cast("long").as("v"))
          .agg(count(lit(1)).as("cr")),
        cur.filter(col(valCol).isNotNull)
          .groupBy(col(valCol).cast("long").as("v"))
          .agg(count(lit(1)).as("cc")),
        maxDistinct, "wassersteinTwoSample")
      .withColumn("__g", gap)
      // the last merged value has no successor (NULL gap) and carries
      // zero ECDF gap anyway (cum_a = na, cum_b = nb ⇒ d = 0); a NULL
      // term is skipped by sum, and coalesce keeps the single-distinct-
      // value input at its true W₁ of 0 instead of NULL
      .agg(max("na").as("n_ref"), max("nb").as("n_cur"),
        count(lit(1)).as("n_distinct"),
        coalesce(sum(when(col("__g").isNotNull, abs(d) * col("__g"))),
          lit(0).cast(dec)).as("__w"))
    val w1 = col("__w").cast("double") * lit(1e6) /
      (col("n_ref").cast("double") * col("n_cur").cast("double"))
    agg.select(col("n_ref"), col("n_cur"), col("n_distinct"),
      when(col("n_ref") > 0L && col("n_cur") > 0L,
        floor(w1 + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("w1_micro"))
  }

  /** GROUPED two-sample Kolmogorov–Smirnov — [[ksTwoSample]] per key,
   * the "WHICH segment drifted" readout every other drift statistic in
   * the family already has (PSI dq4, JSD dq21, qsketch dq28/dq31 all
   * compose per-key forms): one exact KS row per group, numerator the
   * same BIGINT cross-product both engines agree on bit-for-bit.
   *
   * This SCALES BETTER than the global form: the merged-value
   * cumulative partitions BY GROUP (`Window.partitionBy(group)
   * .orderBy(v)` — the [[graft.ext.Sketches.quantileSketchQuantilesBy]]
   * posture), so there is no global single-partition sweep at any group
   * count; the loud `maxDistinct` grain bound and the 2e6-rows-per-side
   * BIGINT bound apply PER GROUP (each is asserted on that group's
   * 1-row total, so a violating segment fails loudly while the job
   * shape stays per-group bounded). Groups present on only one side
   * still surface (full-outer on (group, value)) with a NULL `d_ppm`.
   * Output: (group as string, n_ref, n_cur, d_num, d_ppm — NULL when
   * that group is empty on either side). */
  def ksTwoSampleBy(ref: DataFrame, cur: DataFrame, groupCol: String,
      valCol: String, maxDistinct: Long = MaxOrderStatDistinct)
      : DataFrame = {
    def counts(df: DataFrame, out: String): DataFrame =
      df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
        .groupBy(col(groupCol).cast("string").as("g"),
          col(valCol).cast("long").as("v"))
        .agg(count(lit(1)).as(out))
    ksFromCountsBy(counts(ref, "cr"), counts(cur, "cc"), maxDistinct,
      "ksTwoSampleBy")
  }

  /** [[ksTwoSampleBy]] over pre-bucketed GROUPED histograms
   * `(group, bucket, n_ref)` / `(group, bucket, n_cur)` — the grouped
   * composition seam of [[ksFromBuckets]]: per-segment reference
   * histograms frozen once, per-segment current histograms maintained
   * as ONE streaming aggregate (`groupBy(group, bucket).count` in
   * complete/update mode — same keyed state, one more key column), and
   * this readout is per-group bucket-grain KS. Input grain: one row per
   * (group, bucket) per side. Output: one [[ksTwoSampleBy]]-shaped row
   * per group. */
  def ksFromBucketsBy(refBuckets: DataFrame, curBuckets: DataFrame,
      maxDistinct: Long = MaxOrderStatDistinct): DataFrame =
    ksFromCountsBy(
      refBuckets.select(col("group").cast("string").as("g"),
        col("bucket").cast("long").as("v"),
        col("n_ref").cast("long").as("cr")),
      curBuckets.select(col("group").cast("string").as("g"),
        col("bucket").cast("long").as("v"),
        col("n_cur").cast("long").as("cc")),
      maxDistinct, "ksFromBucketsBy")

  /** THE grouped exact-KS kernel shared by [[ksTwoSampleBy]] and
   * [[ksFromBucketsBy]]: inputs at distinct-(g, v) grain with positive
   * counts `cr` / `cc`. */
  /** Two-sample energy distance (Székely & Rizzo 2004) — the METRIC
   * member of the ECDF family: KS/CvM read probability gaps, W₁ reads
   * transported mass, energy distance
   *   D = 2·E|X−Y| − E|X−X'| − E|Y−Y'|
   * is a true metric between the distributions (0 iff identical),
   * rotation/shift-sensitive in exactly the way embedding-distribution
   * comparison wants, and the basis of the energy two-sample test. For
   * scalars every term is an ECDF integral —
   *   E|X−Y| = ∫ (F(1−G) + G(1−F)) dx,  E|X−X'| = 2∫ F(1−F) dx
   * — so all three ride ONE pass of [[mergedCumCounts]]: per merged
   * gap, exact integer cross-products `cum_a(nb−cum_b) + cum_b(na−cum_a)`
   * (and the within-sample twins) times the gap width, summed as
   * DECIMAL(38,0) (exact at any value range, the
   * [[wassersteinTwoSample]] discipline; DuckDB replays in HUGEINT).
   * The readout is ONE fixed-shape double over the three exact sums
   * and exact integer denominators,
   *   D = 2·axy/(na·nb) − axx/(na·na) − ayy/(nb·nb),
   * micro-quantized half-up, in VALUE units like W₁. The scalar
   * identity D = 2·∫(F−G)² dx (the Cramér distance, doubled) gives its
   * bounds: 0 ≤ D ≤ 2·W₁ (since (F−G)² ≤ |F−G|), with D → 2·W₁ as the
   * supports separate. NULL when either side is empty. Output 1 row:
   * (n_ref, n_cur, n_distinct, e_micro). */
  def energyDistance(ref: DataFrame, cur: DataFrame, valCol: String,
      maxDistinct: Long = MaxOrderStatDistinct): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ord = org.apache.spark.sql.expressions.Window.orderBy("v")
    val gap = lead(col("v").cast(dec), 1).over(ord) -
      col("v").cast(dec)
    def cross(x: Column, y: Column): Column = x.cast(dec) * y.cast(dec)
    val agg = mergedCumCounts(
        ref.filter(col(valCol).isNotNull)
          .groupBy(col(valCol).cast("long").as("v"))
          .agg(count(lit(1)).as("cr")),
        cur.filter(col(valCol).isNotNull)
          .groupBy(col(valCol).cast("long").as("v"))
          .agg(count(lit(1)).as("cc")),
        maxDistinct, "energyDistance")
      .withColumn("__gp", gap)
      .agg(max("na").as("n_ref"), max("nb").as("n_cur"),
        count(lit(1)).as("n_distinct"),
        coalesce(sum(when(col("__gp").isNotNull,
          (cross(col("cum_a"), col("nb") - col("cum_b")) +
            cross(col("cum_b"), col("na") - col("cum_a"))) *
            col("__gp"))), lit(0).cast(dec)).as("__xy"),
        coalesce(sum(when(col("__gp").isNotNull,
          cross(col("cum_a"), col("na") - col("cum_a")) *
            col("__gp"))), lit(0).cast(dec)).as("__xx"),
        coalesce(sum(when(col("__gp").isNotNull,
          cross(col("cum_b"), col("nb") - col("cum_b")) *
            col("__gp"))), lit(0).cast(dec)).as("__yy"))
    val naD = col("n_ref").cast("double")
    val nbD = col("n_cur").cast("double")
    val e = lit(2.0) * col("__xy").cast("double") / (naD * nbD) -
      lit(2.0) * col("__xx").cast("double") / (naD * naD) -
      lit(2.0) * col("__yy").cast("double") / (nbD * nbD)
    agg.select(col("n_ref"), col("n_cur"), col("n_distinct"),
      when(col("n_ref") > 0L && col("n_cur") > 0L,
        floor(e * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("e_micro"))
  }

  /** GROUPED sibling of [[mergedCumCounts]] — the per-key merged-ECDF
   * kernel shared by [[ksFromCountsBy]], [[cvmTwoSampleBy]] and
   * [[wassersteinTwoSampleBy]]: same merge/bounds/cumulative with
   * everything partitioned BY GROUP (no global single-partition sweep
   * at any group count; the loud grain + side bounds asserted on each
   * group's own total row). Returns
   * (g, v, cr, cc, cum_a, cum_b, na, nb). */
  private def mergedCumCountsBy(ca: DataFrame, cb: DataFrame,
      maxDistinct: Long, opName: String): DataFrame = {
    val m = ca.join(cb, Seq("g", "v"), "full_outer")
      .select(col("g"), col("v"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cc"), lit(0L)).as("cc"))
    // Per-group totals + loud per-group bounds: each group's row exists
    // (a group reaches here only with ≥ 1 merged value), so the sums are
    // never NULL — the empty-input hazard the GLOBAL form coalesces
    // against cannot arise at this grain.
    val tot = m.groupBy("g").agg(sum("cr").as("na"), sum("cc").as("nb"),
        count(lit(1)).as("__nd"))
      .withColumn("__g1", assert_true(col("__nd") <= maxDistinct,
        lit(s"$opName: a group exceeds $maxDistinct merged " +
          "distinct values — quantize coarser (bounded-grain contract, " +
          "see Profile.boundedCumCounts)")))
      .where(col("__g1").isNull)
      .withColumn("__g2", assert_true(
        col("na") <= 2000000L && col("nb") <= 2000000L,
        lit(s"$opName: a group's side exceeds 2e6 rows — the " +
          "statistic's integer moments would leave the documented " +
          "envelope (bounded-moment contract); sample the audit " +
          "slice")))
      .where(col("__g2").isNull).select("g", "na", "nb")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy("v")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    m.withColumn("cum_a", sum("cr").over(w))
      .withColumn("cum_b", sum("cc").over(w))
      .join(tot, "g")
  }

  private def ksFromCountsBy(ca: DataFrame, cb: DataFrame,
      maxDistinct: Long, opName: String): DataFrame =
    mergedCumCountsBy(ca, cb, maxDistinct, opName)
      .groupBy("g")
      .agg(max("na").as("n_ref"), max("nb").as("n_cur"),
        max(abs(col("cum_a") * col("nb") - col("cum_b") * col("na")))
          .as("d_num"))
      .select(col("g").as("group"), col("n_ref"), col("n_cur"),
        col("d_num"),
        when(col("n_ref") > 0L && col("n_cur") > 0L,
          expr("(d_num * 1000000) div (n_ref * n_cur)"))
          .otherwise(lit(null).cast("long")).as("d_ppm"))

  /** GROUPED Cramér–von Mises — [[cvmTwoSample]] per key, the "WHICH
   * segment's whole curve moved" readout beside [[ksTwoSampleBy]]'s
   * largest-gap one: a pooled CvM dilutes a one-segment spread change
   * by every stable segment's mass exactly as a pooled KS does. Same
   * DECIMAL(38,0)-exact t_num, same fixed-shape double readout, all
   * moments per group on the group-partitioned kernel (scales better
   * than the global form — no single-partition sweep). Groups present
   * on only one side surface with NULL t_micro. Output: one
   * [[cvmTwoSample]]-shaped row per group (group, n_ref, n_cur,
   * n_distinct, t_micro). */
  def cvmTwoSampleBy(ref: DataFrame, cur: DataFrame, groupCol: String,
      valCol: String, maxDistinct: Long = MaxOrderStatDistinct)
      : DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def counts(df: DataFrame, out: String): DataFrame =
      df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
        .groupBy(col(groupCol).cast("string").as("g"),
          col(valCol).cast("long").as("v"))
        .agg(count(lit(1)).as(out))
    val d = (col("cum_a") * col("nb") - col("cum_b") * col("na"))
      .cast(dec)
    val agg = mergedCumCountsBy(counts(ref, "cr"), counts(cur, "cc"),
        maxDistinct, "cvmTwoSampleBy")
      .groupBy("g")
      .agg(max("na").as("n_ref"), max("nb").as("n_cur"),
        count(lit(1)).as("n_distinct"),
        sum(d * d * (col("cr") + col("cc")).cast(dec)).as("__t"))
    val naD = col("n_ref").cast("double")
    val nbD = col("n_cur").cast("double")
    val t = col("__t").cast("double") * lit(1e6) /
      (naD * nbD * ((naD + nbD) * (naD + nbD)))
    agg.select(col("g").as("group"), col("n_ref"), col("n_cur"),
      col("n_distinct"),
      when(col("n_ref") > 0L && col("n_cur") > 0L,
        floor(t + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("t_micro"))
  }

  /** GROUPED 1-Wasserstein — [[wassersteinTwoSample]] per key: per
   * segment, "how many value units did this segment's mass move",
   * beside the grouped KS/CvM probability readouts. Same
   * DECIMAL(38,0)-exact w_num at any value range, the gap `lead`
   * partitioned BY GROUP on the same one sort as the cumulative.
   * Output: one row per group (group, n_ref, n_cur, n_distinct,
   * w1_micro — NULL when that group is empty on either side). */
  def wassersteinTwoSampleBy(ref: DataFrame, cur: DataFrame,
      groupCol: String, valCol: String,
      maxDistinct: Long = MaxOrderStatDistinct): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def counts(df: DataFrame, out: String): DataFrame =
      df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
        .groupBy(col(groupCol).cast("string").as("g"),
          col(valCol).cast("long").as("v"))
        .agg(count(lit(1)).as(out))
    val ord = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy("v")
    val gap = lead(col("v").cast(dec), 1).over(ord) -
      col("v").cast(dec)
    val d = (col("cum_a") * col("nb") - col("cum_b") * col("na"))
      .cast(dec)
    val agg = mergedCumCountsBy(counts(ref, "cr"), counts(cur, "cc"),
        maxDistinct, "wassersteinTwoSampleBy")
      .withColumn("__gp", gap)
      .groupBy("g")
      .agg(max("na").as("n_ref"), max("nb").as("n_cur"),
        count(lit(1)).as("n_distinct"),
        coalesce(sum(when(col("__gp").isNotNull, abs(d) * col("__gp"))),
          lit(0).cast(dec)).as("__w"))
    val w1 = col("__w").cast("double") * lit(1e6) /
      (col("n_ref").cast("double") * col("n_cur").cast("double"))
    agg.select(col("g").as("group"), col("n_ref"), col("n_cur"),
      col("n_distinct"),
      when(col("n_ref") > 0L && col("n_cur") > 0L,
        floor(w1 + lit(0.5)).cast("long"))
        .otherwise(lit(null).cast("long")).as("w1_micro"))
  }

  /** Join-fanout pre-flight audit: for an equi-join about to run, the
   * top-`topN` keys by OUTPUT contribution (`n_left · n_right`) — the
   * check that catches a multiplicative hot key BEFORE a 100-TB join
   * fans out (the d17/d19 bucket diagnostics' relational sibling, and
   * the number that decides whether [[graft.operators.Skew]]'s salting
   * is needed). Exact, not sampled: two keyed counts (each a partial-agg
   * hash-agg over one column), a count-grain join, and a
   * `TakeOrderedAndProject` cut — the audit costs two narrow scans
   * however large the join would have been. Output:
   * (key as string, n_left, n_right, n_out), ordered n_out DESC with key
   * ties ascending. */
  def joinFanout(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, topN: Int = 10): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val lc = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val rc = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    lc.join(rc, "key")
      .select(col("key").cast("string").as("key"), col("n_left"),
        col("n_right"),
        // DOUBLE product, not BIGINT: the catastrophic hot key this audit
        // exists to catch (two multi-billion-row sides) would overflow a
        // long and wrap NEGATIVE — sorting the worst key to the BOTTOM of
        // the ranking. Exact below 2^53, monotonic and engine-identical
        // above (both engines multiply the same exact longs in IEEE).
        (col("n_left").cast("double") * col("n_right").cast("double"))
          .as("n_out"))
      .orderBy(col("n_out").desc, col("key").asc)
      .limit(topN)
  }

  /** Functional-dependency audit: the `lhs` values that map to MORE than
   * one distinct `rhs` — violations of the expected `lhs → rhs`
   * dependency (a natural key that stopped being one, a denormalized
   * column that drifted). NULL counts as its own rhs value: the most
   * common real drift is values being LOST to null, and a bare
   * countDistinct (which ignores nulls) would report {X, NULL} as clean.
   * One hash-agg keyed by lhs; the violating-keys relation is at most
   * |distinct lhs| and usually tiny — exactly the audit you run before
   * trusting a join key at 100 TB. Output: (lhs_value as string, n_rhs). */
  def fdViolations(df: DataFrame, lhs: String, rhs: String): DataFrame =
    df.groupBy(col(lhs))
      .agg((countDistinct(col(rhs)) +
        max(when(col(rhs).isNull, 1L).otherwise(0L))).as("n_rhs"))
      .filter(col("n_rhs") > 1)
      .select(col(lhs).cast("string").as("lhs_value"), col("n_rhs"))

  /** Zone-map pruning audit — the number that PROVES a clustering layout
   * earns its write cost: for each candidate layout (a name + a total
   * ordering), rows land in simulated `fileRows`-row files in that
   * order, each file keeps per-column min/max (exactly the parquet
   * row-group / Delta file statistics a scan prunes on), and the audit
   * counts how many files a conjunctive range predicate could NOT skip.
   * `files_hit / n_files` is the scan fraction the layout buys — run it
   * on (natural, z-ordered) before committing a 100-TB rewrite (the
   * write side is [[graft.sources.WriteLayout.writeZOrdered]]; z1 gates
   * the key, THIS gates the benefit).
   *
   * `preds` are inclusive ranges per column; a file is hit iff every
   * predicate's range intersects the file's [min, max] — the standard
   * zone-map test, false positives by design (min/max boxes overcover),
   * never false negatives.
   *
   * Plan shape per layout: one range-partitioned global sort
   * ([[Sampling.globalOrder]] — partition-offset indexing, no
   * single-partition window), one file-grain hash-agg, one file-count-
   * sized fold. Output: (layout, n_files, files_hit), one row per
   * layout. */
  def zonemapPruneAudit(df: DataFrame,
      layouts: Seq[(String, Seq[org.apache.spark.sql.Column])],
      fileRows: Int, preds: Seq[(String, Long, Long)]): DataFrame = {
    require(fileRows >= 1, s"fileRows must be >= 1, got $fileRows")
    require(preds.nonEmpty, "zonemapPruneAudit needs at least one predicate")
    require(layouts.nonEmpty, "zonemapPruneAudit needs at least one layout")
    val hit = preds.map { case (c, lo, hi) =>
      col(s"__min_$c") <= lit(hi) && col(s"__max_$c") >= lit(lo)
    }.reduce(_ && _)
    layouts.map { case (name, orderCols) =>
      Sampling.globalOrder(df, orderCols)
        .select(col("position") +: preds.map(p => col(p._1)): _*)
        .groupBy(expr(s"position div $fileRows").as("__f"))
        .agg(
          min(col(preds.head._1)).as(s"__min_${preds.head._1}"),
          (preds.tail.map(p => min(col(p._1)).as(s"__min_${p._1}")) ++
            preds.map(p => max(col(p._1)).as(s"__max_${p._1}"))): _*)
        .agg(count(lit(1)).as("n_files"),
          sum(when(hit, 1L).otherwise(0L)).as("files_hit"))
        .select(lit(name).as("layout"), col("n_files"), col("files_hit"))
    }.reduce(_ unionByName _)
  }

  /** File-grain Bloom data-skipping audit — [[zonemapPruneAudit]]'s
   * EQUALITY-predicate complement (parquet column bloom filters /
   * Delta's per-file skipping stats): min/max zones prune RANGE
   * predicates but pass everything for a scattered point lookup (every
   * file's min..max covers the probe), while a per-file Bloom image
   * prunes it to ~the files that truly contain the key plus the bit-
   * collision margin. Simulates `fileRows`-row files under the given
   * layout order, builds one Bloom image per file
   * ([[graft.ext.Sketches.bloomBitsBy]]), and probes one key: output is
   * one row (n_files, files_bloom_pass, files_true_hit) — no false
   * negatives (`bloom_pass ⊇ true_hit` by construction), and the gap to
   * n_files is the measured case for paying the index write. Key values
   * hash as strings (the d30 convention). */
  def fileBloomPruneAudit(df: DataFrame,
      orderCols: Seq[org.apache.spark.sql.Column], fileRows: Int,
      keyCol: String, probe: String): DataFrame = {
    require(fileRows >= 1, s"fileRows must be >= 1, got $fileRows")
    val filed = graft.ext.Dedup.materialize(
      Sampling.globalOrder(df, orderCols)
        .select(expr(s"position div $fileRows").as("f"),
          col(keyCol).cast("string").as("__k")))
    val fileBits = graft.ext.Sketches.bloomBitsBy(filed, "f", "__k")
    val probeBits = graft.ext.Sketches.bloomBits(
      filed.sparkSession.range(1).select(lit(probe).as("__k")), "__k")
    // a file passes iff it holds EVERY distinct probe bit (the probe's
    // hashes can collide with each other, so the required count is the
    // distinct-bit count, not BloomHashes)
    val nProbeBits = probeBits.count()
    val pass = fileBits.join(broadcast(probeBits), Seq("bit"), "left_semi")
      .groupBy("f").agg(count(lit(1)).as("nb"))
      .filter(col("nb") === nProbeBits)
    val hit = filed.filter(col("__k") === probe).select("f").distinct()
    filed.select(countDistinct(col("f")).as("n_files"))
      .crossJoin(pass.agg(count(lit(1)).as("files_bloom_pass")))
      .crossJoin(hit.agg(count(lit(1)).as("files_true_hit")))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
   * al. 2007) — the privacy pre-flight a training-data release needs
   * BEFORE pseudonymization is trusted: group rows by their
   * quasi-identifier combination and report, per equivalence-class-size
   * bucket, how many classes and rows sit there and the MINIMUM
   * sensitive-value diversity. A hashed id does not help the one person
   * in a (nation, segment) class of size 1 — re-identification is the
   * class size, which is why the size-1/size<k mass is the headline
   * number. l-diversity guards the complementary leak: a size-50 class
   * whose sensitive value is constant reveals it for all 50 without
   * identifying anyone.
   *
   * Size buckets are exact powers of two by binary width (the
   * degreeStats convention — integer, never floating log2). Two keyed
   * hash-aggs (class grain, then bucket grain); everything after the
   * first agg is class-count-sized. Output per bucket:
   * (size_bucket, n_classes, n_rows, min_size, max_size,
   * min_l_diversity). */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    val classes = df
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        countDistinct(col(sensitiveCol)).as("l_div"))
    classes
      .groupBy(length(bin(col("sz"))).cast("int").as("size_bucket"))
      .agg(count(lit(1)).as("n_classes"), sum("sz").as("n_rows"),
        min("sz").as("min_size"), max("sz").as("max_size"),
        min("l_div").as("min_l_diversity"))
  }

  /** GRAIN CONTRACT for the order-statistic selections below: the
   * cumulative window (`Window.orderBy("vq")` with no partitionBy) runs
   * on a SINGLE partition over the DISTINCT values. That is
   * corpus-independent for the intended inputs — centi-quantized
   * metric columns (prices, scores, latencies) whose distinct
   * cardinality is bounded by value RANGE, not row count — and
   * corpus-SIZED for high-cardinality columns (ids, raw nanosecond
   * timestamps), where it degenerates to exactly the row-grain global
   * sort this design exists to avoid. The contract is ENFORCED, not
   * assumed: the same 1-row total agg that feeds `n` also counts the
   * distinct values and `assert_true`s the `maxDistinct` bound, so a
   * caller pointing this at an id column fails loudly on the same job
   * instead of silently single-threading a terabyte sort. (A
   * range-partitioned two-level prefix sum would lift the bound; no
   * current caller needs it, so the loud bound is the honest shape.) */
  private def orderStatMsg(maxDistinct: Long): String =
    s"order-stat selection: distinct-value cardinality exceeds " +
      s"$maxDistinct — this column violates the bounded-grain " +
      "contract (see Profile.boundedCumCounts)"

  /** THE shared enforced-grain cumulative kernel (r9 verdict #7): every
   * exact order-statistic consumer in the engine — equi-depth quantiles
   * (dq11), median/MAD, split-conformal selection (ml4), Kaplan–Meier
   * risk sets (s10), the key-skew Gini histogram — is the same two-step
   * shape: (1) LOUDLY assert the distinct-value cardinality of a
   * (value, count) relation against `maxDistinct` in the 1-row agg that
   * also yields the grand total, (2) run ONE single-partition inclusive
   * cumulative-count window over the distinct values. This method is
   * that pair, in one place, so the next quantile consumer cannot
   * re-implement the window without the bound. Input: `counts` at
   * DISTINCT-`vCol` grain with a positive BIGINT `cCol`. Output: the
   * input rows plus `n` (Σ cCol, broadcast onto every row) and `cum`
   * (inclusive cumulative `cCol` in `vCol` order). The assert fails the
   * SAME job — a violating caller gets `msg`, never a silently
   * single-threaded terabyte sort. */
  private[graft] def boundedCumCounts(counts: DataFrame, vCol: String,
      cCol: String, maxDistinct: Long, msg: String): DataFrame = {
    val tot = counts.agg(sum(cCol).as("n"), count(lit(1)).as("__nd"))
      .withColumn("__g", assert_true(col("__nd") <= maxDistinct, lit(msg)))
      .where(col("__g").isNull).select("n")
    val w = org.apache.spark.sql.expressions.Window.orderBy(vCol)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    counts.crossJoin(broadcast(tot))
      .withColumn("cum", sum(cCol).over(w))
  }

  /** Exact LOWER median of a centi-quantized value relation by
   * value-grain selection: the (n+1) div 2 order statistic through the
   * shared TWO-LEVEL kernel ([[twoLevelRankSelect]] — r10 verdict #2:
   * the two-level plan measured FASTER than the single-partition
   * window at identical 10× grain, so the exact-median consumers ride
   * it; the loud grain bounds move to bucket grain + per-target-bucket
   * grain, satisfiable at any cardinality). Never interpolates: an
   * order-statistic median is an integer both engines agree on, where
   * interpolating quantile implementations differ in double op shape. */
  private def lowerMedianQ(vq: DataFrame,
      maxDistinct: Long = MaxOrderStatDistinct): DataFrame =
    twoLevelRankSelect(vq.groupBy("vq").agg(count(lit(1)).as("c")),
      Seq(1), 1L, 2L, bucketShift = 20, maxGrain = maxDistinct,
      opName = "lowerMedian")
      .agg(min("vq").as("med_q"), max("n").as("n"))

  /** Default distinct-value bound for the single-partition cumulative
   * window: 4M distinct values ≈ a ~100 MB one-partition sort — cheap
   * on any executor, and far above any genuinely centi-quantized
   * metric's range. */
  val MaxOrderStatDistinct: Long = 4L * 1000 * 1000

  /** Exact equi-depth quantiles (generalizing [[lowerMedianQ]] to k
   * cuts): the j-th decile/percentile as the exact LOWER order statistic
   * at rank ⌈j·n/k⌉, selected at distinct-value grain — one count agg,
   * ONE cumulative window over distinct values, a broadcast join of the
   * k rank targets, one min-agg. The profiling primitive behind
   * equi-depth histograms and latency SLO reports that
   * `approx_percentile` only approximates and interpolating exact
   * percentiles render engine-dependent (their double op shapes differ);
   * an order statistic is an integer every engine agrees on. Input
   * centi-quantizes like [[madOutlierStats]]; the distinct-value grain
   * contract is enforced by [[boundedCumCounts]]. Output: (q, rank, vq) —
   * one row per cut j = 1..k, vq in centi-units. */
  def orderStatQuantiles(df: DataFrame, valCol: String,
      k: Int, maxDistinct: Long = MaxOrderStatDistinct): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val session = df.sparkSession
    import session.implicits._
    val counts = df.filter(col(valCol).isNotNull)
      .select(floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
        .as("vq"))
      .groupBy("vq").agg(count(lit(1)).as("c"))
    val cum = boundedCumCounts(counts, "vq", "c", maxDistinct,
      orderStatMsg(maxDistinct))
    cum.crossJoin(broadcast((1 to k).toDF("q")))
      // rank_j = ceil(j*n/k) in integer arithmetic: (j*n + k - 1) div k
      .withColumn("rank", expr(s"(q * n + $k - 1) div ${k}L"))
      .filter(col("cum") >= col("rank"))
      .groupBy("q").agg(max("rank").as("rank"), min("vq").as("vq"))
  }

  /** Two-level exact equi-depth quantiles — [[orderStatQuantiles]] with
   * the single-partition grain caveat LIFTED (the range-partitioned
   * two-level prefix sum the r9 verdict named): level 1 aggregates the
   * distinct values into 2^`bucketShift`-wide range buckets and runs the
   * bounded cumulative window at BUCKET grain; level 2 re-scans ONLY the
   * ≤ k target buckets (a k-row broadcast semi-join against the
   * value-grain relation) and selects the exact within-bucket order
   * statistic under a PARTITIONED window. The grain contract therefore
   * drops from "global distinct ≤ maxGrain" to "range buckets ≤
   * maxGrain AND distinct-per-target-bucket ≤ maxGrain" — both still
   * loudly asserted, both satisfiable at ANY corpus cardinality by
   * choosing `bucketShift` (e.g. shift 32 splits a full 63-bit
   * nonnegative domain into ≤ 2^31/bucket... pick shift ≈
   * (domain_bits − 20) so each level holds ~1M rows). Values
   * centi-quantize like [[orderStatQuantiles]]; SIGNED values are fine —
   * the kernel shifts by the global minimum before bucketing (order-
   * preserving exact integer offset, shifted back on output), so the
   * r10 nonnegative caveat is gone. Result is BIT-IDENTICAL to
   * [[orderStatQuantiles]] (spec-pinned): (q, rank, vq),
   * rank_j = ⌈j·n/k⌉, exact lower order statistics. */
  def orderStatQuantilesTwoLevel(df: DataFrame, valCol: String, k: Int,
      bucketShift: Int = 20,
      maxGrain: Long = MaxOrderStatDistinct): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.filter(col(valCol).isNotNull)
      .select(floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
        .as("vq"))
      .groupBy("vq").agg(count(lit(1)).as("c"))
    twoLevelRankSelect(counts, 1 to k, k - 1L, k.toLong, bucketShift,
        maxGrain, "orderStatQuantilesTwoLevel")
      .select(col("q"), col("rank"), col("vq"))
  }

  /** THE shared TWO-LEVEL exact rank-selection kernel (r10 verdict #2):
   * every exact order-statistic consumer whose grain can plausibly
   * exceed the one-level bound — equi-depth quantiles (dq11/dq22),
   * median/MAD (dq9), the split-conformal radius (ml4) — is the same
   * three-step shape, in one place so the next consumer cannot
   * re-implement the selection without the bounds:
   *
   *  1. SHIFT-TO-NONNEGATIVE: range-bucket floor division needs
   *     vq ≥ 0; instead of refusing signed inputs, shift every value by
   *     the global minimum (an order-preserving exact integer offset,
   *     undone on output). A loud ±2^62 magnitude bound keeps the
   *     offset subtraction inside BIGINT. The shifted distinct-value
   *     relation materializes ONCE — both levels read it.
   *  2. LEVEL 1 at 2^bucketShift-wide range-bucket grain: the shared
   *     enforced single-partition cumulative ([[boundedCumCounts]],
   *     ≤ maxGrain buckets, loud) locates, for each requested cut
   *     `q ∈ qs` at rank `least(n, (q·n + addNum) div divisor)`, the
   *     ONE bucket holding that order statistic.
   *  3. LEVEL 2 re-scans ONLY the ≤ |qs| target buckets (broadcast
   *     join) and selects the exact within-bucket order statistic
   *     under a PARTITIONED window (per-target-bucket distinct ≤
   *     maxGrain, loud).
   *
   * The rank family `least(n, (q·n + addNum) div divisor)` covers every
   * current consumer exactly: quantiles (⌈j·n/k⌉ = (j·n + k−1) div k,
   * the least() a no-op), the lower median ((n+1) div 2 at q=1, addNum
   * 1, divisor 2), and the conformal ⌈(n+1)·α/100⌉-capped-at-n (q=α,
   * addNum α+99, divisor 100). Input: `counts0` at DISTINCT-vq grain
   * with positive BIGINT `c`. Output: (q, rank, vq, n) — one row per
   * cut, vq the exact lower order statistic at that rank, empty when
   * the input is empty. */
  private[graft] def twoLevelRankSelect(counts0: DataFrame, qs: Seq[Int],
      addNum: Long, divisor: Long, bucketShift: Int, maxGrain: Long,
      opName: String): DataFrame = {
    require(qs.nonEmpty, s"$opName: need at least one cut")
    require(divisor >= 1, s"$opName: divisor must be >= 1, got $divisor")
    require(bucketShift >= 8 && bucketShift <= 48,
      s"bucketShift must be in [8, 48], got $bucketShift")
    val session = counts0.sparkSession
    import session.implicits._
    val width = 1L << bucketShift
    // value-grain relation materialized FIRST: the min/max agg, level 1,
    // and level 2 all read the checkpointed relation — the corpus scan
    // (inside counts0's lineage) happens exactly once, never once per
    // consumer (this relation is already distinct-value-sized)
    val c0 = Dedup.materialize(counts0)
    val mn = c0.agg(min("vq").as("vmin"), max("vq").as("__vmax"))
      .withColumn("__gs", assert_true(
        (col("vmin") > lit(Long.MinValue / 2) &&
          col("__vmax") < lit(Long.MaxValue / 2)) || col("vmin").isNull,
        lit(s"$opName: value magnitude exceeds ±2^62 — the " +
          "shift-to-nonnegative offset would overflow (bounded-grain " +
          "contract, see Profile.twoLevelRankSelect)")))
      .where(col("__gs").isNull).select("vmin")
    // the shift is a narrow projection over the checkpointed relation
    val counts = c0.crossJoin(broadcast(mn))
      .select((col("vq") - col("vmin")).as("vq"), col("c"),
        col("vmin"))
    val buckets = counts.groupBy(expr(s"vq div ${width}L").as("b"))
      .agg(sum("c").as("cb"), count(lit(1)).as("ndb"))
    val cum1 = boundedCumCounts(buckets, "b", "cb", maxGrain,
      s"$opName: range-bucket count exceeds $maxGrain — raise " +
        "bucketShift (bounded-grain contract, see " +
        "Profile.boundedCumCounts)")
    val targets = cum1.crossJoin(broadcast(qs.toDF("q")))
      .withColumn("rank",
        least(col("n"), expr(s"(q * n + $addNum) div ${divisor}L")))
      .filter(col("cum") >= col("rank"))
      .groupBy("q")
      .agg(max("rank").as("rank"), max("n").as("n"),
        min_by(struct(col("b"), col("cb"), col("ndb"), col("cum")),
          col("b")).as("g"))
      .select(col("q"), col("rank"), col("n"), col("g.b").as("b"),
        (col("rank") - (col("g.cum") - col("g.cb"))).as("in_rank"),
        col("g.ndb").as("ndb"))
      .withColumn("__g2", assert_true(col("ndb") <= maxGrain,
        lit(s"$opName: a target bucket holds more than $maxGrain " +
          "distinct values — lower bucketShift (bounded-grain " +
          "contract, see Profile.boundedCumCounts)")))
      .where(col("__g2").isNull).drop("__g2")
    val w2 = org.apache.spark.sql.expressions.Window.partitionBy("q")
      .orderBy("vq")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    counts.withColumn("b", expr(s"vq div ${width}L"))
      .join(broadcast(targets), Seq("b"))
      .withColumn("cum2", sum("c").over(w2))
      .filter(col("cum2") >= col("in_rank"))
      .groupBy("q").agg(max("rank").as("rank"),
        min(col("vq") + col("vmin")).as("vq"), max("n").as("n"))
  }

  /** Per-key exact percentile-rank (cume_dist) TRANSFORM table — the
   * normalization a feature pipeline joins back onto rows: every
   * (key, value) maps to its exact within-key cumulative-distribution
   * ppm (`(cum·1e6) div n` — integers end to end, ties share their
   * group's inclusive rank exactly like SQL `cume_dist`). The inverse
   * view of [[groupedOrderStats]] (that answers "what value sits at
   * rank r"; this answers "what rank does value v hold"), and the
   * distribution-free way to compare a value across keys with wildly
   * different scales. Same partitioned-window scale shape as
   * groupedOrderStats — no grain bound needed, each key sweeps its own
   * partition; `valCol` must already be an integer (the caller owns
   * quantization). A loud envelope bound keeps `cum·1e6` inside BIGINT
   * (per-key n ≤ 9e12 — the lorenzCurve/hhi/rocAuc exact-ppm
   * discipline; r10 ADVICE: silently-wrapping non-ANSI division past
   * that is exactly what the siblings refuse loudly). Output:
   * (key, vq, c, n, pct_ppm) at (key, distinct-value) grain. */
  def percentileRanks(df: DataFrame, keyCol: String,
      valCol: String): DataFrame = {
    val counts = df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("key"), col(valCol).cast("long").as("vq"))
      .groupBy("key", "vq").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
      .orderBy("vq")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = counts.groupBy("key").agg(sum("c").as("n"))
      .withColumn("__g", assert_true(col("n") <= 9000000000000L,
        lit("percentileRanks: per-key row count exceeds 9e12 — cum·1e6 " +
          "would leave BIGINT; pre-aggregate or sample the key " +
          "(bounded-moment contract, see Experiment.calibrationBins)")))
      .where(col("__g").isNull).drop("__g")
    counts.withColumn("cum", sum("c").over(w))
      .join(tot, "key")
      .select(col("key"), col("vq"), col("c"), col("n"),
        expr("(cum * 1000000) div n").as("pct_ppm"))
  }

  /** Per-key exact k-quantiles by order-statistic selection — the
   * GROUPED form of [[orderStatQuantiles]], and the shape that removes
   * its single-partition caveat entirely: the cumulative window
   * partitions BY KEY, so every key's distinct-value sweep runs in its
   * own partition and the operator scales with keys × per-key distinct
   * values like any keyed window (no grain bound needed — per-key
   * value-cardinality skew is the same exposure as every keyed window
   * in the engine). `valCol` must already be an integer (the caller
   * owns quantization); rank_j = ⌈j·n/k⌉, selection exact, never
   * interpolated. Output: (key, q ∈ 1..k, vq). */
  def groupedOrderStats(df: DataFrame, keyCol: String, valCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val session = df.sparkSession
    import session.implicits._
    val counts = df.filter(col(valCol).isNotNull)
      .select(col(keyCol).as("key"), col(valCol).cast("long").as("vq"))
      .groupBy("key", "vq").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
      .orderBy("vq")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = counts.groupBy("key").agg(sum("c").as("n"))
    counts.withColumn("cum", sum("c").over(w))
      .join(tot, "key")
      .crossJoin(broadcast((1 to k).toDF("q")))
      .withColumn("rank", expr(s"(q * n + $k - 1) div ${k}L"))
      .filter(col("cum") >= col("rank"))
      .groupBy("key", "q").agg(min("vq").as("vq"))
  }

  /** Lorenz concentration curve of a per-key integer value — "what share
   * of total value sits with the bottom j/k of keys" (revenue
   * concentration per customer, token mass per source, traffic per
   * user): the exact curve behind a Gini readout, and the number that
   * decides whether a per-key budget/cap policy is even worth wiring in.
   * [[keySkewAudit]] prices the FREQUENCY concentration of a key; this
   * prices the VALUE concentration of anything summable.
   *
   * Exactness: per-key totals are exact BIGINT sums of the (caller-
   * quantized) integer `valCol`; the curve evaluates at cut ranks
   * `(j·n) div k` with tied-value groups resolved by exact interpolation
   * INSIDE the group (keys in a tied group are interchangeable, so the
   * bottom-r prefix takes `r − keys_before` copies of the group value —
   * pure integer arithmetic, no doubles anywhere). Shares are exact ppm;
   * a loud bound keeps `total·1e6` inside BIGINT (the calibrationBins
   * discipline).
   *
   * Scale shape: one keyed hash-agg to key grain, then the shared
   * enforced-grain kernel ([[boundedCumCounts]]) at distinct-total
   * grain + one extra value-mass running sum over the SAME bounded
   * single-partition sort, a broadcast of the k cuts, one k-row agg.
   * Output: (q ∈ 1..k, rank, bottom_value, total_value, share_ppm). */
  def lorenzCurve(df: DataFrame, keyCol: String, valCol: String,
      k: Int = 10, maxDistinct: Long = MaxOrderStatDistinct): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val session = df.sparkSession
    import session.implicits._
    val perKey = df.groupBy(col(keyCol))
      .agg(sum(col(valCol).cast("long")).as("vq"))
    val counts = perKey.groupBy("vq").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("vq")
    val wCum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val cum = boundedCumCounts(counts, "vq", "c", maxDistinct,
        orderStatMsg(maxDistinct))
      .withColumn("cumv", sum(col("vq") * col("c")).over(wCum))
      .withColumn("tv", sum(col("vq") * col("c")).over(wAll))
      // nonnegative-value contract + exact-ppm envelope, both loud
      .withColumn("__g", assert_true(
        col("vq") >= 0L && col("tv") <= 9000000000000L,
        lit("lorenzCurve: values must be nonnegative and total·1e6 must " +
          "fit BIGINT — quantize coarser (bounded-moment contract, see " +
          "Experiment.calibrationBins)")))
      .where(col("__g").isNull)
    cum.crossJoin(broadcast((1 to k).toDF("q")))
      .withColumn("rank", expr(s"(q * n) div ${k}L"))
      .filter(col("cum") >= col("rank"))
      .groupBy("q")
      .agg(max("rank").as("rank"),
        min_by(struct(col("vq"), col("c"), col("cum"), col("cumv"),
          col("tv")), col("vq")).as("g"))
      .select(col("q"), col("rank"),
        (col("g.cumv") - col("g.vq") * col("g.c") +
          (col("rank") - (col("g.cum") - col("g.c"))) * col("g.vq"))
          .as("bottom_value"),
        col("g.tv").as("total_value"))
      .withColumn("share_ppm",
        when(col("total_value") === 0L, lit(null).cast("long"))
          .otherwise(expr("(bottom_value * 1000000) div total_value")))
  }

  /** Robust (median/MAD) outlier audit of a numeric column — the
   * heavy-tail-safe alternative to mean/stddev z-scores, whose own
   * inputs the outliers corrupt: median and MAD (median absolute
   * deviation) have 50% breakdown, so the fences hold even when half
   * the column is garbage. Values centi-quantize to BIGINT; both
   * medians are exact lower order statistics ([[lowerMedianQ]] — no
   * interpolation, no doubles); the flag is the classic
   * 0.6745·|x−m|/MAD > 3.5 cross-multiplied into pure integers
   * (6745·dev > 35000·MAD). Two value-grain selection passes + one
   * final count. Output: (n, median_q, mad_q, n_outliers) — one row. */
  def madOutlierStats(df: DataFrame, valCol: String): DataFrame = {
    val vq = Dedup.materialize(
      df.filter(col(valCol).isNotNull)
        .select(floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
          .as("vq")))
    // both selection results are 1-row model scalars consumed by several
    // downstream subtrees — materialized so the plan computes each
    // value-grain selection window ONCE, not per consumer
    val med = Dedup.materialize(lowerMedianQ(vq))
    val dev = vq.crossJoin(broadcast(med))
      .select(abs(col("vq") - col("med_q")).as("vq"), col("med_q"),
        col("n"))
    val mad = Dedup.materialize(lowerMedianQ(dev.select("vq"))
      .select(col("med_q").as("mad_q")))
    dev.crossJoin(broadcast(mad))
      .agg(max("n").as("n"), max("med_q").as("median_q"),
        max("mad_q").as("mad_q"),
        sum(when(lit(6745L) * col("vq") > lit(35000L) * col("mad_q"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Benford's-law expected first-digit shares in exact 1e6 units —
   * PRE-quantized Scala constants (floor(log10(1 + 1/d)·1e6 + 0.5)), so
   * the oracle inlines the identical nine integers instead of trusting
   * two libms to round log10 the same way. */
  val BenfordMicro: Seq[(Int, Long)] = (1 to 9).map(d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5).toLong)

  /** Benford first-digit audit of a positive numeric column — the
   * fabricated-data / unit-mixup tripwire (naturally occurring
   * multiplicative magnitudes follow P(d) = log10(1 + 1/d); uniform
   * synthetic fills, capped fields, and unit mixups do not). The first
   * digit derives through STRING arithmetic on the truncated integer
   * part (never `floor(log10 v)`, whose ulp at exact powers of ten can
   * flip the digit cross-engine); rows with integer part 0 are excluded
   * (their leading digit lives below the decimal point). Shares are
   * exact integer micro-units ((n·1e6) div total); the expected shares
   * are the pre-quantized [[BenfordMicro]] constants; `dev_micro` the
   * absolute gap. One scan + one 9-bucket agg.
   * Output: (digit, n, share_micro, expected_micro, dev_micro). */
  /**
   * Join-key skew audit — the pre-flight for a salted join (the
   * [[graft.operators.Skew]] `k1` discipline: MEASURE the distribution
   * before paying for mitigation): one row with the key count, row
   * count, hottest key's count and its exact ppm share, and the GINI
   * coefficient of the key-frequency distribution in ppm (0 = perfectly
   * uniform keys, → 1e6 = all rows on one key — the single number that
   * says whether AQE skew-split/salting is worth wiring in).
   *
   * Gini is computed at COUNT-HISTOGRAM grain (count-of-counts): after
   * the key-grain agg, keys collapse to (count c, multiplicity m) rows —
   * Zipfian key distributions have FAR fewer distinct counts than keys —
   * and a group of m keys at count c occupying ascending ranks
   * (K, K+m] contributes `c·(m·K + m(m+1)/2)` to the rank-weighted sum
   * Σ i·x_i, all in exact BIGINT. The single-partition cumulative window
   * runs at that histogram grain under the same `maxGrain` contract as
   * [[orderStatQuantiles]] (assert_true, loud refusal).
   *
   * Output: (n_keys, n_rows, max_count, top1_ppm, gini_ppm).
   *
   * Arithmetic bound: the Gini numerator `2·S·1e6` with S ≤ n_keys·n_rows
   * stays inside BIGINT while `n_keys·n_rows ≤ ~4.6e12` (e.g. a million
   * keys over a few million rows). Past that, Spark's ANSI mode raises
   * loudly (and DuckDB widens to HUGEINT — the replay contract ends at
   * the same boundary); audit a key sample rather than the full fact
   * table, which is also the cheaper measurement.
   */
  def keySkewAudit(df: DataFrame, keyCol: String,
      maxGrain: Long = 4000000L): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    // grain guard + cumulative window at the histogram grain via the
    // shared enforced kernel (r9 verdict #7); the EXCLUSIVE prefix this
    // rank math needs is the kernel's inclusive cum minus the row's own
    // multiplicity
    val ranked = boundedCumCounts(
        counts.groupBy("c").agg(count(lit(1)).as("m")), "c", "m",
        maxGrain,
        s"keySkewAudit: count-histogram grain exceeds $maxGrain — " +
          "this key's frequency profile violates the bounded-grain " +
          "contract (see Profile.keySkewAudit)")
      .withColumn("k_before", col("cum") - col("m"))
      .select(col("c"), col("m"), col("k_before"),
        (col("c") * (col("m") * col("k_before") +
          expr("m * (m + 1) div 2"))).as("rank_mass"))
    ranked.agg(
      sum("m").as("n_keys"),
      sum(col("c") * col("m")).as("n_rows"),
      max("c").as("max_count"),
      sum("rank_mass").as("s_rank"))
      .select(col("n_keys"), col("n_rows"), col("max_count"),
        expr("(1000000 * max_count) div n_rows").as("top1_ppm"),
        (expr("(2 * s_rank * 1000000) div (n_keys * n_rows)") -
          expr("((n_keys + 1) * 1000000) div n_keys")).as("gini_ppm"))
  }

  def benfordAudit(df: DataFrame, valCol: String): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val expected = broadcast(
      BenfordMicro.toDF("digit", "expected_micro"))
    val digits = df
      .filter(col(valCol) >= 1)
      .select(substring(floor(col(valCol)).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("total"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("(n * 1000000L) div total").as("share_micro"))
      .join(expected, Seq("digit"))
      .withColumn("dev_micro",
        abs(col("share_micro") - col("expected_micro")))
  }

  /** Declarative constraint-suite audit (the Deequ/Great-Expectations
   * shape): not-null columns, unique keys, and arbitrary boolean check
   * predicates, ALL evaluated in ONE hash-agg over ONE scan — a
   * violation COUNT per constraint (zero = the contract holds), not a
   * row dump, so the audit costs one pass however many constraints
   * ride it. Uniqueness violations are `count − countDistinct(key)`
   * (the number of surplus copies) computed in the same agg; a check
   * predicate that evaluates to NULL counts as a violation (unknown is
   * not a pass — the SQL three-valued-logic trap made explicit).
   * Output: (constraint, n_violations), one row per constraint. */
  def constraintAudit(df: DataFrame, notNull: Seq[String],
      uniqueKeys: Seq[Seq[String]],
      checks: Seq[(String, Column)]): DataFrame = {
    val aggs: Seq[(String, Column)] =
      notNull.map(c => s"not_null:$c" ->
        sum(when(col(c).isNull, 1L).otherwise(0L))) ++
      uniqueKeys.map(k => s"unique:${k.mkString(",")}" ->
        (count(lit(1)) - countDistinct(struct(k.map(col): _*)))) ++
      checks.map { case (n, c) => s"check:$n" ->
        sum(when(coalesce(c, lit(false)), 0L).otherwise(1L)) }
    require(aggs.nonEmpty, "constraintAudit needs at least one constraint")
    val named = aggs.zipWithIndex.map { case ((n, c), i) =>
      (n, c.as(s"__c$i"), s"__c$i") }
    val one = df.agg(named.head._2, named.tail.map(_._2): _*)
    one.select(explode(array(named.map { case (n, _, a) =>
        struct(lit(n).as("constraint"), col(a).as("n_violations"))
      }: _*)).as("m"))
      .select(col("m.constraint"), col("m.n_violations"))
  }

  /** Mutual information between two categorical columns — the
   * dependence audit that catches what a correlation coefficient
   * cannot (any non-linear association) and what an FD audit
   * ([[fdViolations]]) treats as binary: HOW MUCH one column tells you
   * about another, in nats. High lang↔source MI in a corpus means the
   * mixture is confounded (sampling by source silently samples by
   * language); near-zero MI between an id and a label is the sanity
   * floor. MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) with every per-cell
   * term a fixed-shape double over exact BIGINT counts, nano-quantized
   * the moment it leaves ln (the [[psiFromBuckets]] discipline) so the
   * total is an exact integer sum. Null categories are the CALLER's
   * contract: pre-coalesce them to a sentinel — a null key would drop
   * its cells at the marginal join (null ≠ null in any engine).
   *
   * Scale shape: one joint hash-agg (cell grain), marginals REDUCED
   * FROM the joint relation (cell grain, never a second corpus scan),
   * broadcast 1-row total, two cell-grain joins, one 1-row agg.
   * Output: (n_rows, n_x, n_y, n_cells, mi_nano). */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("n_xy"))
    val mx = joint.groupBy("__x").agg(sum("n_xy").as("n_x"))
    val my = joint.groupBy("__y").agg(sum("n_xy").as("n_y"))
    val total = joint.agg(sum("n_xy").as("n"))
    val term = floor(
      col("n_xy").cast("double") / col("n").cast("double") *
        log(col("n_xy").cast("double") * col("n").cast("double") /
          (col("n_x").cast("double") * col("n_y").cast("double"))) *
        lit(1e9) + lit(0.5)).cast("long")
    joint.join(mx, Seq("__x")).join(my, Seq("__y"))
      .crossJoin(broadcast(total))
      .select(col("n"), col("n_xy"), term.as("__t"))
      .agg(max("n").as("n_rows"), count(lit(1)).as("n_cells"),
        sum("__t").as("mi_nano"))
      .crossJoin(broadcast(mx.agg(count(lit(1)).as("n_x"))))
      .crossJoin(broadcast(my.agg(count(lit(1)).as("n_y"))))
      .select(col("n_rows"), col("n_x"), col("n_y"), col("n_cells"),
        col("mi_nano"))
  }

  /** Pearson chi-squared test of independence between two categorical
   * columns, with Cramér's V — the significance-scented sibling of
   * [[mutualInfo]] (MI says how MUCH the columns share; chi²/V says
   * whether the association clears sampling noise and on what 0..1
   * scale). Zero-observed cells CONTRIBUTE (their term is E): the full
   * nx×ny grid is generated from the two broadcast marginals, so a
   * never-observed (lang, source) cell still pushes chi² up — dropping
   * them (the tempting join shape) understates the statistic.
   *
   * Exactness: O, n_x, n_y, n are exact BIGINT; each cell term
   * `(O − E)²/E` is ONE fixed-shape double expression over those
   * integers micro-quantized half-up (the PSI per-term discipline), so
   * the total is an exact BIGINT; V = sqrt(chi²/(n·min(nx−1, ny−1)))
   * derives from the already-quantized total. dof 0 (a constant column)
   * yields NULL V, not NaN.
   *
   * NULL rows are EXCLUDED up front (both columns): a NULL category
   * would be counted in the marginals (groupBy keeps the NULL group)
   * while its observed grid cells never match the null-rejecting equi
   * join — those cells would read O = 0 against a positive E,
   * overstating chi² on NULL-bearing columns (r10 ADVICE). Callers who
   * want NULL as a category pre-coalesce it to a sentinel, the
   * [[mutualInfo]] contract.
   *
   * Scale shape: one cell-grain hash-agg + two category-grain aggs; the
   * grid is |X|·|Y| (categorical grain, broadcast). Output 1 row:
   * (n_rows, n_x, n_y, n_cells, dof, chi2_micro, cramers_v_micro). */
  def chi2Independence(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val joint = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("n_xy"))
    val mx = joint.groupBy("__x").agg(sum("n_xy").as("n_x"))
    val my = joint.groupBy("__y").agg(sum("n_xy").as("n_y"))
    val total = joint.agg(sum("n_xy").as("n"))
    val grid = mx.crossJoin(broadcast(my))
      .join(joint, Seq("__x", "__y"), "left")
      .select(col("n_x"), col("n_y"),
        coalesce(col("n_xy"), lit(0L)).as("o"))
      .crossJoin(broadcast(total))
    val e = col("n_x").cast("double") * col("n_y").cast("double") /
      col("n").cast("double")
    val term = floor((col("o").cast("double") - e) *
      (col("o").cast("double") - e) / e * lit(1e6) + lit(0.5)).cast("long")
    grid.select(col("n"), term.as("__t"))
      .agg(max("n").as("n_rows"), count(lit(1)).as("n_cells"),
        sum("__t").as("chi2_micro"))
      .crossJoin(broadcast(mx.agg(count(lit(1)).as("n_x"))))
      .crossJoin(broadcast(my.agg(count(lit(1)).as("n_y"))))
      .select(col("n_rows"), col("n_x"), col("n_y"), col("n_cells"),
        ((col("n_x") - 1) * (col("n_y") - 1)).as("dof"),
        col("chi2_micro"),
        when((col("n_x") - 1) * (col("n_y") - 1) === 0L,
          lit(null).cast("long"))
          .otherwise(floor(sqrt(col("chi2_micro").cast("double") /
            lit(1e6) / (col("n_rows").cast("double") *
              least(col("n_x") - 1, col("n_y") - 1).cast("double"))) *
            lit(1e6) + lit(0.5)).cast("long")).as("cramers_v_micro"))
  }

  /** Herfindahl–Hirschman concentration index of a categorical column
   * per group — "is this language's corpus one source in a trenchcoat":
   * HHI = Σ share², in exact ppm by integer cross-multiplication
   * (`(Σc²·1e6) div n²` — no doubles anywhere), with the top category's
   * exact ppm share beside it. 1e6/n_cats = perfectly even; 1e6 = fully
   * concentrated. The one-number mixture-health readout above
   * [[mutualInfo]]'s global association and below a full per-group
   * histogram.
   *
   * A loud bound keeps `n²·1e6` inside BIGINT (n ≤ `maxN` per group —
   * the calibrationBins discipline); past it, pre-aggregate or sample
   * the group, which is also the cheaper measurement. One cell-grain
   * hash-agg + one group-grain agg; output one row per group:
   * (group, n, n_cats, top_share_ppm, hhi_ppm). */
  def hhi(df: DataFrame, groupCol: String, catCol: String,
      maxN: Long = 3000000L): DataFrame =
    df.groupBy(col(groupCol).as("group"), col(catCol).as("__cat"))
      .agg(count(lit(1)).as("c"))
      .groupBy("group")
      .agg(sum("c").as("n"), count(lit(1)).as("n_cats"),
        max("c").as("__top"), sum(col("c") * col("c")).as("__ss"))
      .withColumn("__g", assert_true(col("n") <= maxN,
        lit(s"hhi: group row count exceeds $maxN — n²·1e6 would leave " +
          "BIGINT; pre-aggregate or sample the group (bounded-moment " +
          "contract, see Experiment.calibrationBins)")))
      .where(col("__g").isNull)
      .select(col("group"), col("n"), col("n_cats"),
        expr("(__top * 1000000) div n").as("top_share_ppm"),
        expr("(__ss * 1000000) div (n * n)").as("hhi_ppm"))

  /** Snapshot profile-drift audit: per column, the shape statistics
   * whose movement between two snapshots of "the same" feed is how
   * upstream breakage actually announces itself — null rate (a field
   * the producer stopped populating), distinct count (an enum that
   * grew, an id column that collapsed), and mode concentration (a
   * default value flooding in). [[psiDrift]] prices the DISTRIBUTION
   * shift of one numeric column; this is the wide-and-shallow
   * complement: every column, three integers each, exact.
   *
   * Mode concentration is the top value's share of ALL rows (nulls
   * included in the denominator — a column drifting toward null should
   * depress its mode share, not inflate it).
   *
   * Columns are profiled as STRINGS — callers must pre-project
   * non-string columns through a deterministic rendering (integers are
   * safe; cast raw doubles to a quantized integer first, since
   * double→string formatting is engine-specific). Mode ties break to
   * the lexicographically smallest value.
   *
   * Scale shape: one |cols|-way narrow explode per snapshot, two
   * hash-aggs (value grain, then column grain) + a column-grain join —
   * nothing wider than the value-frequency relation, output |cols|
   * rows. Output: (col_name, n_ref, n_cur, null_ppm_ref, null_ppm_cur,
   * distinct_ref, distinct_cur, top_share_ppm_ref, top_share_ppm_cur). */
  def snapshotDrift(ref: DataFrame, cur: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "snapshotDrift needs at least one column")
    def melt(df: DataFrame) =
      df.select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col(c).cast("string").as("v")))
          : _*)).as("m"))
        .select(col("m.col_name"), col("m.v"))
    def prof(df: DataFrame, sfx: String) = {
      val m = melt(df)
      val base = m.groupBy("col_name").agg(
        count(lit(1)).as(s"n_$sfx"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("__nn"),
        countDistinct("v").as(s"distinct_$sfx"))
      val mode = m.filter(col("v").isNotNull)
        .groupBy("col_name", "v").agg(count(lit(1)).as("__c"))
        .groupBy("col_name")
        .agg(min(struct((-col("__c")).as("neg"), col("v"))).as("__t"))
        .select(col("col_name"), (-col("__t.neg")).as("__top"))
      base.join(mode, Seq("col_name"), "left")
        .select(col("col_name"), col(s"n_$sfx"), col(s"distinct_$sfx"),
          expr(s"(__nn * 1000000L) div n_$sfx").as(s"null_ppm_$sfx"),
          coalesce(expr(s"(__top * 1000000L) div n_$sfx"), lit(0L))
            .as(s"top_share_ppm_$sfx"))
    }
    prof(ref, "ref").join(prof(cur, "cur"), "col_name")
      .select(col("col_name"), col("n_ref"), col("n_cur"),
        col("null_ppm_ref"), col("null_ppm_cur"),
        col("distinct_ref"), col("distinct_cur"),
        col("top_share_ppm_ref"), col("top_share_ppm_cur"))
  }
}
