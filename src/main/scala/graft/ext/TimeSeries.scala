package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: turn an irregular event stream into a dense
 * per-key calendar grid (a training-data / feature-pipeline staple — ML
 * feature frames want one row per (entity, period), not one per event).
 *
 * Scale posture: the grid is generated per key with `sequence()` + `explode`
 * — a narrow operation whose output is bounded by Σ_key span(key), never a
 * cross join against a global calendar dimension. The fill join is keyed on
 * (key, period) — one shuffle, and the observed side arrives pre-aggregated
 * (one row per (key, period)), so the join is 1:1, never row-amplifying.
 * Carry-forward uses a running `last(ignoreNulls)` window per key ordered by
 * period — the same single-sort shape as [[graft.operators.AsOfJoin]].
 */
object TimeSeries {

  /**
   * Densify `observed` (one row per (key, period) — pre-aggregate first) to
   * every period of `step` between each key's min and max period.
   *
   * `zeroFill` columns get `coalesce(_, 0)` on missing periods (counts/sums);
   * `carryForward` columns get the latest earlier non-null value per key
   * (gauge-style values).
   */
  def gapFill(
      observed: DataFrame,
      key: String,
      period: String,
      step: String,
      zeroFill: Seq[String],
      carryForward: Seq[String]): DataFrame = {

    val bounds = observed.groupBy(key)
      .agg(min(period).as("__p0"), max(period).as("__p1"))
    val grid = bounds.select(
      col(key),
      explode(sequence(col("__p0"), col("__p1"), expr(s"interval $step")))
        .as(period))

    val w = Window.partitionBy(key).orderBy(period)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    grid.join(observed, Seq(key, period), "left")
      .select(
        Seq(col(key), col(period)) ++
          zeroFill.map(c => coalesce(col(c), lit(0)).as(c)) ++
          carryForward.map(c =>
            last(col(c), ignoreNulls = true).over(w).as(c)): _*)
  }

  /** Peak concurrency per key — the sweep-line classic ("max simultaneous
   * sessions/streams/connections"): each event occupies the half-open
   * interval `[ts, ts + durationNs)`, and the answer per key is the
   * maximum number of overlapping intervals plus the FIRST instant it is
   * reached. The capacity-planning readout of an event table (and the
   * degenerate case of interval self-join counting — but computed in one
   * sort, not a join).
   *
   * Exactness under ties: endpoints pre-aggregate to per-(key, instant)
   * NET deltas (starts − ends). Half-open intervals mean an interval
   * ending at t frees its slot before one starting at t takes it, so
   * within an instant the running count never exceeds its
   * post-instant value — tracking the running sum of net deltas at
   * instant grain is exact, and it makes the window's order key unique
   * per partition (no peer-frame subtleties for the oracle to mismatch).
   *
   * Scale shape: one hash-agg to instant grain (endpoints relation ≤ 2·|events|
   * collapses before the sort), ONE per-key window sort for the running
   * sum, and the peak/argmin aggregation reuses the window's hash
   * partitioning. Nothing global: each key sweeps independently. */
  def peakConcurrency(events: DataFrame, key: String, tsCol: String,
      durationNs: Long): DataFrame = {
    require(durationNs > 0, s"durationNs must be positive, got $durationNs")
    val starts = events.select(col(key), col(tsCol).as("t"),
      lit(1L).as("delta"))
    val ends = events.select(col(key), (col(tsCol) + durationNs).as("t"),
      lit(-1L).as("delta"))
    val net = starts.unionByName(ends)
      .groupBy(col(key), col("t"))
      .agg(sum("delta").as("net"))
    val w = Window.partitionBy(key).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = net.withColumn("run", sum("net").over(w))
      // per-key peak via a second (sort-free, same-partitioning) window —
      // the groupBy below then reduces in one pass with no join-back
      .withColumn("__peak", max("run").over(Window.partitionBy(key)))
    run.groupBy(col(key))
      .agg(max("run").as("peak"),
        min(when(col("run") === col("__peak"), col("t")))
          .as("first_peak_ts"))
  }

  /** OHLC bar resampling — the downsampling classic (candlesticks,
   * per-period gauge summaries): per `(key, bar)` the first value (open),
   * max (high), min (low), last value (close), micro-quantized value sum
   * and row count, with `bar = ts div barNs · barNs` on the long-nanos
   * event time (integer division — ns-epoch magnitudes exceed double's
   * 2^53 mantissa, the w3 lesson).
   *
   * Open/close are argmin/argmax by `(ts, tieCol)` carried through ONE
   * struct-min/struct-max hash-agg — no per-bar window sort, no
   * join-back; `tieCol` makes the ordering total so the endpoints are
   * deterministic under timestamp collisions. The value sum quantizes to
   * integer micros BEFORE aggregating (double addition is
   * summation-order dependent; BIGINT sums are exact on any cluster
   * layout). One shuffle total, partial aggregation upstream of it.
   *
   * Preconditions: `tsCol` is a non-negative long (epoch nanos — `div`
   * truncates toward zero, so a negative timestamp would round its bar
   * UP); `valCol` non-null (a null value would make open/close skip the
   * row Spark-side while max/min skip it too, but null placement inside
   * the endpoint structs is engine-specific). */
  def ohlcBars(events: DataFrame, key: String, tsCol: String,
      valCol: String, tieCol: String, barNs: Long): DataFrame = {
    require(barNs > 0, s"barNs must be positive, got $barNs")
    events
      .groupBy(col(key), expr(s"$tsCol div ${barNs}L").as("__bar"))
      .agg(
        min(struct(col(tsCol), col(tieCol), col(valCol))).as("__o"),
        max(struct(col(tsCol), col(tieCol), col(valCol))).as("__c"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        sum(floor(col(valCol) * lit(1e6) + lit(0.5)).cast("long"))
          .as("v_micro"),
        count(lit(1)).as("n"))
      .select(col(key), (col("__bar") * lit(barNs)).as("bar_start"),
        col(s"__o.$valCol").as("open"), col("high"), col("low"),
        col(s"__c.$valCol").as("close"), col("v_micro"), col("n"))
  }

  /** Recency-decayed value aggregate: per key, Σ value·2^(−⌊age_days /
   * halfLifeDays⌋) — the "recent activity matters more" rollup behind
   * user-value scores, decayed counters, and freshness-weighted
   * sampling priors. Decay is a STAIRCASE dyadic: the exponent is an
   * integer (age bucketed by half-lives), so each weight is an exact
   * power of two and `value / 2^k` is pure exponent arithmetic — the
   * product never rounds, the EWMA dyadic-exactness argument applied to
   * an aggregate. Ages ≥ 63 half-lives weigh exactly 0 (below one ulp
   * of any practical sum anyway); per-event terms micro-quantize to
   * BIGINT before the sum, so totals are partitioning-independent and
   * oracle-exact. The reference instant is the observed max timestamp
   * (self-calibrating, one broadcast scalar). One scan + one keyed
   * hash-agg. Output: (key, n_events, decayed_micro, raw_micro). */
  def decayedValue(events: DataFrame, key: String, tsCol: String,
      valCol: String, halfLifeDays: Int = 7): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    val dayNs = 86400L * 1000000000L
    val ref = events.agg(max(col(tsCol)).as("t_ref"))
    // pure integer division end-to-end: ⌊⌊age_ns/day⌋ / halfLife⌋ — no
    // float quotient anywhere near an integer boundary to replay
    val kSql = s"((t_ref - $tsCol) div ${dayNs}L div $halfLifeDays)"
    val k = expr(kSql)
    val term = when(k < 63,
      floor((col(valCol) /
          expr(s"cast(shiftleft(1L, cast($kSql as int)) as double)"))
        * lit(1e6) + lit(0.5)).cast("long"))
      .otherwise(lit(0L))
    events.crossJoin(broadcast(ref))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_events"),
        sum(term).as("decayed_micro"),
        sum(floor(col(valCol) * lit(1e6) + lit(0.5)).cast("long"))
          .as("raw_micro"))
  }

  /** Seasonal-baseline deviation: per (key, hour-of-day) the all-days
   * mean count is the BASELINE, and each (key, day, hour-of-day) cell is
   * scored against it — the anomaly detector for traffic with a daily
   * rhythm, where [[ewmaAnomaly]]'s trailing mean would chase the cycle
   * itself (every morning ramp looks like a spike to a flat-history
   * smoother; to a seasonal baseline it IS the baseline). Day and
   * hour-of-day derive by pure integer division on the epoch-ns column
   * — never calendar functions, whose week/zone conventions differ
   * cross-engine. The baseline divides by the FULL day span
   * (max_day − min_day + 1, one broadcast scalar), so hours that are
   * silent on most days get an honestly small baseline instead of a
   * present-rows-only inflated one. All integer micro-units; the flag
   * is `n·1e6 > factor·baseline_micro AND n ≥ minBase` (the EWMA
   * spike-rule shape). One count agg + one (key, hod) agg + one keyed
   * join. Output: (key, day, hod, n, baseline_micro, is_anomaly). */
  def seasonalDeviation(events: DataFrame, key: String, tsCol: String,
      factor: Long = 3L, minBase: Long = 5L): DataFrame = {
    val cells = Dedup.materialize(events
      .groupBy(col(key),
        expr(s"$tsCol div ${86400L * 1000000000L}L").as("day"),
        expr(s"($tsCol div ${3600L * 1000000000L}L) % 24").as("hod"))
      .agg(count(lit(1)).as("n")))
    val span = cells.agg(
      (max("day") - min("day") + lit(1L)).as("n_days"))
    val base = cells.groupBy(col(key), col("hod"))
      .agg(sum("n").as("tot"))
      .crossJoin(broadcast(span))
      .select(col(key), col("hod"),
        expr("(tot * 1000000L) div n_days").as("baseline_micro"))
    cells.join(base, Seq(key, "hod"))
      .select(col(key), col("day"), col("hod"), col("n"),
        col("baseline_micro"),
        (col("n") * lit(1000000L) > lit(factor) * col("baseline_micro") &&
          col("n") >= lit(minBase)).as("is_anomaly"))
  }

  /** One-sided (upper) CUSUM change-point detection (Page, Biometrika
   * 1954) over a per-key ordered integer series — the sequential test
   * that catches a SUSTAINED small mean shift long before
   * [[ewmaAnomaly]]'s single-point spike rule (a +σ/2 drift never
   * trips a 2×-EWMA spike but accumulates linearly in CUSUM):
   *
   *   S_n = max(0, S_{n−1} + (x_n − target − slack)),  alarm at S_n > h
   *
   * The recurrence looks inherently sequential, but it folds into
   * windowed form through the prefix-sum identity: with
   * y_t = x_t − target − slack and C_n = Σ_{t≤n} y_t,
   *
   *   S_n = C_n − min(0, min_{t≤n} C_t)
   *
   * (the best restart point is the running minimum of the drift-adjusted
   * prefix) — so the whole detector is ONE per-key window sort carrying
   * two frames (running sum, running min), no self-join, no iteration,
   * exactly the [[ewmaAnomaly]] plan shape. All arithmetic is BIGINT on
   * the caller's units — pre-quantize fractional targets into the value
   * column's scale; the oracle replays `sum`/`min`/`least` on identical
   * integers. Output: (key, ord, x, s_stat, is_alarm). */
  def cusum(series: DataFrame, key: String, ordCol: String,
      valCol: String, target: Long, slack: Long,
      threshold: Long): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val w = Window.partitionBy(key).orderBy(ordCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withC = series.select(col(key), col(ordCol), col(valCol),
      sum(col(valCol).cast("long") - lit(target) - lit(slack)).over(w)
        .as("__c"))
    withC.select(col(key), col(ordCol), col(valCol),
        (col("__c") - least(lit(0L), min(col("__c")).over(w))).as("s_stat"))
      .withColumn("is_alarm", col("s_stat") > lit(threshold))
  }

  /** EWMA smoothing + spike detection over a REGULAR per-key series (one
   * row per (key, ord) — pre-bucket with [[ohlcBars]]/[[gapFill]] first):
   * the trailing exponentially-weighted mean with α = 1/2 truncated at
   * `lookback` lags,
   *
   *   ewma_prev_n = Σ_{i=1..lookback} x_{n−i} · 2^{−i}
   *   ewma_n      = x_n · ½ + ewma_prev_n · ½
   *
   * and a spike flag `x_n > spikeFactor·ewma_prev_n + minBase` once the
   * warmup window is full — the standard streaming anomaly baseline
   * (traffic surges, ingestion-rate monitors) in a form BOTH engines
   * evaluate bit-identically: α = ½ makes every weight a dyadic rational,
   * integer-valued x times 2^−i is exact in IEEE doubles, and the ≤
   * lookback+1-term sums stay inside the 52-bit mantissa for any
   * x < 2^40 — so the doubles (and the flag's comparison) replay exactly
   * in the oracle, no micro-quantization needed. Missing leading lags
   * count as 0 (the fold-from-zero truncated EWMA).
   *
   * Plan: `lookback`+1 `lag()` calls over ONE per-key window sort — a
   * single exchange + sort, no self-join; at 100 TB each key's series
   * sweeps independently (the [[peakConcurrency]] posture).
   * Output: (key, ord, x, ewma, is_spike). */
  /**
   * Sweep-line interval merge (the classic "merge overlapping intervals"
   * at per-key grain): every input row is an interval `[startCol, endCol)`
   * in the same integer time unit; touching or overlapping intervals per
   * key coalesce into islands, and the result is ONE row per key with the
   * island inventory — `n_intervals` (input), `n_islands` (merged),
   * `covered` (Σ island lengths — the de-overlapped activity footprint),
   * `span` (last end − first start) and `idle` (span − covered, the
   * between-island dead time).
   *
   * Shape: one per-key window sort; the island boundary test compares
   * each start against the running `max(end)` over STRICTLY preceding
   * rows (ROWS frame ending at −1 — `[1,10) [2,3) [4,20)` must stay one
   * island even though `[4,20)` starts after its immediate predecessor's
   * end), and island ids are the running sum of boundary flags. Island
   * extents then reduce by (key, island) and again by key — two hash-aggs
   * whose output is bounded by island count, never corpus size. State per
   * row is O(1); nothing is collected.
   *
   * All arithmetic stays in the input's integer unit (micros in the gate
   * query), so the cross-engine replay is exact.
   */
  def mergedIntervals(intervals: DataFrame, key: String,
      startCol: String, endCol: String): DataFrame = {
    val ord = Window.partitionBy(key).orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol)).over(
      ord.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L)
      .otherwise(0L)
    val withIsland = intervals
      .withColumn("__new", isNew)
      .withColumn("__island",
        sum(col("__new")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = withIsland.groupBy(col(key), col("__island"))
      .agg(min(startCol).as("i_start"), max(endCol).as("i_end"),
        count(lit(1)).as("i_n"))
    islands.groupBy(key)
      .agg(sum("i_n").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("i_end") - col("i_start")).as("covered"),
        (max("i_end") - min("i_start")).as("span"))
      .withColumn("idle", col("span") - col("covered"))
  }

  /** Per-key OLS trend slope over an integer series — "is this key's
   * traffic growing, and how fast": slope = (nΣtc − ΣtΣc)/(nΣt² −
   * (Σt)²) computed as an EXACT INTEGER RATIONAL (milli-units by a
   * single TRUNCATING division at the end — Spark `div` and DuckDB `//`
   * both round toward zero, so negative non-exact slopes round toward
   * zero, not down; no doubles anywhere, so the cross-engine replay is
   * trivially exact; contrast [[graft.ext
   * .TextAnalysis.zipfFit]], whose log-log axes force the quantized-ln
   * discipline). A constant-ord key (zero denominator: one point, or
   * repeated ords) yields NULL.
   *
   * Bounds: with ords re-based per key to 0..span (one min-window),
   * nΣtc ≤ n²·span·max|c| — day-grain ords and count-grade values keep
   * every product far inside BIGINT for any realistic key, and the
   * bound is ENFORCED, not assumed (the calibrationBins discipline): a
   * loud `assert_true` checks every cross-moment product against the
   * exact-BIGINT envelope before the integer arithmetic runs, so an
   * extreme key fails the job instead of wrapping silently to a wrong
   * slope in non-ANSI mode. One keyed hash-agg after the re-base
   * window; output one row per key: (key, n_points, slope_milli). */
  def keyedTrend(series: DataFrame, key: String, ordCol: String,
      valCol: String): DataFrame = {
    val w = Window.partitionBy(key)
    val t = (col(ordCol) - min(col(ordCol)).over(w)).cast("long")
    val c = col(valCol).cast("long")
    // every BIGINT product below must stay under Long.Max/1000 so the
    // ×1000 milli-scale and the two-term subtraction cannot wrap; the
    // check runs in doubles (exact enough at this margin — relative
    // double error ~1e-16 against a 2× safety factor)
    val lim = lit(4.0e15)
    val guarded = when(
      abs(col("n_points").cast("double") * col("__stc").cast("double")) < lim &&
      abs(col("__st").cast("double") * col("__sc").cast("double")) < lim &&
      abs(col("n_points").cast("double") * col("__stt").cast("double")) < lim &&
      abs(col("__st").cast("double") * col("__st").cast("double")) < lim,
      lit(true)).otherwise(lit(false))
    series
      .select(col(key), t.as("__t"), c.as("__c"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_points"),
        sum("__t").as("__st"), sum("__c").as("__sc"),
        sum(col("__t") * col("__t")).as("__stt"),
        sum(col("__t") * col("__c")).as("__stc"))
      .withColumn("__g", assert_true(guarded,
        lit("keyedTrend: cross-moment magnitude exceeds the exact-BIGINT " +
          "bound — re-base ords coarser or pre-aggregate values " +
          "(bounded-moment contract, see Experiment.calibrationBins)")))
      .where(col("__g").isNull)
      .select(col(key), col("n_points"),
        when(col("n_points") * col("__stt") -
          col("__st") * col("__st") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            "((n_points * __stc - __st * __sc) * 1000) div " +
              "(n_points * __stt - __st * __st)"))
          .as("slope_milli"))
  }

  /** Full per-key OLS readout — [[keyedTrend]]'s exact slope plus the
   * intercept and R² a dashboard actually plots: "growing 3/day from a
   * base of 7, and the line EXPLAINS the series (R² 0.98)" vs "slope 3
   * on noise (R² 0.1)". The slope stays the exact integer rational
   * (identical to keyedTrend, same loud cross-moment guard extended to
   * Σc²); intercept and R² are ONE fixed-shape double expression each
   * over the exact BIGINT moments (the welch/cuped discipline),
   * micro-quantized half-up — intercept in value micro-units at the
   * re-based origin (t = 0 = the key's first ord), R² in ppm-like
   * micro. Degenerate keys (zero ord variance) yield NULL slope/R²; a
   * constant series (zero value variance) yields R² NULL (0/0 is
   * undefined, not 1). One keyed hash-agg after the re-base window.
   * Output: (key, n_points, slope_milli, intercept_micro, r2_micro). */
  def keyedTrendFull(series: DataFrame, key: String, ordCol: String,
      valCol: String): DataFrame = {
    val w = Window.partitionBy(key)
    val t = (col(ordCol) - min(col(ordCol)).over(w)).cast("long")
    val c = col(valCol).cast("long")
    val lim = lit(4.0e15)
    def inLim(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      abs(a.cast("double") * b.cast("double")) < lim
    val guarded =
      inLim(col("n_points"), col("__stc")) &&
      inLim(col("__st"), col("__sc")) &&
      inLim(col("n_points"), col("__stt")) &&
      inLim(col("__st"), col("__st")) &&
      inLim(col("n_points"), col("__scc")) &&
      inLim(col("__sc"), col("__sc"))
    val agg = series
      .select(col(key), t.as("__t"), c.as("__c"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_points"),
        sum("__t").as("__st"), sum("__c").as("__sc"),
        sum(col("__t") * col("__t")).as("__stt"),
        sum(col("__t") * col("__c")).as("__stc"),
        sum(col("__c") * col("__c")).as("__scc"))
      .withColumn("__g", assert_true(guarded,
        lit("keyedTrendFull: cross-moment magnitude exceeds the " +
          "exact-BIGINT bound — re-base ords coarser or pre-aggregate " +
          "values (bounded-moment contract)")))
      .where(col("__g").isNull)
    // exact integer numerators/denominators, then fixed-shape doubles
    val nL = col("n_points")
    val dNum = nL * col("__stc") - col("__st") * col("__sc")
    val dDen = nL * col("__stt") - col("__st") * col("__st")
    val sCC = nL * col("__scc") - col("__sc") * col("__sc")
    val nD = nL.cast("double")
    val slopeD = dNum.cast("double") / dDen.cast("double")
    val interceptD = col("__sc").cast("double") / nD -
      slopeD * (col("__st").cast("double") / nD)
    val r2D = dNum.cast("double") * dNum.cast("double") /
      (dDen.cast("double") * sCC.cast("double"))
    agg.select(col(key), col("n_points"),
      when(dDen === 0L, lit(null).cast("long"))
        .otherwise(expr(
          "((n_points * __stc - __st * __sc) * 1000) div " +
            "(n_points * __stt - __st * __st)")).as("slope_milli"),
      when(dDen === 0L, lit(null).cast("long"))
        .otherwise(floor(interceptD * lit(1e6) + lit(0.5)).cast("long"))
        .as("intercept_micro"),
      when(dDen === 0L || sCC === 0L, lit(null).cast("long"))
        .otherwise(floor(r2D * lit(1e6) + lit(0.5)).cast("long"))
        .as("r2_micro"))
  }

  /** Inter-arrival burstiness per key (Goh & Barabási 2008): the
   * burstiness index B = (σ − μ)/(σ + μ) over a key's inter-event gaps
   * — −1 for a metronome (σ = 0), → 0 for a Poisson process (σ ≈ μ),
   * → 1 for extreme burst-and-silence. The behavioral fingerprint that
   * separates a human's bursty sessions from a bot's timer loop, on
   * the same axis for every key.
   *
   * Gaps quantize to whole SECONDS before the moment sums (a
   * micros-grain square would overflow BIGINT on month-long gaps; at
   * second grain each g² ≤ Long.Max for any gap under ~96 years, and
   * the residual Σg² exposure is the same accepted class as cuped's
   * pooled moments — exact integers' fixed-shape doubles, the CUPED
   * discipline). One per-key window sort (lag), one keyed
   * hash-agg; keys with < `minGaps` gaps are dropped (a one-gap σ is
   * noise). σ is the population std over gaps. Output:
   * (key, n_gaps, mean_gap_s, b_micro — NULL when σ + μ = 0). */
  def interArrivalBurstiness(events: DataFrame, key: String,
      tsCol: String, minGaps: Long = 2L): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsCol)
    val gaps = events
      .select(col(key),
        (col(tsCol) - lag(col(tsCol), 1).over(w)).as("__gns"))
      .filter(col("__gns").isNotNull)
      .select(col(key), expr("__gns div 1000000000").as("__g"))
    val agg = gaps.groupBy(col(key))
      .agg(count(lit(1)).as("n_gaps"), sum("__g").as("__s"),
        sum(col("__g") * col("__g")).as("__ss"))
      .filter(col("n_gaps") >= minGaps)
    val nD = col("n_gaps").cast("double")
    val mu = col("__s").cast("double") / nD
    val sigma = sqrt(
      (col("__ss").cast("double") - nD * mu * mu) / nD)
    agg.select(col(key), col("n_gaps"),
      expr("__s div n_gaps").as("mean_gap_s"),
      when(sigma + mu === 0.0, lit(null).cast("long"))
        .otherwise(floor((sigma - mu) / (sigma + mu) * lit(1e6) +
          lit(0.5)).cast("long")).as("b_micro"))
  }

  /** Sample autocorrelation function at lags 1..`maxLag` over a REGULAR
   * per-key integer series (one row per (key, ord) — pre-bucket with a
   * keyed count/[[ohlcBars]] first): the one-number-per-lag seasonality
   * detector (a daily rhythm in hourly counts shows as a positive lag-24
   * spike; an alternating load balancer as a negative lag-1) that tells
   * a pipeline WHICH period [[seasonalDeviation]] should baseline on,
   * instead of assuming 24.
   *
   * Estimator: the standard full-mean form
   *   r_k = Σ_{t≤n−k} (x_t − x̄)(x_{t+k} − x̄) / Σ (x_t − x̄)²
   * regrouped so every corpus-sized sum is an exact BIGINT — per key
   * (n, Σx, Σx²), per (key, lag) (m, Σx_t, Σx_{t+k}, Σx_t·x_{t+k}) —
   * and the combination is ONE fixed-shape double expression over those
   * exact sums (the CUPED discipline: both engines evaluate the
   * identical IEEE shape), micro-quantized half-up to ppm. A constant
   * series (zero variance) yields NULL, not NaN.
   *
   * Lags are ROW lags over the per-key ord sort — on a gap-free
   * bucketed series that is exactly time-lag k; gaps are the caller's
   * contract ([[gapFill]] exists for precisely that).
   *
   * Plan: `maxLag` lead()s over ONE per-key window sort (single
   * exchange + sort, no self-join), a `maxLag`-way narrow explode, one
   * (key, lag)-grain hash-agg joined to the broadcast key-grain stats —
   * at 100 TB each key's series sweeps independently and everything
   * after the window is (keys·maxLag)-sized. */
  def autocorrelation(series: DataFrame, key: String, ordCol: String,
      valCol: String, maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64,
      s"maxLag must be in [1, 64], got $maxLag")
    val w = Window.partitionBy(key).orderBy(ordCol)
    val x = col(valCol).cast("long")
    // NULL values are excluded SYMMETRICALLY up front (the
    // groupedOrderStats posture): without this, count(*) includes NULL
    // rows the sums skip and the pair filter drops only NULL leads, so a
    // caller violating the regular-series contract would get silently
    // skewed acf instead of consistent NULL-free estimates.
    val clean = series.filter(col(valCol).isNotNull)
    val withLeads = clean.select(
      col(key) +: x.as("__x") +:
        (1 to maxLag).map(k => lead(x, k).over(w).as(s"__l$k")): _*)
    val pairs = withLeads.select(col(key), col("__x"),
        explode(array((1 to maxLag).map(k =>
          struct(lit(k).as("lag_k"), col(s"__l$k").as("y"))): _*)).as("__p"))
      .select(col(key), col("__x").as("__xv"),
        col("__p.lag_k").as("lag_k"), col("__p.y").as("__y"))
      .filter(col("__y").isNotNull)
    val perLag = pairs.groupBy(col(key), col("lag_k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum("__xv").as("__sa"), sum("__y").as("__sb"),
        sum(col("__xv") * col("__y")).as("__sxy"))
    val perKey = clean.groupBy(col(key))
      .agg(count(lit(1)).as("__n"), sum(x).as("__sx"),
        sum(x * x).as("__sxx"))
    // fixed-shape double combination over the exact sums; xbar appears
    // as the same (Σx/n) sub-expression everywhere so the oracle can
    // write the literally identical shape
    val xbar = col("__sx").cast("double") / col("__n").cast("double")
    val num = col("__sxy").cast("double") -
      xbar * (col("__sa") + col("__sb")).cast("double") +
      col("n_pairs").cast("double") * xbar * xbar
    val den = col("__sxx").cast("double") -
      col("__n").cast("double") * xbar * xbar
    // key-grain × (key × lag)-grain equi-join: both sides are already
    // reduced relations, so AQE broadcasts the key-grain side when it
    // is small — no explicit hint (a forced broadcast would be a
    // driver-memory bet on key cardinality)
    perLag.join(perKey, key)
      .select(col(key), col("lag_k"), col("n_pairs"),
        when(den === 0.0, lit(null).cast("long"))
          .otherwise(floor(num / den * lit(1e6) + lit(0.5)).cast("long"))
          .as("acf_micro"))
  }

  def ewmaAnomaly(series: DataFrame, key: String, ordCol: String,
      valCol: String, lookback: Int = 12, spikeFactor: Double = 2.0,
      minBase: Double = 5.0): DataFrame = {
    require(lookback >= 1 && lookback <= 40,
      s"lookback must be in [1, 40] (exactness bound), got $lookback")
    val w = Window.partitionBy(key).orderBy(ordCol)
    val x = col(valCol).cast("double")
    val ewmaPrev = (1 to lookback).map(i =>
        coalesce(lag(x, i).over(w), lit(0.0)) * lit(math.pow(0.5, i)))
      .reduce(_ + _)
    series.select(col(key), col(ordCol), col(valCol),
        ewmaPrev.as("__ep"),
        (row_number().over(w) > lookback).as("__warm"))
      .select(col(key), col(ordCol), col(valCol),
        (x * lit(0.5) + col("__ep") * lit(0.5)).as("ewma"),
        (col("__warm") &&
          x > lit(spikeFactor) * col("__ep") + lit(minBase)).as("is_spike"))
  }

  /** Mann–Kendall trend test per key (Mann 1945; Kendall's τ machinery)
   * — the DISTRIBUTION-FREE significance complement of
   * [[keyedTrend]]/[[keyedTrendFull]]'s OLS slope: S = Σ_{i<j}
   * sign(v_j − v_i) over the ordered series asks "does the series
   * trend, monotonically, at all" with no linearity or normality
   * assumption, and no single outlier can move S by more than n−1.
   *
   * Exactness: S and the tie correction Σ t(t−1)(2t+5) are exact
   * BIGINT sums; Var(S) = (n(n−1)(2n+5) − Σties)/18 and the
   * continuity-corrected z ((S∓1)/√Var; exactly 0 at S = 0) are ONE
   * fixed-shape double each, micro-quantized half-up (the cuped
   * discipline). Var ≤ 0 (n < 2 or an all-tied series) yields NULL z,
   * never NaN.
   *
   * Contracts, loudly enforced: the series must be at (key, ord)
   * grain (duplicate ords would double-count pairs — asserted), and
   * per-key length ≤ `maxPoints` (the pair self-join is O(n²) per key
   * — the audit-slice bound; aggregate to a coarser ord first). Cost:
   * one keyed self-join at series grain + three keyed hash-aggs.
   * Output: (key, n_points, s_stat, tie_term, z_micro). */
  def mannKendall(series: DataFrame, key: String, ordCol: String,
      valCol: String, maxPoints: Long = 10000L): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val s = series.select(col(key).as("__k"),
      col(ordCol).cast("long").as("__t"), col(valCol).cast("long")
        .as("__v"))
    val n = s.groupBy("__k")
      .agg(count(lit(1)).as("n_points"),
        countDistinct("__t").as("__nd"))
      .withColumn("__g", assert_true(
        col("n_points") <= maxPoints && col("__nd") === col("n_points"),
        lit(s"mannKendall: series must be at (key, ord) grain with at " +
          s"most $maxPoints points per key — the pair expansion is " +
          "O(n²) (bounded-grain contract; pre-aggregate to a coarser " +
          "ord)")))
      .where(col("__g").isNull).drop("__g", "__nd")
    val pairs = s.toDF("__k", "__ta", "__va")
      .join(s.toDF("__k", "__tb", "__vb"), "__k")
      .filter(col("__ta") < col("__tb"))
      .groupBy("__k")
      .agg(sum(when(col("__vb") > col("__va"), 1L)
        .when(col("__vb") < col("__va"), -1L).otherwise(0L))
        .as("s_stat"))
    val ties = s.groupBy("__k", "__v").agg(count(lit(1)).as("__c"))
      .groupBy("__k")
      .agg(sum(col("__c") * (col("__c") - 1L) *
        (col("__c") * 2L + 5L)).as("tie_term"))
    val varS = ((col("n_points") * (col("n_points") - 1L) *
      (col("n_points") * 2L + 5L) - col("tie_term")).cast("double")) /
      lit(18.0)
    val z = when(col("s_stat") > 0L,
        (col("s_stat") - 1L).cast("double") / sqrt(varS))
      .when(col("s_stat") < 0L,
        (col("s_stat") + 1L).cast("double") / sqrt(varS))
      .otherwise(lit(0.0))
    n.join(pairs, Seq("__k"), "left").join(ties, Seq("__k"))
      .select(col("__k").as("key"), col("n_points"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"), col("tie_term"),
        when(varS > 0.0,
          floor(z * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(null).cast("long")).as("z_micro"))
  }

  /** Theil–Sen robust trend slope per key (Theil 1950 / Sen 1968) — the
   * estimator companion to [[mannKendall]]: MK says whether a monotone
   * trend is significant, this says HOW STEEP, immune to the outlier
   * days that drag an OLS slope (x14/x15). The slope is the LOWER
   * MEDIAN of all pairwise slopes (vb − va)/(tb − ta) over ta < tb —
   * median-of-pairs, the classic 29.3%-breakdown robust line.
   *
   * Exactness across engines: each pair's slope is micro-quantized by
   * TRUNCATING integer division — Spark's `div` and DuckDB's integer
   * `//` share exactly that semantics (both toward zero; probed — on
   * integers DuckDB's `//` does NOT floor), so the convention is also
   * the sign-symmetric one: mirroring the series negates every pair
   * slope exactly. The median is the exact (n+1) div 2 order statistic
   * of those integers (the lowerMedianQ convention: order statistics,
   * never interpolation). A loud 2e12 value-magnitude bound keeps
   * `diff·1e6` inside BIGINT on both engines.
   *
   * Same audit-slice contract as [[mannKendall]]: the pair self-join is
   * O(n²) per key behind the loud ≤ `maxPoints` (key, ord)-grain
   * assert; the intended grain is a pre-aggregated series (daily
   * counts, hourly rates), never raw events. Output:
   * (key, n_points, n_pairs, slope_med_micro — NULL for 1-point keys). */
  def theilSen(series: DataFrame, key: String, ordCol: String,
      valCol: String, maxPoints: Long = 10000L): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    // The magnitude gate is PER ROW, asserted strictly below the pair
    // arithmetic (r12 advice: the old max(abs(__v)) agg gate had TWO
    // holes — abs(Long.MinValue) wraps negative and silently passes a
    // <= 2e12 check, and under ANSI the pair subtraction's own overflow
    // RACES any agg-side gate across concurrently-materializing stages,
    // so the documented message won nondeterministically). One
    // codegen'd long comparison per row; the violating row refuses
    // before any arithmetic touches it.
    val s = series.select(col(key).as("__k"),
        col(ordCol).cast("long").as("__t"), col(valCol).cast("long")
          .as("__v"))
      .withColumn("__g", assert_true(
        col("__v") >= -2000000000000L && col("__v") <= 2000000000000L,
        lit("theilSen: value magnitude exceeds 2e12 — diff·1e6 would " +
          "leave BIGINT (bounded-moment contract); rescale the value")))
      .where(col("__g").isNull).drop("__g")
    val n = s.groupBy("__k")
      .agg(count(lit(1)).as("n_points"),
        countDistinct("__t").as("__nd"))
      .withColumn("__g", assert_true(
        col("n_points") <= maxPoints && col("__nd") === col("n_points"),
        lit(s"theilSen: series must be at (key, ord) grain with at " +
          s"most $maxPoints points per key — the pair expansion is " +
          "O(n²) (bounded-grain contract; pre-aggregate to a coarser " +
          "ord)")))
      .where(col("__g").isNull).drop("__g", "__nd")
    val slopes = s.toDF("__k", "__ta", "__va")
      .join(s.toDF("__k", "__tb", "__vb"), "__k")
      .filter(col("__ta") < col("__tb"))
      .select(col("__k"),
        ((col("__vb") - col("__va")) * lit(1000000L)).as("__d"),
        (col("__tb") - col("__ta")).as("__dt"))
      .select(col("__k"), expr("__d div __dt").as("slope_micro"))
    val med = graft.ext.Profile.groupedOrderStats(
        slopes, "__k", "slope_micro", k = 2)
      .filter(col("q") === 1)
      .select(col("key").as("__k"), col("vq").as("slope_med_micro"))
    val np = slopes.groupBy("__k").agg(count(lit(1)).as("n_pairs"))
    n.join(np, Seq("__k"), "left").join(med, Seq("__k"), "left")
      .select(col("__k").as("key"), col("n_points"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        col("slope_med_micro"))
  }
}
