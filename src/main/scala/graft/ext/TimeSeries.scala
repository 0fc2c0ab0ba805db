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
}
