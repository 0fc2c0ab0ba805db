package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/**
 * Backward as-of join: for each left row, attach the value columns of the
 * latest right row with the same key and `rightTime <= leftTime`.
 *
 * Scalable implementation (the union/sort trick used by time-series engines):
 * instead of a range-condition join (which Spark plans as a broadcast
 * nested-loop join at O(|L|·|R|) per key), union both sides tagged, shuffle
 * ONCE on the key, sort within partitions by (time, tag), and carry the
 * right values forward with `last(_, ignoreNulls=true)` over a running
 * window. Cost: one shuffle + one sort — same as a sort-merge join —
 * regardless of the time-range overlap between the sides.
 *
 * Right-side (key, time) pairs must be unique for deterministic output —
 * pre-aggregate the right side if needed. Both `time` columns must share a
 * comparable type (align units before calling).
 *
 * The reference has no as-of operator (SURVEY.md §2.4 — no joins at all);
 * this is a north-star extension for the analytics layer.
 */
object AsOfJoin {

  /** `tolerance` (optional): the standard time-series as-of bound — a
   * match farther than `tolerance` time units from the left row is
   * DROPPED (right values null), e.g. "latest quote at most 5 minutes
   * old". Requires a NUMERIC time column (align units before calling —
   * the same contract the time comparison itself already imposes). */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightVals: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    asof(left, right, key, time, rightVals, forward = false, tolerance)

  /** Forward as-of: for each left row, the EARLIEST right row with the same
   * key and `rightTime >= leftTime` — "next event at or after t" (next
   * order after a campaign touch, next error after a deploy). Same
   * one-shuffle union/sort machinery with the scan order reversed.
   * `tolerance` as in [[asofBackward]]: matches more than `tolerance`
   * units PAST the left time are dropped. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightVals: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    asof(left, right, key, time, rightVals, forward = true, tolerance)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightVals: Seq[String],
      forward: Boolean,
      tolerance: Option[Long]): DataFrame = {
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    // `__t` is the matched-time field INSIDE the right-side struct (built
    // below): a right value column literally named `__t` would sit next to
    // it in the same struct, making `col("__m.__t")` ambiguous and the
    // tolerance comparison wrong (round-4 advice). The other scaffold
    // names (`__key/__time/__tag/__l/__r/__m`) cannot collide: user
    // columns only ever travel INSIDE the `__l`/`__r` structs, never
    // alongside the scaffold columns themselves.
    require(!rightVals.contains("__t"),
      "rightVals may not contain a column named '__t' (reserved for the " +
        "matched-time field of the as-of struct) — rename it before joining")

    val leftCols = left.columns.toSeq
    val leftStruct = StructType(left.schema.fields)
    // The right side rides as ONE struct (matched time + value columns), so
    // the window carries whole ROWS: value and matched-time can never come
    // from different right rows (per-column ignoreNulls carries would let a
    // stale non-null value pair with a newer row's time when the newer
    // row's value column is null), and a right row whose value IS null
    // matches as itself — row semantics, exactly DuckDB ASOF / pandas
    // merge_asof.
    val rightStruct = StructType(
      StructField("__t", right.schema(time).dataType,
        right.schema(time).nullable) +: rightVals.map(right.schema(_)))

    // Right rows tag 0 → sort before left rows at equal time (inclusive
    // as-of in both directions).
    val taggedRight = right.select(
      col(key).as("__key"), col(time).as("__time"), lit(0).as("__tag"),
      lit(null).cast(leftStruct).as("__l"),
      struct(col(time).as("__t") +: rightVals.map(col): _*).as("__r"))

    val taggedLeft = left.select(
      col(key).as("__key"), col(time).as("__time"), lit(1).as("__tag"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rightStruct).as("__r"))

    // Backward walks time ascending carrying the latest right row forward;
    // forward walks time DESCENDING carrying the earliest following right
    // row backward — identical cost either way (one shuffle + one sort).
    val w = (if (forward)
        Window.partitionBy("__key").orderBy(col("__time").desc, col("__tag"))
      else Window.partitionBy("__key").orderBy(col("__time").asc, col("__tag")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Out-of-tolerance match -> right values null, same row kept (the
    // standard asof-with-tolerance contract, e.g. pandas merge_asof).
    def projected(c: String) = tolerance match {
      case None => col(s"__m.$c")
      case Some(tol) =>
        val keep =
          if (forward) col("__m.__t") - col("__time") <= tol
          else col("__time") - col("__m.__t") <= tol
        when(keep, col(s"__m.$c")).otherwise(lit(null))
    }

    taggedRight.unionByName(taggedLeft)
      .select(col("__tag"), col("__l"), col("__time"),
        last(col("__r"), ignoreNulls = true).over(w).as("__m"))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightVals.map(c => projected(c).as(c)): _*)
  }
}
