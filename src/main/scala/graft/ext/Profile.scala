package graft.ext

import org.apache.spark.sql.DataFrame
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
}
