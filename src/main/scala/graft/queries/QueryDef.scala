package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One inventory entry: a Spark query over the testdata tables plus (where the
 * semantics are SQL-expressible) an equivalent DuckDB oracle statement.
 *
 * Contract notes (driver correctness gate):
 *  - every output column is aliased identically in the Spark plan and the SQL;
 *  - result sets are keyed/deterministic (ties broken explicitly) — the driver
 *    hash-compares values after sorting columns by name;
 *  - floating-point aggregates are rounded at the decimal position where the
 *    underlying math is exact, so double summation order cannot flip the hash;
 *  - integer-ish outputs are cast to matching widths in the SQL (DuckDB widens
 *    `year()` to BIGINT and `sum(BIGINT)` to HUGEINT where Spark keeps
 *    INT/BIGINT).
 */
final case class QueryDef(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    describe: String)

object Tables {
  /** Load a testdata table (`region nation customer supplier part orders
   * lineitem events documents embeddings`) from a scale-factor dir. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Frozen "today" for the reference's `current_date()`-derived age (P5) —
   * keeps every derived-age query deterministic and oracle-comparable. */
  val AsOfDate: java.sql.Date = java.sql.Date.valueOf("2026-01-01")
}
