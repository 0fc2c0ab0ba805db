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
   * lineitem events documents embeddings`) from a scale-factor dir.
   *
   * `events.ts` is normalized to the engine's contract — BIGINT epoch
   * nanos — whatever the file's physical type: driver-generated testdata
   * has carried TIMESTAMP(NANOS) (which the session's `nanosAsLong` conf
   * already surfaces as long) in some rounds and TIMESTAMP(MICROS) (read
   * as TIMESTAMP_NTZ) in others; without the normalization every
   * event-time query breaks on the micros vintage. The NTZ→timestamp cast
   * is a pure reinterpretation under the pinned UTC session timezone, so
   * the long matches DuckDB's `epoch_ns(ts)` on the same file exactly. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        import org.apache.spark.sql.functions._
        df.withColumn("ts",
          unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }

  /** Frozen "today" for the reference's `current_date()`-derived age (P5) —
   * keeps every derived-age query deterministic and oracle-comparable. */
  val AsOfDate: java.sql.Date = java.sql.Date.valueOf("2026-01-01")
}
