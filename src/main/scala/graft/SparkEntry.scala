package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * `queries` aggregates every implemented operator from SURVEY.md §2 (plus the
 * north-star extensions); `oracleSql` carries the DuckDB-equivalent statement
 * for each SQL-expressible entry. Column names are aliased identically on
 * both sides — the driver sorts columns by name before hashing.
 */
object SparkEntry {

  /** All inventory modules, merged. Keys must be unique across modules. */
  private def allDefs: Map[String, QueryDef] =
    CoreQueries.defs ++ RelationalQueries.defs ++ ExtensionQueries.defs ++
      GraphQueries.defs ++ AnalyticsQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs("p6_derive_profile").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (name, d) => name -> d.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (name, QueryDef(_, Some(sql), _)) =>
      name -> sql.linesIterator.map(_.trim).mkString(" ").trim
    }
}
