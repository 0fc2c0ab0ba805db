package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Key-salting for skewed shuffles.
 *
 * AQE's skew-join handling splits oversized sort-merge partitions at
 * runtime, which covers most batch skew. Salting remains the tool when
 * AQE can't help: hot keys in shuffled-hash joins, streaming stateful
 * aggregation where one key dominates, or when a single key exceeds what
 * one task can hold even after AQE splitting.
 *
 * `saltedJoin` replicates the (small) right side `factor` times and
 * scatters the left side across the replicas with a deterministic salt, so
 * a hot key's rows spread over `factor` tasks instead of one.
 */
object Skew {

  /** Deterministic salt in [0, factor): hashes the row's whole tuple, so
   * the same input always lands on the same replica (replayable tests,
   * idempotent retries). */
  private def saltCol(df: DataFrame, factor: Int) =
    pmod(hash(df.columns.map(col): _*), lit(factor))

  /** Inner equi-join with the left side salted and the right side
   * replicated. Result set equals the unsalted join exactly. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0)
    val saltedLeft = left.withColumn("__salt", saltCol(left, factor))
    val replicatedRight = right.withColumn("__rep",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedLeft.join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
        col("__salt") === col("__rep"))
      .drop("__salt", "__rep")
      .drop(replicatedRight(key))
  }

  /** Two-phase salted aggregation: partial per (keys, salt), final per
   * keys. Only needed for aggregates where the map-side partial can't
   * shrink a hot key enough (e.g. collect-heavy or high-cardinality
   * distinct under one dominant key). `aggs` must be decomposable
   * (sum/count/min/max). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      factor: Int): DataFrame = {
    df.withColumn("__salt", saltCol(df, factor))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as("total"), sum("__pcnt").as("n"))
  }
}
