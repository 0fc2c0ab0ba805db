package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table layout: the storage-side half of the 100-TB join story.
 *
 * Writing both sides of a recurring equi-join bucketed (and sorted) by the
 * join key lets every subsequent join/aggregation on that key run with NO
 * shuffle — each task zips the matching bucket files. At 100 TB this is the
 * difference between an hourly pipeline re-shuffling the fact table per run
 * and one that pre-pays the shuffle once at ingest.
 */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table in the
   * session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-key bucketed tables; with equal bucket counts Catalyst
   * plans a SortMergeJoin with no Exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
