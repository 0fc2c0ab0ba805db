package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/**
 * At-rest layout strategy for the write path — the other half of scan
 * pruning: `PushdownSpec` pins that filters reach the scan, this pins that
 * the STORED table gives them something to prune.
 *
 * The 100-TB posture for a fact table:
 *  - **Hive-partition by the dominant filter column(s)** (almost always the
 *    date / ingest-batch column): queries with a partition predicate skip
 *    whole directories before any file is opened (`PartitionFilters` in the
 *    scan, vs `PushedFilters` which still opens footers).
 *  - **Sort within partitions by the secondary filter key**: parquet
 *    row-group min/max stats become selective, so even non-partition
 *    predicates skip row groups.
 *  - **zstd compression**: ~30 % smaller than snappy at comparable decode
 *    speed — at 100 TB the difference is tens of TB of storage and scan IO.
 *  - **Bound file sizes** (`maxRecordsPerFile`): one file per partition
 *    value creates multi-GB files (no scan parallelism within a partition);
 *    unbounded small files create a metadata storm. Bounded records per
 *    file keeps both splits and the file count sane.
 *
 * Companion to `Bucketing` (which owns the join-key layout): partition for
 * PRUNING, bucket for JOINS.
 */
object WriteLayout {

  /** Write `df` as a pruning-friendly partitioned parquet table. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L,
      compression: String = "zstd"): Unit =
    df
      // co-locate each partition value before partitionBy: otherwise every
      // task writes a file per value it happens to hold (files = tasks ×
      // values, the classic small-file explosion)
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
}
