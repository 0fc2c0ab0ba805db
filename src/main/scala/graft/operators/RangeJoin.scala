package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (range) join with NO equality key: attach to each point row the
 * interval row(s) whose `[lo, hi)` contains the point.
 *
 * Spark plans a bare `p >= lo AND p < hi` join as a broadcast nested-loop
 * join — O(|points|·|intervals|) comparisons and a full broadcast of one
 * side, which collapses as soon as the interval table outgrows driver
 * memory (IP-range tables, session windows, price bands at 100 TB have
 * millions of intervals). The scalable form is bin-replication blocking,
 * the same technique behind interval joins in time-series/geo engines:
 *
 *  1. pick a bin width `w`;
 *  2. replicate each interval to every bin it overlaps —
 *     `explode(sequence(floor(lo/w), floor((hi-1)/w)))`, amplification
 *     bounded by `avgSpan/w + 1`;
 *  3. map each point to its single bin `floor(p/w)`;
 *  4. hash-join on the bin key and re-apply the exact range predicate.
 *
 * Each matching (point, interval) pair meets in exactly ONE bin — the
 * point's — so no post-join dedup is needed. Cost: one shuffle of each
 * side on the bin key (AQE broadcasts the replicated intervals when they
 * are genuinely small), versus the nested loop's broadcast-everything.
 * `w` trades replication (small w) against bin selectivity (large w);
 * set it near the median interval span.
 *
 * The reference has no joins at all (SURVEY.md §2.4); this is a north-star
 * extension alongside [[AsOfJoin]] — as-of covers "latest value at or
 * before t", this covers "which enclosing interval(s)".
 */
object RangeJoin {

  /** `points(pointCol)` must be integral (LONG-castable); intervals carry
   * `[loCol, hiCol)` half-open integral bounds with `lo < hi`. Output: one
   * row per (point, enclosing interval), all columns of both inputs. */
  def binnedRangeJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")

    // floorDiv, not floor(a/b): integer bins with exact arithmetic (a
    // double division would lose precision past 2^53 — real for ns
    // timestamps), correct for negative domains too.
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("long").cast("decimal(20,0)") / binWidth).cast("long")

    val binnedIntervals = intervals.withColumn(
      "__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol) - 1))))
    val binnedPoints = points.withColumn("__bin", bin(col(pointCol)))

    binnedPoints
      .join(binnedIntervals, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
