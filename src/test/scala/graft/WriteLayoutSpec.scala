package graft

import org.apache.spark.sql.functions._

import graft.sources.WriteLayout

/** The write path must produce a layout the read path can PRUNE: partition
 * directories skipped by partition predicates, zstd files, bounded file
 * counts. Round-trip fidelity is the base requirement. */
class WriteLayoutSpec extends SparkTestBase {

  private val out = "/root/repo/target/test_write_layout"

  test("partitioned zstd layout: round-trip, directory pruning, bounded files") {
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
    WriteLayout.writePartitioned(orders, out,
      partitionCols = Seq("o_orderpriority"), sortCols = Seq("o_custkey"))

    val back = spark.read.parquet(out)
    // fidelity: same rows (modulo column order — partition col moves last)
    assert(back.count() == orders.count())
    assert(back.columns.toSet == orders.columns.toSet)
    val sumBack = back.agg(sum("o_orderkey")).head().getLong(0)
    val sumOrig = orders.agg(sum("o_orderkey")).head().getLong(0)
    assert(sumBack == sumOrig)

    // layout: hive partition dirs, zstd parquet files inside
    val root = new java.io.File(out)
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("o_orderpriority=")), dirs.mkString(","))
    val files = root.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    assert(files.forall(_.getName.contains(".zstd.")),
      files.map(_.getName).take(3).mkString(","))

    // pruning: a partition predicate lands in PartitionFilters (directory
    // skip), NOT PushedFilters (per-file footer evaluation)
    val plan = back.filter(col("o_orderpriority") === "1-URGENT")
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("o_orderpriority"), plan)
  }
}
