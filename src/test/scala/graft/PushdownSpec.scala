package graft

import org.apache.spark.sql.functions._

/** Plan-level locks for scan efficiency: predicates and projections must
 * reach the parquet scan — at 100 TB a scan that reads every column for a
 * two-column projection, or filters after the read, is the whole ballgame. */
class PushdownSpec extends SparkTestBase {

  private def planString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("literal predicate is pushed into the parquet scan") {
    val df = spark.read.parquet(s"$Sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val plan = planString(df)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(o_orderpriority,1-URGENT)"), plan)
  }

  test("projection prunes the read schema to selected columns") {
    val df = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val plan = planString(df)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"),
      readSchema)
  }

  test("null-safety guard pushes IsNotNull to the scan") {
    val df = spark.read.parquet(s"$Sf/customer.parquet")
      .filter(col("c_name").isNotNull)
      .select("c_custkey")
    val plan = planString(df)
    assert(plan.contains("IsNotNull(c_name)"), plan)
  }
}
