package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning: when a shuffle join's small side
 * carries a selective predicate, Catalyst can inject a bloom-filter
 * aggregate on that side and a `might_contain` probe into the OTHER side's
 * scan — rows that cannot join die before the shuffle. At 100 TB this is
 * the difference between shuffling the whole fact table and shuffling the
 * ~1 % that survives the dimension filter. The engine's sessions leave the
 * feature ON (Spark default); the production thresholds (10 MB creation
 * side, 10 GB application side) are sized for real tables, so this spec
 * lowers them to force injection on test-scale data and pins the plan
 * shape. */
class RuntimeFilterSpec extends SparkTestBase {

  test("selective dim filter injects a bloom probe into the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force the shuffle-join regime the feature targets: no broadcast,
      // thresholds admitting the tiny test tables
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val lineitem = spark.read.parquet(s"$Sf/lineitem.parquet")
      val orders = spark.read.parquet(s"$Sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity").cast("decimal(20,2)")).as("q"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"), optimized)
      // and the probe guards the FACT side scan, not the dim side
      assert(optimized.indexOf("might_contain") <
        optimized.indexOf("o_orderpriority = 1-URGENT") ||
        optimized.contains("bloom_filter_agg"), optimized)

      // correctness unchanged by the runtime filter
      val q = joined.collect().head.getDecimal(1)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val qOff = joined.collect().head.getDecimal(1)
      assert(q == qOff)
    } finally {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
