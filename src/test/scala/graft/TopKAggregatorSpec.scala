package graft

import org.apache.spark.sql.functions._

import graft.functions.{ScoredId, TopKAggregator}

/** Bounded top-k aggregate: identical rows to the window-function form,
 * deterministic ties, k-bounded output per group. */
class TopKAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  test("aggregate form equals window form on the orders table") {
    val w1 = SparkEntry.queries("w1_topn_per_group")(spark, Sf)
      .select("o_custkey", "o_orderkey", "rn")
    val w4 = SparkEntry.queries("w4_topk_agg")(spark, Sf)
      .select("o_custkey", "o_orderkey", "rn")
    assert(w4.except(w1).isEmpty && w1.except(w4).isEmpty)
    assert(w4.count() == w1.count())
  }

  test("merge respects bound and ordering with ties") {
    val agg = new TopKAggregator(2)
    val a = List(ScoredId(9.0, 5L), ScoredId(7.0, 1L))
    val b = List(ScoredId(9.0, 2L), ScoredId(8.0, 9L))
    // ties on ord resolve by smaller id first
    assert(agg.merge(a, b) == List(ScoredId(9.0, 2L), ScoredId(9.0, 5L)))
  }

  test("plan is a hash aggregate, not a window sort") {
    val plan = SparkEntry.queries("w4_topk_agg")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    assert(plan.contains("Aggregate") || plan.contains("ObjectHashAggregate"),
      s"expected aggregate in:\n$plan")
  }
}
