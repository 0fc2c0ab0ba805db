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

  test("typed imperative form equals the udaf form (and both bound by k)") {
    graft.functions.GraftFunctions.register(spark)
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
    val viaUdaf = {
      val topk = udaf(new TopKAggregator(3))
      orders.groupBy("o_custkey")
        .agg(topk($"o_totalprice", $"o_orderkey").as("top"))
        .select($"o_custkey", posexplode($"top"))
        .select($"o_custkey", $"col.ord", $"col.id", $"pos")
    }
    val viaTyped = orders.groupBy("o_custkey")
      .agg(graft.functions.GraftFunctions.topK(
        $"o_totalprice", $"o_orderkey", 3).as("top"))
      .select($"o_custkey", posexplode($"top"))
      .select($"o_custkey", $"col.ord", $"col.id", $"pos")
    assert(viaTyped.except(viaUdaf).isEmpty && viaUdaf.except(viaTyped).isEmpty)
    assert(viaTyped.count() == viaUdaf.count())
    val maxPerGroup = viaTyped.groupBy("o_custkey").count()
      .agg(max("count")).first().getLong(0)
    assert(maxPerGroup <= 3)
  }

  test("typed buffer: insert/merge/serde respect bound and tie ordering") {
    val buf = new graft.functions.TopKBuffer(2)
    buf.insert(9.0, 5L); buf.insert(7.0, 1L); buf.insert(9.0, 2L); buf.insert(8.0, 9L)
    // ties on ord resolve by smaller id first; k=2 bound enforced
    assert(buf.n == 2 && buf.ords.toList == List(9.0, 9.0) &&
      buf.ids.toList == List(2L, 5L))
    val agg = graft.functions.TypedTopK(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0),
      org.apache.spark.sql.catalyst.expressions.Literal(0L), 2)
    val rt = agg.deserialize(agg.serialize(buf))
    assert(rt.n == 2 && rt.ords.toList == buf.ords.toList &&
      rt.ids.toList == buf.ids.toList)
    val other = new graft.functions.TopKBuffer(2)
    other.insert(10.0, 7L)
    val merged = agg.merge(rt, other)
    assert(merged.ords.take(2).toList == List(10.0, 9.0) &&
      merged.ids.take(2).toList == List(7L, 2L))
  }

  test("plan is a hash aggregate, not a window sort") {
    val plan = SparkEntry.queries("w4_topk_agg")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    assert(plan.contains("Aggregate") || plan.contains("ObjectHashAggregate"),
      s"expected aggregate in:\n$plan")
  }
}
