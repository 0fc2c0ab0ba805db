package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** SpaceSaving heavy-hitter aggregate: exact regime (capacity >= distinct),
 * eviction error bounds, and shuffle-boundary serde. */
class SpaceSavingSpec extends SparkTestBase {
  import spark.implicits._

  private def hh(df: org.apache.spark.sql.DataFrame, cap: Int, k: Int) = {
    GraftFunctions.register(spark)
    df.agg(GraftFunctions.heavyHitters(col("item"), cap, k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.item", $"e.n", $"e.err")
      .as[(String, Long, Long)].collect()
  }

  test("exact regime: counts match groupBy, err = 0, partition-independent") {
    val items = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c") ++
      Seq.fill(2)("d")).toDF("item")
    val expected = Seq(("a", 50L, 0L), ("b", 30L, 0L), ("c", 7L, 0L), ("d", 2L, 0L))
    assert(hh(items, cap = 10, k = 4).toSeq == expected)
    assert(hh(items.repartition(7), cap = 10, k = 4).toSeq == expected)
  }

  test("eviction regime: overestimates bounded, true heavy hitter survives") {
    // skewed single-partition stream: 'hot' 60x among 30 rare singletons
    val rows = (1 to 30).flatMap(i => Seq(s"rare$i", "hot", "hot"))
    val items = rows.toDF("item").coalesce(1)
    val out = hh(items, cap = 4, k = 4)
    val n = rows.size.toLong
    val hot = out.find(_._1 == "hot").get
    assert(hot._2 >= 60L)                   // SpaceSaving never undercounts
    assert(hot._2 - hot._3 <= 60L)          // count - err <= true count
    out.foreach { case (_, cnt, err) =>
      assert(err <= n / 4 + 1)              // err bounded by ~n/capacity
      assert(cnt >= err)                    // count includes the inherited mass
    }
    assert(out.head._1 == "hot")            // the true heavy hitter ranks first
  }

  test("k truncates below capacity with deterministic (n DESC, item ASC) order") {
    val items = (Seq.fill(5)("x") ++ Seq.fill(5)("y") ++ Seq.fill(3)("z"))
      .toDF("item")
    val out = hh(items, cap = 10, k = 2)
    assert(out.toSeq == Seq(("x", 5L, 0L), ("y", 5L, 0L)))
  }
}
