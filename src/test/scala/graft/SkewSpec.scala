package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted join/aggregate must be result-identical to the unsalted forms. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // 90% of left rows share one hot key.
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i))
      .toDF("k", "v")
    val right = Seq((42L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")

    val plain = left.join(right, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(left, right, "k", factor = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedSumCount equals plain aggregation") {
    val df = (1 to 5000).map(i => (i.toLong % 3, i.toDouble)).toDF("k", "value")
    val plain = df.groupBy("k")
      .agg(sum("value").as("total"), count(lit(1)).as("n"))
      .as[(Long, Double, Long)].collect().toSet
    val salted = Skew.saltedSumCount(df, "k", "value", factor = 16)
      .as[(Long, Double, Long)].collect().toSet
    assert(salted == plain)
  }
}
