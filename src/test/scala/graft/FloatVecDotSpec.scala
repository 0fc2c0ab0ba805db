package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.functions.GraftFunctions

/** Native codegen'd FloatVecDot vs the builtin zip_with/aggregate
 * composition: bit-identical results (same cast + accumulation order),
 * null propagation, and SQL registration via the extensions path. */
class FloatVecDotSpec extends SparkTestBase {
  import spark.implicits._

  test("native dot is bit-identical to builtin composition on real data") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet").limit(100)
    val pairs = emb.toDF("ida", "a", "la")
      .crossJoin(emb.toDF("idb", "b", "lb"))
      .filter($"ida" < $"idb").limit(2000)
    val diff = pairs.select(
      (Similarity.dot($"a", $"b") - Similarity.dotBuiltin($"a", $"b")).as("d"))
      .agg(max(abs($"d"))).as[Double].first()
    assert(diff == 0.0)  // exactly zero: same fp operations in same order
  }

  test("null input yields null") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1f, 2f), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(GraftFunctions.vecDot($"a", $"b")).collect().head
    assert(r.isNullAt(0))
  }

  test("resolves in SQL through the registry") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").as[Double].first()
    assert(r == 11.0)
  }
}
