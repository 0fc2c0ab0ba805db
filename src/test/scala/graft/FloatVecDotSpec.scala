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

  test("double-array side is bit-identical to builtin composition") {
    GraftFunctions.register(spark)
    val planes = Similarity.rpPlanes(dim = 64, bits = 4)
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet").limit(200)
    planes.foreach { w =>
      val diff = emb.select(
        (Similarity.dot($"embedding", lit(w)) -
          aggregate(
            zip_with($"embedding", lit(w), (x, y) => x.cast("double") * y),
            lit(0.0), (acc, v) => acc + v)).as("d"))
        .agg(max(abs($"d"))).as[Double].first()
      assert(diff == 0.0)  // float side widens, double side passes through
    }
  }

  test("rp cells: deterministic, in range, and derived cells drive knn") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    val planes = Similarity.rpPlanes(dim = 64, bits = 4)
    // plane weights live on the exact 1/1000 grid (oracle-replayable)
    assert(planes.flatten.forall(w => w >= -1.0 && w <= 1.0 &&
      math.round(w * 1000) / 1000.0 == w))
    val cells = emb.select(Similarity.rpCell($"embedding", planes).as("cell"))
    val bounds = cells.agg(min($"cell"), max($"cell")).first()
    assert(bounds.getInt(0) >= 0 && bounds.getInt(1) < 16)
    // same planes => same assignment on re-derivation (content-stable)
    val again = emb.select(Similarity.rpCell($"embedding",
      Similarity.rpPlanes(dim = 64, bits = 4)).as("cell"))
    assert(cells.exceptAll(again).isEmpty && again.exceptAll(cells).isEmpty)
    // knnRp == knnCell over the materialized derived column
    val withCell = emb.withColumn("c", Similarity.rpCell($"embedding", planes))
    val viaKnnCell = Similarity.knnCell(
      withCell.filter($"vec_id" < 5), withCell, "c", 3)
    val viaKnnRp = Similarity.knnRp(
      emb.filter($"vec_id" < 5), emb, 3, bits = 4, dim = 64)
    assert(viaKnnRp.exceptAll(viaKnnCell).isEmpty &&
      viaKnnCell.exceptAll(viaKnnRp).isEmpty)
  }

  test("multi-probe knn never finds a worse best-neighbor than single-probe") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    def best(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.filter($"rank" === 1).select($"q_id", $"sim")
        .as[(Long, Double)].collect().toMap
    val single = best(Similarity.knnRp(emb.filter($"vec_id" < 10), emb, 3))
    val multi = best(Similarity.knnRpMultiProbe(emb.filter($"vec_id" < 10), emb, 3))
    // multi-probe candidates are a superset: its best sim can only be >=
    assert(single.keySet.subsetOf(multi.keySet))
    single.foreach { case (q, s) => assert(multi(q) >= s) }
  }

  test("recallAtK: exact-vs-itself is 1.0, multiprobe never below single-probe") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val exact = Similarity.knnBrute(q, emb, 3)
    val self = Similarity.recallAtK(exact, exact, 3)
      .select("recall").as[Double].collect()
    assert(self.nonEmpty && self.forall(_ == 1.0))
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg($"recall")).as[Double].first()
    val single = mean(Similarity.recallAtK(Similarity.knnRp(q, emb, 3), exact, 3))
    val multi = mean(Similarity.recallAtK(Similarity.knnRpMultiProbe(q, emb, 3), exact, 3))
    assert(multi >= single)  // more probes can only add exact hits
  }

  test("int8 quantization: values in range, dequant error within half a step") {
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet").limit(100)
    val joined = Similarity.quantizeInt8(emb).join(emb, "vec_id")
    val r = joined.select(
      max(array_max(zip_with($"q", $"embedding", (qi, x) =>
        abs(qi.cast("double") * $"scale" / lit(127.0) - x.cast("double")) / $"scale")))
        .as("max_rel_err"),
      min(array_min($"q")).as("qmin"),
      max(array_max($"q")).as("qmax")).first()
    assert(r.getAs[Double]("max_rel_err") <= 0.5 / 127 + 1e-12)
    assert(r.getAs[Int]("qmin") >= -127 && r.getAs[Int]("qmax") <= 127)
  }

  test("resolves in SQL through the registry") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").as[Double].first()
    assert(r == 11.0)
  }
}
