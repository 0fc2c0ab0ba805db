package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.GraftFunctions

/** Native MinHash12 vs the builtin md5-prefix composition
 * (Dedup.seededHash): bit-identical for every seed on real shingles,
 * null propagation, SQL registration, and edge shapes (empty string,
 * unicode, long input spanning md5 blocks). */
class MinHash12Spec extends SparkTestBase {
  import spark.implicits._

  test("all 12 hashes bit-identical to seededHash on real shingles") {
    GraftFunctions.register(spark)
    val sh = Dedup.shingles(spark.read.parquet(s"$Sf/documents.parquet"))
      .limit(5000)
    val checks = (0 until Dedup.NumHashes).map { s =>
      sum(when(element_at(col("h"), s + 1) === Dedup.seededHash(col("sh"), s), 0)
        .otherwise(1)).as(s"bad$s")
    }
    val row = sh.withColumn("h", GraftFunctions.minhash12(col("sh")))
      .agg(checks.head, checks.tail: _*).first()
    (0 until Dedup.NumHashes).foreach(s => assert(row.getLong(s) == 0L))
  }

  test("edge shapes match the builtin") {
    GraftFunctions.register(spark)
    val inputs = Seq("", "a", "héllo wörld ünïcode", "日本語 テスト 文章",
      "x" * 500, "a b c:d e", "0:prefix collision probe")
    val df = inputs.toDF("sh")
    val bad = df.select(
      GraftFunctions.minhash12(col("sh")).as("h"), col("sh"))
      .select((0 until Dedup.NumHashes).map(s =>
        (element_at(col("h"), s + 1) === Dedup.seededHash(col("sh"), s))
          .as(s"ok$s")): _*)
      .collect()
    bad.foreach(r => (0 until Dedup.NumHashes).foreach(i => assert(r.getBoolean(i))))
  }

  test("null input yields null; resolves in SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_minhash12(CAST(NULL AS STRING))").collect().head
    assert(r.isNullAt(0))
    val arr = spark.sql("SELECT graft_minhash12('abc def ghi')")
      .first().getSeq[Long](0)
    assert(arr.length == Dedup.NumHashes)
    assert(arr.forall(v => v >= 0L && v <= 0xffffffffL))
  }
}
