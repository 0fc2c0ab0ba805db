package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

/** Gates for the in-engine BPE tokenizer. Training is iterative-argmax and
 * has no SQL oracle — its merges are pinned against hand computations
 * here; the ENCODE expression (which sp16 oracle-gates at corpus scale) is
 * additionally proven equal to the independent driver-side reference
 * implementation over every corpus word and a set of adversarial repeated
 * patterns. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("train learns the hand-computed merges on a tiny corpus") {
    // "low low low lower": counts low=3, lower=1.
    // Pairs: (l,o)=4, (o,w)=4, (w,</w>)=3, (w,e)=1, (e,r)=1, (r,</w>)=1.
    // Tie (l,o) vs (o,w) at 4 → lexicographically smaller (l,o) first.
    val docs = Seq((0L, "low low low lower")).toDF("doc_id", "text")
    val m = Bpe.train(docs, 4)
    assert(m == Seq(("l", "o"), ("lo", "w"), ("low", "</w>"), ("e", "r")))
  }

  test("training order matters: merges chain into whole frequent words") {
    // The frozen table (trained on the synthetic corpus) must end in the
    // multi-step chains that spell whole words — proof the iteration
    // composes units rather than repeatedly picking char pairs.
    assert(Bpe.FrozenMerges.contains(("jo", "in</w>")))
    assert(Bpe.FrozenMerges.contains(("h", "ash</w>")))
  }

  test("frozen table reproduces training on the sf0.01 word counts") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert(Bpe.train(docs, 24) == Bpe.FrozenMerges)
  }

  test("encode expression equals the reference encode on every corpus word") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val rows = words
      .select(col("w"),
        Bpe.encodeWordExpr(col("w"), Bpe.FrozenMerges).as("enc"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = Bpe.encodeWord(r.getString(0), Bpe.FrozenMerges)
        .mkString(" ")
      assert(r.getString(1) == expect, s"word ${r.getString(0)}")
    }
  }

  test("doubled replace handles adjacent repeated pairs like the reference") {
    // Adversarial shapes for the boundary-space overlap: alternating and
    // run-repeated patterns under merges that chain into each other.
    val merges = Seq(("a", "b"), ("ab", "ab"), ("a", "a"))
    val words = Seq("abab", "ababab", "abababab", "aaa", "aaaa", "aabab",
      "ba", "bab", "abba")
    val out = words.toDF("w")
      .select(col("w"), Bpe.encodeWordExpr(col("w"), merges).as("enc"))
      .collect()
    out.foreach { r =>
      val expect = Bpe.encodeWord(r.getString(0), merges).mkString(" ")
      assert(r.getString(1) == expect, s"word ${r.getString(0)}")
    }
  }

  test("merge table round-trips through its parquet artifact in order") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_art").toString
    Bpe.save(spark, Bpe.FrozenMerges, dir)
    val loaded = Bpe.load(spark, dir)
    assert(loaded == Bpe.FrozenMerges, "order IS the model")
    // encode under the loaded table is byte-identical to the in-memory one
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val a = Bpe.tokenCounts(docs, Bpe.FrozenMerges)
      .orderBy("doc_id").collect().toSeq
    val b = Bpe.tokenCounts(docs, loaded).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("token counts: fanout shrinks as merges grow") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    def meanFanout(n: Int): Double = {
      val m = Bpe.FrozenMerges.take(n)
      Bpe.tokenCounts(docs, m)
        .agg(avg("fanout")).collect().head.getDouble(0)
    }
    val none = meanFanout(0)
    val half = meanFanout(12)
    val full = meanFanout(24)
    assert(none > half && half > full,
      s"more merges must mean fewer symbols per word: $none, $half, $full")
  }
}
