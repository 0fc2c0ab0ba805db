package graft

import org.apache.spark.sql.functions._

import graft.ext.{Retrieval, Selection, TextAnalysis}

/** Behavior locks for the round-7 selection/retrieval additions (their
 * VALUES are oracle-gated by sp12/sp13/t16/t17; these pin the semantics
 * the oracles can't express — ranking direction, determinism under
 * repartitioning, and the published methods' qualitative contracts). */
class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  // Target-vocabulary docs (0-9, "a*" words), pool docs drawn either from
  // the target vocabulary (10-14) or from a disjoint one (15-19, "b*").
  private def docs = (0 until 20).map { i =>
    val vocab = if (i < 15) "a" else "b"
    val txt = (0 until 30).map(j => s"$vocab${(i * 3 + j) % 7}").mkString(" ")
    (i.toLong, txt, if (i < 10) "tgt" else "pool")
  }.toDF("doc_id", "text", "role")

  test("DSIR: pool docs matching the target vocabulary outweigh disjoint ones") {
    val w = Selection.dsirWeights(docs, col("role") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.keySet == (10L until 20L).toSet, "weights cover exactly the pool")
    val likeTarget = (10L until 15L).map(w)
    val disjoint = (15L until 20L).map(w)
    assert(likeTarget.min > disjoint.max,
      s"target-vocab pool docs must all outweigh disjoint-vocab ones: " +
        s"$likeTarget vs $disjoint")
  }

  test("DSIR weights are partition-independent") {
    val a = Selection.dsirWeights(docs, col("role") === "tgt")
      .orderBy("doc_id").collect().toSeq
    val b = Selection.dsirWeights(docs.repartition(7), col("role") === "tgt")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("DSIR Gumbel resample: k distinct pool docs, same set every run") {
    val s1 = Selection.dsirResample(docs, col("role") === "tgt", k = 4)
      .select("doc_id").as[Long].collect().toSeq
    val s2 = Selection.dsirResample(docs.repartition(5), col("role") === "tgt", k = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(s1 == s2, "resample must be deterministic under repartitioning")
    assert(s1.distinct.size == 4, "without replacement: k distinct ids")
    assert(s1.forall(id => id >= 10L && id < 20L), "only pool docs are candidates")
  }

  test("DSIR bigram features separate word order where unigram features can't") {
    // Target repeats one bigram chain; pool doc 10 matches the chain, doc
    // 11 has the SAME unigrams reversed. Unigram buckets are identical for
    // both, so sp12-style weights tie; bigram features split them.
    val chain = (0 until 24).map(j => s"c${j % 6}")
    val d = ((0 until 8).map(i => (i.toLong, chain.mkString(" "), "tgt")) ++
      Seq((10L, chain.mkString(" "), "pool"),
        (11L, chain.reverse.mkString(" "), "pool")))
      .toDF("doc_id", "text", "role")
    def w(ngrams: Int): Map[Long, Long] =
      Selection.dsirWeights(d, col("role") === "tgt", ngrams)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val uni = w(1)
    assert(uni(10L) == uni(11L), "unigram weights cannot see order")
    val bi = w(2)
    assert(bi(10L) > bi(11L),
      s"bigram weights must favor the in-order doc: ${bi(10L)} vs ${bi(11L)}")
  }

  test("BM25: higher query-term frequency ranks higher at equal length") {
    val d = Seq(
      (1L, "x x x x q q q q"),   // tf(q)=4
      (2L, "x x x x x x q q"),   // tf(q)=2
      (3L, "x x x x x x x x")    // no hit
    ).toDF("doc_id", "text")
    val top = Retrieval.bm25TopK(d, Seq("q"), k = 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L), s"tf order with the no-hit doc absent, got $top")
  }

  test("BM25: at equal tf the shorter document ranks higher (length norm)") {
    val d = Seq(
      (1L, "q q " + Seq.fill(30)("x").mkString(" ")),
      (2L, "q q x x")
    ).toDF("doc_id", "text")
    val top = Retrieval.bm25TopK(d, Seq("q"), k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(top == Seq(2L, 1L), s"shorter doc first, got $top")
  }

  test("BM25 is partition-independent") {
    val base = docs.select(col("doc_id"), col("text"))
    val a = Retrieval.bm25TopK(base, Seq("a1", "a2"), k = 8).collect().toSeq
    val b = Retrieval.bm25TopK(base.repartition(7), Seq("a1", "a2"), k = 8)
      .collect().toSeq
    assert(a == b)
  }

  test("Stupid Backoff: a seen chain scores near zero, unseen order pays " +
      "the double-backoff penalty") {
    // Reference "a b c a b c ...": nearly every trigram is the only
    // continuation of its context (S = 1; the end-of-doc dangling bigram
    // leaves one context at 42/48), so the in-order pool doc's mean NLL
    // is tiny. The reversed doc's trigrams AND backoff bigrams are all
    // unseen → every position takes the α² unigram branch (−ln ≈ 2.93).
    val chain = (0 until 24).map(j => Seq("a", "b", "c")(j % 3))
    val d = ((0 until 6).map(i => (i.toLong, chain.mkString(" "), true)) ++
      Seq((10L, chain.mkString(" "), false),
        (11L, chain.reverse.mkString(" "), false)))
      .toDF("doc_id", "text", "is_ref")
    val x = TextAnalysis.stupidBackoffXent(d, col("is_ref"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(x.keySet == Set(10L, 11L))
    assert(x(10L)._1 == 22L, "n_tri = tokens - 2")
    assert(x(10L)._2 < 0.1, s"seen chain must be near-free: ${x(10L)._2}")
    assert(x(11L)._2 > 2.0, s"all-backoff doc must pay: ${x(11L)._2}")
  }

  test("Stupid Backoff: trigram context beats the bigram model on " +
      "two-word-history patterns") {
    // Reference (one 3-token doc per line): "a b c"×3, "d b e"×3,
    // "a b e"×1, "d b c"×1. Bigram counts are SYMMETRIC — (a b)=(d b)=4,
    // (b c)=(b e)=4 — so the bigram model ties the two pool docs exactly;
    // trigram counts are asymmetric — (a b c)=3 vs (a b e)=1 — so only
    // the two-word context separates them.
    val refDocs = Seq.fill(3)("a b c") ++ Seq.fill(3)("d b e") ++
      Seq("a b e", "d b c")
    val d = (refDocs.zipWithIndex.map { case (t, i) => (i.toLong, t, true) } ++
      Seq((20L, "a b c", false), (21L, "a b e", false)))
      .toDF("doc_id", "text", "is_ref")
    val tri = TextAnalysis.stupidBackoffXent(d, col("is_ref"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(tri(20L) < tri(21L),
      s"trigram context must separate: ${tri(20L)} vs ${tri(21L)}")
    val bi = TextAnalysis.bigramCrossEntropy(d, col("is_ref"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(bi(20L) == bi(21L),
      s"bigram model is blind to the swap: ${bi(20L)} vs ${bi(21L)}")
  }

  test("Stupid Backoff is partition-independent") {
    val d = (0 until 12).map { i =>
      (i.toLong, (0 until 12).map(j => s"t${(i + j) % 4}").mkString(" "),
        i < 6)
    }.toDF("doc_id", "text", "is_ref")
    val a = TextAnalysis.stupidBackoffXent(d, col("is_ref"))
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.stupidBackoffXent(d.repartition(7), col("is_ref"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("bigram xent: in-distribution word ORDER scores below scrambled order") {
    // Reference: a strongly-patterned bigram chain. Pool doc 10 repeats the
    // chain (every bigram seen); doc 11 has identical UNIGRAMS reversed so
    // its bigrams are unseen — a unigram model can't separate them.
    val chain = (0 until 20).map(j => s"c${j % 5}")
    val d = ((0 until 10).map(i => (i.toLong, chain.mkString(" "), true)) ++
      Seq((10L, chain.mkString(" "), false),
        (11L, chain.reverse.mkString(" "), false)))
      .toDF("doc_id", "text", "is_ref")
    val x = TextAnalysis.bigramCrossEntropy(d, col("is_ref"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(x.keySet == Set(10L, 11L), "scores cover exactly the pool")
    assert(x(10L)._1 == 19L && x(11L)._1 == 19L, "n_bg = tokens - 1")
    assert(x(10L)._2 < x(11L)._2,
      s"in-order doc must score lower xent: ${x(10L)._2} vs ${x(11L)._2}")
  }

  test("bigram xent is partition-independent and skips sub-bigram docs") {
    val d = (0 until 12).map { i =>
      val txt = if (i == 11) "solo" else (0 until 10).map(j => s"t${(i + j) % 4}").mkString(" ")
      (i.toLong, txt, i < 6)
    }.toDF("doc_id", "text", "is_ref")
    val a = TextAnalysis.bigramCrossEntropy(d, col("is_ref"))
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.bigramCrossEntropy(d.repartition(5), col("is_ref"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(!a.map(_.getLong(0)).contains(11L), "a 1-token doc has no bigrams")
  }

  test("Kneser-Ney: hand-computed interpolated score on a tiny model") {
    // Ref "a b a b a c": c2 = {ab:2, ba:2, ac:1}; ctx a = (3, 2 succ),
    // ctx b = (2, 1); cont(b) = 1; T = 3. Pool "a b":
    //   s = (2 - 0.75)/3 + ((0.75·2)/3)·(1/3)
    val d = Seq((0L, "a b a b a c", true), (10L, "a b", false))
      .toDF("doc_id", "text", "is_ref")
    val r = TextAnalysis.kneserNeyXent(d, col("is_ref")).collect()
    assert(r.length == 1 && r(0).getLong(0) == 10L && r(0).getLong(1) == 1L)
    val s = math.max(2.0 - 0.75, 0.0) / 3.0 + ((0.75 * 2.0) / 3.0) * (1.0 / 3.0)
    val nllQ = math.floor(-math.log(s) * 1e6 + 0.5).toLong
    assert(r(0).getLong(2) == nllQ, s"s_q must replay the hand score: " +
      s"${r(0).getLong(2)} vs $nllQ")
  }

  test("Kneser-Ney: continuation count separates equal-frequency words " +
      "(the 'Francisco' property)") {
    // "francisco" occurs 4× but ALWAYS after "san" (1 continuation
    // context); "cat" occurs 4× after 4 DISTINCT contexts. A unigram (or
    // Stupid-Backoff-to-unigram) model scores them identically after a
    // novel context; KN's continuation count makes "cat" the likelier
    // continuation — exactly Kneser & Ney's motivating example.
    val ref = Seq("san francisco", "san francisco", "san francisco",
      "san francisco", "big cat", "fat cat", "old cat", "red cat")
    val d = (ref.zipWithIndex.map { case (t, i) => (i.toLong, t, true) } ++
      Seq((20L, "zzz francisco", false), (21L, "zzz cat", false)))
      .toDF("doc_id", "text", "is_ref")
    val x = TextAnalysis.kneserNeyXent(d, col("is_ref"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(x(21L) < x(20L),
      s"many-context word must outscore one-context word after a novel " +
        s"context: cat=${x(21L)} vs francisco=${x(20L)}")
  }

  test("Kneser-Ney is partition-independent and skips sub-bigram docs") {
    val d = (0 until 12).map { i =>
      val txt = if (i == 11) "solo"
        else (0 until 10).map(j => s"t${(i + j) % 4}").mkString(" ")
      (i.toLong, txt, i < 6)
    }.toDF("doc_id", "text", "is_ref")
    val a = TextAnalysis.kneserNeyXent(d, col("is_ref"))
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.kneserNeyXent(d.repartition(5), col("is_ref"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(!a.map(_.getLong(0)).contains(11L), "a 1-token doc has no bigrams")
  }
}
