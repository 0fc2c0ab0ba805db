package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Retrieval, TextAnalysis}

/** Behavior locks for the Gopher repetition panel, the LSH recall
 * diagnostic, and reciprocal-rank fusion (values are oracle-gated by
 * t19/d21/t18; these pin the semantics the oracles can't express —
 * hand-computed fractions, monotonicity of the bucket cap, fusion
 * ordering). */
class RepetitionRecallSpec extends SparkTestBase {
  import spark.implicits._

  // ---- gopherRepetition ----

  test("top-2-gram char fraction matches the hand computation") {
    // "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → top "a b" ×3,
    // gram chars 3, doc chars 11 → 3·3/11 = 0.8182
    val d = Seq((0L, "a b a b a b")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRepetition(d).collect().head
    assert(r.getAs[Double]("top2_frac") == 0.8182)
  }

  test("dup-5-gram coverage counts every occurrence, overlaps once") {
    // "x y z w v x y z w v": 5-gram "x y z w v" occurs at positions 0 and
    // 5 — the two windows tile the whole doc → coverage 10/10 tokens.
    val d = Seq((0L, "x y z w v x y z w v")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRepetition(d).collect().head
    assert(r.getAs[Double]("dup5_frac") == 1.0)
    assert(!r.getAs[Boolean]("rep_pass"))
  }

  test("a doc with no repeated 5-gram scores dup5 = 0") {
    val d = Seq((0L, (0 until 20).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRepetition(d).collect().head
    assert(r.getAs[Double]("dup5_frac") == 0.0)
    assert(r.getAs[Boolean]("rep_pass"))
  }

  test("docs shorter than the gram widths score 0.0 everywhere and pass") {
    val d = Seq((0L, "solo")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRepetition(d).collect().head
    Seq("top2_frac", "top3_frac", "top4_frac", "dup5_frac").foreach(c =>
      assert(r.getAs[Double](c) == 0.0, c))
    assert(r.getAs[Boolean]("rep_pass"))
  }

  test("repetition panel is partition-independent") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val a = TextAnalysis.gopherRepetition(docs)
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.gopherRepetition(docs.repartition(7))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  // ---- lshRecall ----

  test("lshRecall invariants: hits bound by truth and candidates") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val r = Dedup.lshRecall(docs, minJaccard = 0.5, samplePct = 100)
      .collect().head
    val (nTruth, nCand, nHit) =
      (r.getAs[Long]("n_truth"), r.getAs[Long]("n_cand"),
        r.getAs[Long]("n_hit"))
    assert(nHit <= nTruth && nHit <= nCand)
    assert(r.getAs[Long]("n_sample") == docs.count())
    if (nTruth > 0) {
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("bucket cap can only shrink the candidate set") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val unc = Dedup.lshRecall(docs, samplePct = 100)
      .collect().head.getAs[Long]("n_cand")
    val cap = Dedup.lshRecall(docs, samplePct = 100, maxBucket = 2)
      .collect().head.getAs[Long]("n_cand")
    assert(cap <= unc)
  }

  // ---- rrfFuse ----

  test("RRF: a doc ranked in both lists outranks single-list docs") {
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val rows = Retrieval.rrfFuse(Seq(a, b), k = 10).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L, 3L))
    assert(rows.head.getAs[Long]("n_lists") == 2L)
    // floor(1e6/61) + floor(1e6/62) — exact integer micros
    assert(rows.head.getAs[Long]("rrf_q") == 16393L + 16129L)
  }

  // ---- plan posture ----

  test("repetition panel plans no window sort (struct-min argmax)") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val plan = TextAnalysis.gopherRepetition(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort found in:\n$plan")
  }

  test("BPE token counting is one narrow pass: no exchange in the plan") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val plan = graft.ext.Bpe
      .tokenCounts(docs, graft.ext.Bpe.FrozenMerges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"shuffle found in a pure projection:\n$plan")
  }

  test("RRF cut is a bounded TakeOrderedAndProject, not a global sort") {
    // The input must exceed k or EliminateLimits removes the cut entirely
    // (maxRows ≤ limit) and there is nothing to assert about.
    val a = (1 to 20).map(i => (i.toLong, i)).toDF("doc_id", "rank")
    val plan = Retrieval.rrfFuse(Seq(a), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("RRF is deterministic under repartitioning and rank ties") {
    val a = Seq((1L, 1), (2L, 1)).toDF("doc_id", "rank")
    val r1 = Retrieval.rrfFuse(Seq(a), k = 2).collect().map(_.getLong(0))
    val r2 = Retrieval.rrfFuse(Seq(a.repartition(5)), k = 2)
      .collect().map(_.getLong(0))
    assert(r1.toSeq == Seq(1L, 2L) && r2.toSeq == Seq(1L, 2L))
  }
}
