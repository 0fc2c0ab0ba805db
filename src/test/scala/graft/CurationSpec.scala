package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup}

/** Composition locks for the curation pipeline (round-6 verdict #1): the
 * values of every stage are oracle-gated (pipe1_curation_report); these
 * tests pin the SHAPE that makes the composition viable at 100 TB —
 * the corpus is tokenized once, the LSH bucket cap is live, and the
 * optional embedding-decontamination signal composes correctly. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  // Near-dup structure: docs 3k/3k+1 are identical, 3k+2 unique; enough
  // tokens for both the width-3 near-dup shingles and the width-8 spans.
  private def docs = (0 until 30).map { i =>
    val base = i - (i % 3 min 1)   // 3k and 3k+1 share text
    (i.toLong, (1 to 24).map(j => s"w${(base * 7 + j) % 19}x$base").mkString(" "))
  }.toDF("doc_id", "text")

  private def bench = docs.filter(col("doc_id") % 10 === 0)

  test("composed pipeline tokenizes the corpus ONCE per width") {
    Dedup.tokenizationCounts.clear()
    val report = Curation.curationReport(docs, bench)
    val n = report.count()
    assert(n == 30, s"one disposition row per doc, got $n")
    val w3 = Dedup.tokenizationCounts.get(Dedup.ShingleWidth).get()
    val w8 = Dedup.tokenizationCounts.get(8).get()
    // width 3: one SHARED corpus derivation feeding both the near-dup and
    // the n-gram leak stage, plus the benchmark side's own (benchmark-sized)
    // shingling inside decontaminationHitsFromShingles. Before the shared-
    // relation fix this was 3 corpus derivations.
    assert(w3 == 2, s"expected 1 corpus + 1 bench tokenization at width 3, got $w3")
    // width 8 (span removal): its own positioned derivation, exactly once.
    assert(w8 == 1, s"expected 1 span-window tokenization at width 8, got $w8")
  }

  test("LSH bucket cap is live in the composed path") {
    // A pathological corpus where every doc shares one hot shingle set:
    // with the cap at default 100 nothing changes on this small input, but
    // maxBucket = 1 must suppress every LSH candidate (all buckets ≥ 2),
    // proving the parameter reaches lshCandidates instead of being
    // hard-wired off as before.
    val capped = Curation.curationReport(docs, bench, maxBucket = 1)
    assert(capped.filter(!col("neardup_keeper")).count() == 0,
      "maxBucket = 1 must suppress all LSH candidates => no near-dup losers")
    val uncapped = Curation.curationReport(docs, bench)
    assert(uncapped.filter(!col("neardup_keeper")).count() > 0,
      "fixture must produce near-dup losers when the cap is not binding")
  }

  test("embedding decontamination signal: None => constant false, Some => flags hits") {
    val none = Curation.curationReport(docs, bench)
    assert(none.filter(col("embed_contaminated")).count() == 0)

    // doc 5's embedding sits on the eval vector; doc 7's is orthogonal.
    val corpusVecs = Seq(
      (5L, Array(1f, 0f, 0f, 0f), 0), (7L, Array(0f, 1f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val evalVecs = Seq((100L, Array(1f, 0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val some = Curation.curationReport(docs, bench,
      embeddings = Some((corpusVecs, evalVecs)), minCos = 0.9)
    val flagged = some.filter(col("embed_contaminated"))
      .select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(5L), s"expected only doc 5 flagged, got $flagged")
    // the embed flag participates in keep: a doc failing ONLY this gate
    // must not be kept
    val row5 = some.filter(col("doc_id") === 5).head
    assert(!row5.getAs[Boolean]("keep") || !row5.getAs[Boolean]("lang_ok")
      || !row5.getAs[Boolean]("quality_ok") || row5.getAs[Boolean]("keep") == false)
  }
}
