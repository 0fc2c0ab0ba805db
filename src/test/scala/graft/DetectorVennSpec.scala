package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Composition locks for the cross-detector Venn (round-8 verdict #1):
 * d34's VALUES are oracle-gated; these tests pin the SHAPE — the corpus
 * is tokenized once for both shingle consumers (MinHash banding and the
 * winnow selection), and the composed operator is result-identical to
 * building the three detectors independently. */
class DetectorVennSpec extends SparkTestBase {
  import spark.implicits._

  // Near-dup structure at three grains: 3k/3k+1 identical (every
  // detector fires), 3k+2 unique; enough tokens for width-3 shingles
  // and the win=4 winnow selection.
  private def docs = (0 until 30).map { i =>
    val base = i - (i % 3 min 1)
    (i.toLong, (1 to 24).map(j => s"w${(base * 7 + j) % 19}x$base").mkString(" "))
  }.toDF("doc_id", "text")

  test("composed Venn tokenizes the corpus ONCE at the shingle width") {
    Dedup.tokenizationCounts.clear()
    val venn = Dedup.nearDupDetectorVenn(docs)
    val n = venn.count()
    assert(n >= 1, s"expected at least one mask row, got $n")
    val w3 = Dedup.tokenizationCounts.get(Dedup.ShingleWidth).get()
    // ONE shared positioned-shingle derivation feeds both MinHash
    // banding (via the distinct projection) and the winnow selection.
    // Before the composed form this was 2 corpus derivations (the
    // winnow detector re-tokenized what MinHash had already paid for;
    // SimHash tokenizes at WORD grain and never registers here).
    assert(w3 == 1,
      s"expected exactly 1 corpus tokenization at width ${Dedup.ShingleWidth}, got $w3")
  }

  test("composed Venn is result-identical to independent detectors") {
    val composed = Dedup.nearDupDetectorVenn(docs)
      .orderBy("mask").collect().map(r => (r.getLong(0), r.getLong(1)))
    val independent = Dedup.detectorAgreement(Seq(
        1 -> Dedup.minhashDedupPairs(docs, 0.5, maxBucket = Int.MaxValue),
        2 -> Dedup.simhashPairs(docs),
        4 -> Dedup.winnowCandidates(docs, width = Dedup.ShingleWidth,
          win = 4, minShared = 2, maxPostings = 100)))
      .orderBy("mask").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(composed.nonEmpty && composed.sameElements(independent),
      s"composed ${composed.toSeq} != independent ${independent.toSeq}")
  }

  test("materializeShared knob cannot change the result, only the cost") {
    // r9 verdict #2 flipped the default to nomat (the measured winner on
    // the IO-bound bench host); the two forms must stay bit-identical
    val mat = Dedup.nearDupDetectorVenn(docs, materializeShared = true)
      .orderBy("mask").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nomat = Dedup.nearDupDetectorVenn(docs, materializeShared = false)
      .orderBy("mask").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mat.nonEmpty && mat.sameElements(nomat),
      s"mat ${mat.toSeq} != nomat ${nomat.toSeq}")
  }

  test("identical doc pairs are found by all three detectors (mask 7)") {
    val byMask = Dedup.nearDupDetectorVenn(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ten identical (3k, 3k+1) pairs — every detector must see them
    assert(byMask.getOrElse(7L, 0L) == 10L,
      s"expected the 10 identical pairs at mask 7, got $byMask")
  }
}
