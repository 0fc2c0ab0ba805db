package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{Curation, Incremental}
import graft.streaming.{StreamingCuration, StreamingEtl}

/** The incrementally maintained curation table (round-6 verdict #5): a
 * 3-micro-batch document stream through [[StreamingCuration.curationSink]]
 * must land, version by version, on EXACTLY the one-shot
 * [[Curation.curationReport]] of the accumulated corpus — including the one
 * non-monotone disposition (a later batch bridging two existing near-dup
 * clusters flips the larger cluster's keeper to loser via a `U` merge row).
 * Also pins replay idempotence of the batch-keyed state legs and retention
 * via [[Incremental.vacuum]]. */
class StreamingCurationSpec extends SparkTestBase {
  import spark.implicits._

  // Shared-pad bridge geometry, LSH-verified deterministic (the md5-seeded
  // minhash bands for THESE tokens yield candidates (0,10) and (4,10) and
  // no (0,4) bucket): X = A++P and Y = P++B share only the pad's interior
  // shingles (jac 0.2941 < 0.3 -> separate clusters), while the bridge
  // A++P++B contains each side's full shingle set (jac 0.6471 to both).
  private val A = (1 to 12).map(j => s"a2q$j")
  private val B = (1 to 12).map(j => s"b2q$j")
  private val P = (1 to 12).map(j => s"p2q$j")
  private val X = (A ++ P).mkString(" ")
  private val Y = (P ++ B).mkString(" ")
  private def uniq(i: Int) = (1 to 24).map(j => s"u${i}t$j").mkString(" ")

  // batch 1: two near-dup clusters ({0,1} on X, {4,5} on Y) + unique docs
  private val b1 = Seq(0L -> X, 1L -> X, 2L -> uniq(2), 3L -> uniq(3),
    4L -> Y, 5L -> Y, 6L -> uniq(6))
  // batch 2: doc 10 BRIDGES the two clusters (near-dup of both sides at
  // minJaccard = 0.3) -> merged cluster keeps keeper 0, doc 4 flips
  // keeper->loser; doc 12 is an exact cross-batch copy of X
  private val b2 = Seq(10L -> (A ++ P ++ B).mkString(" "),
    11L -> uniq(11), 12L -> X)
  // batch 3: doc 20 copies a 10-token run of doc 2 (cross-batch span cut,
  // but too little 3-shingle overlap for a near-dup edge)
  private val b3 = Seq(
    20L -> ((1 to 14).map(j => s"z$j").mkString(" ") + " " +
      uniq(2).split(" ").take(10).mkString(" ")),
    21L -> uniq(21))

  private def bench = Seq(1000L -> uniq(2)).toDF("doc_id", "text")
  private def corpusVecs = Seq(
    (2L, Array(1f, 0f, 0f, 0f), 0), (6L, Array(0f, 1f, 0f, 0f), 0)
  ).toDF("vec_id", "embedding", "label")
  private def evalVecs = Seq((9000L, Array(1f, 0f, 0f, 0f), 0))
    .toDF("vec_id", "embedding", "label")

  test("3-batch incremental curation == one-shot curationReport on the union") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("curation_table").toString
    val stateDir = Files.createTempDirectory("curation_state").toString
    val cp = Files.createTempDirectory("curation_cp").toString

    val input = MemoryStream[(Long, String)]
    val docsStream = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
    val sink = StreamingCuration.curationSink(tableDir, stateDir, bench,
      minJaccard = 0.3, embeddings = Some((corpusVecs, evalVecs)),
      minCos = 0.9)
    val q = StreamingEtl.start(docsStream, cp, Seq(sink))
    Seq(b1, b2, b3).foreach { b =>
      input.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()

    val allDocs = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val expected = Curation.curationReport(allDocs, bench,
      minJaccard = 0.3, embeddings = Some((corpusVecs, evalVecs)),
      minCos = 0.9)
    val actual = Incremental.currentBase(spark, tableDir)
    assert(actual.columns.toSeq == expected.columns.toSeq)
    val key = actual.columns.toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    assert(rows(actual).sameElements(rows(expected)),
      s"incremental table diverged from one-shot report:\n" +
        s"got ${rows(actual).mkString("\n")}\n" +
        s"want ${rows(expected).mkString("\n")}")

    // the flip actually happened (the U-row path is exercised, not vacuous):
    // after batch 1 doc 4 was its cluster's keeper; the batch-2 bridge
    // merged the clusters and demoted it
    def keeperOf(asOf: Long, id: Long): Boolean =
      Incremental.baseAsOf(spark, tableDir, asOf)
        .filter(col("doc_id") === id)
        .select("neardup_keeper").as[Boolean].head()
    assert(keeperOf(0, 4L), "doc 4 must start as its own cluster's keeper")
    assert(!keeperOf(2, 4L), "the batch-2 bridge must demote doc 4")
    assert(keeperOf(2, 0L), "the merged cluster's keeper is doc 0")

    // exact cross-batch signals landed
    val byId = actual.collect().map(r => r.getLong(0) -> r).toMap
    assert(!byId(12L).getAs[Boolean]("exact_keeper"),
      "doc 12 duplicates batch-1 text; its keeper lives in batch 1")
    assert(byId(12L).getAs[Int]("span_kept") == 0,
      "doc 12's every span window was already seen in batch 1")
    assert(byId(20L).getAs[Int]("span_kept") < 24 &&
      byId(20L).getAs[Int]("span_kept") > 0,
      "doc 20's copied run is cut, its fresh prefix kept")
    assert(byId(3L).getAs[Boolean]("contaminated") == false)
    assert(byId(2L).getAs[Boolean]("contaminated"),
      "doc 2 shares its full text with bench doc 1000")
    assert(byId(2L).getAs[Boolean]("embed_contaminated"),
      "doc 2's embedding sits on the eval vector")
    assert(!byId(6L).getAs[Boolean]("embed_contaminated"))

    // replay idempotence: re-running the last micro-batch (foreachBatch is
    // at-least-once) must leave the table byte-identical — batch-keyed
    // state legs and the merge sink's v=<batchId> both overwrite in place
    sink.write(b3.toDF("doc_id", "text"), 2L)
    val replayed = Incremental.currentBase(spark, tableDir)
    assert(rows(replayed).sameElements(rows(expected)),
      "replaying the last batch changed the table")

    // retention: vacuum keeps the chain bounded and the current version
    // intact (keepLast >= 2 so a further replay could still re-derive)
    val dropped = Incremental.vacuum(spark, tableDir, keepLast = 2)
    assert(Incremental.listVersions(spark, tableDir).size == 2)
    assert(dropped.nonEmpty)
    assert(rows(Incremental.currentBase(spark, tableDir))
      .sameElements(rows(expected)))
  }

  test("state-leg compaction mid-stream preserves the maintained table") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("curation_table_c").toString
    val stateDir = Files.createTempDirectory("curation_state_c").toString
    val cp = Files.createTempDirectory("curation_cp_c").toString
    val sink = StreamingCuration.curationSink(tableDir, stateDir, bench,
      minJaccard = 0.3)

    val input = MemoryStream[(Long, String)]
    val docsStream = input.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = StreamingEtl.start(docsStream, cp, Seq(sink))
    Seq(b1, b2).foreach { b => input.addData(b: _*); q.processAllAvailable() }

    // maintenance between batches: legs b=0,b=1 exist per kind; the fold
    // boundary (all but the newest) is a single leg, so nothing folds yet —
    // then after batch 3 the b=0..1 prefix folds into one leg per kind
    val none = StreamingCuration.compactState(spark, stateDir)
    assert(none.values.forall(_ == 0), s"two legs -> nothing to fold: $none")
    input.addData(b3: _*); q.processAllAvailable()
    q.stop()
    val folded = StreamingCuration.compactState(spark, stateDir)
    assert(folded("sh") == 1 && folded("fps") == 1 && folded("clusters") == 1,
      s"b=0 must fold into b=1 per kind: $folded")

    // the compacted state still serves: replay the last batch (the only
    // batch that can replay — its leg was NOT folded) and the table must
    // land on the one-shot report of the union
    sink.write(b3.toDF("doc_id", "text"), 2L)
    val expected = Curation.curationReport(
      (b1 ++ b2 ++ b3).toDF("doc_id", "text"), bench, minJaccard = 0.3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    assert(rows(Incremental.currentBase(spark, tableDir))
      .sameElements(rows(expected)),
      "post-compaction replay diverged from the one-shot report")
  }
}
