package graft.ext

import org.apache.spark.sql.DataFrame

/** Incremental index maintenance: [[AnnIndex.appendIvfPq]] must extend the
 * searchable corpus exactly as if the appended rows had been encoded at
 * build time under the SAME (stale) codebooks — that is what a no-retrain
 * append means. Lives in `graft.ext` so the expected side can be assembled
 * from the shared `private[ext]` encode/search bodies directly. */
class AnnIndexAppendSpec extends graft.SparkTestBase {
  import spark.implicits._

  private lazy val embs =
    spark.read.parquet(s"$Sf/embeddings.parquet").select("vec_id", "embedding")
  private lazy val queries = embs.filter($"vec_id" < 8)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("appended rows search identically to a one-shot encode under the same codebooks") {
    val dir = java.nio.file.Files.createTempDirectory("ann_ivfpq_append").toString
    val half = embs.filter($"vec_id" % 2 === 0)
    val rest = embs.filter($"vec_id" % 2 =!= 0)
    AnnIndex.buildIvfPq(half, dir)
    AnnIndex.appendIvfPq(rest, dir)

    // expected: the shared search body over the FULL corpus, encoded with
    // the codebooks trained on `half` only (append never retrains)
    val planes = Similarity.rpPlanes(64, 4, "rp")
    val cbs = Similarity.pqCodebooks(half, 4, 16, 2, "pq")
    val enc = Similarity.encodeIvfPq(embs, planes, cbs, 16)
    val expected = Similarity.ivfPqSearchEncoded(queries, enc, planes, cbs, 16, 3)
    assert(rows(AnnIndex.searchIvfPq(queries, spark, dir, 3)) == rows(expected))

    // the raw-vector copy is appended too: IVFADC+R sees appended rows
    val expectedRr = Similarity.rerankExact(
      Similarity.ivfPqSearchEncoded(queries, enc, planes, cbs, 16, 10),
      queries, embs, 3)
    assert(rows(AnnIndex.searchIvfPqRerank(queries, spark, dir, 3, rerank = 10)) ==
      rows(expectedRr))

    // append added files into cell directories; it did not rewrite the base
    // build's rows (total searchable ids = full corpus, each exactly once)
    val stored = spark.read.parquet(s"$dir/encoded.parquet")
    assert(stored.count() == embs.count())
    assert(stored.select("vec_id").distinct().count() == embs.count())
  }
}
