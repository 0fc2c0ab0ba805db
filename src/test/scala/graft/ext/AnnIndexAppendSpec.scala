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
    AnnIndex.appendIvfPq(rest, dir, batchId = 0L)

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

    // the append landed as a published leg; it did not rewrite the base
    // build's rows (total searchable ids = full corpus, each exactly once)
    val stored = AnnIndex.listing(spark, dir, "encoded")
    assert(stored.count() == embs.count())
    assert(stored.select("vec_id").distinct().count() == embs.count())
    assert(spark.read.parquet(s"$dir/encoded.parquet").count() == half.count())
  }

  test("a replayed append batch is a no-op; an unpublished leg is invisible") {
    val dir = java.nio.file.Files.createTempDirectory("ann_ivfpq_replay").toString
    val half = embs.filter($"vec_id" % 2 === 0)
    val rest = embs.filter($"vec_id" % 2 =!= 0)
    AnnIndex.buildIvfPq(half, dir)
    AnnIndex.appendIvfPq(rest, dir, batchId = 0L)
    val once = rows(AnnIndex.searchIvfPq(queries, spark, dir, 3))
    val onceRr = rows(AnnIndex.searchIvfPqRerank(queries, spark, dir, 3,
      rerank = 10))
    // foreachBatch is at-least-once: the SAME batch id re-running must not
    // double-append (r6 advice #1)
    AnnIndex.appendIvfPq(rest, dir, batchId = 0L)
    assert(AnnIndex.listing(spark, dir, "encoded").count() == embs.count())
    assert(rows(AnnIndex.searchIvfPq(queries, spark, dir, 3)) == once)
    // a leg without its marker (mid-batch crash) never reaches a reader:
    // stage data for batch 1 by hand-copying batch 0's layout, no marker
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$dir/appends/b=0"), fs,
      new org.apache.hadoop.fs.Path(s"$dir/appends/b=1"), false,
      spark.sparkContext.hadoopConfiguration)
    assert(AnnIndex.committedAppendIds(spark, dir) == Seq(0L))
    assert(AnnIndex.listing(spark, dir, "encoded").count() == embs.count())
    // vacuum sweeps the dead staging and folds the published leg
    AnnIndex.vacuumDeletes(spark, dir)
    assert(AnnIndex.committedAppendIds(spark, dir).isEmpty)
    assert(!new java.io.File(s"$dir/appends/b=1").exists)
    assert(spark.read.parquet(s"$dir/encoded.parquet").count() == embs.count())
    assert(rows(AnnIndex.searchIvfPq(queries, spark, dir, 3)) == once)
    assert(rows(AnnIndex.searchIvfPqRerank(queries, spark, dir, 3,
      rerank = 10)) == onceRr)
  }

  test("residual appends search identically to a one-shot encode under " +
    "frozen coarse + residual codebooks (r7 verdict #4)") {
    val dir = java.nio.file.Files
      .createTempDirectory("ann_ivfadc_res_append").toString
    val half = embs.filter($"vec_id" % 2 === 0)
    val rest = embs.filter($"vec_id" % 2 =!= 0)
    AnnIndex.buildIvfAdcResidual(half, dir)
    AnnIndex.appendIvfAdcResidual(rest, dir, batchId = 0L)

    // expected: the shared residual search body over the FULL corpus,
    // with coarse AND residual codebooks trained on `half` only
    import org.apache.spark.sql.functions.col
    val coarse = Similarity.codebook(half)
    def residualsOf(v: DataFrame) =
      v.select(col("vec_id"), col("embedding"),
        Similarity.nearestCell(col("embedding"), coarse).as("cell"))
        .select(col("vec_id"), col("cell"),
          Similarity.residualQ(col("embedding"), col("cell"), coarse)
            .as("rq"))
    val cbs = Similarity.pqCodebooksResidual(residualsOf(half))
    val expected = Similarity.ivfAdcResidualSearch(queries,
      Similarity.encodeResidual(residualsOf(embs), cbs, 16),
      coarse, cbs, 16, 3, 2)
    assert(rows(AnnIndex.searchIvfAdcResidual(queries, spark, dir, 3,
      nprobe = 2)) == rows(expected))

    // the append landed as a published codes-only leg (no raw-vector
    // copy anywhere in the artifact), base untouched
    val stored = AnnIndex.listing(spark, dir, "encoded")
    assert(stored.count() == embs.count())
    assert(stored.select("vec_id").distinct().count() == embs.count())
    assert(spark.read.parquet(s"$dir/encoded.parquet").count() == half.count())
    assert(!new java.io.File(s"$dir/corpus.parquet").exists)
    assert(!new java.io.File(s"$dir/appends/b=0/corpus.parquet").exists)

    // +R reads legs too: appended candidates re-rank from the SOURCE table
    val expectedRr = Similarity.rerankExact(
      Similarity.ivfAdcResidualSearch(queries,
        Similarity.encodeResidual(residualsOf(embs), cbs, 16),
        coarse, cbs, 16, 10, 2),
      queries, embs, 3)
    assert(rows(AnnIndex.searchIvfAdcResidualRerank(queries, spark, dir,
      embs, 3, rerank = 10, nprobe = 2)) == rows(expectedRr))

    // replay safety: the same batch id re-running is a no-op
    AnnIndex.appendIvfAdcResidual(rest, dir, batchId = 0L)
    assert(AnnIndex.listing(spark, dir, "encoded").count() == embs.count())

    // vacuum folds the leg into the base; results unchanged
    val before = rows(AnnIndex.searchIvfAdcResidual(queries, spark, dir, 3,
      nprobe = 2))
    AnnIndex.vacuumDeletes(spark, dir)
    assert(AnnIndex.committedAppendIds(spark, dir).isEmpty)
    assert(spark.read.parquet(s"$dir/encoded.parquet").count() == embs.count())
    assert(rows(AnnIndex.searchIvfAdcResidual(queries, spark, dir, 3,
      nprobe = 2)) == before)
  }

  test("residual drift log: baseline at build, per-append rows, shifted " +
    "batches rise; history survives vacuum") {
    val dir = java.nio.file.Files
      .createTempDirectory("ann_ivfadc_res_drift").toString
    val half = embs.filter($"vec_id" % 2 === 0)
    val rest = embs.filter($"vec_id" % 2 =!= 0)
    AnnIndex.buildIvfAdcResidual(half, dir)
    val maxId = embs.agg(org.apache.spark.sql.functions.max($"vec_id"))
      .head.getLong(0)
    AnnIndex.appendIvfAdcResidual(rest, dir, batchId = 0L)
    AnnIndex.appendIvfAdcResidual(
      rest.select(($"vec_id" + maxId + 1).as("vec_id"),
        org.apache.spark.sql.functions.transform($"embedding",
          v => (v + org.apache.spark.sql.functions.lit(5.0f)).cast("float"))
          .as("embedding")),
      dir, batchId = 1L)
    val log = AnnIndex.driftLog(spark, dir)
      .select("batch_id", "err_mean").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(log.keySet == Set(-1L, 0L, 1L))
    assert(log(0L) <= 2 * log(-1L),
      s"same-distribution drift ${log(0L)} vs build ${log(-1L)}")
    assert(log(1L) > 10 * log(-1L),
      s"shifted drift ${log(1L)} not above build ${log(-1L)}")
    AnnIndex.vacuumDeletes(spark, dir)
    val folded = AnnIndex.driftLog(spark, dir)
      .select("batch_id", "err_mean").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(folded == log)
  }

  test("sq8 appends search identically to a one-shot build; replay is a " +
    "no-op; vacuum folds; drift history survives (r8 verdict #5)") {
    val dir = java.nio.file.Files
      .createTempDirectory("ann_ivfsq8_append").toString
    val oneShotDir = java.nio.file.Files
      .createTempDirectory("ann_ivfsq8_oneshot").toString
    val half = embs.filter($"vec_id" % 2 === 0)
    val rest = embs.filter($"vec_id" % 2 =!= 0)
    AnnIndex.buildIvfSq8(half, dir)
    AnnIndex.appendIvfSq8(rest, dir, batchId = 0L)

    // SQ8 has no trained codebook, so append ≡ one-shot holds against a
    // FULL-corpus build, not just a frozen-codebook re-encode
    AnnIndex.buildIvfSq8(embs, oneShotDir)
    val expected = rows(AnnIndex.searchIvfSq8(queries, spark, oneShotDir, 3))
    assert(rows(AnnIndex.searchIvfSq8(queries, spark, dir, 3)) == expected)

    // the append landed as a published leg; base untouched
    val stored = AnnIndex.listing(spark, dir, "sq8")
    assert(stored.count() == embs.count())
    assert(stored.select("vec_id").distinct().count() == embs.count())
    assert(spark.read.parquet(s"$dir/sq8.parquet").count() == half.count())

    // replay safety: the same batch id re-running is a no-op
    AnnIndex.appendIvfSq8(rest, dir, batchId = 0L)
    assert(AnnIndex.listing(spark, dir, "sq8").count() == embs.count())

    // tombstones are honored on the appended rows too
    val victim = rest.select("vec_id").orderBy("vec_id").limit(1)
    AnnIndex.deleteIds(victim, dir)
    val victimId = victim.head.getLong(0)
    assert(AnnIndex.listing(spark, dir, "sq8")
      .filter($"vec_id" === victimId).count() == 0)

    // vacuum folds the leg + tombstone into the base; results match a
    // one-shot build over the surviving corpus
    AnnIndex.vacuumDeletes(spark, dir)
    assert(AnnIndex.committedAppendIds(spark, dir).isEmpty)
    assert(spark.read.parquet(s"$dir/sq8.parquet").count() == embs.count() - 1)
    val survivorDir = java.nio.file.Files
      .createTempDirectory("ann_ivfsq8_survivor").toString
    AnnIndex.buildIvfSq8(embs.filter($"vec_id" =!= victimId), survivorDir)
    assert(rows(AnnIndex.searchIvfSq8(queries, spark, dir, 3)) ==
      rows(AnnIndex.searchIvfSq8(queries, spark, survivorDir, 3)))

    // drift history: build baseline + the append row, surviving the fold
    val log = AnnIndex.driftLog(spark, dir)
      .select("batch_id", "err_mean").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(log.keySet == Set(-1L, 0L))
    assert(log(0L) <= 2 * log(-1L),
      s"same-distribution sq8 drift ${log(0L)} vs build ${log(-1L)}")
  }

  test("sq8 drift log: dynamic-range blowup rises (the scalar-quantizer " +
    "rebuild signal — no codebook to drift off, so scale IS the axis)") {
    val dir = java.nio.file.Files
      .createTempDirectory("ann_ivfsq8_drift").toString
    val half = embs.filter($"vec_id" % 2 === 0)
    val rest = embs.filter($"vec_id" % 2 =!= 0)
    AnnIndex.buildIvfSq8(half, dir)
    val maxId = embs.agg(org.apache.spark.sql.functions.max($"vec_id"))
      .head.getLong(0)
    AnnIndex.appendIvfSq8(rest, dir, batchId = 0L)
    // batch 1: one dimension blown up 20× — the per-vector scale
    // inflates, coarsening EVERY dimension's int8 resolution
    AnnIndex.appendIvfSq8(
      rest.select(($"vec_id" + maxId + 1).as("vec_id"),
        org.apache.spark.sql.functions.transform($"embedding",
          (v, i) => org.apache.spark.sql.functions
            .when(i === 0, v * 20.0f).otherwise(v).cast("float"))
          .as("embedding")),
      dir, batchId = 1L)
    val log = AnnIndex.driftLog(spark, dir)
      .select("batch_id", "err_mean").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(log.keySet == Set(-1L, 0L, 1L))
    assert(log(0L) <= 2 * log(-1L),
      s"same-distribution sq8 drift ${log(0L)} vs build ${log(-1L)}")
    assert(log(1L) > 3 * log(-1L),
      s"range-blown sq8 drift ${log(1L)} not above build ${log(-1L)}")
  }

  test("drift log: same-distribution appends stay flat, shifted ones rise") {
    val dir = java.nio.file.Files.createTempDirectory("ann_ivfpq_drift").toString
    val half = embs.filter($"vec_id" % 2 === 0)
    val rest = embs.filter($"vec_id" % 2 =!= 0)
    AnnIndex.buildIvfPq(half, dir)
    val maxId = embs.agg(org.apache.spark.sql.functions.max($"vec_id"))
      .head.getLong(0)
    // batch 0: held-out rows from the SAME distribution the codebooks
    // trained on; batch 1: the same vectors shifted far off-distribution
    AnnIndex.appendIvfPq(rest, dir, batchId = 0L)
    AnnIndex.appendIvfPq(
      rest.select(($"vec_id" + maxId + 1).as("vec_id"),
        org.apache.spark.sql.functions.transform($"embedding",
          v => (v + org.apache.spark.sql.functions.lit(5.0f)).cast("float"))
          .as("embedding")),
      dir, batchId = 1L)
    val log = AnnIndex.driftLog(spark, dir)
      .select("batch_id", "err_mean").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(log.keySet == Set(-1L, 0L, 1L))
    // same-distribution: mean reconstruction error within 2x of build time
    assert(log(0L) <= 2 * log(-1L),
      s"same-distribution drift ${log(0L)} vs build ${log(-1L)}")
    // off-distribution: the rebuild signal — error far above the baseline
    assert(log(1L) > 10 * log(-1L),
      s"shifted drift ${log(1L)} not above build ${log(-1L)}")
    // the history survives compaction
    AnnIndex.vacuumDeletes(spark, dir)
    val folded = AnnIndex.driftLog(spark, dir)
      .select("batch_id", "err_mean").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(folded == log)
  }
}
