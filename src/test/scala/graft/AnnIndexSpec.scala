package graft

import org.apache.spark.sql.DataFrame

import graft.ext.{AnnIndex, Similarity}

/** Build→save→load→search round trips for the persisted ANN indexes: the
 * prebuilt-index search paths must return BIT-IDENTICAL rows to the fused
 * train-at-query-time paths (all arithmetic is exact-integer micro-grid, so
 * the parquet round trip has no representation loss to hide behind). */
class AnnIndexSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val embs =
    spark.read.parquet(s"$Sf/embeddings.parquet").select("vec_id", "embedding")
  private lazy val queries = embs.filter($"vec_id" < 8)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("IVF index round-trips: prebuilt search equals the fused path") {
    val dir = tmp("ann_ivf")
    AnnIndex.buildIvf(embs, dir, rounds = 2)
    assert(rows(AnnIndex.searchIvf(queries, spark, dir, 3)) ==
      rows(Similarity.knnIvfTrained(queries, embs, 3, rounds = 2)))
    // the stored codebook IS the trained codebook
    val stored = AnnIndex.loadCodebook(spark, s"$dir/codebook.parquet")
    val trained = Similarity.trainCodebook(embs, rounds = 2)
    assert(stored.map(_._1).toSeq == trained.map(_._1).toSeq)
    assert(stored.zip(trained).forall { case ((_, a), (_, b)) =>
      a.toSeq == b.toSeq })
  }

  test("IVF corpus is cell-partitioned at rest (one directory per list)") {
    val dir = tmp("ann_ivf_layout")
    AnnIndex.buildIvf(embs, dir)
    val cellDirs = new java.io.File(s"$dir/corpus.parquet")
      .listFiles.filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cellDirs.nonEmpty, "expected cell=<id> partition directories")
    // a literal-cell read prunes to that directory's files at plan time
    val one = spark.read.parquet(s"$dir/corpus.parquet")
      .filter($"cell" === cellDirs.head.stripPrefix("cell=").toInt)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    // ... and the SEARCH path itself pushes the probed cells as literal
    // partition filters (IVF list selection at the file level): its scan
    // of the stored corpus must carry a non-empty partition IN-filter
    val searchScan = AnnIndex.searchIvf(queries, spark, dir, 3)
      .queryExecution.executedPlan.toString
    // the filter names the scan's physical column (`cell`; the __tc rename
    // sits above the scan) and must be a literal IN over the probed cells
    assert(searchScan.contains("PartitionFilters: [cell"), searchScan)
    assert(searchScan.matches("(?s).*PartitionFilters: \\[cell#\\d+ IN \\(.*"),
      searchScan)
  }

  test("PQ index round-trips: prebuilt ADC search equals the fused path") {
    val dir = tmp("ann_pq")
    AnnIndex.buildPq(embs, dir)
    assert(rows(AnnIndex.searchPqAdc(queries, spark, dir, 3)) ==
      rows(Similarity.knnPqAdc(queries, embs, 3)))
  }

  test("IVF-PQ index round-trips: prebuilt search equals the fused path") {
    val dir = tmp("ann_ivfpq")
    AnnIndex.buildIvfPq(embs, dir)
    assert(rows(AnnIndex.searchIvfPq(queries, spark, dir, 3)) ==
      rows(Similarity.knnIvfPq(queries, embs, 3)))
  }

  test("RP index round-trips: single- and multi-probe equal the fused paths") {
    val dir = tmp("ann_rp")
    AnnIndex.buildRp(embs, dir)
    assert(rows(AnnIndex.searchRp(queries, spark, dir, 3)) ==
      rows(Similarity.knnRp(queries, embs, 3)))
    assert(rows(AnnIndex.searchRpMultiProbe(queries, spark, dir, 3)) ==
      rows(Similarity.knnRpMultiProbe(queries, embs, 3)))
  }

  test("IVF-SQ8 index round-trips: prebuilt search equals the fused path") {
    val dir = tmp("ann_ivfsq8")
    AnnIndex.buildIvfSq8(embs, dir)
    assert(rows(AnnIndex.searchIvfSq8(queries, spark, dir, 3)) ==
      rows(Similarity.knnIvfSq8(queries, embs, 3)))
    // the stored codes are cell-partitioned (one directory per list)
    val root = new java.io.File(s"$dir/sq8.parquet")
    assert(root.listFiles().exists(f =>
      f.isDirectory && f.getName.startsWith("cell=")))
  }

  test("filtered search round-trips bit-identical and honors the " +
    "pre-filter contract") {
    val dir = tmp("ann_ivfpq_filtered")
    AnnIndex.buildIvfPq(embs, dir)
    val allowed = embs.filter($"vec_id" % 3 === 1).select("vec_id")
    val idx = AnnIndex.searchIvfPqFiltered(queries, spark, dir, 3, allowed)
    assert(rows(idx) ==
      rows(Similarity.knnIvfPqFiltered(queries, embs, allowed, 3)))
    // every returned neighbor satisfies the predicate
    assert(idx.filter($"n_id" % 3 =!= 1).count() == 0L)
    // PRE-filter, not post-filter: restricting after the cut would return
    // strictly fewer rows whenever a top-3 neighbor was filtered out
    val postFilter = AnnIndex.searchIvfPq(queries, spark, dir, 3)
      .filter($"n_id" % 3 === 1)
    assert(idx.count() >= postFilter.count())
  }

  test("IVF-PQ multi-probe round-trips bit-identical to the fused path") {
    val dir = tmp("ann_ivfpq_mp")
    AnnIndex.buildIvfPq(embs, dir)
    assert(rows(AnnIndex.searchIvfPqMultiProbe(queries, spark, dir, 3)) ==
      rows(Similarity.knnIvfPqMultiProbe(queries, embs, 3)))
  }

  test("IVFADC+R round-trips bit-identical to the fused rerank path") {
    val dir = tmp("ann_ivfpq_rr")
    AnnIndex.buildIvfPq(embs, dir)
    assert(rows(AnnIndex.searchIvfPqRerank(queries, spark, dir, 3, rerank = 10)) ==
      rows(Similarity.knnIvfPqRerank(queries, embs, 3, rerank = 10)))
    // the raw-vector second copy is cell-partitioned like the codes
    val cellDirs = new java.io.File(s"$dir/corpus.parquet")
      .listFiles.filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(cellDirs.nonEmpty, "expected cell=<id> partition directories")
  }

  test("multi-probe IVFADC+R round-trips bit-identical to the fused path") {
    val dir = tmp("ann_ivfpq_mprr")
    AnnIndex.buildIvfPq(embs, dir)
    assert(rows(
      AnnIndex.searchIvfPqMultiProbeRerank(queries, spark, dir, 3, rerank = 10)) ==
      rows(Similarity.knnIvfPqMultiProbeRerank(queries, embs, 3, rerank = 10)))
  }

  test("exact re-rank recall is >= code-only ADC recall") {
    // the point of IVFADC+R: repairing PQ quantization error in the final
    // ranking must not LOSE recall vs ranking on codes alone
    val exact = Similarity.knnBrute(queries, embs, 3)
    def avgRecall(approx: DataFrame): Double =
      Similarity.recallAtK(approx, exact, 3)
        .agg(org.apache.spark.sql.functions.avg("recall")).head.getDouble(0)
    val adcOnly = avgRecall(Similarity.knnIvfPq(queries, embs, 3))
    val reranked = avgRecall(Similarity.knnIvfPqRerank(queries, embs, 3))
    assert(reranked >= adcOnly, s"rerank recall $reranked < ADC-only $adcOnly")
  }

  test("index multi-probe recall is >= index single-probe recall") {
    // the round-5 verdict's recall cliff: the recall repair must SURVIVE
    // the index round-trip, not just exist on the fused path
    val dir = tmp("ann_rp_recall")
    AnnIndex.buildRp(embs, dir)
    val exact = Similarity.knnBrute(queries, embs, 3)
    def avgRecall(approx: DataFrame): Double =
      Similarity.recallAtK(approx, exact, 3)
        .agg(org.apache.spark.sql.functions.avg("recall")).head.getDouble(0)
    val single = avgRecall(AnnIndex.searchRp(queries, spark, dir, 3))
    val multi = avgRecall(AnnIndex.searchRpMultiProbe(queries, spark, dir, 3))
    assert(multi >= single, s"multi-probe recall $multi < single-probe $single")
  }

  test("deleteIds tombstones every search path; vacuum folds and re-opens") {
    val dir = tmp("ann_del")
    AnnIndex.buildIvfPq(embs, dir)
    val before = rows(AnnIndex.searchIvfPq(queries, spark, dir, 3))
    // victim: a vector actually returned as a neighbor pre-delete
    val victim = AnnIndex.searchIvfPq(queries, spark, dir, 3)
      .select("n_id").as[Long].head()
    AnnIndex.deleteIds(Seq(victim).toDF("vec_id"), dir)
    def neighborIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("n_id").as[Long].collect().toSet
    // gone from the code path, the multi-probe path, AND the rerank path
    // (the raw-vector copy is tombstoned too, not just the codes)
    assert(!neighborIds(AnnIndex.searchIvfPq(queries, spark, dir, 50))
      .contains(victim))
    assert(!neighborIds(AnnIndex.searchIvfPqMultiProbe(queries, spark, dir, 50))
      .contains(victim))
    assert(!neighborIds(
        AnnIndex.searchIvfPqRerank(queries, spark, dir, 5, rerank = 50))
      .contains(victim))
    // a tombstoned id stays deleted even if re-appended
    AnnIndex.appendIvfPq(embs.filter($"vec_id" === victim), dir, batchId = 10L)
    assert(!neighborIds(AnnIndex.searchIvfPq(queries, spark, dir, 50))
      .contains(victim))
    // vacuum folds tombstones into the lists and clears them...
    AnnIndex.vacuumDeletes(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones.parquet").exists)
    assert(!neighborIds(AnnIndex.searchIvfPq(queries, spark, dir, 50))
      .contains(victim))
    // ...re-opening the id for ingest: re-appending the same row restores
    // the exact pre-delete results (same stored codebooks -> same codes;
    // fresh batch id — the folded batch 10's marker was cleared by vacuum)
    AnnIndex.appendIvfPq(embs.filter($"vec_id" === victim), dir, batchId = 11L)
    assert(rows(AnnIndex.searchIvfPq(queries, spark, dir, 3)) == before)
  }

  test("SQ8 searches honor tombstones immediately (r7 verdict #3)") {
    val dir = tmp("ann_sq8_del")
    AnnIndex.buildIvfSq8(embs, dir)
    val victim = AnnIndex.searchIvfSq8(queries, spark, dir, 3)
      .select("n_id").as[Long].head()
    AnnIndex.deleteIds(Seq(victim).toDF("vec_id"), dir)
    def neighborIds(): Set[Long] =
      AnnIndex.searchIvfSq8(queries, spark, dir, 50)
        .select("n_id").as[Long].collect().toSet
    // gone PRE-vacuum: the deletion contract is immediate, not deferred
    assert(!neighborIds().contains(victim),
      "tombstoned id surfaced from an SQ8 search before vacuum")
    // vacuum folds the tombstones into sq8.parquet and clears them
    AnnIndex.vacuumDeletes(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones.parquet").exists)
    assert(!neighborIds().contains(victim),
      "tombstoned id resurfaced after vacuum folded the SQ8 listing")
    // the fold preserved the cell-partitioned at-rest layout
    assert(new java.io.File(s"$dir/sq8.parquet").listFiles().exists(f =>
      f.isDirectory && f.getName.startsWith("cell=")))
  }

  test("over-threshold probed-cell batches fall back to the cell semi-join") {
    val dir = tmp("ann_ivfpq_fallback")
    AnnIndex.buildIvfPq(embs, dir)
    // maxInList = 0 forces the join fallback regardless of batch size
    val fallback = AnnIndex.searchIvfPq(queries, spark, dir, 3, maxInList = 0)
    // identical rows to the IN-list path...
    assert(rows(fallback) == rows(AnnIndex.searchIvfPq(queries, spark, dir, 3)))
    // ...and the plan carries NO literal partition IN-filter (the unbounded
    // IN-list is exactly what the fallback exists to avoid)
    val plan = fallback.queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*PartitionFilters: \\[cell#\\d+ IN \\(.*"), plan)
  }

  test("a null-embedding query degrades gracefully instead of failing the search") {
    val dir = tmp("ann_ivf_nullq")
    AnnIndex.buildIvf(embs, dir)
    val withNull = queries.unionByName(
      Seq((999L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    // must not throw; the valid queries' rows are unaffected
    val got = rows(AnnIndex.searchIvf(withNull, spark, dir, 3)
      .filter($"q_id" < 8))
    assert(got == rows(AnnIndex.searchIvf(queries, spark, dir, 3)))
  }

  test("search needs only the directory: params round-trip the geometry") {
    // A non-default geometry — search must pick it up from params.parquet,
    // not from defaults.
    val dir = tmp("ann_pq_geom")
    AnnIndex.buildPq(embs, dir, m = 8, subDim = 8, bits = 2, seed = "alt")
    assert(rows(AnnIndex.searchPqAdc(queries, spark, dir, 3)) ==
      rows(Similarity.knnPqAdc(queries, embs, 3, m = 8, subDim = 8,
        bits = 2, seed = "alt")))
  }
}
