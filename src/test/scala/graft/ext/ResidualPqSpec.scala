package graft.ext

import org.apache.spark.sql.functions._

/** Residual IVFADC (n18) behavior locks. The VALUES are oracle-gated by
 * `n18_knn_ivfadc_residual`; these pin the published method's qualitative
 * contract and the determinism the oracle can't express. Lives in
 * `graft.ext` for the `private[ext]` residual helpers. */
class ResidualPqSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val SubDim = 16
  private lazy val embs =
    spark.read.parquet(s"$Sf/embeddings.parquet").select("vec_id", "embedding")

  test("residual PQ reconstructs finer than raw-vector PQ at the same code budget") {
    // The reason IVFADC encodes residuals (Jégou et al. 2011): residual
    // energy is far below vector energy once the coarse centroid is
    // subtracted, so the same (m, bits) quantizes with smaller error.
    val coarse = Similarity.codebook(embs)
    val residuals = embs
      .select(col("vec_id"),
        Similarity.nearestCell(col("embedding"), coarse).as("cell"),
        col("embedding"))
      .select(col("vec_id"), col("cell"),
        Similarity.residualQ(col("embedding"), col("cell"), coarse).as("rq"))
    val cbs = Similarity.pqCodebooksResidual(residuals)
    val enc = residuals.select(
      col("vec_id") +: col("rq") +:
        cbs.indices.map(i =>
          Similarity.nearestCellQ(
            slice(col("rq"), lit(i * SubDim + 1), lit(SubDim)), cbs(i))
            .as(s"c$i")): _*)
    val resErr = enc
      .select(Similarity.adcDistResidual(col("rq"), cbs, SubDim).as("e"))
      .agg(avg("e")).head.getDouble(0)
    val rawErr = Similarity
      .adcSelfError(embs, Similarity.pqCodebooks(embs), SubDim)
      .agg(avg("adc_err")).head.getDouble(0)
    assert(resErr < rawErr,
      s"mean residual ADC error $resErr must undercut raw-PQ $rawErr")
  }

  test("residual IVFADC search is partition-independent and exactly ranked") {
    val q = embs.filter($"vec_id" < 6)
    val a = Similarity.knnIvfAdcResidual(q, embs, 3)
      .collect().map(_.toString).sorted.toSeq
    val b = Similarity.knnIvfAdcResidual(
        q.repartition(5), embs.repartition(7), 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "repartitioning must not change any neighbor or distance")
    assert(a.nonEmpty)
  }

  test("nprobe=2 never ranks a worse neighbor at any position than nprobe=1") {
    // More probed lists = a superset of candidates, so the distance at
    // every (query, rank) slot is monotone non-increasing in nprobe.
    val q = embs.filter($"vec_id" < 6)
    def byRank(nprobe: Int): Map[(Long, Int), Long] =
      Similarity.knnIvfAdcResidual(q, embs, 3, nprobe = nprobe)
        .collect()
        .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(2)).toMap
    val one = byRank(1)
    val two = byRank(2)
    assert(one.nonEmpty)
    one.foreach { case (key, d1) =>
      val d2 = two(key)
      assert(d2 <= d1, s"slot $key regressed: nprobe2 $d2 > nprobe1 $d1")
    }
  }

  test("index round-trip is bit-identical to the fused path, at nprobe 1 and 2") {
    val dir = java.nio.file.Files
      .createTempDirectory("ann_ivfadc_residual").toString
    AnnIndex.buildIvfAdcResidual(embs, dir)
    val q = embs.filter($"vec_id" < 6)
    for (np <- Seq(1, 2)) {
      val fused = Similarity.knnIvfAdcResidual(q, embs, 3, nprobe = np)
        .collect().map(_.toString).sorted.toSeq
      val stored = AnnIndex.searchIvfAdcResidual(q, spark, dir, 3, nprobe = np)
        .collect().map(_.toString).sorted.toSeq
      assert(stored == fused, s"index search must equal fused at nprobe=$np")
      assert(stored.nonEmpty)
    }
  }

  test("a tombstoned id disappears from residual-index search results") {
    val dir = java.nio.file.Files
      .createTempDirectory("ann_ivfadc_residual_del").toString
    AnnIndex.buildIvfAdcResidual(embs, dir)
    val q = embs.filter($"vec_id" < 6)
    val before = AnnIndex.searchIvfAdcResidual(q, spark, dir, 3, nprobe = 2)
      .select("n_id").as[Long].collect().toSet
    assert(before.nonEmpty)
    val victim = before.max
    AnnIndex.deleteIds(Seq(victim).toDF("vec_id"), dir)
    val after = AnnIndex.searchIvfAdcResidual(q, spark, dir, 3, nprobe = 2)
      .select("n_id").as[Long].collect().toSet
    assert(!after.contains(victim),
      s"deleted id $victim still surfaced: $after")
  }

  test("residual +R: index rerank is bit-identical to the fused rerank path") {
    val dir = java.nio.file.Files
      .createTempDirectory("ann_ivfadc_residual_rr").toString
    AnnIndex.buildIvfAdcResidual(embs, dir)
    val q = embs.filter($"vec_id" < 6)
    for (np <- Seq(1, 2)) {
      val fused = Similarity
        .knnIvfAdcResidualRerank(q, embs, 3, rerank = 10, nprobe = np)
        .collect().map(_.toString).sorted.toSeq
      val stored = AnnIndex
        .searchIvfAdcResidualRerank(q, spark, dir, embs, 3, rerank = 10,
          nprobe = np)
        .collect().map(_.toString).sorted.toSeq
      assert(stored == fused, s"index rerank must equal fused at nprobe=$np")
      assert(stored.nonEmpty)
    }
  }

  test("residual +R recall is >= residual code-only recall") {
    // same claim as the IVF-PQ family's rerank test: repairing residual-PQ
    // quantization error in the final ranking must not LOSE recall
    val q = embs.filter($"vec_id" < 6)
    val exact = Similarity.knnBrute(q, embs, 3)
    def avgRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(approx, exact, 3)
        .agg(avg("recall")).head.getDouble(0)
    // the ADC result ranks by integer distance; recallAtK only needs the
    // (q_id, n_id, rank) triple, so both shapes feed it directly
    val adcOnly = avgRecall(Similarity.knnIvfAdcResidual(q, embs, 3))
    val reranked =
      avgRecall(Similarity.knnIvfAdcResidualRerank(q, embs, 3, rerank = 10))
    assert(reranked >= adcOnly, s"rerank recall $reranked < ADC-only $adcOnly")
  }

  test("a tombstoned id cannot be resurrected by the rerank corpus join") {
    // the +R stage joins back to the SOURCE corpus, which still contains
    // the deleted vector — the tombstone must hold because deletion
    // filters the CANDIDATE stage, and rerank only rescores candidates
    val dir = java.nio.file.Files
      .createTempDirectory("ann_ivfadc_residual_rr_del").toString
    AnnIndex.buildIvfAdcResidual(embs, dir)
    val q = embs.filter($"vec_id" < 6)
    val before = AnnIndex
      .searchIvfAdcResidualRerank(q, spark, dir, embs, 3, rerank = 10)
      .select("n_id").as[Long].collect().toSet
    assert(before.nonEmpty)
    val victim = before.max
    AnnIndex.deleteIds(Seq(victim).toDF("vec_id"), dir)
    val after = AnnIndex
      .searchIvfAdcResidualRerank(q, spark, dir, embs, 5, rerank = 50)
      .select("n_id").as[Long].collect().toSet
    assert(!after.contains(victim),
      s"deleted id $victim resurfaced through the corpus re-rank join")
  }

  test("integer-millis plane projections assign like their float twins' signs") {
    // rpCellQ on micro-grid integers with millis weights must equal the
    // sign pattern of the exact real projection: scaling by 1000·1e6 > 0
    // preserves signs, and the integer dot is exact — so the assignment
    // can never sit on a rounding boundary.
    val planes = Similarity.rpPlanesMillis(4, 2, "t")
    val vecs = Seq(
      (1L, Seq(1000000L, -2000000L, 3000000L, -500000L)),
      (2L, Seq(-1L, 1L, -1L, 1L)),
      (3L, Seq(0L, 0L, 0L, 0L))).toDF("vec_id", "rq")
    val got = vecs.select(col("vec_id"),
      Similarity.rpCellQ(col("rq"), planes).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = Seq(
      (1L, Seq(1000000L, -2000000L, 3000000L, -500000L)),
      (2L, Seq(-1L, 1L, -1L, 1L)),
      (3L, Seq(0L, 0L, 0L, 0L))).map { case (id, v) =>
      id -> planes.zipWithIndex.map { case (w, p) =>
        val d = v.zip(w).map { case (a, b) => a * b }.sum
        if (d > 0) 1 << p else 0
      }.sum
    }.toMap
    assert(got == want)
  }
}
