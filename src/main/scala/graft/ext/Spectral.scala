package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Spectral embedding analysis: the principal component of an embedding
 * corpus by POWER ITERATION, in the engine's exact-fixed-point discipline
 * (the PageRank treatment applied to PCA) — the first tool an embedding
 * pipeline reaches for when it needs whitening directions, a drift axis,
 * or a 1-D projection for binning/visualization, computed without ever
 * materializing the dim×dim covariance:
 *
 *   v_{t+1} ∝ C·v_t = Σ_d x_d · (x_d·v_t)
 *
 * so each iteration is ONE corpus pass — a per-doc dot product (narrow,
 * codegen'd `zip_with`/`aggregate` against the current direction as a
 * literal) followed by a dim-grain weighted sum (posexplode + hash-agg to
 * `dim` rows). Nothing dim²-sized exists anywhere; the per-iteration
 * driver state is the `dim`-long direction vector — the codebook
 * model-parameter posture.
 *
 * Determinism (the repo-wide gate contract): embeddings snap to the micro
 * grid once ([[Similarity.quantizeMicro]]); dot products and weighted
 * sums are exact BIGINT arithmetic; the per-iteration renormalization is
 * `(S_j·10⁶) div max|S|` in 128-bit integers (BigInt here, HUGEINT in
 * the oracle — both truncate toward zero), so every iterate replays
 * bit-for-bit in DuckDB's unrolled CTEs under any partitioning. The
 * deterministic all-ones start vector fixes the usual PCA sign ambiguity:
 * both engines walk the identical integer trajectory.
 *
 * Mean-centering is deliberately NOT applied (this is the principal
 * direction of the raw second moment, the common choice for unit-length
 * embedding corpora where the mean is near 0); center upstream if the
 * corpus isn't.
 *
 * Overflow headroom: |xq| ≤ 10⁶·max|x|, |v| ≤ 10⁶, so per-doc dots are
 * ≤ dim·10¹² and the dim-grain sums ≤ n·max|xq|·(dot div 10⁶) — BIGINT
 * holds to n ~ 10⁵ docs at unit-normalized 64-dim. At corpus scale the
 * direction trains on a deterministic hash sample
 * ([[Sampling.hashSample]], the codebook-training posture) and the
 * PROJECTION — the corpus-sized pass — runs on everything: projecting is
 * a narrow map under any n.
 */
object Spectral {

  /** Micro-grid unit (1e6) as a Long. */
  private val Unit = 1000000L

  /** The power-iteration trajectory: `iters` exact iterations from the
   * all-ones direction; returns the final direction as (pos, v) — `dim`
   * rows, micro-grid integers with max|v| = 10⁶ by construction. */
  def pcaPowerDirection(vecs: DataFrame, dim: Int = 64,
      iters: Int = 3): Array[Long] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val xq = Dedup.materialize(
      vecs.select(col("vec_id"),
        Similarity.quantizeMicro(col("embedding")).as("xq")))
    var v = Array.fill(dim)(Unit)
    for (_ <- 1 to iters) {
      val s = xq.select(col("xq"),
          aggregate(zip_with(col("xq"), lit(v), _ * _), lit(0L), _ + _)
            .as("dot"))
        // integral division, truncation toward zero — `div`, never `/`
        // (double division would break the exact-integer replay)
        .select(col("xq"), expr(s"dot div $Unit").as("su"))
        .select(posexplode(col("xq")).as(Seq("pos", "x")), col("su"))
        .groupBy("pos").agg(sum(col("x") * col("su")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val sums = Array.tabulate(dim)(j => s.getOrElse(j, 0L))
      val m = sums.map(x => math.abs(x)).max
      require(m > 0L, "degenerate corpus: zero second moment")
      v = sums.map(x => ((BigInt(x) * Unit) / m).toLong)
    }
    v
  }

  /** The gate-facing direction relation: (pos, v) — `dim` rows of the
   * final iterate. */
  def pcaPower(vecs: DataFrame, dim: Int = 64, iters: Int = 3): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    pcaPowerDirection(vecs, dim, iters).zipWithIndex
      .map { case (x, j) => (j, x) }.toSeq.toDF("pos", "v")
  }

  /** Per-vector projection onto the power-iteration direction: micro-grid
   * integer `proj_q = (xq·v) div 10⁶` per vec_id — the 1-D coordinate
   * downstream binning/drift monitoring keys on. The direction derives
   * from `trainVecs` (defaults to the projection corpus; pass a hash
   * sample at scale); projecting itself is a narrow codegen'd map —
   * corpus-safe at any n. */
  def pcaProject(vecs: DataFrame, dim: Int = 64, iters: Int = 3,
      trainVecs: Option[DataFrame] = None): DataFrame =
    pcaProjectWith(vecs,
      pcaPowerDirection(trainVecs.getOrElse(vecs), dim, iters))

  /** Projection onto a HELD direction vector — the frozen-axis form:
   * train once ([[pcaPowerDirection]]), project many corpora/slices
   * with the same axis (e16 scores reference and candidate drops
   * against one direction; re-deriving it per slice would both double
   * the training cost and let the axes drift apart). */
  def pcaProjectWith(vecs: DataFrame, v: Array[Long]): DataFrame =
    vecs.select(col("vec_id"),
        aggregate(zip_with(Similarity.quantizeMicro(col("embedding")),
          lit(v), _ * _), lit(0L), _ + _).as("dot"))
      .select(col("vec_id"), expr(s"dot div $Unit").as("proj_q"))

  /** Per-dimension first/second moments of the micro-grid corpus — the
   * whitening statistics ([[standardize]]'s parameters) as exact
   * integers: `mean_q = Σx div n` and `std_q = round(√((n·Σx² − (Σx)²)
   * div n²))` — the variance numerator is an exact BIGINT, the single
   * integer division lands the micro²-unit variance back under 2⁵³, and
   * IEEE sqrt of an exactly-representable double is correctly rounded in
   * every engine, so the stats replay bit-for-bit. One posexplode +
   * dim-grain hash-agg; output (pos, n, mean_q, std_q) — `dim` rows. */
  def dimStats(vecs: DataFrame): DataFrame =
    vecs.select(posexplode(Similarity.quantizeMicro(col("embedding")))
        .as(Seq("pos", "xq")))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum("xq").as("s"),
        sum(col("xq") * col("xq")).as("ss"))
      .select(col("pos"), col("n"),
        expr("s div n").as("mean_q"),
        floor(sqrt(expr("((n * ss - s * s) div (n * n))").cast("double"))
          + lit(0.5)).cast("long").as("std_q"))

  /** Z-score standardization of the embedding column against `stats`
   * (a [[dimStats]] collect — dim rows of driver-held
   * (mean_q, std_q) parameters, the codebook posture): each element maps
   * to `(xq − mean_q) / std_q` — the micro units cancel, so `z` is in
   * standard-deviation units; zero-variance dims map to 0. Exact integer
   * subtraction followed by ONE IEEE double division per element —
   * deterministic under any partitioning. A narrow codegen'd map,
   * corpus-safe at any n (the whitening preprocessor ahead of
   * [[pcaPower]]/codebook training). */
  def standardize(vecs: DataFrame, stats: Array[(Long, Long)]): DataFrame = {
    val means = stats.map(_._1)
    val stds = stats.map(_._2)
    vecs.select(col("vec_id"),
      zip_with(
        zip_with(Similarity.quantizeMicro(col("embedding")), lit(means),
          (x, m) => x - m),
        lit(stds),
        (d, sd) => when(sd === lit(0L), lit(0.0))
          .otherwise(d.cast("double") / sd.cast("double"))).as("z"))
  }

  // ─────────── Exact normal-equations linear probe (ridge) ───────────

  /** Sign of a permutation by inversion count. */
  private def permSign(p: Seq[Int]): Int = {
    var inv = 0
    for (i <- p.indices; j <- (i + 1) until p.size)
      if (p(i) > p(j)) inv += 1
    if (inv % 2 == 0) 1 else -1
  }

  /** Leibniz determinant over BigInt — d ≤ 6 keeps the d! expansion
   * trivial, and the expansion is exactly what the oracle unrolls in
   * HUGEINT, so both engines sum identical integer terms. */
  private[ext] def detLeibniz(m: IndexedSeq[IndexedSeq[BigInt]]): BigInt =
    m.indices.permutations.map { p =>
      val prod = p.zipWithIndex.map { case (c, r) => m(r)(c) }.product
      if (permSign(p) > 0) prod else -prod
    }.sum

  /** Closed-form ridge-regression probe over embedding features, trained
   * IN-ENGINE with the PageRank/PCA exact-integer discipline: features
   * are the first `dims` embedding coordinates on the CENTI grid plus an
   * intercept, the target is the one-vs-rest indicator of `targetLabel`,
   * and the weights solve (XᵀX + λI)·w = Xᵀy EXACTLY — the Gram/moment
   * sums are ONE corpus-pass hash-agg to a single (d²+d)-column row; the
   * tiny d×d solve is Cramer's rule over Leibniz determinants in BigInt
   * (HUGEINT in the oracle), so each weight is an exact rational
   * `w_num/w_den`, identical in any engine, under any partitioning, at
   * any parallelism. No gradient loop, no learning rate, no float
   * drift — the trained-weights counterpart to [[QualityModel]]'s fixed
   * hashed-feature scorer.
   *
   * Scale shape: the corpus pass is a narrow projection + one hash-agg
   * (model-parameter posture — like every codebook, the solve input is
   * a single row on the driver). Train on a deterministic hash sample at
   * corpus scale ([[Sampling.hashSample]]); determinant magnitudes grow
   * as (n·maxx²)^d·d!, so the 128-bit oracle replay holds to n ≈ 10³ at
   * d = 4 — BigInt here never overflows regardless.
   * Output: (feature, w_num, w_den) with the exact integers as STRINGS
   * (they exceed BIGINT; both engines print identical digits). */
  def linearProbe(vecs: DataFrame, dims: Int = 3, lambdaInt: Long = 100L,
      targetLabel: Int = 0): DataFrame = {
    require(dims >= 1 && dims <= 5, s"dims must be in [1, 5], got $dims")
    require(lambdaInt >= 0, s"lambda must be >= 0, got $lambdaInt")
    val d = dims + 1
    val spark = vecs.sparkSession
    val feats = (0 until dims).map(j =>
      floor(element_at(col("embedding"), j + 1).cast("double") * 100
        + 0.5).cast("long").as(s"x$j")) :+ lit(1L).as(s"x$dims")
    val rows = vecs.select(feats :+
      when(col("label") === targetLabel, 1L).otherwise(0L).as("y"): _*)
    val sums =
      (for { i <- 0 until d; j <- i until d } yield
        sum(col(s"x$i") * col(s"x$j")).as(s"a_${i}_$j")) ++
        (0 until d).map(i => sum(col(s"x$i") * col("y")).as(s"b_$i"))
    val g = rows.agg(sums.head, sums.tail: _*).head()
    def gv(n: String) = BigInt(g.getLong(g.fieldIndex(n)))
    val a = IndexedSeq.tabulate(d, d) { (i, j) =>
      gv(s"a_${math.min(i, j)}_${math.max(i, j)}") +
        (if (i == j) BigInt(lambdaInt) else BigInt(0))
    }
    val b = IndexedSeq.tabulate(d)(i => gv(s"b_$i"))
    val den = detLeibniz(a)
    require(den > 0,
      "normal matrix must be positive definite: raise lambda")
    val out = (0 until d).map { i =>
      val ai = IndexedSeq.tabulate(d, d)((r, c) =>
        if (c == i) b(r) else a(r)(c))
      (i, detLeibniz(ai).toString, den.toString)
    }
    import spark.implicits._
    out.toDF("feature", "w_num", "w_den")
  }

  /** The probe's weights on the integer MICRO grid, rounded half away
   * from zero — `sign·((2·|num|·10⁶ + den) div (2·den))`, exact BigInt
   * arithmetic with den > 0, replayed identically by the oracle's
   * HUGEINT `//` (truncation = floor on non-negatives). The driver-held
   * parameter vector [[linearProbeScores]] consumes. */
  def probeWeightsMicro(probe: DataFrame): Array[Long] =
    probe.orderBy("feature").collect().map { r =>
      val num = BigInt(r.getString(1))
      val den = BigInt(r.getString(2))
      val q = (num.abs * 2000000 + den) / (den * 2)
      (if (num < 0) -q else q).toLong
    }

  /** Score the corpus with micro-grid probe weights: `score_cmicro =
   * Σ_j w_micro_j·x_j + w_micro_d` over the same centi-grid features —
   * exact integer per row (micro·centi units), a narrow codegen'd map at
   * any n; the top-`k` cut is a TakeOrderedAndProject. The
   * train-on-sample / score-everything split of the probe pipeline. */
  def linearProbeScores(vecs: DataFrame, wMicro: Array[Long],
      k: Int = 20): DataFrame = {
    val dims = wMicro.length - 1
    val score = (0 until dims).map(j =>
      lit(wMicro(j)) * floor(element_at(col("embedding"), j + 1)
        .cast("double") * 100 + 0.5).cast("long"))
      .reduce(_ + _) + lit(wMicro(dims))
    vecs.select(col("vec_id"), score.as("score_cmicro"))
      .orderBy(col("score_cmicro").desc, col("vec_id"))
      .limit(k)
  }
}
