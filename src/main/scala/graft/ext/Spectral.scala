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
      trainVecs: Option[DataFrame] = None): DataFrame = {
    val v = pcaPowerDirection(trainVecs.getOrElse(vecs), dim, iters)
    vecs.select(col("vec_id"),
        aggregate(zip_with(Similarity.quantizeMicro(col("embedding")),
          lit(v), _ * _), lit(0L), _ + _).as("dot"))
      .select(col("vec_id"), expr(s"dot div $Unit").as("proj_q"))
  }

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
}
