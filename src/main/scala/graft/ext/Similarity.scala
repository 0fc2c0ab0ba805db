package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 *  - Brute-force cosine top-k: the exact baseline — a broadcast of the query
 *    set against a full scan of the corpus, one window per query for the
 *    top-k cut. Linear in corpus size; the right answer up to ~10^7 vectors
 *    per executor-scan when the query set is small.
 *  - IVF-style cell-restricted search: candidates limited to the query's
 *    coarse cell (here the materialized `label` column stands in for the
 *    assigned centroid id — exactly how an IVF index is stored at rest:
 *    a cell id column + cell-partitioned layout). Turns the scan into a
 *    partition-pruned lookup; recall trades off with cell count.
 *
 * All arithmetic is element-wise double math in index order (codegen'd
 * builtins — `zip_with`/`aggregate`), so results replay bit-for-bit in the
 * DuckDB oracle.
 */
object Similarity {

  /** Dot product of two float-array columns in double precision — the
   * codegen'd native expression (graft.functions.FloatVecDot). Requires
   * `GraftFunctions.register(spark)` on the session (GraftSession does it;
   * query defs re-register defensively). Bit-identical to the builtin
   * composition `aggregate(zip_with(a,b,(x,y)=>x*y), 0d, _+_)`. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vecDot(a, b)

  /** The builtin-only composition (kept for cross-checking the native
   * expression in tests). */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity (double). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact brute-force top-k neighbors for each query vector.
   * `queries`/`corpus`: (id, embedding). Self-matches excluded.
   * Norms are precomputed per side — one sqrt per vector instead of two
   * dot products per PAIR (same doubles, so results are unchanged; the
   * per-pair work drops to a single fused dot product). */
  def knnBrute(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("q_norm"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("n_norm"))
    val scored = q.crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")), 4).as("sim"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("sim"), asc("n_id"))))
      .filter(col("rank") <= k)
  }

  /** Deterministic within-cell truncation to `maxCell` members, ordered by
   * a hash of the id (a pseudo-random but replayable sample). Mirrors
   * `Dedup.lshCandidates`'s bucket cap: one degenerate cell (a dominant
   * label) otherwise makes every within-cell join O(B²)/unbounded. Unlike
   * LSH buckets (where over-cap buckets are droppable — their docs share
   * tighter buckets), a cell here is the ONLY route to its members, so we
   * sample it down instead of dropping it: bounded cost, graceful recall
   * degradation. `maxCell = Int.MaxValue` disables. */
  private def capCell(vecs: DataFrame, idCol: String, maxCell: Int): DataFrame =
    if (maxCell == Int.MaxValue) vecs
    else vecs.withColumn("__rn", row_number().over(
        Window.partitionBy("cell").orderBy(xxhash64(col(idCol)), col(idCol))))
      .filter(col("__rn") <= maxCell).drop("__rn")

  /** IVF-style search: same scoring, but candidates restricted to the
   * query's cell (`cellCol`), pruning the scan by the cell partitioning.
   * Corpus cells are capped at `maxCell` candidates (see capCell). */
  def knnCell(queries: DataFrame, corpus: DataFrame, cellCol: String, k: Int,
      maxCell: Int = 10000): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col(cellCol).as("cell"),
      sqrt(dot(col("embedding"), col("embedding"))).as("q_norm"))
    val c = capCell(
      corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col(cellCol).as("cell"),
        sqrt(dot(col("embedding"), col("embedding"))).as("n_norm")),
      "n_id", maxCell)
    val scored = q.join(c, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")), 4).as("sim"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("sim"), asc("n_id"))))
      .filter(col("rank") <= k)
  }

  /** Embedding near-dup pairs: same-cell blocking, cosine ≥ threshold.
   * Cells are capped at `maxCell` members before the self-join, bounding
   * the within-cell cost at maxCell²/2 pairs (see capCell). */
  def cosineDedupPairs(vecs: DataFrame, cellCol: String, minCos: Double,
      maxCell: Int = 10000): DataFrame = {
    val capped = capCell(
      vecs.select(col(cellCol).as("cell"), col("vec_id"), col("embedding")),
      "vec_id", maxCell)
    val a = capped.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = capped.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 4).as("sim"))
      .filter(col("sim") >= minCos)
  }
}
