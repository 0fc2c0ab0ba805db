package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based document quality filtering: a linear classifier over hashed
 * bag-of-words features — the fastText-style quality scorer every
 * large-scale pretraining pipeline runs after the heuristic filters
 * (`TextAnalysis.qualityColumns`).
 *
 * The model is a weight table indexed by a feature hash of each token
 * (`bucket = md5_32("qw:" + token) mod NumBuckets`); the document score is
 * the mean token weight. Weights here are derived from a fixed seed (a
 * stand-in for trained parameters — the ARITHMETIC is the deliverable), in
 * integer MILLIS so the per-document sum is an exact BIGINT: summation
 * order cannot perturb the score, which keeps the result deterministic
 * under any partitioning AND lets the DuckDB oracle replay it bit-for-bit.
 *
 * Scale shape: explode(tokens) → narrow hash/weight projection (all
 * codegen'd builtins, no weight-table join — the "table" is a hash formula,
 * the same trick as feature hashing in VW/fastText) → one partial-agg
 * hash-agg back to doc grain. Linear in corpus tokens, one shuffle at doc
 * grain. With a real trained model the weight table becomes a broadcast
 * array literal indexed by the same bucket id — the plan is unchanged.
 */
object QualityModel {

  val NumBuckets = 1024

  /** md5-prefix 32-bit hash, as used across the dedup/sampling family —
   * DuckDB replays it as ('0x' || substr(md5(s), 1, 8))::BIGINT. */
  private def md5u32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Feature bucket of a token. */
  def featureBucket(token: Column): Column =
    pmod(md5u32(concat(lit("qw:"), token)), lit(NumBuckets.toLong))

  /** Seeded weight of a bucket, in integer millis ∈ [-1000, 1000] —
   * exact-summable; /1000.0 only at the end. */
  def bucketWeightMillis(bucket: Column): Column =
    pmod(md5u32(concat(lit("qv:"), bucket.cast("string"))), lit(2001L)) - lit(1000L)

  /** Per-document score: mean hashed-token weight (exact integer sum of
   * millis, single final division), plus the keep decision at `minScore`.
   * Output: (doc_id, n_toks, score, keep). */
  def score(docs: DataFrame, minScore: Double = 0.0): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), bucketWeightMillis(featureBucket(col("tok"))).as("w_m"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum("w_m").as("__s_m"))
      .select(col("doc_id"), col("n_toks"),
        (col("__s_m").cast("double") / lit(1000.0) / col("n_toks")).as("score"))
      .withColumn("keep", col("score") > minScore)

  /** Per-source CALIBRATED quality gate: keep the top `keepPct`% of each
   * source by model score — the way a production run actually sets
   * thresholds, because one global cutoff over-prunes sources the scorer
   * dislikes wholesale and under-prunes the ones it likes (the classifier
   * is calibrated per domain, not globally). Rank-based rather than
   * quantile-interpolated: the cut is `rn ≤ ⌈n_s · keepPct / 100⌉` with
   * ties broken by doc_id, all exact integer arithmetic, so the kept set
   * (and the reported threshold — the lowest kept score) replays
   * bit-for-bit with no percentile-interpolation ambiguity between
   * engines.
   *
   * Returns the calibration table a run pins before filtering:
   * `(source, n_docs, n_kept, threshold)`. Cost: the scorer's one
   * doc-grain agg + ONE per-source window sort (w1's top-n shape) + a
   * sources-sized aggregate; the per-source count rides the same window
   * partitioning, no join-back. */
  def calibratedBySource(docs: DataFrame, keepPct: Int): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100,
      s"keepPct must be in [1, 100], got $keepPct")
    val bySrc = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val ranked = score(docs.select("doc_id", "text"))
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .withColumn("rn", row_number().over(
        bySrc.orderBy(col("score").desc, col("doc_id"))))
      .withColumn("n_s", count(lit(1)).over(bySrc))
      .withColumn("kept",
        col("rn") <= expr(s"(n_s * $keepPct + 99) div 100"))
    ranked.groupBy("source")
      .agg(max("n_s").as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        min(when(col("kept"), col("score"))).as("threshold"))
  }
}
