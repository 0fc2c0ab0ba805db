package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multinomial Naive Bayes text classifier (the fastText-free baseline a
 * curation pipeline trains in-engine for language-ID / quality routing —
 * the supervised sibling of [[TextAnalysis]]'s n-gram heuristic and the
 * same model family CCNet uses for its lang filter). TRAINING is pure
 * counting (exact integers); SCORING sums Laplace-smoothed log
 * likelihoods `ln((n_tc + 1)/(n_c + V))`, each term micro-quantized on
 * the repo's `floor(x·1e6 + 0.5)` grid BEFORE the per-document sum — so
 * document scores are exact BIGINT sums (partitioning-independent,
 * byte-replayable by the DuckDB oracle), and the argmax is deterministic
 * with the lexicographically-smallest class breaking exact ties.
 *
 * Scale posture: the model is the (token, class) count relation — vocab-
 * bounded, never corpus-bounded. Scoring joins test-token occurrences to
 * the CLASS-GRID of per-class stats (a broadcast of |classes| rows) and
 * left-joins the count relation, so out-of-vocabulary tokens fall back
 * to the smoothing floor `1/(n_c + V)` without materializing a V×C grid.
 * One hash-agg to document grain, one to the confusion matrix.
 */
object NaiveBayes {

  /**
   * Feature hashing (the "hashing trick", Weinberger et al. 2009): bag-of-
   * words token counts folded into a FIXED-width feature space by a seeded
   * hash, with the companion SIGN hash (±1 per token) that makes collision
   * noise zero-mean instead of additive — the featurizer that feeds a
   * linear quality/langid probe without materializing (or shipping) a
   * vocabulary. Output: sparse `(doc_id, bucket, w)` rows, `w` the signed
   * token-count sum — exact integers end to end, vocabulary-free by
   * construction (the whole point at 100 TB: the feature space is
   * `numBuckets` wide no matter how many distinct tokens the corpus
   * grows). One narrow projection + one (doc, bucket) hash-agg.
   */
  def hashFeatures(docs: DataFrame, numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val bucket = pmod(Dedup.seededHash(col("tok"), 61), lit(numBuckets.toLong))
    val sign = when(Dedup.seededHash(col("tok"), 62) % 2 === 0, lit(1L))
      .otherwise(lit(-1L))
    tok.select(col("doc_id"), bucket.as("bucket"), sign.as("s"))
      .groupBy("doc_id", "bucket")
      .agg(sum("s").as("w"))
      .filter(col("w") =!= 0L)
  }

  private def qlog(x: Column): Column =
    floor(log(x) * lit(1e6) + lit(0.5)).cast("long")

  /**
   * Train on `docs` rows where `trainSide` holds, score the rest, return
   * the confusion matrix `(label_true, label_pred, n_docs)`.
   *
   * `labelCol` supervises training; test rows' labels are used only to
   * bucket the matrix. Tokens are whitespace words (multinomial: every
   * occurrence counts). Test documents whose label class never occurred
   * in training still score (priors cover trained classes only — an
   * unseen class cannot be predicted, the honest NB behavior).
   */
  def confusion(docs: DataFrame, labelCol: String,
      trainSide: Column): DataFrame = {
    val tokens = docs.select(col("doc_id"), col(labelCol).as("label"),
      trainSide.as("is_train"),
      explode(split(col("text"), " ")).as("tok"))
    val trainToks = tokens.filter(col("is_train"))
    // per-class token counts (the model), class totals, vocab size
    val ntc = Dedup.materialize(trainToks.groupBy("label", "tok")
      .agg(count(lit(1)).as("n_tc")))
    val nc = ntc.groupBy("label").agg(sum("n_tc").as("n_c"))
    val vocab = trainToks.agg(countDistinct("tok").as("v"))
    val priors = docs.filter(trainSide)
      .groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("d_c"))
    val dTot = docs.filter(trainSide).agg(count(lit(1)).as("d"))
    // class grid: one row per trained class with totals + prior
    val grid = nc.join(priors, Seq("label"))
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(dTot))
      .select(col("label").as("cls"), col("n_c"), col("v"),
        qlog(col("d_c").cast("double") / col("d")).as("prior_q"))
    // every test-token occurrence × trained class, smoothing fallback on
    // the left join; per-term quantization keeps document sums exact
    val testToks = tokens.filter(!col("is_train"))
    val termScores = testToks
      .crossJoin(broadcast(grid))
      .join(ntc.select(col("label").as("cls"), col("tok"),
          col("n_tc")), Seq("cls", "tok"), "left")
      .select(col("doc_id"), col("label"), col("cls"),
        qlog((coalesce(col("n_tc"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_c") + col("v"))).as("q"))
    val docScores = termScores.groupBy("doc_id", "label", "cls")
      .agg(sum("q").as("ll"))
      .join(broadcast(grid.select(col("cls"), col("prior_q"))), Seq("cls"))
      .select(col("doc_id"), col("label"), col("cls"),
        (col("ll") + col("prior_q")).as("score"))
    val pred = docScores.groupBy("doc_id", "label")
      .agg(min(struct((-col("score")).as("neg"), col("cls"))).as("best"))
      .select(col("label").as("label_true"),
        col("best.cls").as("label_pred"))
    pred.groupBy("label_true", "label_pred")
      .agg(count(lit(1)).as("n_docs"))
  }
}
