package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
 * 2023): pick pretraining documents from a large raw pool so the SELECTED
 * set's distribution matches a small high-quality target corpus. The
 * published recipe, exactly as three dataflow steps:
 *
 *  1. fit hashed n-gram bag-of-words models of the target and the raw
 *     pool (feature hashing into `NumBuckets` buckets — the same trick as
 *     [[QualityModel]]; collisions are part of the method, not a bug);
 *  2. per raw document, the log importance weight
 *     `log w(x) = Σ_tok log p_target(b(tok)) − log p_raw(b(tok))`
 *     (add-1 smoothed over the bucket count);
 *  3. Gumbel top-k: sample k documents WITHOUT replacement with
 *     probability ∝ w(x) by ranking on `log w + Gumbel noise`.
 *
 * Determinism discipline (the repo-wide gate contract): each bucket's
 * log-ratio is quantized to integer MICROS the moment it leaves `ln`
 * (identical IEEE doubles in, one correctly-behaved `ln` each engine), so
 * per-document sums are exact BIGINTs — partitioning cannot perturb a
 * weight, and the DuckDB oracle replays every weight bit-for-bit. The
 * Gumbel draw derives from an md5 uniform (`u = (h mod 1e6 + 0.5)/1e6`,
 * `g = −ln(−ln u)`, micro-quantized) — "noise" that is a pure function of
 * doc_id, so the sample is the same on any cluster, any run.
 *
 * Scale shape (the 100-TB posture): ONE corpus token pass feeds a
 * bucket-grain conditional count (`NumBuckets` rows out — KB-scale
 * regardless of corpus size), the ratio table broadcasts back onto the
 * raw-side token relation (narrow join, no corpus shuffle), and the only
 * corpus-keyed exchange is the final doc-grain partial-agg sum. The
 * top-k select is `TakeOrderedAndProject` — k rows per partition cross
 * the wire, never the pool.
 */
object Selection {

  /** Feature-hash buckets. 10⁴ in the paper for unigrams+bigrams; 1024
   * here to keep bucket collisions exercised at test scale. */
  val NumBuckets = 1024

  private def md5u32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Feature bucket of a token (seed-domain "ds:" — distinct from the
   * quality model's "qw:" so the two hashed feature spaces differ). */
  def featureBucket(token: Column): Column =
    pmod(md5u32(concat(lit("ds:"), token)), lit(NumBuckets.toLong))

  /** The hashed feature stream of a document relation: unigrams always;
   * with `ngrams = 2` also the word bigrams (`"w1 w2"` strings into the
   * same hashed bucket space) — the paper's full feature set. Bigrams
   * derive NARROWLY (`zip_with` over two array slices); the explode is the
   * only amplification, ~2× the token count. */
  private def featureStream(docs: DataFrame, isTarget: Column,
      ngrams: Int): DataFrame = {
    require(ngrams == 1 || ngrams == 2, s"ngrams must be 1 or 2, got $ngrams")
    val w = split(col("text"), " ")
    val uni = docs.select(col("doc_id"), isTarget.as("is_t"),
      explode(w).as("tok"))
    if (ngrams == 1) uni
    else uni.unionByName(docs
      .filter(size(w) >= 2)
      .select(col("doc_id"), isTarget.as("is_t"),
        explode(zip_with(
          slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b))).as("tok")))
  }

  /** Per-bucket micro-quantized log importance ratio
   * `floor((ln((ct+1)/(Nt+B)) − ln((cr+1)/(Nr+B)))·1e6 + 0.5)`
   * from ONE pass over the corpus tokens (conditional counts; target and
   * raw totals derive from the same bucket-grain relation, not a second
   * scan). Output: (b, ct, cr, lr_q) — `NumBuckets` rows. */
  def dsirBucketLogRatios(docs: DataFrame, isTarget: Column,
      ngrams: Int = 1): DataFrame = {
    val toks = featureStream(docs, isTarget, ngrams)
      .select(col("is_t"), featureBucket(col("tok")).as("b"))
    // Materialized: `counts` feeds BOTH the totals and the ratio projection
    // — without the checkpoint each reference re-derives it from its own
    // full corpus token scan (the plan showed 2 corpus passes for a
    // 1024-row relation). KB-scale, so the checkpoint is free.
    val counts = Dedup.materialize(toks.groupBy("b").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("cr")))
    val totals = counts.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    counts.crossJoin(broadcast(totals))
      .select(col("b"), col("ct"), col("cr"),
        floor((log((col("ct") + lit(1L)).cast("double") /
                 (col("nt") + lit(NumBuckets.toLong)).cast("double")) -
               log((col("cr") + lit(1L)).cast("double") /
                 (col("nr") + lit(NumBuckets.toLong)).cast("double"))) * lit(1e6)
          + lit(0.5)).cast("long").as("lr_q"))
  }

  /** Log importance weight of every RAW-side document (target docs define
   * the distribution; they are not candidates). `ngrams = 2` scores over
   * hashed unigrams+bigrams, the paper's configuration. Output:
   * (doc_id, n_toks, logw_q, logw = logw_q/1e6). */
  def dsirWeights(docs: DataFrame, isTarget: Column,
      ngrams: Int = 1): DataFrame = {
    val lr = dsirBucketLogRatios(docs, isTarget, ngrams)
    featureStream(docs, isTarget, ngrams).filter(!col("is_t"))
      .select(col("doc_id"), featureBucket(col("tok")).as("b"))
      .join(broadcast(lr.select("b", "lr_q")), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum("lr_q").as("logw_q"))
      .select(col("doc_id"), col("n_toks"), col("logw_q"),
        (col("logw_q").cast("double") / lit(1e6)).as("logw"))
  }

  /** Micro-quantized deterministic Gumbel draw for a document id. */
  def gumbelQ(docId: Column): Column = {
    val u = (pmod(md5u32(concat(lit("dg:"), docId.cast("string"))),
      lit(1000000L)).cast("double") + lit(0.5)) / lit(1e6)
    floor(-log(-log(u)) * lit(1e6) + lit(0.5)).cast("long")
  }

  /** Gumbel top-k over `logw_q`: the k raw documents sampled without
   * replacement with probability ∝ importance weight. Ties (exact-integer
   * keys can collide) break on doc_id, so the selected SET is unique.
   * Output: (doc_id, n_toks, logw_q, g_q, key_q) — k rows. */
  def dsirResample(docs: DataFrame, isTarget: Column, k: Int,
      ngrams: Int = 1): DataFrame =
    dsirWeights(docs, isTarget, ngrams)
      .withColumn("g_q", gumbelQ(col("doc_id")))
      .withColumn("key_q", col("logw_q") + col("g_q"))
      .select("doc_id", "n_toks", "logw_q", "g_q", "key_q")
      .orderBy(col("key_q").desc, col("doc_id").asc)
      .limit(k)

  /** k-center greedy coreset selection (Sener & Savarese, ICLR 2018 —
   * the "Core-Set" active-learning/data-pruning selector): pick `k`
   * embedding-space representatives by repeatedly taking the point
   * FARTHEST from everything already selected — a 2-approximation of the
   * optimal k-center cover, and the diversity-first complement to the
   * density-based pruners ([[Similarity.protoPrune]]/D4): those drop
   * redundant points, this one CHOOSES maximally-spread ones (few-shot
   * pools, eval-subset construction, seed sets for labeling).
   *
   * Determinism is the [[Retrieval.mmrRerank]] integer ladder: cosine
   * distances on the 1e-4 grid (`d4 = 10⁴ − sim4`), each step's argmax
   * packs `(−ms4)·2²¹ + (2²¹−1−vec_id)` into one BIGINT (max = farthest
   * point, ties to the smaller id — `argmax min-dist ≡ argmin max-sim`
   * under the grid), and the seed is the minimum id (documented, not a
   * random init). `radius4` per step = the winner's distance to the
   * prior selection — the non-increasing k-center radius sequence, the
   * audit number the selection is judged by (step 1 = 2·10⁴, the grid
   * diameter, by convention: distance to an empty set).
   *
   * Scale shape: greedy k-center is quadratic in candidates, so at
   * corpus scale it runs on a deterministic hash-SAMPLE. `samplePct`
   * alone is NOT a scale bound (round-7 verdict #2): at fixed pct the
   * materialized pair grid still grows quadratically with the corpus —
   * 4k sampled vecs is 16M pair rows, 40k would be 1.6G. `sampleN` is
   * the absolute bound: when > 0, the candidate set is the `sampleN`
   * vectors with the smallest md5 rank (a `TakeOrderedAndProject` —
   * sampleN rows per partition cross the wire, never the corpus;
   * deterministic under any partitioning, with vec_id as the total-order
   * tiebreak), so the pair grid is O(sampleN²) REGARDLESS of corpus
   * size. When both are given, `sampleN` wins. Pairwise sims materialize once
   * (sample²-bounded); the k−1 rounds are aggregates over that
   * relation. */
  def kcenterSelect(vecs: DataFrame, k: Int,
      samplePct: Int = 100, sampleN: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(sampleN >= 0, s"sampleN must be >= 0, got $sampleN")
    val M = 1L << 21
    val sampled =
      if (sampleN > 0)
        vecs.orderBy(
          md5(concat(lit("kcn:"), col("vec_id").cast("string"))).asc,
          col("vec_id").asc)
          .limit(sampleN)
      else if (samplePct >= 100) vecs
      else Sampling.hashSample(vecs, "vec_id", samplePct)
    val v = graft.ext.Dedup.materialize(
      sampled.select(col("vec_id"), col("embedding")))
    require(v.filter(col("vec_id") >= M || col("vec_id") < 0).isEmpty,
      s"kcenterSelect requires 0 <= vec_id < $M for key packing")
    // Streamed side spread to the parallelism floor + explicit broadcast
    // of the (sample-bounded) build side: the sample²-sized sim grid is
    // the whole cost of the selector, and without the floor it scores on
    // a single task (the checkpointed sample is one block).
    val sims = graft.ext.Dedup.materialize(
      graft.ext.Dedup.spread(v.toDF("id_a", "emb_a"))
        .join(broadcast(v.toDF("id_b", "emb_b")),
          col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"),
          floor(round(Similarity.cosine(col("emb_a"), col("emb_b")), 4)
            * lit(1e4) + lit(0.5)).cast("long").as("sim4")))
    var result = graft.ext.Dedup.materialize(
      v.agg(min("vec_id").as("vec_id"))
        // empty (sampled) input: the global min agg yields one all-NULL
        // row — drop it so the selection is empty, not a phantom seed
        .filter(col("vec_id").isNotNull)
        .select(lit(1).as("step"), col("vec_id"),
          lit(20000L).as("radius4")))
    for (step <- 2 to k) {
      val ms = sims
        .join(result.select(col("vec_id").as("id_b")), Seq("id_b"))
        .groupBy(col("id_a")).agg(max("sim4").as("ms4"))
        .join(result.select(col("vec_id").as("id_a")), Seq("id_a"),
          "left_anti")
      val next = ms
        .select((-col("ms4") * M + (lit(M) - 1 - col("id_a"))).as("key"))
        .agg(max("key").as("key"))
        // k > |candidates|: the global max over an EMPTY relation is one
        // all-NULL row — drop it instead of unioning a phantom step
        .filter(col("key").isNotNull)
        .select(lit(step).as("step"),
          (lit(M) - 1 - pmod(col("key"), lit(M))).as("vec_id"),
          (lit(10000L) + expr(s"(key - pmod(key, $M)) div $M"))
            .as("radius4"))
      result = graft.ext.Dedup.materialize(result.unionByName(next))
    }
    result
  }

  /** 2-D Pareto skyline (Börzsönyi et al., ICDE 2001 — the SKYLINE
   * operator): the rows not DOMINATED in the maximize-both sense
   * (`b` dominates `a` iff `x_b >= x_a ∧ y_b >= y_a` with at least one
   * strict) — multi-objective data selection without scalarizing the
   * trade-off into one weighted score first (pick documents on the
   * quality/novelty frontier, configs on the cost/coverage frontier).
   * Exact-duplicate `(x, y)` points do not dominate each other; ALL rows
   * on a frontier point survive.
   *
   * Plan shape (the 2-D monotone-chain formulation, NOT the O(n²)
   * dominance join): one hash-agg to per-`x` maxima (only the max-`y`
   * point at each `x` can be non-dominated), ONE window pass over the
   * |distinct x|-sized maxima relation (running max of `y` over strictly
   * greater `x`; survive iff `y` strictly exceeds it), then a keyed
   * semi-join back to recover the surviving rows. The global sort runs
   * over the x-grain AGGREGATE, not the corpus — at 100 TB you bound
   * |distinct x| by bucketing a continuous dimension first (the z-order
   * grid discipline); the corpus itself is touched only by hash-agg and
   * semi-join. Columns must be integer-valued for the exact gate replay.
   * Output: (idCol, xCol, yCol) of every skyline row. */
  def skyline2d(df: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__x").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val frontier = df
      .groupBy(col(xCol).as("__x")).agg(max(col(yCol)).as("__y"))
      // distinct __x, so every preceding row under x-desc order has
      // STRICTLY greater x: dominated iff some such row has y >= ours
      .withColumn("__rm", max("__y").over(w))
      .filter(col("__rm").isNull || col("__y") > col("__rm"))
      .select(col("__x"), col("__y"))
    df.select(col(idCol), col(xCol), col(yCol))
      .join(frontier,
        col(xCol) === col("__x") && col(yCol) === col("__y"), "left_semi")
  }
}
