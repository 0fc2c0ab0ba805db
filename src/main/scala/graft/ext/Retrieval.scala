package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Lexical retrieval over the corpus: Okapi BM25 (Robertson et al., TREC-3;
 * the Lucene `ln(1 + (N − df + 0.5)/(df + 0.5))` idf variant) — the
 * standard first-stage ranker a training-data pipeline runs to pull
 * task-relevant documents from a web-scale pool (and the lexical half of
 * every hybrid lexical+ANN retrieval stack; the ANN half is
 * [[Similarity]]/[[AnnIndex]]).
 *
 * Determinism discipline: idf is micro-quantized to an integer the moment
 * it leaves `ln`; the per-(doc, term) score re-quantizes after the tf
 * saturation (one double multiply + divide chain on identical IEEE inputs
 * in both engines), so per-document totals are exact BIGINT sums and the
 * top-k cut (`bm25_q DESC, doc_id`) is engine-independent.
 *
 * Scale shape: the token scan filters to the query vocabulary BEFORE any
 * aggregation (a `terms`-sized IN-list inside the codegen'd scan stage —
 * the corpus never aggregates at full vocabulary grain for a query), doc
 * length rides the same projection (no second corpus pass, no doc-grain
 * join), df/avgdl are term-count-sized broadcasts, and the final ranking
 * is `TakeOrderedAndProject`: k rows per partition cross the wire. One
 * corpus-keyed exchange total (the (doc, term) tf partial-agg).
 */
object Retrieval {

  /** Micro-quantized Lucene idf and the per-(doc, term) saturated-tf BM25
   * score — the shared scoring core of [[bm25TopK]] and [[rm3TopK]]'s
   * second pass (one definition, so the expansion pass cannot drift from
   * the first-pass formula the oracle replays). Expects columns
   * (tf, dl, df, n_docs, sum_dl) in scope. */
  private def sQ(k1: Double, b: Double): Column = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idfQ = floor(log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))) * lit(1e6) + lit(0.5))
      .cast("long")
    val tfNorm = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    floor(idfQ.cast("double") * tfNorm + lit(0.5)).cast("long")
  }

  /** BM25 top-k documents for a bag-of-terms query. Output:
   * (doc_id, n_terms, bm25_q, bm25), ranked by bm25_q DESC, doc_id. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val w = split(col("text"), " ")
    // Corpus stats: one narrow length projection → 1-row broadcast.
    val lens = docs.select(col("doc_id"), size(w).cast("long").as("dl"))
    val stats = lens.agg(sum("dl").as("sum_dl"), count(lit(1)).as("n_docs"))
    // (doc, term) term frequencies; dl carried through the explode so no
    // doc-grain join is ever needed (dl is functionally determined by
    // doc_id, so adding it to the grouping key changes nothing).
    // Materialized: tf feeds both the df aggregation and the scoring join
    // — un-checkpointed, the df reference re-derives it from a second full
    // corpus scan. Post-filter it holds only (matching-doc, term) rows.
    val tf = Dedup.materialize(docs
      .select(col("doc_id"), size(w).cast("long").as("dl"),
        explode(w).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "dl", "tok")
      .agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), sQ(k1, b).as("s_q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("s_q").as("bm25_q"))
      .select(col("doc_id"), col("n_terms"), col("bm25_q"),
        (col("bm25_q").cast("double") / lit(1e6)).as("bm25"))
      .orderBy(col("bm25_q").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty 2001
   * — the language-modeling retrieval family beside [[bm25TopK]]'s
   * probabilistic one; the two disagree exactly where their length
   * normalizations differ, which is why an engine carries both):
   * score(Q, d) = Σ_{t∈Q} ln((tf_{t,d} + µ·p(t|C)) / (dl_d + µ)),
   * decomposed so only MATCHING (doc, term) pairs are ever enumerated:
   *
   *   Σ_matched ln((tf + µp)/(µp))   (per-pair, micro-quantized)
   * + Σ_{t∈Q} ln(µp_t)               (doc-independent constant)
   * − |Q|·ln(dl + µ)                 (per-doc, micro-quantized once)
   *
   * Every ln micro-quantizes the moment it is taken (PSI discipline),
   * so the total is an exact BIGINT and the (score DESC, doc_id) cut
   * is deterministic. Query terms absent from the corpus (p = 0 ⇒
   * ln −∞) drop from Q — the standard OOV rule. Docs matching no term
   * rank by length alone and are excluded (the [[bm25TopK]] contract).
   * Same scan shape as BM25: one materialized (doc, term) tf relation,
   * term-grain stats broadcast, one doc-grain agg, TakeOrdered.
   * Output: (doc_id, n_terms, ql_micro, ql). */
  def qlDirichletTopK(docs: DataFrame, terms: Seq[String], k: Int,
      mu: Long = 2000L): DataFrame = {
    require(terms.nonEmpty, "QL needs at least one query term")
    require(mu >= 1, s"mu must be >= 1, got $mu")
    val w = split(col("text"), " ")
    val lens = docs.select(col("doc_id"), size(w).cast("long").as("dl"))
    val stats = lens.agg(sum("dl").as("sum_dl"))
    val tf = Dedup.materialize(docs
      .select(col("doc_id"), size(w).cast("long").as("dl"),
        explode(w).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "dl", "tok")
      .agg(count(lit(1)).as("tf")))
    val pt = tf.groupBy("tok").agg(sum("tf").as("ctf"))
      .crossJoin(broadcast(stats))
      .select(col("tok"),
        (lit(mu).cast("double") * col("ctf").cast("double") /
          col("sum_dl").cast("double")).as("mup"))
    val consts = pt.agg(
      sum(floor(log(col("mup")) * lit(1e6) + lit(0.5)).cast("long"))
        .as("c_micro"),
      count(lit(1)).as("n_q"))
    tf.join(broadcast(pt), "tok")
      .select(col("doc_id"), col("dl"),
        floor(log((col("tf").cast("double") + col("mup")) / col("mup"))
          * lit(1e6) + lit(0.5)).cast("long").as("p1"))
      .groupBy("doc_id", "dl")
      .agg(count(lit(1)).as("n_terms"), sum("p1").as("s1"))
      .crossJoin(broadcast(consts))
      .select(col("doc_id"), col("n_terms"),
        (col("s1") + col("c_micro") - col("n_q") *
          floor(log(col("dl").cast("double") + lit(mu.toDouble)) *
            lit(1e6) + lit(0.5)).cast("long")).as("ql_micro"))
      .select(col("doc_id"), col("n_terms"), col("ql_micro"),
        (col("ql_micro").cast("double") / lit(1e6)).as("ql"))
      .orderBy(col("ql_micro").desc, col("doc_id").asc)
      .limit(k)
  }

  /** RM3 pseudo-relevance feedback (Lavrenko & Croft's relevance model,
   * the Anserini/Indri "RM3" composition): run BM25, treat the top
   * `fbDocs` documents as pseudo-relevant, estimate an expansion term
   * distribution from them, interpolate with the original query at
   * λ = 0.5, and re-rank with the expanded weighted query — the standard
   * one-round query expansion of a lexical retrieval stack (recall the
   * original bag-of-words misses, without embeddings).
   *
   * Determinism discipline (the same exact-integer ladder as BM25): each
   * feedback doc's relevance weight is its integer `bm25_q` share; RM1
   * term mass quantizes per (term, doc) contribution BEFORE summation
   * (`floor((tf·s_d)/(dl·S)·1e9 + 0.5)` — one fixed-shape double
   * expression over exact integers, so addition order cannot drift),
   * expansion/original weights carry as integer MICROS, and the final
   * score `Σ_t w_mic(t)·s_q(t,d)` is an exact BIGINT sum ranked by
   * (rm3_q DESC, doc_id).
   *
   * Scale shape: pass 1 is [[bm25TopK]] (one filtered corpus scan); the
   * feedback relation is `fbDocs` rows, so expansion-term estimation
   * scans only those docs (broadcast semi-join on doc_id — bounded rows
   * explode); the re-rank pass is one more corpus token scan filtered by
   * the ≤ |query|+`fbTerms` term relation (broadcast join in the scan
   * stage), same grain as pass 1. Nothing all-pairs, nothing
   * driver-side. */
  def rm3TopK(docs: DataFrame, terms: Seq[String], k: Int,
      fbDocs: Int = 5, fbTerms: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "RM3 needs at least one query term")
    val w = split(col("text"), " ")
    // pass 1: pseudo-relevant docs + their integer relevance mass
    val fb = Dedup.materialize(
      bm25TopK(docs, terms, fbDocs, k1, b).select("doc_id", "bm25_q"))
    val sTot = fb.agg(sum("bm25_q").as("s_tot"))
    // RM1 term mass over the feedback docs only (fbDocs-bounded explode)
    val ftok = docs
      .join(broadcast(fb), Seq("doc_id"))
      .select(col("doc_id"), col("bm25_q"), size(w).cast("long").as("dl"),
        explode(w).as("tok"))
      .groupBy("doc_id", "bm25_q", "dl", "tok")
      .agg(count(lit(1)).as("tf"))
    val rmc = ftok.crossJoin(broadcast(sTot))
      .select(col("tok"),
        floor((col("tf").cast("double") * col("bm25_q").cast("double")) /
          (col("dl").cast("double") * col("s_tot").cast("double")) *
          lit(1e9) + lit(0.5)).cast("long").as("c_q"))
      .groupBy("tok").agg(sum("c_q").as("rm_q"))
    val exp = Dedup.materialize(
      rmc.orderBy(col("rm_q").desc, col("tok").asc).limit(fbTerms))
    val rmTot = exp.agg(sum("rm_q").as("rm_tot"))
    // interpolated term weights in integer micros: λ/|Q| per original
    // term + (1−λ)·(rm share) per expansion term, λ = 0.5
    val spark = docs.sparkSession
    val orig = spark.createDataFrame(terms.map(Tuple1.apply)).toDF("tok")
      .withColumn("__o", lit(true))
    val wterms = Dedup.materialize(orig
      .join(exp.withColumn("__e", lit(true)), Seq("tok"), "full_outer")
      .crossJoin(broadcast(rmTot))
      .select(col("tok"),
        (when(col("__o"), lit(500000L / terms.size)).otherwise(lit(0L)) +
          when(col("__e"),
            floor(lit(5e5) * col("rm_q").cast("double") /
              col("rm_tot").cast("double") + lit(0.5)).cast("long"))
            .otherwise(lit(0L))).as("w_mic")))
    // pass 2: weighted BM25 over the expanded vocabulary — the same
    // filtered-scan grain as pass 1, term filter now a broadcast join
    val lens = docs.select(col("doc_id"), size(w).cast("long").as("dl"))
    val stats = lens.agg(sum("dl").as("sum_dl"), count(lit(1)).as("n_docs"))
    val tf2 = Dedup.materialize(docs
      .select(col("doc_id"), size(w).cast("long").as("dl"),
        explode(w).as("tok"))
      .join(broadcast(wterms.select("tok")), Seq("tok"))
      .groupBy("doc_id", "dl", "tok")
      .agg(count(lit(1)).as("tf")))
    val dfreq2 = tf2.groupBy("tok").agg(count(lit(1)).as("df"))
    tf2.join(broadcast(dfreq2), "tok")
      .join(broadcast(wterms), "tok")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), (col("w_mic") * sQ(k1, b)).as("ws_q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("ws_q").as("rm3_q"))
      .select(col("doc_id"), col("n_terms"), col("rm3_q"),
        (col("rm3_q").cast("double") / lit(1e12)).as("rm3"))
      .orderBy(col("rm3_q").desc, col("doc_id").asc)
      .limit(k)
  }

  /** MMR diversified re-rank (Carbonell & Goldstein, SIGIR 1998) at
   * λ = ½: greedily select `k` of the top-`fetch` dense candidates,
   * each step taking `argmax λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)` —
   * relevance traded against redundancy with what's already picked, the
   * standard diversity pass between retrieval and consumption (a near-dup
   * top-k wastes its result budget; the in-results twin of the corpus
   * dedup stages).
   *
   * Determinism is ALL integer: cosines land on the 1e-4 grid
   * (`floor(sim·1e4 + 0.5)`), λ = ½ makes the MMR objective a pure
   * integer DIFFERENCE `rel4 − maxsim4` (the ½ cancels in argmax), and
   * each step's argmax packs (mmr4, n_id) into one BIGINT key
   * (`mmr4·2²¹ + (2²¹−1−n_id)` — max(key) is then argmax by score with
   * ties to the SMALLER id, decoded by floored mod/div; requires ids
   * < 2²¹, enforced) so both engines pick bit-identical winners with no
   * arg_max tie ambiguity.
   *
   * Scale shape: the corpus-sized work is the upstream retriever
   * ([[Similarity.knnBrute]] here; swap the ANN index paths at scale) —
   * everything after runs on (queries × fetch)-bounded relations:
   * pairwise sims are fetch² per query, and the k−1 greedy rounds are
   * joins over those bounded relations (each round materialized, tiny).
   * The greedy loop is inherently sequential in k — that is MMR — but k
   * is the RESULT budget, not the corpus. Output: (q_id, step, n_id,
   * mmr4), step = selection order, mmr4 = the winning integer objective
   * (step 1 = rel4). */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, k: Int,
      fetch: Int): DataFrame = {
    require(k >= 1 && fetch >= k, s"need 1 <= k <= fetch, got k=$k fetch=$fetch")
    mmrSelect(
      Similarity.knnBrute(queries, corpus, fetch)
        .select(col("q_id"), col("n_id"),
          floor(col("sim") * lit(1e4) + lit(0.5)).cast("long").as("rel4")),
      corpus.select(col("vec_id").as("n_id"), col("embedding")), k)
  }

  /** The greedy MMR core over an ALREADY-RETRIEVED candidate relation
   * `(q_id, n_id, rel4)` plus an embedding lookup `(n_id, embedding)` —
   * the seam [[mmrRerank]] (dense rel) and [[retrievalStack]] (lexical
   * rel, semantic diversity) share, so the two compositions cannot drift
   * on the selection arithmetic. */
  private[ext] def mmrSelect(cand0: DataFrame, embById: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val M = 1L << 21
    val cand = Dedup.materialize(cand0)
    // ids must fit the key packing — fail loudly, never mis-decode
    require(cand.filter(col("n_id") >= M || col("n_id") < 0).isEmpty,
      s"MMR requires 0 <= n_id < $M for key packing")
    val ce = Dedup.materialize(cand.join(embById, "n_id")
      .select(col("q_id"), col("n_id"), col("embedding")))
    // a candidate without an embedding row would win step 1 on relevance
    // but silently vanish from every diversity step (the maxsim inner
    // join) — an inconsistent hybrid; demand full coverage instead.
    // Left-anti emptiness, not count equality: duplicate embById rows
    // could balance a missing id and fool a count check (and it is one
    // bounded action instead of two). Caller contract: embById is unique
    // per n_id — a conflicting duplicate would make the sims relation
    // row-dependent.
    require(cand.join(embById, Seq("n_id"), "left_anti").isEmpty,
      "MMR requires an embedding row for every candidate id")
    val sims = Dedup.materialize(
      ce.toDF("q_id", "c_a", "emb_a")
        .join(ce.toDF("q2", "c_b", "emb_b"),
          col("q_id") === col("q2") && col("c_a") =!= col("c_b"))
        .select(col("q_id"), col("c_a"), col("c_b"),
          // round-to-4 FIRST (the engine-wide cosine grid), then scale:
          // identical to rel4's derivation from the already-rounded
          // retriever sim, and to the oracle's sqlCos-based replay
          floor(round(Similarity.cosine(col("emb_a"), col("emb_b")), 4)
            * lit(1e4) + lit(0.5)).cast("long").as("sim4")))
    def pick(scored: DataFrame, step: Int): DataFrame =
      scored
        .select(col("q_id"),
          (col("mmr4") * M + (lit(M) - 1 - col("n_id"))).as("key"))
        .groupBy("q_id").agg(max("key").as("key"))
        .select(col("q_id"), lit(step).as("step"),
          (lit(M) - 1 - pmod(col("key"), lit(M))).as("n_id"),
          expr(s"(key - pmod(key, $M)) div $M").as("mmr4"))
    var result = Dedup.materialize(
      pick(cand.withColumn("mmr4", col("rel4")), 1))
    for (step <- 2 to k) {
      val maxsim = sims
        .join(result.select(col("q_id"), col("n_id").as("c_b")),
          Seq("q_id", "c_b"))
        .groupBy(col("q_id"), col("c_a").as("n_id"))
        .agg(max("sim4").as("ms4"))
      val scored = cand
        .join(result.select("q_id", "n_id"), Seq("q_id", "n_id"),
          "left_anti")
        .join(maxsim, Seq("q_id", "n_id"))
        .withColumn("mmr4", col("rel4") - col("ms4"))
      result = Dedup.materialize(
        result.unionByName(pick(scored, step)))
    }
    result
  }

  /** Flagship composition #3 — the SERVING-side stack, complementing
   * pipe1 (curation audit) and pipe2 (training assembly): retrieve
   * LEXICALLY, diversify SEMANTICALLY. BM25 pulls the top-`fetch`
   * candidates ([[bm25TopK]] — the corpus-scale stage), then the greedy
   * MMR core selects `k` of them trading lexical relevance against
   * embedding-cosine redundancy — the standard "don't return ten copies
   * of the same page" pass between retrieval and consumption, with the
   * relevance and diversity signals deliberately from DIFFERENT
   * modalities (the hybrid a pure-dense or pure-lexical stack can't
   * express).
   *
   * Scale mapping: BM25's integer-micro score maps onto the MMR grid by
   * exact integer division (`rel4 = bm25_q div 1000` — micro → the
   * 1e-4-grid magnitude the sim term lives on; the standard
   * normalize-before-MMR step, done in exact arithmetic). Everything
   * after the retriever runs on (fetch)-bounded relations. Output:
   * (step, doc_id, mmr4). */
  def retrievalStack(docs: DataFrame, embeddings: DataFrame,
      terms: Seq[String], k: Int, fetch: Int): DataFrame = {
    require(k >= 1 && fetch >= k, s"need 1 <= k <= fetch, got k=$k fetch=$fetch")
    val embIds = embeddings.select(col("vec_id").as("n_id"), col("embedding"))
    mmrSelect(
      bm25TopK(docs, terms, fetch)
        .select(lit(0L).as("q_id"), col("doc_id").as("n_id"),
          expr("bm25_q div 1000").as("rel4"))
        // the stack serves from the EMBEDDED corpus: a lexical candidate
        // without an embedding cannot be diversity-assessed, so it is
        // excluded up front (wholly, not the silent step-1-only hybrid
        // mmrSelect guards against) — on a partially-embedded corpus the
        // final page may hold fewer than k docs, by contract
        .join(embIds.select("n_id").distinct(), Seq("n_id"), "left_semi"),
      embIds, k)
      .select(col("step"), col("n_id").as("doc_id"), col("mmr4"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009): fuse N ranked
   * retrieval lists by `Σ_lists 1/(k0 + rank)` — the standard glue of a
   * hybrid lexical+dense stack (BM25 top-k ∪ ANN top-k), rank-only so no
   * cross-system score calibration is needed. Each input must carry
   * `(doc_id, rank)` with rank 1-based; a doc missing from a list simply
   * contributes nothing (the published formulation).
   *
   * Determinism: each reciprocal quantizes to integer MICROS
   * (`floor(1e6/(k0+rank))` — one double divide of exact integers, same
   * IEEE result in any engine), so fused totals are exact BIGINT sums and
   * the final cut (`rrf_q DESC, doc_id`) is engine-independent.
   *
   * Scale shape: the inputs are top-k lists — k·N rows TOTAL regardless of
   * corpus size — so the union, the doc-keyed agg, and the
   * `TakeOrderedAndProject` cut all run on bounded relations; the heavy
   * lifting stays inside the upstream retrievers. Output:
   * (doc_id, n_lists, rrf_q, rrf), ranked by rrf_q DESC, doc_id. */
  /** Exact phrase search over positional postings — the retrieval
   * primitive BM25's bag-of-words scoring cannot express ("spark
   * structured streaming" as a phrase, not three independent terms).
   * Returns `(doc_id, n_hits)` for documents containing the phrase's
   * tokens CONSECUTIVELY, with the occurrence count.
   *
   * Scale shape: the positional explode filters to the phrase's (tiny)
   * vocabulary INSIDE the scan projection — only phrase-term postings
   * `(doc_id, pos, tok)` survive into the join graph, a |phrase|-bounded
   * fraction of the corpus. Occurrences then assemble by position
   * arithmetic: anchor postings of the first term equi-join the i-th
   * term's postings on `(doc_id, pos − i)` — |phrase|−1 keyed joins on
   * selective relations (AQE broadcasts them when the phrase is rare),
   * never a window sort and never array re-scans of the document text.
   * The postings relation is MATERIALIZED before the join graph consumes
   * it three ways (anchor + each offset side) — without that, Spark
   * re-derives the subtree per consumer and the "one corpus pass"
   * becomes |phrase| corpus explodes (caught in the r7 plan audit). */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val post = Dedup.materialize(docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .where(col("tok").isin(phrase.distinct: _*)))
    val anchor = post.where(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(anchor) {
      case (acc, (term, i)) =>
        acc.join(
          post.where(col("tok") === term)
            .select(col("doc_id"), (col("pos") - i).as("p0")),
          Seq("doc_id", "p0"))
    }
    matched.groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  def rrfFuse(lists: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    lists
      .map(_.select(col("doc_id"),
        floor(lit(1e6) / (lit(k0) + col("rank"))).cast("long").as("rrf_q")))
      .reduce(_ unionByName _)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lists"), sum("rrf_q").as("rrf_q"))
      .select(col("doc_id"), col("n_lists"), col("rrf_q"),
        (col("rrf_q").cast("double") / lit(1e6)).as("rrf"))
      .orderBy(col("rrf_q").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Ranking-quality evaluation at cutoff `k` — the metrics harness every
   * retrieval stack is judged by (TREC-style binary relevance):
   * per query, hits@k, recall@k, MRR, and nDCG@k against a gold relevance
   * relation. `ranking` is any (q_id, doc_id, rank) relation (the shape
   * [[bm25TopK]]-derived lists, [[rrfFuse]], [[mmrRerank]] and the
   * [[Similarity]] kNN searches all produce); `gold` is (q_id, doc_id)
   * relevant pairs. The evaluation universe is the queries present in
   * `gold` — a ranking for an ungold query has no defined metric.
   *
   * Determinism (the BM25/RM3 integer ladder): each DCG discount
   * 1/log₂(r+1) = ln2/ln(r+1) quantizes to integer micros PER TERM before
   * the sum (the PSI ln discipline — both engines IEEE-divide then floor,
   * so addition order cannot drift), IDCG folds the same quantized
   * discounts over ranks 1..min(n_rel, k) with `aggregate` (no explode),
   * MRR is floor(1e6/first_rank + 0.5) — one exact-integer divide. Ratios
   * (recall, ndcg) round to the 1e-4 grid.
   *
   * Scale shape: `ranking` is |Q|·k rows by construction (the searches
   * already cut), `gold` |Q|·rel — both query-grain. One semi-join
   * (gold broadcast when dims allow), two hash-aggs, everything
   * downstream query-count-sized. Nothing corpus-grain. */
  /** Per-item rank-biased-overlap weights in exact 1e9 units: an item
   * whose worse rank across the two lists is `m` contributes
   * W(m) = Σ_{d=m..k} (1−p)·p^{d−1}/d to truncated RBO@k. Pre-quantized
   * Scala constants (the Benford discipline) — both engines join the
   * identical integers instead of each summing a geometric tail. */
  def rboWeightsMicro(k: Int, p: Double): Seq[(Int, Long)] =
    (1 to k).map { m =>
      val w = (m to k).map(d => (1 - p) * math.pow(p, d - 1) / d).sum
      m -> math.floor(w * 1e9 + 0.5).toLong
    }

  /** Truncated rank-biased overlap RBO@k (Webber, Moffat & Zobel, TOIS
   * 2010) between two top-k rankings of the same query set — the
   * top-weighted similarity measure for comparing a cheap ranking
   * against an expensive one (IVF-PQ vs brute force, truncated-dim
   * proxy vs full embedding): unlike [[Similarity]]-style set recall it
   * penalizes a disagreement at rank 1 far more than one at rank k.
   *
   *   RBO@k = (1−p) Σ_{d=1..k} p^{d−1} · |A_{≤d} ∩ B_{≤d}| / d
   *
   * re-grouped PER ITEM: an item shared by both lists with worse rank
   * m = max(r_A, r_B) is inside the overlap for every depth d ≥ m, so it
   * contributes the closed tail W(m) — a [[rboWeightsMicro]] constant —
   * and the whole measure collapses to ONE integer sum of joined
   * constants: no per-depth pass, no doubles, bit-replayable anywhere.
   * Truncated form (no extrapolation term — documented; identical lists
   * score Σ_d W(d) = 1 − p^k up to quantization). Queries with empty
   * intersection emit 0. Scale shape: one (q_id, n_id) equi-join of two
   * k-bounded relations + a broadcast 10-row weight join + one hash-agg.
   * Output: (q_id, n_shared, rbo_micro). */
  def rbo(a: DataFrame, b: DataFrame, k: Int,
      p: Double = 0.9): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    val session = a.sparkSession
    import session.implicits._
    val wts = broadcast(rboWeightsMicro(k, p).toDF("m", "w_micro"))
    val shared = a.filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").as("ra"))
      .join(b.filter(col("rank") <= k)
        .select(col("q_id"), col("n_id"), col("rank").as("rb")),
        Seq("q_id", "n_id"))
      .select(col("q_id"), greatest(col("ra"), col("rb")).as("m"))
      .join(wts, Seq("m"))
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_shared"), sum("w_micro").as("rbo_micro"))
    a.select("q_id").distinct()
      .join(shared, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(col("rbo_micro"), lit(0L)).as("rbo_micro"))
  }

  def rankEval(ranking: DataFrame, gold: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val discount = (r: Column) =>
      floor(lit(1e6) * log(lit(2.0)) / log(r.cast("double") + lit(1.0))
        + lit(0.5)).cast("long")
    val g = gold.select("q_id", "doc_id").distinct()
    val nRel = g.groupBy("q_id").agg(count(lit(1)).as("n_rel"))
    val perQ = ranking.filter(col("rank") <= k)
      .join(g, Seq("q_id", "doc_id"), "left_semi")
      .groupBy("q_id").agg(
        count(lit(1)).as("hits"),
        min("rank").as("__first"),
        sum(discount(col("rank"))).as("dcg_micro"))
    nRel.join(perQ, Seq("q_id"), "left")
      .select(col("q_id"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_rel").cast("double"), 4).as("recall"),
        coalesce(floor(lit(1e6) / col("__first").cast("double") + lit(0.5))
          .cast("long"), lit(0L)).as("mrr_micro"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        aggregate(sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
          lit(0L), (acc, i) => acc + discount(i)).as("idcg_micro"))
      .withColumn("ndcg",
        round(col("dcg_micro").cast("double") /
          col("idcg_micro").cast("double"), 4))
  }
}
