package graft.ext

import org.apache.spark.sql.DataFrame
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
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idfQ = floor(log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))) * lit(1e6) + lit(0.5))
      .cast("long")
    val tfNorm = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(idfQ.cast("double") * tfNorm + lit(0.5)).cast("long").as("s_q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("s_q").as("bm25_q"))
      .select(col("doc_id"), col("n_terms"), col("bm25_q"),
        (col("bm25_q").cast("double") / lit(1e6)).as("bm25"))
      .orderBy(col("bm25_q").desc, col("doc_id").asc)
      .limit(k)
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
}
