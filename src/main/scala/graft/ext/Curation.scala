package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus curation pipeline as ONE declarative DAG.
 *
 * Production LLM-data runs don't execute their stages as separate scripts
 * with intermediate files — they want, per document, the full disposition:
 * which gates it passed, why it was dropped, and where it would land. This
 * composes the library's already-gated stages (language ID, Gopher quality
 * rules, exact dedup, MinHash/LSH near-dup clustering, benchmark
 * decontamination, deterministic splitting) into a single audit relation —
 * the artifact you need to DEBUG a 100-TB curation run (removal-reason
 * attribution), and the proof that the operators compose as a library
 * rather than only running as isolated queries.
 *
 * Scale posture: every signal is an independent derivation over the corpus
 * (each already individually oracle-gated and capped/blocked on its scale
 * path); the final assembly is doc_id-keyed joins, so after the first
 * exchange per side the joins reuse one hash partitioning. Nothing here
 * adds a new corpus-sized structure on top of the stages' own.
 */
object Curation {

  /** Per-document disposition audit: `(doc_id, lang_ok, quality_ok,
   * exact_keeper, neardup_keeper, contaminated, split, keep)`.
   *
   *  - `lang_ok`      — [[TextAnalysis.langId]] prediction equals
   *                     `targetLang`;
   *  - `quality_ok`   — the [[TextAnalysis.gopherRules]] panel verdict;
   *  - `exact_keeper` — the document is its byte-identical group's
   *                     min-id representative ([[Dedup.exactDedup]]);
   *  - `neardup_keeper` — survives MinHash/LSH near-dup clustering at
   *                     `minJaccard` ([[Dedup.dedupSurvivors]] over
   *                     [[Dedup.dupClusters]]);
   *  - `contaminated` — shares ≥ `minOverlap` distinct shingles with any
   *                     OTHER document in `bench`
   *                     ([[Dedup.decontaminationHits]]);
   *  - `split`        — the deterministic md5-bucket train/val/test
   *                     assignment ([[Sampling.hashSplit]]);
   *  - `keep`         — the conjunction: all gates passed and not
   *                     contaminated. The training corpus is
   *                     `keep && split = 'train'`.
   */
  def curationReport(docs: DataFrame, bench: DataFrame,
      targetLang: String = "en", minJaccard: Double = 0.5,
      minOverlap: Int = 5): DataFrame = {
    val lang = docs.select(col("doc_id"),
      (TextAnalysis.langId(col("text")) === lit(targetLang)).as("lang_ok"))
    val quality = TextAnalysis.gopherRules(docs)
      .select(col("doc_id"), col("pass").as("quality_ok"))
    val exactKeepers = Dedup.exactDedup(docs)
      .select(col("doc_id"), lit(true).as("exact_keeper"))
    val nearKeepers = Dedup.dedupSurvivors(docs,
        Dedup.dupClusters(
          Dedup.minhashDedupPairs(docs, minJaccard, maxBucket = Int.MaxValue)
            .select("doc_a", "doc_b")))
      .withColumn("neardup_keeper", lit(true))
    val contaminated = Dedup.decontaminationHits(docs, bench, minOverlap)
      .filter(col("doc_id") =!= col("bench_id"))
      .select("doc_id").distinct()
      .withColumn("contaminated", lit(true))
    Sampling.hashSplit(
        lang.join(quality, Seq("doc_id"))
          .join(exactKeepers, Seq("doc_id"), "left")
          .join(nearKeepers, Seq("doc_id"), "left")
          .join(contaminated, Seq("doc_id"), "left"),
        "doc_id")
      .select(col("doc_id"), col("lang_ok"), col("quality_ok"),
        coalesce(col("exact_keeper"), lit(false)).as("exact_keeper"),
        coalesce(col("neardup_keeper"), lit(false)).as("neardup_keeper"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"),
        col("split"))
      .withColumn("keep",
        col("lang_ok") && col("quality_ok") && col("exact_keeper") &&
          col("neardup_keeper") && !col("contaminated"))
  }
}
