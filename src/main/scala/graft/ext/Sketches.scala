package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable frequency/membership sketches as PLAIN RELATIONAL AGGREGATES —
 * the two classics a 100-TB token pipeline leans on when exact per-key
 * state would be corpus-sized, built so every estimate replays exactly in
 * the oracle (all hashing is the repo's md5-derived [[Dedup.seededHash]];
 * counters/bitsets are integer relations, not binary blobs):
 *
 *  - Count-Min (Cormode & Muthukrishnan 2005): `depth` hash rows ×
 *    `width` counters; point estimate = min over rows. The counter table
 *    is `depth·width` rows TOTAL regardless of key cardinality — the
 *    sketch-sized state a vocabulary-unbounded stream keeps where exact
 *    counting keeps the vocabulary. Never underestimates; overestimates
 *    by hash-collision mass (bounded by 2·N/width w.p. 1−2^−depth).
 *    Counters merge by (r, b) SUM — partition-, batch-, and
 *    shard-mergeable by construction (the partial-agg shape Spark
 *    already exploits).
 *
 *  - Bloom pre-filter: the membership side. `BloomHashes` bit positions
 *    in a `BloomBits`-sized space; a key "passes" iff ALL its bits are
 *    set. No false negatives, tunable false positives — so a
 *    decontamination / CDC / incremental-dedup stage can pre-filter its
 *    EXPENSIVE exact join down to candidates using a broadcast relation
 *    bounded by the BIT SPACE (≤ `BloomBits` rows — KBs), not by the
 *    reference set (the benchmark's shingle relation can be arbitrarily
 *    large; its Bloom image cannot).
 */
object Sketches {

  val CmsDepth = 4
  val CmsWidth = 1024
  /** seededHash seed base for the CMS rows (domain 41..44 — disjoint from
   * MinHash 0..11, SimHash 0, winnowing 27). */
  val CmsSeedBase = 41

  val BloomBits = 32768
  val BloomHashes = 3
  /** Bloom seed domain 51..53. */
  val BloomSeedBase = 51

  private def cmsBucket(key: Column, r: Int, width: Int): Column =
    pmod(Dedup.seededHash(key, CmsSeedBase + r), lit(width.toLong))

  /** Build the CMS counter table over a key stream (one row per
   * occurrence): (r, b, c) — `depth·width` rows max. One narrow ×depth
   * expansion + one hash-agg (map-side partial combine collapses each
   * partition to ≤ depth·width rows before the shuffle). */
  def cmsCounters(keys: DataFrame, keyCol: String, depth: Int = CmsDepth,
      width: Int = CmsWidth): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    keys.select(posexplode(array((0 until depth).map(r =>
        cmsBucket(col(keyCol), r, width)): _*)).as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
  }

  /** Point-estimate the counts of `queryKeys` (distinct keys) from a
   * counter table: min over the `depth` rows' counters, 0 when a bucket
   * was never touched. The counter relation broadcasts (depth·width
   * rows); the query side stays a narrow ×depth expansion — no shuffle
   * of anything corpus-sized. Output: (keyCol, cms_n). */
  def cmsEstimate(counters: DataFrame, queryKeys: DataFrame, keyCol: String,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame =
    queryKeys.select(col(keyCol),
        posexplode(array((0 until depth).map(r =>
          cmsBucket(col(keyCol), r, width)): _*)).as(Seq("r", "b")))
      .join(broadcast(counters), Seq("r", "b"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_n"))

  private def bloomBit(key: Column, i: Int): Column =
    pmod(Dedup.seededHash(key, BloomSeedBase + i), lit(BloomBits.toLong))

  /** The Bloom image of a reference key set: the DISTINCT set bit
   * positions — ≤ [[BloomBits]] rows no matter how large the reference
   * is. This is the broadcast side of [[bloomPrefilterHits]]. */
  def bloomBits(refKeys: DataFrame, keyCol: String): DataFrame =
    refKeys.select(explode(array((0 until BloomHashes).map(i =>
        bloomBit(col(keyCol), i)): _*)).as("bit"))
      .distinct()

  /** Bloom candidate pre-filter for decontamination-shaped joins: per
   * document, the number of its distinct keys (shingles) whose
   * [[BloomHashes]] bits are ALL set in `bits` — a SUPERSET count of the
   * exact reference hits (no false negatives; collisions only ever add).
   * Only docs with ≥ 1 passing key surface — everything else provably
   * cannot overlap the reference and skips the exact join entirely.
   *
   * Plan: narrow ×k bit expansion, ONE broadcast semi-join against the
   * bit-space-bounded relation, two keyed hash-aggs. Nothing sized by
   * the reference set touches the corpus. Input: (doc_id, keyCol)
   * distinct. Output: (doc_id, n_bloom). */
  def bloomPrefilterHits(docKeys: DataFrame, bits: DataFrame,
      keyCol: String): DataFrame =
    docKeys.select(col("doc_id"), col(keyCol).as("__k"),
        posexplode(array((0 until BloomHashes).map(i =>
          bloomBit(col(keyCol), i)): _*)).as(Seq("i", "bit")))
      .join(broadcast(bits), Seq("bit"), "left_semi")
      .groupBy("doc_id", "__k").agg(count(lit(1)).as("nb"))
      .filter(col("nb") === BloomHashes)
      .groupBy("doc_id").agg(count(lit(1)).as("n_bloom"))
}
