package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable sketches as PLAIN RELATIONAL AGGREGATES — frequency (CMS),
 * membership (Bloom), distinct count (HLL registers, KMV) and, since r11,
 * whole DISTRIBUTIONS ([[quantileSketch]]) — the bounded-state summaries
 * a 100-TB token pipeline leans on when exact per-key state would be
 * corpus-sized, built so every estimate replays exactly in the oracle
 * (hashing is the repo's md5-derived [[Dedup.seededHash]]; counters/
 * bitsets/buckets are integer relations, not binary blobs). The first two:
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

  /** Equi-join SIZE estimate from two CMS counter tables (Cormode &
   * Muthukrishnan §4.2, the AMS inner-product estimate carried by CMS):
   * |A ⋈_k B| = Σ_k f_A(k)·f_B(k), estimated per hash row as the bucket
   * inner product Σ_b cA[r][b]·cB[r][b] and min'd across rows. Hash
   * collisions only ADD cross terms, so — like the point estimates — the
   * estimate NEVER undershoots the true join size; the min over depth
   * independent rows bounds the overshoot. The pre-flight completing
   * [[graft.ext.Profile.joinFanout]]: that one prices a join's top hot
   * keys EXACTLY by scanning both sides; this one prices the TOTAL at
   * sketch cost — two depth·width relations that may have been
   * maintained incrementally (streamed, merged across shards) with the
   * sides never co-located at all. Inputs are [[cmsCounters]] outputs
   * over the two key columns (same depth/width/seeds — enforced by the
   * shared bucket hash); cost is a (r, b)-keyed join of two sketch-sized
   * relations. Output: one row (join_size_est). */
  def cmsJoinSizeEstimate(countersA: DataFrame, countersB: DataFrame,
      depth: Int = CmsDepth): DataFrame = {
    val session = countersA.sparkSession
    import session.implicits._
    // every depth row participates in the min, including rows whose
    // touched buckets are disjoint: their inner product is 0, which is
    // both VALID (no shared bucket ⇒ no shared key ⇒ the true join is
    // empty on that row's evidence) and the tightest bound — dropping
    // them (the inner join alone) would inflate the estimate and leave
    // a fully-disjoint pair with a NULL instead of 0
    (0 until depth).toDF("r")
      .join(
        countersA.toDF("r", "b", "ca")
          .join(countersB.toDF("r", "b", "cb"), Seq("r", "b"))
          .groupBy("r").agg(sum(col("ca") * col("cb")).as("ip")),
        Seq("r"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("join_size_est"))
  }

  /** HLL register count exponent: m = 2^p = 1024 registers. */
  val HllP = 10
  /** seededHash seed domain 61 (disjoint from CMS 41..44, Bloom 51..53). */
  val HllSeed = 61

  /** rho(w) = (leading-zero count of the `width`-bit word) + 1, as a
   * when-chain over the 2^i thresholds — the only log2 both engines
   * replay exactly (no float log in the SKETCH; floats appear only in
   * the final estimate formula). w = 0 → width+1. */
  private def rhoChain(w: Column, width: Int): Column =
    coalesce((width - 1 to 0 by -1).map(i =>
      when(w >= lit(1L << i), lit((width - i).toLong))) :+
      lit((width + 1).toLong): _*)

  /** HyperLogLog register relation (Flajolet et al. 2007): key → register
   * `reg` (low p hash bits) with `max_rho` = max over keys of the
   * leading-zero rank of the remaining bits. ≤ 2^p rows at ANY key
   * cardinality — the distinct-count sibling of [[cmsCounters]]'
   * frequency sketch, and like it a plain hash-agg: map-side partials,
   * mergeable across batches/shards/streams by (reg, MAX), maintainable
   * as a complete-mode streaming agg with register-bounded state.
   * Spark's own `approx_count_distinct` is HLL++ behind an opaque binary
   * blob; this relation IS the sketch, persistable/joinable/replayable
   * (the g6 estimate gets an artifact you can audit). */
  def hllRegisters(keys: DataFrame, keyCol: String,
      p: Int = HllP): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = 1L << p
    val h = Dedup.seededHash(col(keyCol), HllSeed)
    keys.select(pmod(h, lit(m)).as("reg"),
        rhoChain(shiftright(h, p), 32 - p).as("rho"))
      .groupBy("reg").agg(max("rho").as("max_rho"))
  }

  /** The HLL estimate from a register relation: raw =
   * α_m·m²/Σ_j 2^(−M_j) with the harmonic mass held EXACT — every
   * 2^(−M_j) term carries the common denominator 2^(width+1), so the
   * mass numerator is an exact BIGINT sum (untouched registers
   * contribute 2^(width+1) each); the only floats are the final α/ln
   * expressions, written with identical literal structure in the oracle.
   * Flajolet's small-range linear-counting correction applies below
   * 2.5m with empty registers present. Output: one row (n_regs, est). */
  def hllEstimate(registers: DataFrame, p: Int = HllP): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = 1L << p
    val wp1 = 32 - p + 1
    val agg = registers.agg(
      count(lit(1)).as("n_regs"),
      coalesce(sum(pow(lit(2.0),
        lit(wp1.toDouble) - col("max_rho").cast("double")).cast("long")),
        lit(0L)).as("n_touched"))
    val nTot = (col("n_touched") +
      (lit(m) - col("n_regs")) * lit(1L << wp1)).cast("double")
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit(m.toDouble) * lit(m.toDouble) * lit((1L << wp1).toDouble) / nTot
    val v = lit(m) - col("n_regs")
    agg.select(col("n_regs"),
      when(raw <= lit(2.5) * lit(m.toDouble) && v > 0,
        floor(lit(m.toDouble) *
          log(lit(m.toDouble) / v.cast("double")) + lit(0.5)))
        .otherwise(floor(raw + lit(0.5)))
        .cast("long").as("hll_est"))
  }

  /** GROUPED HyperLogLog registers: one sketch per `groupCol` value in a
   * single hash-agg — (group, reg, max_rho), ≤ 2^p rows PER GROUP at any
   * per-group cardinality. The "distinct shingles per source" /
   * "distinct users per domain" shape at 100 TB, where
   * `count(DISTINCT ...)` per group shuffles a row per distinct value
   * and this shuffles at most groups·2^p counters. Same hash/rho as
   * [[hllRegisters]] (a single-group relation is byte-identical), same
   * (group, reg, MAX) mergeability. */
  def hllRegistersBy(keys: DataFrame, groupCol: String, keyCol: String,
      p: Int = HllP): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = 1L << p
    val h = Dedup.seededHash(col(keyCol), HllSeed)
    keys.select(col(groupCol), pmod(h, lit(m)).as("reg"),
        rhoChain(shiftright(h, p), 32 - p).as("rho"))
      .groupBy(groupCol, "reg").agg(max("rho").as("max_rho"))
  }

  /** Per-group HLL estimates from a [[hllRegistersBy]] relation — the
   * [[hllEstimate]] formula evaluated at group grain (exact harmonic-
   * mass numerator per group, α/ln floats only in the final expression).
   * Output: (group, n_regs, hll_est), one row per group. */
  def hllEstimateBy(registers: DataFrame, groupCol: String,
      p: Int = HllP): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = 1L << p
    val wp1 = 32 - p + 1
    val agg = registers.groupBy(groupCol).agg(
      count(lit(1)).as("n_regs"),
      sum(pow(lit(2.0),
        lit(wp1.toDouble) - col("max_rho").cast("double")).cast("long"))
        .as("n_touched"))
    val nTot = (col("n_touched") +
      (lit(m) - col("n_regs")) * lit(1L << wp1)).cast("double")
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit(m.toDouble) * lit(m.toDouble) * lit((1L << wp1).toDouble) / nTot
    val v = lit(m) - col("n_regs")
    agg.select(col(groupCol), col("n_regs"),
      when(raw <= lit(2.5) * lit(m.toDouble) && v > 0,
        floor(lit(m.toDouble) *
          log(lit(m.toDouble) / v.cast("double")) + lit(0.5)))
        .otherwise(floor(raw + lit(0.5)))
        .cast("long").as("hll_est"))
  }

  /** KMV hash width: 48 bits (12 md5 hex chars). Narrow enough that the
   * estimator's `(k−1)·2^48` numerator stays exact in BIGINT on both
   * engines (k ≤ 2^14 headroom); wide enough that hash ties are
   * negligible at any realistic sketch size. */
  val KmvBits = 48
  val KmvK = 512

  /** The KMV element hash: uniform on [0, 2^48). Distinct by construction
   * of md5; the `kmv:` salt keeps the domain disjoint from every other
   * seeded-hash family in the repo. */
  private def kmvHash(key: Column): Column =
    conv(substring(md5(concat(lit("kmv:"), key)), 1, KmvBits / 4), 16, 10)
      .cast("long")

  /**
   * K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002; Beyer et
   * al. 2007): the `k` smallest distinct hash values of a key stream.
   * The whole sketch is a k-row RELATION — mergeable with any other KMV
   * sketch by "union, keep k smallest", and (unlike HLL) supporting SET
   * OPERATIONS: intersections and differences estimate from one merged
   * sketch (see [[kmvSetOps]]), which register sketches cannot do.
   *
   * Estimator: `(k−1)·2^48 / h_k` with `h_k` the k-th smallest hash —
   * integer division on an exactly-representable numerator, so the
   * cross-engine replay is bit-exact. Cost: one distinct-agg then a
   * bounded top-k (`TakeOrderedAndProject` — never a global sort); the
   * driver never holds more than k rows.
   *
   * Returns `(pos, h)`, pos = 1..k ascending.
   */
  def kmvSketch(keys: DataFrame, keyCol: String, k: Int = KmvK): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    keys.select(kmvHash(col(keyCol)).as("h"))
      .distinct()
      .orderBy("h").limit(k)
      .select(row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("h")).cast("long")
          .as("pos"),
        col("h"))
  }

  /** Distinct-count estimate from a [[kmvSketch]]: one row
   * `(k_used, kth_hash, est_distinct)`. When the stream held fewer than
   * `k` distinct keys the sketch IS the exact answer (`est = k_used`). */
  def kmvEstimate(sketch: DataFrame, k: Int = KmvK): DataFrame =
    sketch.agg(count(lit(1)).as("k_used"), max("h").as("kth_hash"))
      .select(col("k_used"), col("kth_hash"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(expr(s"(${k - 1} * ${1L << KmvBits}L) div kth_hash"))
          .as("est_distinct"))

  /**
   * KMV set operations (Beyer et al. 2007 §4): merge two sketches, keep
   * the k smallest of the union — that is EXACTLY the KMV sketch of
   * A ∪ B, so `est_union` follows from [[kmvEstimate]]'s estimator; the
   * Jaccard of the two sets is estimated by the fraction `K/k` of the
   * merged sketch's elements present in BOTH input sketches, and
   * `est_inter = K · est_union / k` (integer division — exact replay).
   *
   * Everything is arithmetic over two k-row relations: the merge is a
   * union + top-k, the membership test two broadcast-sized semi-joins.
   * Output: one row `(k_used, est_union, k_both, est_inter,
   * jaccard_milli)` with the Jaccard in exact milli-units.
   */
  def kmvSetOps(sketchA: DataFrame, sketchB: DataFrame,
      k: Int = KmvK): DataFrame = {
    val merged = sketchA.select("h").unionByName(sketchB.select("h"))
      .distinct().orderBy("h").limit(k)
    val inBoth = merged
      .join(sketchA.select(col("h")), Seq("h"), "left_semi")
      .join(sketchB.select(col("h")), Seq("h"), "left_semi")
      .agg(count(lit(1)).as("k_both"))
    merged.agg(count(lit(1)).as("k_used"), max("h").as("kth_hash"))
      .select(col("k_used"), col("kth_hash"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(expr(s"(${k - 1} * ${1L << KmvBits}L) div kth_hash"))
          .as("est_union"))
      .crossJoin(broadcast(inBoth))
      .select(col("k_used"),
        col("est_union"),
        col("k_both"),
        expr("k_both * est_union div k_used").as("est_inter"),
        expr("k_both * 1000 div k_used").as("jaccard_milli"))
  }

  /** Quantile-sketch mantissa bits m: buckets carry the top m bits of
   * the value's binary mantissa, so the guaranteed RELATIVE error of any
   * quantile estimate is 2^−m (m = 5 → ≤ 3.125%), and the sketch holds
   * ≤ 2^(m+1) + 62·2^m rows (m = 5 → ≤ 2048) at ANY input cardinality. */
  val QSketchSubBits = 5

  /** Hard row bound of a [[quantileSketch]] relation at `subBits` —
   * exact-value buckets for the ≤ m+1-bit range plus 2^m sub-buckets
   * per remaining binary exponent. */
  def qSketchMaxBuckets(subBits: Int): Long =
    (1L << (subBits + 1)) + (63L - subBits) * (1L << subBits)

  /**
   * MERGEABLE quantile sketch as a PLAIN RELATION — the missing member
   * of the sketch family (CMS counts frequencies, HLL/KMV count
   * distincts, SpaceSaving finds heavy hitters; THIS holds a whole
   * value DISTRIBUTION in bounded rows). The log-bucketed-histogram
   * design of DDSketch (Masson, Rim & Lee, VLDB 2019) with the base-2
   * bucketing variant its §2.3 "fast" implementation uses (and
   * HdrHistogram popularized): a nonnegative integer value `v` with
   * binary width `e` lands in the bucket keyed by its top
   * `subBits`-bit mantissa prefix —
   *
   *   s  = max(0, e − 1 − subBits)      (dropped low bits)
   *   lo = (v >> s) << s,  hi = lo + 2^s − 1
   *
   * — so bucket width `2^s` never exceeds `lo / 2^subBits`: any value
   * read back from its bucket bounds carries ≤ 2^−subBits RELATIVE
   * error, the guarantee exact order statistics cannot give in bounded
   * state and `approx_percentile`'s opaque blob gives unauditable.
   * Everything is integer bit arithmetic (`length(bin(v))` — the
   * kAnonymityAudit binary-width idiom — and shifts), so the sketch
   * replays EXACTLY in the oracle: unlike log-base-γ DDSketch
   * bucketing, no libm call sits on a bucket boundary. The domain is
   * [0, 2^62) — loudly asserted — so `hi + 1 = (sub+1)·2^s ≤ 2^62`
   * never overflows BIGINT in EITHER engine (Spark's shiftleft wraps
   * silently where DuckDB raises; the bound keeps both inside the
   * well-defined range).
   *
   * The relation is (lo, hi, c) — and like every sketch in this file it
   * is a hash-agg: map-side partials, mergeable across
   * batches/shards/snapshots by (lo, hi) SUM ([[quantileSketchMerge]]),
   * maintainable as a complete-mode streaming aggregation with
   * bucket-bounded state (the t28/t32 posture). Values must be
   * NONNEGATIVE integers (the caller owns quantization, the
   * percentileRanks contract; loud assert) — shift signed inputs
   * upstream. One narrow scan + one ≤ [[qSketchMaxBuckets]]-row
   * hash-agg.
   */
  def quantileSketch(df: DataFrame, valCol: String,
      subBits: Int = QSketchSubBits): DataFrame = {
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in [1, 16], got $subBits")
    df.filter(col(valCol).isNotNull)
      .select(col(valCol).cast("long").as("v"))
      .withColumn("__g", assert_true(
        col("v") >= 0L && col("v") < lit(1L << 62),
        lit("quantileSketch: values must be in [0, 2^62) — " +
          "quantize/shift upstream (log-bucket contract, see " +
          "Sketches.quantileSketch)")))
      .where(col("__g").isNull)
      .withColumn("s",
        greatest(lit(0), length(bin(col("v"))) - lit(1 + subBits)))
      .select(expr("shiftleft(shiftright(v, s), s)").as("lo"),
        (expr("shiftleft(shiftright(v, s) + 1, s)") - lit(1L)).as("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("c"))
  }

  /** SIGNED front door for [[quantileSketch]] (r11 verdict #3: the
   * [0, 2^62) domain made every signed metric — deltas, balances,
   * residuals — hand-roll an offset shift upstream, the exact footgun
   * the loud assert exists to catch). A global additive shift is the
   * WRONG fix for a log-bucketed sketch: shifting a near-zero residual
   * by 2^61 lands it in a bucket ~2^56 wide — the relative-error
   * guarantee would hold on the shifted value and be useless on the
   * real one. The standard DDSketch answer (Masson, Rim & Lee, VLDB
   * 2019 §2.1: separate positive/negative stores + a zero bucket) is a
   * SIGN SPLIT: |v| buckets exactly as [[quantileSketch]], and a
   * negative value's bucket is the MIRRORED interval —
   *
   *   v ≥ 0: (lo, hi) = (loAbs, hiAbs)
   *   v < 0: (lo, hi) = (−hiAbs, −loAbs)
   *
   * — so buckets never straddle zero, `lo ≤ v ≤ hi` still holds
   * row-by-row, bucket order by `lo` IS value order (the readout kernel
   * unchanged), and width stays inside the 2^−subBits envelope of |v|
   * on BOTH sides: (hi − lo + 1) · 2^subBits ≤ max(min(|lo|, |hi|),
   * 2^subBits). Merge is [[quantileSketchMerge]] unchanged (bucket
   * boundaries are value-determined on either side of zero). Domain is
   * (−2^62, 2^62), loudly asserted. Row bound: ≤ 2·qSketchMaxBuckets+1
   * (both sign stores + the zero bucket) — pass `signed = true` to
   * [[quantileSketchQuantiles]] so its well-formedness bound widens to
   * match. A nonnegative input produces bucket-identical rows to
   * [[quantileSketch]]. */
  def quantileSketchSigned(df: DataFrame, valCol: String,
      subBits: Int = QSketchSubBits): DataFrame = {
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in [1, 16], got $subBits")
    df.filter(col(valCol).isNotNull)
      .select(col(valCol).cast("long").as("v"))
      .withColumn("__g", assert_true(
        col("v") > lit(-(1L << 62)) && col("v") < lit(1L << 62),
        lit("quantileSketchSigned: values must be in (-2^62, 2^62) — " +
          "quantize upstream (log-bucket contract, see " +
          "Sketches.quantileSketchSigned)")))
      .where(col("__g").isNull)
      .withColumn("a", abs(col("v")))
      .withColumn("s",
        greatest(lit(0), length(bin(col("a"))) - lit(1 + subBits)))
      .withColumn("loA", expr("shiftleft(shiftright(a, s), s)"))
      .withColumn("hiA",
        expr("shiftleft(shiftright(a, s) + 1, s)") - lit(1L))
      .select(
        when(col("v") >= 0L, col("loA")).otherwise(-col("hiA")).as("lo"),
        when(col("v") >= 0L, col("hiA")).otherwise(-col("loA")).as("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("c"))
  }

  /** GROUPED signed quantile sketch: one [[quantileSketchSigned]] per
   * `groupCol` value in a single hash-agg — (group, lo, hi, c), ≤
   * 2·qSketchMaxBuckets+1 rows per group (both sign stores + zero).
   * The per-type residual/delta profile at 100 TB: each group's
   * deviations sketch with the 2^−subBits |v| envelope on both sides
   * of zero. [[quantileSketchQuantilesBy]] reads it unchanged (per-
   * group partitions need no global bound; bucket order by `lo` is
   * value order on either side of zero). A single-group relation is
   * bucket-identical to [[quantileSketchSigned]]. */
  def quantileSketchSignedBy(df: DataFrame, groupCol: String,
      valCol: String, subBits: Int = QSketchSubBits): DataFrame = {
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in [1, 16], got $subBits")
    df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("group"), col(valCol).cast("long").as("v"))
      .withColumn("__g", assert_true(
        col("v") > lit(-(1L << 62)) && col("v") < lit(1L << 62),
        lit("quantileSketchSignedBy: values must be in (-2^62, 2^62) — " +
          "quantize upstream (log-bucket contract, see " +
          "Sketches.quantileSketchSigned)")))
      .where(col("__g").isNull)
      .withColumn("a", abs(col("v")))
      .withColumn("s",
        greatest(lit(0), length(bin(col("a"))) - lit(1 + subBits)))
      .withColumn("loA", expr("shiftleft(shiftright(a, s), s)"))
      .withColumn("hiA",
        expr("shiftleft(shiftright(a, s) + 1, s)") - lit(1L))
      .select(col("group"),
        when(col("v") >= 0L, col("loA")).otherwise(-col("hiA")).as("lo"),
        when(col("v") >= 0L, col("hiA")).otherwise(-col("loA")).as("hi"))
      .groupBy("group", "lo", "hi").agg(count(lit(1)).as("c"))
  }

  /** GROUPED quantile sketch: one [[quantileSketch]] per `groupCol`
   * value in a single hash-agg — (group, lo, hi, c), ≤
   * [[qSketchMaxBuckets]] rows PER GROUP at any per-group cardinality
   * (the hllRegistersBy shape for distributions: per-source latency /
   * per-type value profiles at 100 TB without a per-group exact sort).
   * A single-group relation is byte-identical to [[quantileSketch]]. */
  def quantileSketchBy(df: DataFrame, groupCol: String, valCol: String,
      subBits: Int = QSketchSubBits): DataFrame = {
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in [1, 16], got $subBits")
    df.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("group"), col(valCol).cast("long").as("v"))
      .withColumn("__g", assert_true(
        col("v") >= 0L && col("v") < lit(1L << 62),
        lit("quantileSketchBy: values must be in [0, 2^62) — " +
          "quantize/shift upstream (log-bucket contract, see " +
          "Sketches.quantileSketch)")))
      .where(col("__g").isNull)
      .withColumn("s",
        greatest(lit(0), length(bin(col("v"))) - lit(1 + subBits)))
      .select(col("group"),
        expr("shiftleft(shiftright(v, s), s)").as("lo"),
        (expr("shiftleft(shiftright(v, s) + 1, s)") - lit(1L)).as("hi"))
      .groupBy("group", "lo", "hi").agg(count(lit(1)).as("c"))
  }

  /** Merge two [[quantileSketch]] relations: union + (lo, hi) SUM —
   * EXACTLY the sketch of the concatenated inputs (bucket boundaries
   * are value-determined, so equal buckets are the only possible
   * overlap; spec-pinned bit-identical). The property that makes the
   * sketch a per-shard/per-day artifact: build per partition of a
   * 100-TB corpus, persist the ≤2k-row relations, merge on read. */
  def quantileSketchMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select("lo", "hi", "c").unionByName(b.select("lo", "hi", "c"))
      .groupBy("lo", "hi").agg(sum("c").as("c"))

  /** Merge two GROUPED sketch relations ([[quantileSketchBy]] or
   * [[quantileSketchSignedBy]]): union + (group, lo, hi) SUM — exactly
   * the grouped sketch of the concatenated inputs, because bucket
   * boundaries are value-determined within every group. The per-shard/
   * per-day artifact path for PER-KEY distributions: build each shard's
   * (group, lo, hi, c) relation, persist, merge on read. */
  def quantileSketchMergeBy(a: DataFrame, b: DataFrame): DataFrame =
    a.select("group", "lo", "hi", "c")
      .unionByName(b.select("group", "lo", "hi", "c"))
      .groupBy("group", "lo", "hi").agg(sum("c").as("c"))

  /** Quantile ESTIMATES from a [[quantileSketch]] relation: for each cut
   * j = 1..k, the bucket holding the exact rank-⌈j·n/k⌉ order statistic
   * — its (lo, hi) BRACKET the true order statistic by construction
   * (bucket-grain cumulative counts are exact; only position WITHIN the
   * bucket is unknown), which is the testable guarantee the g6b-style
   * gate enforces: `lo ≤ exact ≤ hi` with `hi − lo` inside the 2^−m
   * relative envelope. Rides the shared enforced-grain kernel
   * ([[graft.ext.Profile.boundedCumCounts]]) at bucket grain — bounded
   * by [[qSketchMaxBuckets]] by construction, so the loud bound can
   * never fire on a well-formed sketch. Pass `signed = true` for a
   * [[quantileSketchSigned]] relation (the well-formedness bound widens
   * to both sign stores + the zero bucket; the sweep itself is
   * unchanged — bucket order by `lo` is value order on either side of
   * zero). Output: (q, rank, lo, hi, mid) — `mid` is THE point-estimate
   * convention (r11 verdict #5: every downstream consumer was about to
   * re-decide one): the integer bucket midpoint `lo + (hi − lo) div 2`,
   * exact when the bucket is a singleton, never outside the bracket. */
  def quantileSketchQuantiles(sketch: DataFrame, k: Int,
      subBits: Int = QSketchSubBits, signed: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val session = sketch.sparkSession
    import session.implicits._
    val bound =
      if (signed) 2L * qSketchMaxBuckets(subBits) + 1L
      else qSketchMaxBuckets(subBits)
    val cum = graft.ext.Profile.boundedCumCounts(
      sketch.select("lo", "hi", "c"), "lo", "c",
      bound,
      s"quantileSketchQuantiles: more than $bound " +
        "buckets — not a well-formed quantileSketch relation at " +
        s"subBits=$subBits, signed=$signed")
    cum.crossJoin(broadcast((1 to k).toDF("q")))
      .withColumn("rank", expr(s"(q * n + $k - 1) div ${k}L"))
      .filter(col("cum") >= col("rank"))
      .groupBy("q")
      .agg(max("rank").as("rank"),
        min_by(struct(col("lo"), col("hi")), col("lo")).as("g"))
      .select(col("q"), col("rank"), col("g.lo").as("lo"),
        col("g.hi").as("hi"),
        expr("g.lo + (g.hi - g.lo) div 2").as("mid"))
  }

  /** Per-group quantile estimates from a [[quantileSketchBy]] relation —
   * the bucket cumulative partitions BY GROUP (each group sweeps its
   * own ≤ [[qSketchMaxBuckets]]-row partition; no grain bound needed,
   * the groupedOrderStats posture). Output: (group, q, rank, lo, hi,
   * mid) — `mid` the same documented point-estimate convention as
   * [[quantileSketchQuantiles]]. */
  def quantileSketchQuantilesBy(sketch: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val session = sketch.sparkSession
    import session.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy("group")
      .orderBy("lo")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = sketch.groupBy("group").agg(sum("c").as("n"))
    sketch.withColumn("cum", sum("c").over(w))
      .join(tot, "group")
      .crossJoin(broadcast((1 to k).toDF("q")))
      .withColumn("rank", expr(s"(q * n + $k - 1) div ${k}L"))
      .filter(col("cum") >= col("rank"))
      .groupBy("group", "q")
      .agg(max("rank").as("rank"),
        min_by(struct(col("lo"), col("hi")), col("lo")).as("g"))
      .select(col("group"), col("q"), col("rank"), col("g.lo").as("lo"),
        col("g.hi").as("hi"),
        expr("g.lo + (g.hi - g.lo) div 2").as("mid"))
  }

  private def bloomBit(key: Column, i: Int): Column =
    pmod(Dedup.seededHash(key, BloomSeedBase + i), lit(BloomBits.toLong))

  /** The Bloom image of a reference key set: the DISTINCT set bit
   * positions — ≤ [[BloomBits]] rows no matter how large the reference
   * is. This is the broadcast side of [[bloomPrefilterHits]]. */
  def bloomBits(refKeys: DataFrame, keyCol: String): DataFrame =
    refKeys.select(explode(array((0 until BloomHashes).map(i =>
        bloomBit(col(keyCol), i)): _*)).as("bit"))
      .distinct()

  /** GROUPED Bloom images: one bit set per `groupCol` value in a single
   * distinct — (group, bit), ≤ [[BloomBits]] rows per group. The
   * file-grain Bloom index shape (parquet bloom filters / Delta's
   * per-file skipping stats): group = file ordinal, keys = that file's
   * column values. A single-group relation matches [[bloomBits]]. */
  def bloomBitsBy(keys: DataFrame, groupCol: String,
      keyCol: String): DataFrame =
    keys.select(col(groupCol), explode(array((0 until BloomHashes).map(
        i => bloomBit(col(keyCol), i)): _*)).as("bit"))
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
