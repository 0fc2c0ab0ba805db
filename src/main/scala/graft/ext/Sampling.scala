package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus splitting, sampling and sequence packing for a
 * training-data pipeline.
 *
 * Everything keys off a content-independent md5 bucket of the document id:
 * the assignment is stable across runs, engines and cluster layouts (no
 * `rand()`, no partition-index dependence), so train/val/test membership is
 * reproducible and leakage-auditable — and the DuckDB oracle can replay the
 * identical arithmetic. The md5-prefix bucket is the same construction the
 * MinHash pipeline uses (`('0x'||substr(md5(x),1,8))::BIGINT` on the SQL
 * side).
 */
object Sampling {

  val Buckets = 100

  /** Stable bucket in [0, Buckets): md5-prefix hash of the id, mod 100. */
  def hashBucket(id: Column, salt: String = "split"): Column =
    pmod(conv(substring(md5(concat(lit(s"$salt:"), id.cast("string"))), 1, 8),
      16, 10).cast("long"), lit(Buckets.toLong))

  /** Deterministic train/val/test split: bucket < trainPct → train,
   * < trainPct+valPct → val, else test. A pure narrow projection — no
   * shuffle, no state, assignment survives any repartitioning. */
  def hashSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic fractional sample: keep ids whose bucket falls below
   * `pct` — the same rows every run, on any cluster. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), salt = "sample") < pct)

  /** Leakage-PROOF grouped split — [[hashSplit]] keyed on a GROUP
   * instead of the row: every member of a group (a near-dup cluster, a
   * source domain, a conversation thread) draws the SAME bucket, so
   * group mates can never straddle train/test. [[splitLeakage]] AUDITS
   * the leakage a row-keyed split allows; this prevents it by
   * construction (scikit-learn's GroupShuffleSplit, as a narrow
   * deterministic projection). `groups` maps `groupIdCol` → `groupCol`
   * (e.g. [[graft.ext.Dedup.dupClusters]] output — delta-sized, only
   * clustered rows need appear); rows absent from it are their own
   * group, and because the bucket salt matches [[hashSplit]], UNGROUPED
   * rows keep exactly the assignment the row-keyed split gives them —
   * adopting the grouped form moves only the rows that had the leakage
   * problem. One left join against the group relation (broadcast when
   * small) + the same md5 bucket arithmetic. The group projection is
   * deduplicated on `groupIdCol` (min group wins, deterministic) before
   * the join — a `groups` relation carrying an id twice (an id in two
   * clusters, or a non-dupClusters source) must not fan out input rows
   * or hand one row two different split assignments. */
  def groupedSplit(df: DataFrame, idCol: String, groups: DataFrame,
      groupIdCol: String, groupCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val g = groups.groupBy(col(groupIdCol).as(idCol))
      .agg(min(col(groupCol)).as("__grp"))
    val b = hashBucket(coalesce(col("__grp"), col(idCol)))
    df.join(g, Seq(idCol), "left")
      .withColumn("split",
        when(b < trainPct, "train")
          .when(b < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("__grp")
  }

  /** Temporal train/test split with an EMBARGO gap (the purged split of
   * de Prado 2018 §7, the leakage control a time-series model needs that
   * [[hashSplit]] cannot give): the cutoff sits at `trainPct`% of the
   * observed time span, rows inside `embargo` time units BEFORE the
   * cutoff are assigned to neither side (a trailing-window feature
   * computed at test time reaches back across the boundary; the embargo
   * absorbs exactly that reach), train is strictly before the embargo,
   * test at/after the cutoff. All arithmetic in the integer time unit of
   * `tsCol` (BIGINT — exact, replayable).
   *
   * One min/max agg (broadcast 1-row scalar) + a narrow projection: no
   * shuffle of the data, assignment reproducible on any partitioning.
   * Output: input columns + `split` ∈ {train, embargo, test}. */
  def timeSplit(df: DataFrame, tsCol: String, trainPct: Int = 80,
      embargo: Long = 0L): DataFrame = {
    require(trainPct >= 1 && trainPct <= 99,
      s"trainPct must be in [1, 99], got $trainPct")
    require(embargo >= 0L, s"embargo must be >= 0, got $embargo")
    val bounds = df.agg(min(col(tsCol)).as("__t0"), max(col(tsCol)).as("__t1"))
      .select((col("__t0") +
        expr(s"(__t1 - __t0) * $trainPct div 100")).as("__cut"))
    df.crossJoin(broadcast(bounds))
      .withColumn("split",
        when(col(tsCol) >= col("__cut"), "test")
          .when(col(tsCol) < col("__cut") - lit(embargo), "train")
          .otherwise("embargo"))
      .drop("__cut")
  }

  /** Water-filling budget allocation across strata (the cap-and-
   * redistribute rule every data-mixture budget ends up needing: give
   * every source up to a common cap C, chosen as the largest integer
   * with Σ min(count_s, C) ≤ budget — small sources keep everything,
   * dominant sources are capped, and no source is starved to feed
   * another). Returns per-stratum `(stratum, n_docs, cap, alloc)` with
   * `alloc = min(n_docs, cap)`; Σ alloc lands within #capped-strata of
   * the budget (the floor allocation — distributing the sub-cap
   * remainder is the caller's policy decision, not silently ours).
   *
   * The search runs at STRATUM grain: one count agg, one window over the
   * (tiny, |strata|-sized) count relation sorted ascending — candidate
   * cap at row i is `(budget − cum_before) div (n − i + 1)`, valid iff
   * it undercuts that row's count; the first valid row's candidate is C
   * (when none is valid the budget covers everything and alloc = count).
   * Exact integers throughout. */
  def waterfillBudget(df: DataFrame, stratumCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_docs"), col("stratum"))
    val ranked = counts
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("cum_before", coalesce(sum("n_docs").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(counts.agg(count(lit(1)).as("n_strata"))))
      .withColumn("cand",
        expr(s"($budget - cum_before) div (n_strata - idx + 1)"))
    val cap = ranked.filter(col("cand") < col("n_docs"))
      .agg(min(struct(col("idx"), col("cand"))).as("first"))
      .select(col("first.cand").as("cap"))
    counts.crossJoin(broadcast(cap))
      .select(col("stratum"), col("n_docs"), col("cap"),
        when(col("cap").isNotNull, least(col("n_docs"), col("cap")))
          .otherwise(col("n_docs")).as("alloc"))
  }

  /** Stratified deterministic sample: per-stratum keep-rates (percent) over
   * the same stable hash bucket — the knob a data-mixing stage turns to hit
   * a target source/language mixture (up-weight scarce strata, down-sample
   * dominant ones). A pure narrow projection + filter like `hashSample`:
   * no shuffle, no per-stratum scan, assignment reproducible anywhere.
   * Strata missing from `rates` fall back to `defaultPct`. */
  /** Deterministic EXACT-k-per-stratum sample — the eval-set builder
   * [[stratifiedSample]] can't be (a pct-rate sample yields a BINOMIAL
   * count per stratum; an eval harness wants exactly k): rows rank by
   * the salted md5 of their id WITHIN each stratum (id as the total
   * tie-break) and the top k survive. Fully deterministic — the same
   * corpus always yields the same sample, any engine replays it — and
   * stable under growth in OTHER strata (a new stratum never perturbs an
   * existing one's picks; new rows in the same stratum displace at most
   * the boundary ranks). One per-stratum window sort; strata with < k
   * rows keep everything. */
  def stratumTopK(df: DataFrame, idCol: String, stratumCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(md5(concat(lit("stk:"), col(idCol).cast("string"))),
        col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (s, pct)) =>
      when(col(stratumCol) === s, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), salt = "strat") < rate)
  }

  /** Sqrt-smoothed mixture resampling — the classic multilingual
   * "temperature" smoothing (weights ∝ count^(1/2)): every stratum's keep
   * rate is `floor(100·√(c_min/c_s))`, so the rarest stratum keeps 100 %
   * and dominant strata are downsampled toward (not onto) the floor.
   * Unlike [[stratifiedSample]] the rates are DERIVED from the corpus, not
   * caller-supplied — and derived with IEEE-exact arithmetic only (one
   * divide, one sqrt, one floor), so the rate table replays identically in
   * the oracle. Fully distributed: one stratum-cardinality aggregate,
   * broadcast back; the filter itself stays the stable-md5-bucket narrow
   * scan. α = 1/2 specifically because sqrt is correctly rounded by IEEE —
   * a general `pow(c, α)` is not, and a 1-ulp cross-engine divergence at a
   * rate boundary would flip rows. */
  def sqrtMixtureSample(df: DataFrame, idCol: String,
      stratumCol: String): DataFrame =
    df.join(broadcast(sqrtMixtureRates(df, stratumCol)), stratumCol)
      .filter(hashBucket(col(idCol), salt = "temp") < col("rate"))
      .drop("rate")

  /** The derived sqrt-smoothed rate table, one row per NON-NULL stratum:
   * `(stratumCol, rate)` with `rate = max(1, floor(100·√(cmin/c)))`.
   * Shared by [[sqrtMixtureSample]] and the sp9 gate query so the
   * displayed rates can never drift from the rates the sample used.
   * Clamped at 1 %: past ~10^4× skew the floor would reach 0 and silently
   * DROP the dominant stratum entirely — the clamp keeps it represented
   * (real web corpora exceed that skew routinely). NULL strata are
   * excluded on both sides: a stray NULL would otherwise set cmin and
   * deflate every real stratum's rate while its own rows vanished in the
   * equi-join. */
  def sqrtMixtureRates(df: DataFrame, stratumCol: String): DataFrame =
    temperatureMixtureRates(df, stratumCol, alphaLog2 = 1)

  /** Temperature-smoothed mixture rates at α = 1/2^`alphaLog2` — the
   * general "sampling temperature" knob of multilingual/multi-source
   * training mixes (weights ∝ count^α: α = 1 is proportional, α → 0
   * uniform; `alphaLog2` = 1 is [[sqrtMixtureRates]]' classic √-smoothing,
   * 2 the flatter α = ¼ used when dominant sources must be damped harder).
   * α is restricted to powers of ½ DELIBERATELY: `x^(1/2^k)` evaluates as
   * k nested `sqrt` calls, and sqrt — unlike the general `pow` — is
   * correctly rounded under IEEE 754, so every engine computes the
   * bit-identical rate table and no stratum can flip across a rate
   * boundary between the plan and its replay (the same argument
   * [[sqrtMixtureRates]] always documented, now for the whole α family).
   * Same shape as before: one stratum-cardinality aggregate, a 1-row
   * broadcast, rates clamped at 1 % so extreme skew cannot silently drop
   * a stratum. */
  def temperatureMixtureRates(df: DataFrame, stratumCol: String,
      alphaLog2: Int): DataFrame = {
    require(alphaLog2 >= 1 && alphaLog2 <= 6,
      s"alphaLog2 must be in [1, 6], got $alphaLog2")
    val counts = df.filter(col(stratumCol).isNotNull)
      .groupBy(stratumCol).agg(count(lit(1)).as("__c"))
    val root = (1 to alphaLog2).foldLeft(
      col("__cmin").cast("double") / col("__c"))((e, _) => sqrt(e))
    counts
      .crossJoin(broadcast(counts.agg(min(col("__c")).as("__cmin"))))
      .select(col(stratumCol),
        greatest(lit(1),
          floor(lit(100.0) * root).cast("int")).as("rate"))
  }

  /** The sampler over [[temperatureMixtureRates]] — identical filter shape
   * to [[sqrtMixtureSample]] (stable md5 bucket vs the broadcast rate
   * table; a narrow scan, no shuffle on the corpus side). */
  def temperatureMixtureSample(df: DataFrame, idCol: String,
      stratumCol: String, alphaLog2: Int): DataFrame =
    df.join(broadcast(temperatureMixtureRates(df, stratumCol, alphaLog2)),
        stratumCol)
      .filter(hashBucket(col(idCol), salt = "temp") < col("rate"))
      .drop("rate")

  /** Global training order (curriculum): every row gets its exact position
   * in the corpus-wide `orderCols` sort. A bare `row_number()` over an
   * unpartitioned window is the trap here — Spark plans it as a SINGLE
   * partition holding the whole corpus. The scalable form is the classic
   * two-pass shape: a range-partitioned distributed sort, then
   * `zipWithIndex` (one extra tiny job collecting per-partition COUNTS —
   * not data — to offset each partition's local indexes). This is one of
   * the few genuinely-RDD operations in the engine: no DataFrame operator
   * exposes partition-offset indexing. */
  def globalOrder(df: DataFrame, orderCols: Seq[Column]): DataFrame = {
    val sorted = df.orderBy(orderCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "position", org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    sorted.sparkSession.createDataFrame(indexed, schema)
  }

  /** Upsampling mixture balance — the other half of [[sqrtMixtureSample]]:
   * scarce strata REPLICATE toward the dominant one instead of the
   * dominant downsampling. Rates normalize against the LARGEST stratum
   * (`rate_s = floor(100·√(cmax/c_s)) ≥ 100`): each row emits
   * `rate div 100` full copies plus one more when its stable hash bucket
   * falls under `rate mod 100`. Replicas are tagged (`__copy`) so
   * downstream dedup/packing can tell them apart; everything stays a
   * narrow explode — no shuffle, deterministic on any cluster. */
  def sqrtUpsample(df: DataFrame, idCol: String,
      stratumCol: String): DataFrame = {
    val counts = df.filter(col(stratumCol).isNotNull)
      .groupBy(stratumCol).agg(count(lit(1)).as("__c"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(max(col("__c")).as("__cmax"))))
      .select(col(stratumCol),
        floor(lit(100.0) * sqrt(col("__cmax").cast("double") / col("__c")))
          .cast("int").as("__rate"))
    df.join(broadcast(rates), stratumCol)
      .withColumn("__n_copies",
        (col("__rate") / 100).cast("int") +
          when(hashBucket(col(idCol), salt = "up") < col("__rate") % 100, 1)
            .otherwise(0))
      .withColumn("__copy",
        explode(sequence(lit(1), col("__n_copies"))))
      .drop("__rate", "__n_copies")
  }

  /** Weighted sample WITHOUT replacement (Efraimidis & Spirakis 2006,
   * algorithm A-ES): each row draws an exponential arrival
   * r_i = −ln(u_i)/w_i and the k SMALLEST arrivals win — the one-pass
   * formulation whose inclusion law is exactly successive
   * weight-proportional draws without replacement. Everything this
   * family's charter demands falls out of the shape: u_i comes from the
   * stable md5 bucket ((h32+1)/2^32 ∈ (0,1], no `rand()`), so the sample
   * is the same on any cluster and any run; the arrival is
   * micro-quantized at the ln boundary (the PSI discipline) with ties
   * broken by id, so the DuckDB oracle replays the selection
   * bit-for-bit; and the top-k by (arrival, id) plans as
   * TakeOrderedAndProject — k rows per partition cross the wire, nothing
   * corpus-sized moves, which is also WHY A-ES is the distributed
   * weighted sampler: top-k of a union is the top-k of per-part top-ks.
   * Rows with non-positive or null weight are excluded (they have no
   * inclusion probability). Output: input columns + `pri_micro`. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "ws"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    weightedArrivals(df, idCol, weightCol, salt)
      .orderBy(col("pri_micro"), col(idCol))
      .limit(k)
  }

  /** The A-ES arrival relation without the cut: every positive-weight
   * row with its quantized exponential arrival `pri_micro` — the
   * mergeable half of [[weightedSample]]. */
  def weightedArrivals(df: DataFrame, idCol: String, weightCol: String,
      salt: String = "ws"): DataFrame = {
    val h = conv(substring(
      md5(concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0)
    df.filter(col(weightCol).isNotNull &&
        col(weightCol).cast("double") > 0)
      .withColumn("pri_micro",
        floor(lit(1e6) * -log(u) / col(weightCol).cast("double")
          + lit(0.5)).cast("long"))
  }

  /** Fold a new batch into a MAINTAINED weighted sample — the streaming
   * form A-ES was designed for: because the k smallest arrivals of a
   * union are the k smallest of (top-k of A) ∪ (arrivals of B), the
   * maintained state is just the current k-row sample, and each
   * micro-batch pays arrivals(batch) + a (k + batch)-row top-k. Arrivals
   * are content-deterministic (md5), so REPLAYING a batch is a no-op
   * (the distinct collapses re-seen rows) — checkpoint-recovery
   * idempotence for free. `prior` is a previous [[weightedSample]] /
   * [[weightedSampleMerge]] output (same columns + `pri_micro`); `batch`
   * carries the original columns. Ids are content keys: a re-seen id
   * must carry the same weight (else its two arrivals are distinct rows
   * and both can place — the usual sketch-state contract, same as a
   * CMS key's identity). */
  def weightedSampleMerge(prior: DataFrame, batch: DataFrame,
      idCol: String, weightCol: String, k: Int,
      salt: String = "ws"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    prior.unionByName(weightedArrivals(batch, idCol, weightCol, salt))
      .distinct()
      .orderBy(col("pri_micro"), col(idCol))
      .limit(k)
  }

  /** Sliding-window document chunking: fixed `chunkSize`-token windows every
   * `chunkSize - overlap` tokens — the context-window prep step between
   * cleaning and packing in a pretraining pipeline. Pure narrow
   * split/sequence/slice (one explode, no shuffle, no UDF); a trailing
   * window that would add no new tokens beyond the previous chunk's
   * coverage is dropped (every emitted chunk advances the corpus).
   * Output: (doc_id, chunk_id, n_toks, chunk). */
  def chunkDocuments(docs: DataFrame, chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(step))).as("start"))
      .filter(col("start") === 0 || col("start") + overlap < size(col("toks")))
      .select(col("doc_id"),
        (col("start") / step).cast("int").as("chunk_id"),
        slice(col("toks"), col("start") + 1, lit(chunkSize)).as("ct"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ct")).as("n_toks"),
        concat_ws(" ", col("ct")).as("chunk"))
  }

  /** Decontamination audit: near-dup pairs annotated with each side's
   * train/val/test assignment. `leaks = true` marks a pair straddling a
   * split boundary — a test/val document whose near-duplicate sits in
   * train, the leakage that silently inflates eval scores. Cost shape: two
   * joins of the (small) verified-pair set against the pure-projection
   * split assignment — never a corpus self-join; at 100 TB the pair set is
   * the LSH output, orders of magnitude below the corpus. */
  def splitLeakage(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val splits = hashSplit(docs.select("doc_id"), "doc_id")
    pairs.select("doc_a", "doc_b")
      .join(splits.toDF("doc_a", "split_a"), Seq("doc_a"))
      .join(splits.toDF("doc_b", "split_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        (col("split_a") =!= col("split_b")).as("leaks"))
  }

  /** Training-mixture statistics: per (split, source) document/token counts
   * and each source's fraction of its split — the table a data-mixing stage
   * reads to set or verify sampling weights. One hash-agg over a narrow
   * projection plus a window over the (tiny) aggregate relation. */
  def sourceMix(docs: DataFrame, sourceCol: String = "source"): DataFrame = {
    val w = Window.partitionBy("split")
    hashSplit(docs.select(col("doc_id"), col(sourceCol).as("source"),
        TextAnalysis.wsTokenCount(col("text")).as("n_toks")), "doc_id")
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks").cast("long")).as("n_tokens"))
      .withColumn("frac", round(col("n_docs") / sum("n_docs").over(w), 4))
  }

  /** Token-budget epoch planner — the mixture table a pretraining run pins
   * before launch (the LLaMA-report shape: per source, tokens available,
   * sampling weight, tokens drawn at the budget, and the implied epoch
   * count — epochs > 1 means repeating that source's data, the number the
   * repeated-data scaling results say to audit). Weights are
   * sqrt-smoothed over available tokens (`w_s ∝ √tokens_s`, the same
   * dominant-source damping as [[sqrtMixtureSample]]), carried as exact
   * integer milliweights so the plan replays bit-for-bit in any engine:
   * `drawn_s = budget · w_s DIV Σw` is pure BIGINT arithmetic and
   * `epochs_s` is one deterministic double division of two exact
   * integers. One hash-agg over a narrow (source, token-count)
   * projection; everything after is sources-sized. */
  def tokenBudgetPlan(docs: DataFrame, budget: Long,
      sourceCol: String = "source"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val per = docs.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.wsTokenCount(col("text")).cast("long"))
          .as("tokens"))
      .withColumn("w_millis",
        floor(lit(1000.0) * sqrt(col("tokens").cast("double")))
          .cast("long"))
    per.crossJoin(broadcast(per.agg(sum("w_millis").as("__wsum"))))
      .withColumn("drawn_tokens",
        expr(s"($budget * w_millis) div __wsum"))
      .select(col("source"), col("n_docs"), col("tokens"), col("w_millis"),
        col("drawn_tokens"),
        round(col("drawn_tokens").cast("double") / col("tokens"), 4)
          .as("epochs"))
  }

  /** Sequence packing: assign documents to fixed-token-budget packs — the
   * contiguous-fill approximation of bin packing used when concatenating
   * documents into training sequences.
   *
   * Scale shape: a global greedy pack is inherently serial, so documents are
   * first scattered into `Buckets` independent streams by the stable hash
   * bucket, and packing runs per bucket (window partitioned by bucket,
   * ordered by id) — each bucket is a bounded, deterministic unit of work
   * and packs are identified by (bucket, pack_id). The exclusive running sum
   * of token counts divided by the budget yields the pack index; a document
   * larger than the budget still lands in its own pack(s) boundary. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      budget: Int): DataFrame = {
    val bucket = hashBucket(col(idCol), salt = "pack")
    val w = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bucket", bucket)
      .withColumn("__cum_excl",
        coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"__cum_excl div $budget"))
      .drop("__cum_excl")
  }

  /** Deterministic per-EPOCH reshuffle: every (epoch, doc) pair gets a
   * stable md5-derived order key and its exact position within its
   * epoch's order — different order every epoch (the training-dynamics
   * requirement), identical order every RUN (the reproducibility
   * requirement), on any cluster. The scalable form is one corpus-wide
   * range sort by (epoch, key) via [[globalOrder]] with per-epoch
   * positions recovered by subtracting `epoch · n_docs` — NOT a
   * per-epoch window (row_number partitioned by epoch puts an entire
   * epoch's corpus in one partition). Keys are 60-bit md5 prefixes
   * (fit a long, collision odds ~E·n²/2^61), ties broken by doc_id.
   * Output: (doc_id, epoch, pos). */
  def epochShuffles(docs: DataFrame, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val keyed = docs.select("doc_id")
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("__okey",
        conv(substring(md5(concat(lit("ep:"), col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long"))
    val n = docs.select("doc_id").count()
    globalOrder(keyed,
      Seq(col("epoch").asc, col("__okey").asc, col("doc_id").asc))
      .select(col("doc_id"), col("epoch"),
        (col("position") - col("epoch").cast("long") * n).as("pos"))
  }

  /** [[packSequences]] plus each document's START OFFSET within its pack
   * — the attention-mask / position-id metadata a trainer needs so
   * packed documents don't attend across their boundaries (every packed
   *-sequence format ships it: doc spans within the concatenated
   * window). One more window over the SAME per-bucket ordering the pack
   * assignment used (partitioned one level finer at (bucket, pack_id) —
   * no new exchange, hashpartitioning(bucket) already clusters it; one
   * additional per-partition sort). Output: input columns + bucket +
   * pack_id + offset. */
  def packOffsets(df: DataFrame, idCol: String, tokenCol: String,
      budget: Int): DataFrame = {
    val w = Window.partitionBy("bucket", "pack_id").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    packSequences(df, idCol, tokenCol, budget)
      .withColumn("offset",
        coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)))
  }

  /** One-row packing-efficiency audit of [[packSequences]] — the figure
   * that says whether the chosen `budget` wastes trainer compute: pack
   * count, document count, total tokens, min/max pack fill, the number
   * of packs whose fill EXCEEDS the budget (a document whose cumulative
   * start lands in-pack carries its tail over the boundary — the
   * cross-boundary attention the offset metadata exists to mask), and
   * the mean fill in exact permille of budget (integer `div`, no double
   * division). Cost: the sp2 assignment + two hash-aggs (pack grain,
   * then one row); everything after the assignment is pack-count-sized. */
  def packEfficiency(df: DataFrame, idCol: String, tokenCol: String,
      budget: Int): DataFrame = {
    packSequences(df, idCol, tokenCol, budget)
      .groupBy("bucket", "pack_id")
      .agg(sum(col(tokenCol).cast("long")).as("fill"),
        count(lit(1)).as("nd"))
      .agg(
        count(lit(1)).as("n_packs"),
        sum("nd").as("n_docs"),
        sum("fill").as("total_tokens"),
        min("fill").as("min_fill"),
        max("fill").as("max_fill"),
        sum(when(col("fill") > budget, 1L).otherwise(0L)).as("n_over"))
      .withColumn("mean_fill_permille",
        expr(s"(total_tokens * 1000) div (n_packs * ${budget}L)"))
  }
}
