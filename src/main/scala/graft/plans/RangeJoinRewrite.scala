package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/**
 * Catalyst optimizer rule: rewrite an equality-free interval join
 * (`p >= lo AND p < hi`, integral types, no equi-conjunct) into the
 * bin-replication form so it plans as a HASH join instead of Spark's
 * O(|L|·|R|) BroadcastNestedLoopJoin.
 *
 * This is [[graft.operators.RangeJoin.binnedRangeJoin]] as an OPTIMIZER
 * RULE instead of an API call: a user (or generated SQL) writing the
 * natural `JOIN ... ON p BETWEEN lo AND hi - 1` gets the scalable plan
 * automatically — declare the semantics, let the optimizer pick the
 * execution — which is exactly what a whole-plan rewrite (Rule +
 * SparkSessionExtensions) is for, where an Expression or operator API
 * can't reach.
 *
 * Rewrite (semantics-preserving, inner joins):
 *  - left gains `__graft_bin_l = floor(p / w)` (exact decimal floor-div);
 *  - right explodes to one row per overlapped bin via
 *    `sequence(floor(lo/w), floor((hi-1)/w))` (`hi` inclusive when the
 *    upper conjunct is `<=`);
 *  - the join becomes `bin_l = bin_r AND <original condition>`, and a
 *    final Project restores the original output. Each qualifying (L, R)
 *    pair meets in exactly one bin — the point's — so no dedup is needed.
 *  - HYBRID guard: only intervals with `span <= w · MaxReplication` take
 *    the binned join; wider outliers stay on the original nested-loop
 *    form in a unioned second branch, so replication is bounded by
 *    construction no matter how badly the sampled width underestimates
 *    (a corpus-spanning interval matches ~every point anyway — binning
 *    it replicates without pruning).
 *
 * Fires only when: inner join; both bounds on the same left-side integral
 * expression with right-side integral bounds; all expressions
 * deterministic; and NO equi-conjunct (of any type) already present — an
 * equi key means the join already hash-plans and the rewrite would only
 * add work.
 *
 * The ENABLE flag is opt-in (`spark.graft.rangeJoinRewrite.enabled`,
 * default FALSE — a whole-plan rewrite should never surprise a session),
 * but the bin width no longer needs manual sizing:
 * `spark.graft.rangeJoinRewrite.binWidth` defaults to `auto`, which
 * derives the width from the MEDIAN INTERVAL SPAN of a bounded sample of
 * the interval side (first `10001` rows via `executeTake` — a few
 * partitions scanned, driver cost one small sorted array). Median span as
 * the width puts the replication factor of a typical interval at ≈ 2
 * (span/width + 1), the standard sizing rule, at any domain scale —
 * integer cents and ns-epoch intervals both land right, where any fixed
 * default is absurd for one of them (a 1-hour ns interval against width
 * 1000 would replicate to 3.6e9 bins and exceed Spark's sequence limit).
 * The derivation is cached per canonicalized (interval plan, lo, hi) so
 * optimizer fixpoint iterations don't re-sample; a streaming interval
 * side, an empty sample, or a sampling failure stands the rule down
 * (original join kept) rather than guessing. An explicit numeric width
 * overrides the derivation (replication factor ≈ span/width + 1).
 */
case class RangeJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledConf = "spark.graft.rangeJoinRewrite.enabled"
  private val WidthConf = "spark.graft.rangeJoinRewrite.binWidth"
  private val SampleN = 10001
  /** Partition-spread bound for the sampling job: at most this many tasks,
   * evenly strided across the relation's partitions. */
  private val SamplePartitions = 64
  /** Width clamp: the widest SAMPLED span may replicate to at most this
   * many bins. Bounds the worst case a mis-sampled median can produce
   * (bin replication is span/width + 1; the exact predicate re-applies, so
   * a larger width only trades hash-bucket selectivity, never
   * correctness). */
  private val MaxReplication = 10000L

  /** Derived widths keyed by the CANONICALIZED sampling projection —
   * QueryPlan canonicalization normalizes attribute exprIds to output
   * positions, so the same re-submitted query (fresh exprIds every
   * analysis) hits the cache instead of re-launching the sampling job;
   * fixpoint re-runs within one optimization hit it too. Size-bounded
   * true LRU (access-ordered LinkedHashMap): the 65th distinct interval
   * relation evicts the least-recently-USED entry, not the whole cache —
   * a long-lived session with >64 live interval tables keeps its hot
   * widths (round-4 advice). Staleness note: entries live for the
   * session; a table overwritten with differently-scaled intervals keeps
   * its old width until eviction — performance-only, the exact predicate
   * preserves correctness. */
  private val widthCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[LogicalPlan, java.lang.Long](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LogicalPlan, java.lang.Long]): Boolean =
        size() > 64
    })

  /** Re-entrancy latch: deriving a width EXECUTES a plan, and executing a
   * plan runs the optimizer — on this same thread, on a plan that may
   * itself contain an equality-free range join (self-join of an interval
   * table; a cached plan being re-optimized at lookup). Without the latch
   * that inner optimization would launch a nested sampling job from inside
   * the outer one's derivation — unbounded recursion in the worst case.
   * Inside a derivation the rule simply stands down (the inner join keeps
   * its original plan; only sampled rows flow through it, so the NL form
   * is harmless there). */
  private val deriving: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** Median interval span over a bounded, PARTITION-SPREAD sample of the
   * interval side: up to [[SamplePartitions]] evenly-strided partitions
   * contribute `SampleN / partitions` rows each (one `runJob` over just
   * those partitions — bounded task count at any relation size). The
   * spread matters: a prefix `executeTake` sample of a relation ORDERED or
   * clustered by span reads only one end of the distribution, and a
   * too-small median then replicates wide outliers into thousands of bins
   * (round-4 advice, medium). The derived width is additionally clamped so
   * the widest sampled span replicates to at most [[MaxReplication]] bins.
   * Returns None (rule stands down) for streaming plans, empty/degenerate
   * samples, re-entrant derivations, or any execution failure — an
   * optimizer rule must never fail the query. */
  private def deriveWidth(right: LogicalPlan, lo: Expression,
      hi: Expression): Option[Long] = {
    if (right.isStreaming || deriving.get()) return None
    // TRY-mode: one overflow-span row under ANSI would otherwise throw the
    // whole sampling job and stand the rule down for the entire relation;
    // as NULL it is simply excluded from the sample (and the hybrid split
    // routes such rows to the NL branch at runtime anyway).
    val span = Subtract(castLong(hi), castLong(lo),
      NumericEvalContext(EvalMode.TRY, allowDecimalPrecisionLoss = true))
    val proj = Project(Seq(Alias(span, "__graft_span")()), right)
    val key = proj.canonicalized
    val cached = widthCache.get(key)
    if (cached != null) return if (cached > 0) Some(cached.longValue) else None
    deriving.set(true)
    val derived: Option[Long] =
      try {
        val rdd = spark.sessionState.executePlan(proj).executedPlan.execute()
        val parts = rdd.getNumPartitions
        // ceil-div stride: a floor stride of parts/64 breaks the task
        // bound for 65..127 partitions (stride 1 -> every partition)
        val chosen =
          if (parts <= SamplePartitions) 0 until parts
          else 0 until parts by
            ((parts + SamplePartitions - 1) / SamplePartitions)
        val perPart = math.max(1, SampleN / math.max(1, chosen.size))
        val spans = spark.sparkContext
          .runJob(rdd,
            (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
              it.take(perPart)
                .map(r => if (r.isNullAt(0)) 0L else r.getLong(0)).toArray,
            chosen)
          .flatten.filter(_ > 0)
        if (spans.isEmpty) None
        else {
          java.util.Arrays.sort(spans)
          val median = math.max(1L, spans(spans.length / 2))
          val widest = spans.last
          // ceil-div: width w guarantees <= MaxReplication+1 bins for the
          // widest SAMPLED span; unsampled outliers stay bounded by the
          // same factor relative to their own span
          Some(math.max(median,
            (widest + MaxReplication - 1) / MaxReplication))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally deriving.set(false)
    widthCache.put(key, java.lang.Long.valueOf(derived.getOrElse(-1L)))
    derived
  }

  /** Types whose Cast-to-long is exact and ORDER-PRESERVING, making the
   * bin arithmetic sound: the exact range predicate re-applies after the
   * bin equi-join, so the bins only need to be monotone in the original
   * values. Timestamps cast to epoch SECONDS — the dominant real interval
   * domain (session windows, validity ranges) — with the auto-derived
   * width measured in the same cast units by construction. */
  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** floor(e / width) in pure integer arithmetic. Optimizer rules run
   * AFTER analysis, so every expression built here must resolve as-is —
   * no analyzer type-coercion will fix a decimal Divide — and integer
   * floor-div is also exact past 2^53 where a double division is not
   * (real for ns-epoch domains). `div` truncates toward zero; correct to
   * floor for negative operands via the remainder sign (width > 0). */
  private def binOf(e: Expression, width: Long): Expression = {
    val a = castLong(e)
    val q = IntegralDivide(a, Literal(width))
    val r = Remainder(a, Literal(width))
    If(LessThan(r, Literal(0L)), Subtract(q, Literal(1L)), q)
  }

  /** Cast built AFTER analysis must carry the session timezone itself —
   * harmless for the TZ-independent numeric cases. */
  private def castLong(e: Expression): Expression =
    Cast(e, LongType, Some(spark.sessionState.conf.sessionLocalTimeZone))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(EnabledConf, "false").toBoolean) return plan
    // "auto" (the default) derives the width per join from sampled
    // interval-span statistics; an explicit numeric value overrides.
    // Invalid/non-positive width: the operator API raises; an optimizer
    // rule must not fail or silently corrupt the query (IntegralDivide by
    // 0 is NULL in non-ANSI mode -> every bin key NULL -> empty join), so
    // stand down.
    val widthConf = spark.conf.get(WidthConf, "auto")
    val manualWidth: Option[Long] =
      if (widthConf.equalsIgnoreCase("auto")) None
      else scala.util.Try(widthConf.toLong).toOption.orElse(Some(-1L))
    if (manualWidth.exists(_ <= 0)) return plan

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)

        def fromLeft(e: Expression) = e.references.subsetOf(left.outputSet) &&
          e.references.nonEmpty && e.deterministic && integral(e.dataType)
        def fromRight(e: Expression) = e.references.subsetOf(right.outputSet) &&
          e.references.nonEmpty && e.deterministic && integral(e.dataType)

        // an equi-conjunct of ANY type (not just integral) means the join
        // already hash-plans — the rewrite would only add work
        def splitsSides(l: Expression, r: Expression) =
          l.references.nonEmpty && r.references.nonEmpty &&
            ((l.references.subsetOf(left.outputSet) &&
              r.references.subsetOf(right.outputSet)) ||
             (r.references.subsetOf(left.outputSet) &&
              l.references.subsetOf(right.outputSet)))
        val hasEqui = conjuncts.exists {
          case EqualTo(l, r) => splitsSides(l, r)
          case EqualNullSafe(l, r) => splitsSides(l, r)
          case _ => false
        }

        // canonicalize to (p, lo): p >= lo in either spelling
        val lower = conjuncts.collectFirst {
          case GreaterThanOrEqual(p, lo) if fromLeft(p) && fromRight(lo) => (p, lo)
          case LessThanOrEqual(lo, p) if fromLeft(p) && fromRight(lo) => (p, lo)
        }
        // (p, hi, inclusive): p < hi or p <= hi, same p as the lower bound
        def upper(p: Expression) = conjuncts.collectFirst {
          case LessThan(p2, hi) if p2.semanticEquals(p) && fromRight(hi) =>
            (hi, false)
          case GreaterThan(hi, p2) if p2.semanticEquals(p) && fromRight(hi) =>
            (hi, false)
          case LessThanOrEqual(p2, hi) if p2.semanticEquals(p) && fromRight(hi) =>
            (hi, true)
          case GreaterThanOrEqual(hi, p2) if p2.semanticEquals(p) && fromRight(hi) =>
            (hi, true)
        }

        // The wide-residual branch this rule itself emits keeps the
        // original (equality-free) range condition — recognize it by its
        // span filter and stand down, or the fixpoint batch would re-split
        // it forever (each pass launching a fresh sampling job). The check
        // is CAST-INSENSITIVE and searches every sub-predicate: this rule
        // shares the operator-optimization fixpoint with SimplifyCasts,
        // which strips the same-type Cast the filter was built with — a
        // literal-shape match would stop recognizing the residual after
        // one iteration for long-typed bounds and re-derive/re-split it
        // (caught in review; the old exact-shape guard only actually held
        // for timestamp bounds, whose Cast survives). A user's own
        // `hi - lo > k` filter under an un-rewritten range join matches
        // too — conservative stand-down, the join keeps its original plan.
        def stripCast(e: Expression): Expression = e match {
          case c: Cast => stripCast(c.child)
          case _ => e
        }
        // Recurse through interposed Project/SubqueryAlias nodes before the
        // Filter match (round-5 advice): ColumnPruning can push a Project
        // between the wide Join and its span Filter during the fixpoint,
        // and a top-level-only match would stop recognizing the residual —
        // re-deriving and re-splitting it each iteration (extra
        // optimize-time sampling jobs; correctness unaffected).
        def isWideResidual(r: LogicalPlan, lo: Expression,
            hi: Expression): Boolean = r match {
          case Filter(cond, _) => cond.exists {
            case GreaterThan(Subtract(h, l, _), Literal(_, LongType)) =>
              stripCast(h).semanticEquals(stripCast(hi)) &&
                stripCast(l).semanticEquals(stripCast(lo))
            case _ => false
          }
          case Project(_, child) => isWideResidual(child, lo, hi)
          case org.apache.spark.sql.catalyst.plans.logical
            .SubqueryAlias(_, child) => isWideResidual(child, lo, hi)
          case _ => false
        }

        (if (hasEqui) None else lower.flatMap { case (p, lo) =>
          upper(p).flatMap { case (hi, inclusive) =>
            if (isWideResidual(right, lo, hi)) None
            else manualWidth.orElse(deriveWidth(right, lo, hi))
              .map(w => (p, lo, hi, inclusive, w))
          }
        }) match {
          case None => j
          case Some((p, lo, hi, inclusive, width)) =>
            val binL = Alias(binOf(p, width), "__graft_bin_l")()
            val newLeft = Project(left.output :+ binL, left)
            val hiBinArg =
              if (inclusive) hi
              else hi.dataType match {
                // timestamp cast TRUNCATES to epoch seconds: for a `< hi`
                // bound with a sub-second component, (hi_seconds - 1)
                // undershoots the top bin and would DROP matching pairs in
                // hi's own second — keep hi_seconds (at worst one extra
                // candidate bin, which the exact predicate discards)
                case TimestampType | TimestampNTZType => hi
                case _ => Subtract(castLong(hi), Literal(1L))
              }
            // Sequence is TimeZoneAwareExpression: resolved only with a
            // timezone id set (the analyzer would inject it; we run after).
            // NO explicit step: with step=1 an empty/inverted interval
            // (hi <= lo across a bin boundary) would crash at runtime
            // ("Illegal sequence boundaries"); the default step follows the
            // boundary direction, and the exact predicate discards whatever
            // a descending sequence emits — same posture as the operator
            // API (RangeJoin.binnedRangeJoin uses sequence(start, stop)).
            val seq = Sequence(binOf(lo, width), binOf(hiBinArg, width),
              None, Some(spark.sessionState.conf.sessionLocalTimeZone))
            val binR = AttributeReference("__graft_bin_r", LongType,
              nullable = false)()
            // HYBRID split (round-4 advice, medium): NO sampled width can
            // promise the widest UNSAMPLED interval stays boundedly
            // replicated — any bounded sample of an adversarially ordered
            // relation misses outliers, and one missed 1e9-span interval
            // under a span-1 width is a runtime Sequence-length failure.
            // So over-wide intervals never reach the bin Generate at all:
            // intervals with span <= width·MaxReplication take the binned
            // hash join; the (rare, by the width derivation) wider ones
            // keep the original nested-loop form, which for a handful of
            // corpus-spanning intervals is also the RIGHT plan — they match
            // nearly every point, so binning them would replicate without
            // pruning anything. Bounded replication by CONSTRUCTION; the
            // width only tunes the constant. Null bounds drop from both
            // branches (an inner range join can never match them). The two
            // branches partition the interval rows, so no dedup is needed;
            // the left side is scanned once per branch (exchange reuse
            // collapses the scans when the planner can).
            // Span filters evaluate in TRY mode: hi − lo overflows Long for
            // extreme domains (rows the original NL join handles fine), and
            // under ANSI — the Spark 4 default — a plain Subtract would
            // THROW at runtime inside the rewritten query. TRY yields NULL
            // on overflow, and null spans route to the WIDE branch: an
            // overflow-wide interval is by definition wider than any cap
            // (null BOUNDS also land there and correctly match nothing
            // through the original condition).
            def trySpan = Subtract(castLong(hi), castLong(lo),
              NumericEvalContext(EvalMode.TRY,
                allowDecimalPrecisionLoss = true))
            val maxSpan =
              if (width > Long.MaxValue / MaxReplication) Long.MaxValue
              else width * MaxReplication
            val narrow = Filter(
              LessThanOrEqual(trySpan, Literal(maxSpan)), right)
            val wide = Filter(
              Or(GreaterThan(trySpan, Literal(maxSpan)), IsNull(trySpan)),
              right)
            val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(binR), child = narrow)
            val newCond = And(EqualTo(binL.toAttribute, binR), cond)
            val binned =
              Project(j.output, Join(newLeft, gen, Inner, Some(newCond), hint))
            Union(Seq(binned, Join(left, wide, Inner, Some(cond), hint)))
        }
    }
  }
}
