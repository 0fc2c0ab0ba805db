package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
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
 *
 * Fires only when: inner join; both bounds on the same left-side integral
 * expression with right-side integral bounds; all expressions
 * deterministic; and NO equi-conjunct (of any type) already present — an
 * equi key means the join already hash-plans and the rewrite would only
 * add work.
 *
 * OPT-IN by design: `spark.graft.rangeJoinRewrite.enabled` defaults to
 * FALSE and `spark.graft.rangeJoinRewrite.binWidth` (default 1000) must be
 * sized to the workload's interval spans. Bin width is inherently
 * domain-specific — 1000 is reasonable for integer cents, absurd for
 * ns-epoch intervals (a 1-hour ns interval would replicate to 3.6e9 bins
 * and exceed Spark's sequence length limit). An optimizer rule has no
 * data statistics to derive the width from, so a library must not turn
 * this on blindly for every session; enable it per workload with a width
 * near the median interval span (replication factor ≈ span/width + 1).
 */
case class RangeJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledConf = "spark.graft.rangeJoinRewrite.enabled"
  private val WidthConf = "spark.graft.rangeJoinRewrite.binWidth"

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** floor(e / width) in pure integer arithmetic. Optimizer rules run
   * AFTER analysis, so every expression built here must resolve as-is —
   * no analyzer type-coercion will fix a decimal Divide — and integer
   * floor-div is also exact past 2^53 where a double division is not
   * (real for ns-epoch domains). `div` truncates toward zero; correct to
   * floor for negative operands via the remainder sign (width > 0). */
  private def binOf(e: Expression, width: Long): Expression = {
    val a = Cast(e, LongType)
    val q = IntegralDivide(a, Literal(width))
    val r = Remainder(a, Literal(width))
    If(LessThan(r, Literal(0L)), Subtract(q, Literal(1L)), q)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get(EnabledConf, "false").toBoolean) return plan
    val width = spark.conf.get(WidthConf, "1000").toLong
    // invalid width: the operator API raises; an optimizer rule must not
    // fail or silently corrupt the query (IntegralDivide by 0 is NULL in
    // non-ANSI mode -> every bin key NULL -> empty join), so stand down
    if (width <= 0) return plan

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

        (if (hasEqui) None else lower.flatMap { case (p, lo) =>
          upper(p).map { case (hi, inclusive) => (p, lo, hi, inclusive) }
        }) match {
          case None => j
          case Some((p, lo, hi, inclusive)) =>
            val binL = Alias(binOf(p, width), "__graft_bin_l")()
            val newLeft = Project(left.output :+ binL, left)
            val hiBinArg =
              if (inclusive) hi
              else Subtract(Cast(hi, LongType), Literal(1L))
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
            val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(binR), child = right)
            val newCond = And(EqualTo(binL.toAttribute, binR), cond)
            Project(j.output, Join(newLeft, gen, Inner, Some(newCond), hint))
        }
    }
  }
}
