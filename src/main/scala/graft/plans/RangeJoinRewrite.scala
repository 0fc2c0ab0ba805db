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
 * deterministic; and NO equi-conjunct already present (an equi key means
 * the join already hash-plans and the rewrite would only add work).
 * Guarded by `spark.graft.rangeJoinRewrite.enabled` (default true);
 * `spark.graft.rangeJoinRewrite.binWidth` sets the bin width.
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
    if (!spark.conf.get(EnabledConf, "true").toBoolean) return plan
    val width = spark.conf.get(WidthConf, "1000").toLong

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)

        def fromLeft(e: Expression) = e.references.subsetOf(left.outputSet) &&
          e.references.nonEmpty && e.deterministic && integral(e.dataType)
        def fromRight(e: Expression) = e.references.subsetOf(right.outputSet) &&
          e.references.nonEmpty && e.deterministic && integral(e.dataType)

        val hasEqui = conjuncts.exists {
          case EqualTo(l, r) => (fromLeft(l) && fromRight(r)) ||
            (fromLeft(r) && fromRight(l))
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
            // timezone id set (the analyzer would inject it; we run after)
            val seq = Sequence(binOf(lo, width), binOf(hiBinArg, width),
              Some(Literal(1L)),
              Some(spark.sessionState.conf.sessionLocalTimeZone))
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
