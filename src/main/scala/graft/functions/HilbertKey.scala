package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Codegen'd 2-D Hilbert-curve index: maps (x, y), each in [0, 2^bits), to
 * the point's distance along the order-`bits` Hilbert curve — the classic
 * top-down quadrant walk (per level: quadrant index from the two high
 * bits, then rotate/reflect the frame), compiled to a tight primitive
 * loop inside WholeStageCodegen.
 *
 * Why a custom Expression (the FloatVecDot rationale): the algorithm is a
 * LOOP carrying (x, y, d) state across bit levels. As builtins that is an
 * `aggregate` fold with a struct accumulator — linear expression size,
 * but every row pays `bits` interpreted lambda frames plus a struct
 * allocation per level, and a clustering WRITE evaluates the key through
 * range-partitioner sampling AND the sort, multiplying that cost (z4's
 * first form measured ~24× the one-pass price at sf0.1). Here the whole
 * walk is ~6 long ops per level, no allocation. The interpreted eval and
 * the generated code run the identical arithmetic, and both match the
 * scalar reference locked in Round8Spec and the oracle's unrolled CTEs.
 *
 * Null parity: null in either coordinate → null (BinaryExpression
 * default). Inputs must be LongType already in [0, 2^bits) — scale or
 * rank first, as with `WriteLayout.zorderKey`.
 */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && 2 * bits <= 62,
    s"hilbert_key: 2*bits must fit a signed long, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a;
         |long $y = $b;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}
