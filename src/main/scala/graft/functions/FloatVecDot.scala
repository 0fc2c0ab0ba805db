package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Codegen'd dot product over two `array<float>` columns, accumulating in
 * double in index order.
 *
 * Why a custom Expression (SURVEY §4 note: none needed for the reference
 * surface — this one is perf-driven for the ANN extension): the builtin
 * composition `aggregate(zip_with(a, b, (x, y) => x*y), 0d, acc+v)` walks
 * two lambda interpreters and materializes an intermediate array per row
 * pair; at brute-force-ANN scale (corpus × queries × dim multiply-adds) the
 * inner loop IS the workload. This expression compiles to a tight
 * primitive loop inside WholeStageCodegen — no allocation, no virtual
 * calls — and reproduces bit-for-bit the same result as the builtin
 * composition (same double-cast, same left-to-right accumulation), so the
 * DuckDB oracle comparison is unaffected.
 */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level API for the engine's native functions. */
object GraftFunctions {

  val VecDotName = "graft_vec_dot"

  /** Idempotent per-session registration (temp function). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      VecDotName, exprs => FloatVecDot(exprs(0), exprs(1)), "scala_udf")

  /** Column API: resolves through the function registry. */
  def vecDot(a: Column, b: Column): Column = call_function(VecDotName, a, b)
}

/** `SparkSessionExtensions` hook: injects the native functions at session
 * build time (`SparkSession.builder().withExtensions(new GraftExtensions)`),
 * the canonical registration path for a deployed library. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.VecDotName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FloatVecDot].getName, GraftFunctions.VecDotName),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))))
  }
}
