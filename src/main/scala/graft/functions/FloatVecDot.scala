package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Codegen'd dot product over two vector columns (`array<float>` or
 * `array<double>`, independently per side), accumulating in double in index
 * order. Float elements widen to double before the multiply — bit-identical
 * to the builtin `aggregate(zip_with(...))` composition on the same inputs.
 * The double-array form exists for exact-decimal literal vectors (random-
 * hyperplane weights, oracle-replayable in SQL) dotted against float
 * embeddings.
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
 * DuckDB oracle comparison is unaffected. Null parity with the builtin is
 * exact too: mismatched lengths yield NULL (zip_with pads with nulls and
 * poisons the sum) and any null element yields NULL.
 */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xf, yf) = (isFloatArr(left), isFloatArr(right))
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // Per-element null checks are emitted only when either input type can
      // hold nulls — embedding columns declare containsNull=false and keep
      // the unconditioned tight loop.
      val canHoldNulls = Seq(left, right).exists(_.dataType match {
        case ArrayType(_, cn) => cn
        case _ => false
      })
      val nullCheck =
        if (canHoldNulls)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      def get(e: Expression, arr: String): String =
        if (isFloatArr(e)) s"((double) $arr.getFloat($i))"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += ${get(left, x)} * ${get(right, y)};
         |  }
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
  val MinHash12Name = "graft_minhash12"
  val TopKName = "graft_topk"
  val HeavyHittersName = "graft_heavy_hitters"
  val NfcName = "graft_nfc"
  val JaroWinklerName = "graft_jaro_winkler"
  val HilbertName = "graft_hilbert"
  val DamerauName = "graft_damerau"

  /** Build the TypedTopK aggregate from registry args: (ord, id, k) with k a
   * foldable integer literal. Public alias for the extensions injector. */
  def topKFromExprs(exprs: Seq[Expression]): Expression = topKBuilder(exprs)

  private def topKBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"$TopKName expects (ord, id, k)")
    require(exprs(2).foldable, s"$TopKName k must be a literal")
    val k = exprs(2).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$TopKName k must be integral, got $other")
    }
    TypedTopK(exprs(0), exprs(1), k)
  }

  /** Build the HeavyHitters aggregate from registry args:
   * (item, capacity, k), both bounds foldable integer literals. */
  def heavyHittersFromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"$HeavyHittersName expects (item, capacity, k)")
    def intLit(e: Expression, name: String): Int = {
      require(e.foldable, s"$HeavyHittersName $name must be a literal")
      e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$HeavyHittersName $name must be integral, got $other")
      }
    }
    HeavyHitters(exprs(0), intLit(exprs(1), "capacity"), intLit(exprs(2), "k"))
  }

  /** Builder wrapper enforcing exact arity: a bare `exprs(0)` access
   * throws IndexOutOfBounds on zero args and silently IGNORES extras —
   * both must surface as proper analysis-time errors instead. */
  private[functions] def withArity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == n,
        s"$name expects exactly $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  /** Idempotent per-session registration (temp functions). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      VecDotName,
      withArity(VecDotName, 2)(e => FloatVecDot(e(0), e(1))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MinHash12Name,
      withArity(MinHash12Name, 1)(e => MinHash12(e(0))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TopKName, topKBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      HeavyHittersName, heavyHittersFromExprs, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NfcName,
      withArity(NfcName, 1)(e => NormalizeNfc(e(0))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      JaroWinklerName,
      withArity(JaroWinklerName, 2)(e => JaroWinkler(e(0), e(1))),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      HilbertName, hilbertFromExprs, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DamerauName,
      withArity(DamerauName, 2)(e => DamerauLevenshtein(e(0), e(1))),
      "scala_udf")
  }

  /** Build the HilbertKey expression from registry args: (x, y, bits)
   * with bits a foldable integer literal. */
  def hilbertFromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"$HilbertName expects (x, y, bits)")
    require(exprs(2).foldable, s"$HilbertName bits must be a literal")
    val bits = exprs(2).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$HilbertName bits must be integral, got $other")
    }
    HilbertKey(exprs(0), exprs(1), bits)
  }

  /** Column API: resolves through the function registry. */
  def vecDot(a: Column, b: Column): Column = call_function(VecDotName, a, b)

  /** All 12 seeded md5-prefix hashes of a string column (array<long>). */
  def minhash12(in: Column): Column = call_function(MinHash12Name, in)

  /** Bounded top-k aggregate (ord DESC, id ASC) — array<struct<ord,id>>. */
  def topK(ord: Column, id: Column, k: Int): Column =
    call_function(TopKName, ord, id, org.apache.spark.sql.functions.lit(k))

  /** SpaceSaving heavy-hitter sketch aggregate —
   * array<struct<item,n,err>>, (n DESC, item ASC), top k of capacity. */
  def heavyHitters(item: Column, capacity: Int, k: Int): Column =
    call_function(HeavyHittersName, item,
      org.apache.spark.sql.functions.lit(capacity),
      org.apache.spark.sql.functions.lit(k))

  /** Unicode NFC normalization (codegen'd; no-copy on already-NFC input). */
  def nfc(in: Column): Column = call_function(NfcName, in)

  /** Jaro-Winkler similarity (codegen'd; DuckDB-identical semantics). */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function(JaroWinklerName, a, b)

  /** Unrestricted Damerau-Levenshtein distance (codegen'd;
   * DuckDB-identical byte-level semantics). */
  def damerau(a: Column, b: Column): Column =
    call_function(DamerauName, a, b)

  /** 2-D Hilbert-curve index (codegen'd quadrant walk); inputs BIGINT in
   * [0, 2^bits). */
  def hilbert(x: Column, y: Column, bits: Int): Column =
    call_function(HilbertName, x, y,
      org.apache.spark.sql.functions.lit(bits))
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
      GraftFunctions.withArity(GraftFunctions.VecDotName, 2)(
        e => FloatVecDot(e(0), e(1)))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.MinHash12Name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHash12].getName, GraftFunctions.MinHash12Name),
      GraftFunctions.withArity(GraftFunctions.MinHash12Name, 1)(
        e => MinHash12(e(0)))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.TopKName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TypedTopK].getName, GraftFunctions.TopKName),
      GraftFunctions.topKFromExprs _))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.HeavyHittersName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HeavyHitters].getName, GraftFunctions.HeavyHittersName),
      GraftFunctions.heavyHittersFromExprs _))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.NfcName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NormalizeNfc].getName, GraftFunctions.NfcName),
      GraftFunctions.withArity(GraftFunctions.NfcName, 1)(
        e => NormalizeNfc(e(0)))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.JaroWinklerName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[JaroWinkler].getName, GraftFunctions.JaroWinklerName),
      GraftFunctions.withArity(GraftFunctions.JaroWinklerName, 2)(
        e => JaroWinkler(e(0), e(1)))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.HilbertName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HilbertKey].getName, GraftFunctions.HilbertName),
      GraftFunctions.hilbertFromExprs _))
    // whole-plan rewrite: equality-free integral range joins re-plan as
    // bin-replicated hash joins (see plans.RangeJoinRewrite)
    e.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
  }
}
