package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd UNRESTRICTED Damerau-Levenshtein distance (Lowrance & Wagner
 * 1975) — edit distance where an adjacent transposition costs 1 and,
 * unlike the "optimal string alignment" restriction, a transposed pair
 * may be edited again (probed: `CA`→`ABC` is 2 — delete between the
 * transposed pair — where OSA says 3). Spark ships only plain
 * `levenshtein`; transposition-aware distance is the better typo model
 * for name/record matching (Damerau 1964 found >80% of human
 * misspellings are a single insert/delete/substitute/TRANSPOSE).
 *
 * Exactly DuckDB `damerau_levenshtein` semantics, byte-level (probed:
 * 'héllo' vs 'hello' → 2 — the two-byte é costs substitute+insert — and
 * the unrestricted cases above), so the oracle replays the measure
 * natively. Same static-kernel codegen shape as [[JaroWinkler]]: one
 * call, no boxing, stays inside WholeStageCodegen.
 *
 * The kernel allocates the full (la+2)·(lb+2) DP matrix the unrestricted
 * recurrence needs (the transposition term reaches back to the LAST ROW
 * where the current byte matched, so the two-row trick of plain
 * Levenshtein does not apply). Inputs are capped at [[DamerauLevenshtein
 * .MaxLen]] bytes — this is a candidate-pair verifier for BLOCKED short
 * strings (names, titles, keys), not a document measure; a corpus-length
 * string would allocate quadratic memory per row in any engine.
 */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.dist(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.DamerauLevenshtein.dist(" +
        s"$x.getBytes(), $y.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Byte-length cap: quadratic DP memory per evaluation is only sane for
   * short blocked strings. 2048² ints ≈ 16 MB transient worst case. */
  val MaxLen = 2048

  /** Test/diagnostic convenience over Strings (UTF-8 encoded). */
  def dist(a: String, b: String): Int =
    dist(a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The scalar kernel — static so generated code calls it directly.
   * Lowrance-Wagner DP with a 256-entry last-occurrence table. */
  def dist(a: Array[Byte], b: Array[Byte]): Int = {
    val la = a.length
    val lb = b.length
    if (la > MaxLen || lb > MaxLen)
      throw new IllegalArgumentException(
        s"damerau_levenshtein input exceeds $MaxLen bytes ($la, $lb) — " +
          "this is a short-string verifier; block and truncate upstream")
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // d is (la+2) x (lb+2), flattened; row 0 is the "infinity" sentinel
    // row the transposition term falls back to when a byte was never seen
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(b(j - 1) & 0xFF)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val subst = d(i * w + j) + cost
        val insert = d((i + 1) * w + j) + 1
        val delete = d(i * w + j + 1) + 1
        val transp = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = subst
        if (insert < best) best = insert
        if (delete < best) best = delete
        if (transp < best) best = transp
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da(a(i - 1) & 0xFF) = i
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }
}
