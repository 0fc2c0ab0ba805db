package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization of a string column — the first step of every
 * text-cleaning pipeline (the same logical glyph can arrive composed U+00E9
 * or decomposed U+0065 U+0301; dedup shingles, fingerprints and tokenizers
 * must see one spelling). Spark has no builtin for it (DuckDB:
 * `nfc_normalize`, which the oracle uses to replay this expression).
 *
 * Native Expression rather than a UDF (mandated preference order): stays
 * inside WholeStageCodegen with no serialization boundary, and the
 * already-normalized fast path — the overwhelming case for real corpora,
 * checked by `Normalizer.isNormalized`'s quick-check scan — returns the
 * input `UTF8String` without any allocation or copy.
 */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    NormalizeNfc.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.NormalizeNfc.nfc($in);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  /** Shared by interpreted eval and codegen (static forwarder). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
