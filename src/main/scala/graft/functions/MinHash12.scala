package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * All `NumHashes` seeded 32-bit md5-prefix hashes of a string in ONE
 * codegen'd evaluation: `out(s) = unsigned32(md5_bytes("s:" ++ utf8(in)))`.
 *
 * Bit-identical to the builtin composition
 * `conv(substring(md5(concat(lit(s"$seed:"), sh)), 1, 8), 16, 10).cast("long")`
 * (graft.ext.Dedup.seededHash) for every seed — the first 8 hex chars of an
 * md5 digest ARE its first 4 bytes, and `conv(..., 16, 10)` parses them
 * unsigned — so the DuckDB oracle replay
 * (`('0x' || substr(md5(seed || ':' || sh), 1, 8))::BIGINT`) is unaffected.
 *
 * Why a custom Expression (round-1 verdict's top perf item): the builtin
 * form routes every hash through hex-string encode (md5 → 32-char
 * UTF8String), substring, and a string radix parse (`conv`) — 12× per
 * shingle row, and shingle rows are |corpus| × |doc| words. This expression
 * reuses one thread-local MessageDigest, hashes raw UTF-8 bytes, and
 * assembles the unsigned prefix with shifts — no string round-trips, no
 * per-seed concat allocation (seed prefixes "0:".."11:" are precomputed).
 * The md5 work itself is unchanged, keeping oracle parity.
 */
case class MinHash12(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(in: Any): Any =
    MinHash12.compute(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash12.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHash12 =
    copy(child = newChild)
}

object MinHash12 {

  val NumHashes = 12

  private val Prefixes: Array[Array[Byte]] =
    Array.tabulate(NumHashes)(s => s"$s:".getBytes("UTF-8"))

  private val Digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(in: UTF8String): ArrayData = {
    val bytes = in.getBytes
    val md = Digest.get()
    val out = new Array[Long](NumHashes)
    var s = 0
    while (s < NumHashes) {
      md.reset()
      md.update(Prefixes(s))
      md.update(bytes)
      val d = md.digest()
      out(s) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      s += 1
    }
    new GenericArrayData(out)
  }
}
