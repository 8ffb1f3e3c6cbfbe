package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 56-bit md5 prefix hash over a string column: the first 7
  * digest bytes as a non-negative big-endian long — numerically
  * IDENTICAL to the builtin composition
  * `conv(substring(md5(s), 1, 14), 16, 10) :: long`
  * (TextOps.hofHash56) and to the DuckDB oracle's
  * `('0x' || substr(md5(s), 1, 14))::BIGINT`, because the first 14 hex
  * characters ARE the first 7 bytes.
  *
  * Why a custom Expression: the builtin path materializes the full
  * 32-char hex string, slices it, then parses 14 characters back out of
  * radix-16 — per shingle posting row, millions of times in the
  * MinHash / winnowing / SimHash / hash-vectorizer paths. This kernel
  * goes digest-bytes -> long with no hex round-trip.
  *
  * Registered as `graft_hash56` via [[GraftExtensions]].
  */
case class Hash56(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_hash56 requires a string argument, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Hash56.hash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash56.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash56 =
    copy(child = newChild)

  override def prettyName: String = "graft_hash56"
}

object Hash56 {
  /** First 7 md5 digest bytes, big-endian, as a non-negative long. */
  def hash(s: UTF8String): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) | ((d(2) & 0xffL) << 32) |
      ((d(3) & 0xffL) << 24) | ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) |
      (d(6) & 0xffL)
  }
}
