package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-space tokenizer over a string column: one pass over
  * the UTF-8 bytes emitting the non-empty runs between 0x20 bytes —
  * numerically identical to the builtin composition
  * `filter(split(text, " "), t -> t <> "")` (TextOps.hofTokens), which
  * is the entry point of EVERY text operator (stats, shingles, BM25,
  * SimHash, language ID, ...).
  *
  * Why a custom Expression: the builtin path runs the regex engine per
  * row (Spark's `split` compiles " " as a pattern), materializes the
  * raw token array including empties, then walks it again under the
  * `filter` lambda. This kernel scans bytes once; 0x20 can never occur
  * inside a multi-byte UTF-8 sequence, so byte splitting is exact.
  * NULL text yields NULL, like the builtin chain.
  *
  * Registered as `graft_tokens` via [[GraftExtensions]].
  */
case class Tokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_tokens requires a string argument, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Tokens.split(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokens.split($c)")

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)

  override def prettyName: String = "graft_tokens"
}

object Tokens {
  /** Non-empty byte runs between 0x20 separators, as UTF8Strings. */
  def split(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[Object]
    var i = 0
    while (i < n) {
      if (b(i) == ' ') i += 1
      else {
        var j = i + 1
        while (j < n && b(j) != ' ') j += 1
        out.add(UTF8String.fromBytes(b, i, j - i))
        i = j
      }
    }
    new GenericArrayData(out.toArray)
  }
}
