package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode text normalization — NFC canonical composition
  * followed by root-locale lowercasing — the multilingual key-normal
  * form every cross-document comparison in a web-scale corpus needs
  * BEFORE hashing: the same word arrives from different crawls as
  * precomposed `é` (U+00E9) or decomposed `e`+U+0301, and in any case
  * mix, so exact dedup, MinHash shingles, Bloom gates, token counts,
  * and BM25 terms all silently fragment without one agreed normal
  * form (UAX #15's motivating case; CCNet/Gopher pipelines normalize
  * before dedup for exactly this reason).
  *
  * Semantics: NFC first (canonical composition — stable across
  * Unicode versions for assigned characters per the normalization
  * stability policy), then `toLowerCase(Locale.ROOT)`. Spark has no
  * builtin normalizer, hence a kernel; there is an ASCII fast path
  * (`Normalizer.isNormalized` is O(n) with a quick-check table, and
  * ASCII text skips both passes' allocations).
  *
  * A pure per-row projection — codegen'd, no shuffle, streams
  * unchanged. Registered as `graft_textnorm` via [[GraftExtensions]].
  */
case class TextNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_textnorm requires a string argument, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    TextNorm.normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): TextNorm =
    copy(child = newChild)

  override def prettyName: String = "graft_textnorm"
}

object TextNorm {

  def normalize(s: UTF8String): UTF8String = {
    // ASCII fast path: NFC is the identity and lowercasing is a byte
    // map — the overwhelmingly common case in a web corpus
    val n = s.numBytes()
    var i = 0
    var ascii = true
    var hasUpper = false
    while (ascii && i < n) {
      val b = s.getByte(i)
      if (b < 0) ascii = false
      else if (b >= 'A' && b <= 'Z') hasUpper = true
      i += 1
    }
    if (ascii) {
      if (!hasUpper) s
      else UTF8String.fromString(
        s.toString.toLowerCase(java.util.Locale.ROOT))
    } else UTF8String.fromString(normalize(s.toString))
  }

  def normalize(s: String): String = {
    val nfc =
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    nfc.toLowerCase(java.util.Locale.ROOT)
  }
}
