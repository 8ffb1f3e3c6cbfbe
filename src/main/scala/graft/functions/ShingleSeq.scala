package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst n-gram shingle builder over an `array<string>` token
  * column: one pass, one reused parts buffer — the hot kernel of the
  * whole text-dedup family (Jaccard / MinHash / SimHash / winnowing /
  * containment / decontamination all start from shingles).
  *
  * Why a custom Expression and not the
  * `transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))`
  * HOF composition (see TextOps.hofShingleSeq): the HOF path allocates
  * a sequence array, then per shingle a sliced ArrayData plus the
  * lambda-variable walk; this expression emits the shingle strings
  * directly. Semantics match the HOF version exactly, so the DuckDB
  * oracle twins stay valid:
  *
  *  - `size(toks) < n` (including empty and NULL token arrays — the
  *    HOF's `when` predicate is false/null there) → EMPTY array, never
  *    null; the expression is therefore non-nullable;
  *  - shingle i = tokens i..i+n-1 joined by a single space, duplicates
  *    kept, positional order (winnowing needs positions);
  *  - null elements are skipped by the join, like `concat_ws`.
  *
  * Registered as `graft_shingle_seq` via [[GraftExtensions]].
  */
case class ShingleSeq(tokens: Expression, n: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = n

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def foldable: Boolean = tokens.foldable && n.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, n.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if n.foldable =>
        val k = n.eval()
        if (k != null && k.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_shingle_seq requires a literal n >= 1, got ${n.sql}")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_shingle_seq requires (array<string>, literal int), got ${l.sql} and ${r.sql}")
    }

  @transient private lazy val nVal: Int = n.eval().asInstanceOf[Int]

  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) return empty
    val arr = t.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    val k = nVal
    if (sz < k) return empty
    val sep = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](k)
    val out = new Array[Any](sz - k + 1)
    var i = 0
    while (i <= sz - k) {
      var j = 0
      while (j < k) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tokensGen = tokens.genCode(ctx)
    val sep = ctx.addReferenceObj("sep", UTF8String.fromString(" "),
      classOf[UTF8String].getName)
    val emptyArr = ctx.addReferenceObj("emptyShingles", empty,
      classOf[GenericArrayData].getName)
    val k = nVal
    val arr = ctx.freshName("arr")
    val sz = ctx.freshName("sz")
    val out = ctx.freshName("out")
    val parts = ctx.freshName("parts")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val u8 = classOf[UTF8String].getName
    val gad = classOf[GenericArrayData].getName
    val code =
      code"""
        |${tokensGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $emptyArr;
        |if (!${tokensGen.isNull}) {
        |  final org.apache.spark.sql.catalyst.util.ArrayData $arr = ${tokensGen.value};
        |  final int $sz = $arr.numElements();
        |  if ($sz >= $k) {
        |    final Object[] $out = new Object[$sz - $k + 1];
        |    final $u8[] $parts = new $u8[$k];
        |    for (int $i = 0; $i <= $sz - $k; $i++) {
        |      for (int $j = 0; $j < $k; $j++) {
        |        $parts[$j] = $arr.isNullAt($i + $j) ? null : $arr.getUTF8String($i + $j);
        |      }
        |      $out[$i] = $u8.concatWs($sep, $parts);
        |    }
        |    ${ev.value} = new $gad($out);
        |  }
        |}
      """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleSeq =
    copy(tokens = newLeft, n = newRight)

  override def prettyName: String = "graft_shingle_seq"
}
