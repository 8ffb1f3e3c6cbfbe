package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign-LSH signature as ONE codegen'd expression: bit j of the result
  * is [ dot(vec, weights(j)) > 0 ] for up to 64 hyperplanes, packed into
  * a long bitmask.
  *
  * Why not compose from built-ins: one boolean column per hyperplane
  * embeds nBits x dim literal nodes in the plan (codegen compile time
  * dominated the cold run), while `transform` over a 2-D literal is a
  * higher-order function that Spark evaluates INTERPRETED per row
  * (measured 3x slower than the per-bit codegen). This expression keeps
  * the plan a single node and the inner loop whole-stage-compiled, with
  * the hyperplane matrix attached as a codegen reference object.
  *
  * `weights` must be a foldable array<array<double>> (the deterministic
  * hyperplane matrix); each dot accumulates left-to-right in double,
  * identical to [[DotProduct]] and the DuckDB oracle's list_sum walk.
  * Registered as `graft_sign_bits` via [[GraftExtensions]].
  */
case class SignBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(vt, _), ArrayType(ArrayType(DoubleType, _), _))
          if (vt == FloatType || vt == DoubleType) && right.foldable =>
        val n = matrix.length
        if (n >= 1 && n <= 64) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_sign_bits supports 1..64 hyperplanes, got $n")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_sign_bits requires (array<float|double>, foldable " +
            s"array<array<double>>), got ${l.sql} and ${r.sql}")
    }

  /** The hyperplane matrix, folded once from the literal child. */
  private lazy val matrix: Array[Array[Double]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(j => arr.getArray(j).toDoubleArray())
  }

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, unused: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val isF = vecIsFloat
    var mask = 0L
    var j = 0
    while (j < matrix.length) {
      val w = matrix(j)
      val n = math.min(w.length, x.numElements())
      var s = 0.0
      var d = 0
      while (d < n) {
        s += (if (isF) x.getFloat(d).toDouble else x.getDouble(d)) * w(d)
        d += 1
      }
      if (s > 0.0) mask |= (1L << j)
      j += 1
    }
    mask
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val mat = ctx.addReferenceObj("signBitsMat", matrix, "double[][]")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val w = ctx.freshName("w"); val mask = ctx.freshName("mask")
      val get = if (vecIsFloat) s"$v.getFloat($d)" else s"$v.getDouble($d)"
      s"""
         |long $mask = 0L;
         |for (int $j = 0; $j < $mat.length; $j++) {
         |  final double[] $w = $mat[$j];
         |  final int $n = java.lang.Math.min($w.length, $v.numElements());
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $s += (double)($get) * $w[$d];
         |  }
         |  if ($s > 0.0) { $mask |= (1L << $j); }
         |}
         |${ev.value} = $mask;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignBits =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sign_bits"
}
