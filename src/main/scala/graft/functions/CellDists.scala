package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared-L2 distances from one vector to every row of a centroid
  * matrix, as ONE codegen'd expression returning `array<double>`.
  *
  * Why not compose from built-ins: one distance column per centroid
  * embeds nCells x dim literal nodes in the plan — for a 16x64 coarse
  * quantizer that is ~1k AST nodes PER Lloyd iteration (the centroids
  * change every iteration, so nothing is reused and codegen compile
  * time dominates the k-means); a `transform` over a 2-D literal runs
  * interpreted per row (the [[SignBits]] measurement). This keeps the
  * plan a single node with the matrix attached as a codegen reference
  * object and the double loop whole-stage-compiled.
  *
  * Each distance accumulates (x_d - c_d)^2 left-to-right in double —
  * interpreted and codegen'd paths are bit-identical. Registered as
  * `graft_l2sq_cells` via [[GraftExtensions]].
  */
case class CellDists(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(vt, _), ArrayType(ArrayType(DoubleType, _), _))
          if (vt == FloatType || vt == DoubleType) && right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_l2sq_cells requires (array<float|double>, foldable " +
            s"array<array<double>>), got ${l.sql} and ${r.sql}")
    }

  /** The centroid matrix, folded once from the literal child. */
  private lazy val matrix: Array[Array[Double]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(j => arr.getArray(j).toDoubleArray())
  }

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, unused: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val isF = vecIsFloat
    val out = new Array[Double](matrix.length)
    var j = 0
    while (j < matrix.length) {
      val c = matrix(j)
      val n = math.min(c.length, x.numElements())
      var s = 0.0
      var d = 0
      while (d < n) {
        val xd = if (isF) x.getFloat(d).toDouble else x.getDouble(d)
        val diff = xd - c(d)
        s += diff * diff
        d += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val mat = ctx.addReferenceObj("cellDistMat", matrix, "double[][]")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val c = ctx.freshName("c"); val out = ctx.freshName("out")
      val diff = ctx.freshName("diff")
      val get = if (vecIsFloat) s"$v.getFloat($d)" else s"$v.getDouble($d)"
      s"""
         |double[] $out = new double[$mat.length];
         |for (int $j = 0; $j < $mat.length; $j++) {
         |  final double[] $c = $mat[$j];
         |  final int $n = java.lang.Math.min($c.length, $v.numElements());
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    final double $diff = (double)($get) - $c[$d];
         |    $s += $diff * $diff;
         |  }
         |  $out[$j] = $s;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellDists =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_l2sq_cells"
}
