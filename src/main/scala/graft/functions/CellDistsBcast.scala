package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** [[CellDists]] with the centroid matrix shipped as a BROADCAST
  * instead of a plan literal.
  *
  * The literal form is right for small quantizers (the matrix folds
  * once and rides the plan), but it serializes k x dim doubles into
  * every task binary and every plan string — at the ~100k-cell coarse
  * quantizers a 100 TB IVFADC implies, that is tens of MB per task.
  * Here the expression carries only the broadcast HANDLE; each executor
  * fetches the matrix once (torrent blocks), and codegen reads it from
  * a lazily-initialized mutable field.
  *
  * Arithmetic is token-identical to [[CellDists]] — (x-c)^2 accumulated
  * left-to-right in double — so the two forms are bitwise
  * interchangeable (pinned by the parity suite). Cannot go through the
  * function registry (a registry builder receives only child
  * expressions, not a Broadcast), so [[graft.vector.Ivf]] constructs it
  * directly via the sql-namespace column bridge.
  */
case class CellDistsBcast(
    child: Expression,
    bc: Broadcast[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(vt, _) if vt == FloatType || vt == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_l2sq_cells_bcast requires array<float|double>, got ${other.sql}")
    }

  @transient private lazy val matrix: Array[Array[Double]] = bc.value

  private def vecIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
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
    nullSafeCodeGen(ctx, ev, v => {
      val bcRef = ctx.addReferenceObj("cellDistBc", bc,
        classOf[Broadcast[Array[Array[Double]]]].getName)
      // fetched once per task from the executor-local broadcast blocks,
      // NOT serialized into the task binary like the literal form
      val mat = ctx.addMutableState("double[][]", "cellDistMat",
        m => s"$m = (double[][]) $bcRef.value();")
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

  override protected def withNewChildInternal(
      newChild: Expression): CellDistsBcast =
    copy(child = newChild)

  override def prettyName: String = "graft_l2sq_cells_bcast"
}
