package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native Catalyst functions —
  * attach with `SparkSession.builder().withExtensions(new
  * GraftExtensions)` or `spark.sql.extensions=graft.functions
  * .GraftExtensions`. Operators in [[graft.vector.Similarity]] detect
  * the registration and switch their hot kernels from the HOF
  * composition to the native expression (bit-identical results, so the
  * choice never affects oracle parity — only speed). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(GraftExtensions.DotName),
      new ExpressionInfo(classOf[DotProduct].getName, GraftExtensions.DotName),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"${GraftExtensions.DotName} takes exactly 2 arguments, got ${args.length}")
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(GraftExtensions.SignBitsName),
      new ExpressionInfo(classOf[SignBits].getName, GraftExtensions.SignBitsName),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"${GraftExtensions.SignBitsName} takes exactly 2 arguments, got ${args.length}")
        SignBits(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(GraftExtensions.CellDistsName),
      new ExpressionInfo(classOf[CellDists].getName, GraftExtensions.CellDistsName),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"${GraftExtensions.CellDistsName} takes exactly 2 arguments, got ${args.length}")
        CellDists(args.head, args(1))
      }))
    // user queries written with the idiomatic zip_with/aggregate dot
    // composition get the fused codegen kernel automatically
    ext.injectOptimizerRule(_ => RewriteHofDot)
  }
}

object GraftExtensions {
  val DotName = "graft_dot"
  val SignBitsName = "graft_sign_bits"
  val CellDistsName = "graft_l2sq_cells"
}
