package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min point query against a BROADCAST counter grid: the MIN of
  * the grid cells at the child's d flattened positions (row-major,
  * cell (j, c) at index j*w + c — the [[graft.stats.Cms]] layout).
  *
  * The HOF-literal probe in [[graft.stats.Cms.estimate]] is right for
  * small grids, but it embeds d*w longs in every task binary; at the
  * grid sizes a 100 TB profile needs (w = 2^16..2^19 for sub-1e-4
  * overcount rates), this expression carries only the broadcast
  * HANDLE — each executor fetches the counters once (torrent blocks)
  * and codegen reads them from a lazily-initialized field (the
  * [[BloomContainsBcast]] precedent). Estimates are bit-identical to
  * the literal probe (CmsSpec pins parity).
  *
  * Constructed directly via the sql-namespace column bridge (a
  * registry builder cannot receive a Broadcast handle).
  */
case class CmsMinBcast(
    child: Expression,
    bc: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_min_bcast requires array<bigint> positions, " +
          s"got ${other.sql}")
    }

  @transient private lazy val grid: Array[Long] = bc.value

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var min = Long.MaxValue
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val c = grid(arr.getLong(i).toInt)
      if (c < min) min = c
      i += 1
    }
    if (min == Long.MaxValue) 0L else min
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bcRef = ctx.addReferenceObj("cmsBc", bc,
        classOf[Broadcast[Array[Long]]].getName)
      val g = ctx.addMutableState("long[]", "cmsGrid",
        m => s"$m = (long[]) $bcRef.value();")
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val min = ctx.freshName("min")
      s"""
         |long $min = Long.MAX_VALUE;
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  final long $c = $g[(int) $v.getLong($i)];
         |  if ($c < $min) $min = $c;
         |}
         |${ev.value} = $min == Long.MAX_VALUE ? 0L : $min;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): CmsMinBcast =
    copy(child = newChild)

  override def prettyName: String = "graft_cms_min_bcast"
}
