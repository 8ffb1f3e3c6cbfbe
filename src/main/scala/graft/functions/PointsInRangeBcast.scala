package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The covered slice of a BROADCAST sorted point spine per interval:
  * given (lo, hi) and a strictly-increasing `Array[Long]` of distinct
  * point values, returns the sub-array with lo <= p <= hi — two binary
  * searches plus one arraycopy per interval row.
  *
  * This is the spine-side-broadcast spelling of the range join
  * ([[graft.operators.RangeJoin.pointInIntervalBroadcast]]): when the
  * point side is small (a date spine, a calendar) and the interval
  * side is huge, bucket expansion replicates and SHUFFLES the big side
  * ~(span/width + 1)x just to meet a spine that would fit in one
  * broadcast block. Here the interval side is scanned ONCE in place —
  * no expansion, no shuffle, no join — and each row explodes directly
  * into its covered points. Like [[CellDistsBcast]], the expression
  * carries only the broadcast HANDLE; each executor fetches the sorted
  * spine once and codegen reads it from a lazily-initialized field.
  *
  * Degenerate intervals (hi < lo) yield an empty array — `explode`
  * then drops the row, matching the bucket-expansion operator's
  * `__nb > 0` filter. Constructed directly via the sql-namespace
  * column bridge (a registry builder cannot receive a Broadcast).
  */
case class PointsInRangeBcast(
    left: Expression,
    right: Expression,
    bc: Broadcast[Array[Long]])
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_points_in_range_bcast requires (bigint, bigint) bounds, " +
          s"got (${l.sql}, ${r.sql})")
    }

  @transient private lazy val pts: Array[Long] = bc.value

  override def nullSafeEval(loV: Any, hiV: Any): Any = {
    val lo = loV.asInstanceOf[Long]
    val hi = hiV.asInstanceOf[Long]
    val out = PointsInRangeBcast.slice(pts, lo, hi)
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lo, hi) => {
      val bcRef = ctx.addReferenceObj("spineBc", bc,
        classOf[Broadcast[Array[Long]]].getName)
      val p = ctx.addMutableState("long[]", "spinePts",
        m => s"$m = (long[]) $bcRef.value();")
      val cls = PointsInRangeBcast.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.slice($p, $lo, $hi));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PointsInRangeBcast =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_points_in_range_bcast"
}

object PointsInRangeBcast {
  /** The `lo <= p <= hi` slice of a sorted distinct array — shared by
    * the interpreted and generated paths so both are token-identical. */
  def slice(pts: Array[Long], lo: Long, hi: Long): Array[Long] = {
    if (hi < lo || pts.length == 0) return Array.emptyLongArray
    var s = java.util.Arrays.binarySearch(pts, lo)
    if (s < 0) s = -s - 1            // first index with pts(i) >= lo
    var e = java.util.Arrays.binarySearch(pts, hi)
    if (e < 0) e = -e - 2            // last index with pts(i) <= hi
    val len = e - s + 1
    if (len <= 0) return Array.emptyLongArray
    val out = new Array[Long](len)
    System.arraycopy(pts, s, out, 0, len)
    out
  }
}
