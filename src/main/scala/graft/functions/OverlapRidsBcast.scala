package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All BROADCAST intervals overlapping a probe interval, as their row
  * ids: given (key, lo, hi) and a per-key index of a small interval
  * set, returns the rids of every indexed interval B in that key's
  * cell with `lo <= hiB && loB <= hi` (inclusive ends).
  *
  * This is the interval-side-broadcast spelling of the overlap join
  * ([[graft.operators.RangeJoin.intervalOverlapBroadcast]]), the
  * [[PointsInRangeBcast]] pattern generalized from points to
  * intervals: the big side is scanned ONCE in place — no bucket
  * expansion, no shuffle — and each row explodes directly into its
  * overlap partners. Per key the index is the lo-sorted interval
  * array under an implicit max-hi segment tree, so a probe reports
  * its k partners in O(log n + k): binary search bounds the
  * `loB <= hi` prefix, the max-hi tree prunes every subtree with no
  * `hiB >= lo` survivor.
  *
  * Degenerate probes (hi < lo) yield an empty array — `explode` then
  * drops the row, matching the bucket-expansion operator's
  * `__nb > 0` filter (degenerate INDEXED intervals are skipped at
  * build). Like [[PointsInRangeBcast]], the expression carries only
  * the broadcast HANDLE; constructed via the sql-namespace column
  * bridge (a registry builder cannot receive a Broadcast).
  */
case class OverlapRidsBcast(
    first: Expression,
    second: Expression,
    third: Expression,
    bc: Broadcast[java.util.HashMap[AnyRef, OverlapRidsBcast.Bucket]])
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // key is STRING (general concatenated cell key) or BIGINT (the
  // single-integral-key fast path: no per-row string materialization —
  // the Bloom integral-probe lesson, 7x there)
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType | LongType, LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_overlap_rids_bcast requires (string|bigint key, bigint, " +
          s"bigint), got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  @transient private lazy val idx
      : java.util.HashMap[AnyRef, OverlapRidsBcast.Bucket] = bc.value

  override def nullSafeEval(keyV: Any, loV: Any, hiV: Any): Any = {
    val key: AnyRef = keyV match {
      case s: UTF8String => s.toString
      case l: java.lang.Long => l
      case other => other.asInstanceOf[AnyRef]
    }
    OverlapRidsBcast.query(idx, key,
      loV.asInstanceOf[Long], hiV.asInstanceOf[Long])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (key, lo, hi) => {
      val bcRef = ctx.addReferenceObj("overlapBc", bc,
        classOf[Broadcast[java.util.HashMap[AnyRef, OverlapRidsBcast.Bucket]]]
          .getName)
      val m = ctx.addMutableState("java.util.HashMap", "overlapIdx",
        v => s"$v = (java.util.HashMap) $bcRef.value();")
      val cls = OverlapRidsBcast.getClass.getName.stripSuffix("$")
      val keyObj = first.dataType match {
        case LongType => s"(Object) java.lang.Long.valueOf($key)"
        case _ => s"$key.toString()"
      }
      s"""
         |${ev.value} = $cls.query($m, $keyObj, $lo, $hi);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): OverlapRidsBcast =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "graft_overlap_rids_bcast"
}

object OverlapRidsBcast {

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  /** Shared by the interpreted and generated paths. */
  def query(idx: java.util.HashMap[AnyRef, Bucket], key: AnyRef,
      lo: Long, hi: Long): GenericArrayData = {
    val b = idx.get(key)
    if (b == null) Empty
    else {
      val out = b.overlapping(lo, hi)
      if (out.length == 0) Empty else new GenericArrayData(out)
    }
  }

  /** One key cell: intervals sorted by lo under an implicit max-hi
    * segment tree (leaves at p2..p2+n−1, pad Long.MinValue). */
  final class Bucket(val lo: Array[Long], val hi: Array[Long],
      val rid: Array[Long]) extends Serializable {
    private val n = lo.length
    private val p2 = { var p = 1; while (p < n) p <<= 1; p }
    private val tree = {
      val t = new Array[Long](2 * p2)
      java.util.Arrays.fill(t, Long.MinValue)
      var i = 0
      while (i < n) { t(p2 + i) = hi(i); i += 1 }
      var k = p2 - 1
      while (k >= 1) { t(k) = math.max(t(2 * k), t(2 * k + 1)); k -= 1 }
      t
    }

    /** rids of every interval with loB <= qhi && hiB >= qlo, ascending
      * by lo-sorted position (deterministic). O(log n + matches). */
    def overlapping(qlo: Long, qhi: Long): Array[Long] = {
      if (qhi < qlo || n == 0) return Array.emptyLongArray
      // e = last index with lo(e) <= qhi (the loB <= qhi prefix)
      var s = java.util.Arrays.binarySearch(lo, qhi)
      if (s >= 0) { // walk past equal keys to the last one
        while (s + 1 < n && lo(s + 1) == qhi) s += 1
      } else s = -s - 2
      if (s < 0) return Array.emptyLongArray
      val out = new scala.collection.mutable.ArrayBuilder.ofLong
      descend(1, 0, p2, qlo, s, out)
      out.result()
    }

    private def descend(node: Int, l: Int, r: Int, qlo: Long, e: Int,
        out: scala.collection.mutable.ArrayBuilder.ofLong): Unit = {
      if (l > e || tree(node) < qlo) return
      if (r - l == 1) { // leaf: l <= e and hi(l) >= qlo both hold here
        if (l < n) out += rid(l)
        return
      }
      val mid = (l + r) >>> 1
      descend(2 * node, l, mid, qlo, e, out)
      descend(2 * node + 1, mid, r, qlo, e, out)
    }
  }

  /** Build one cell from parallel (lo, hi, rid) triples, sorting by lo
    * (ties by rid for determinism). */
  def bucketOf(triples: Array[(Long, Long, Long)]): Bucket = {
    val sorted = triples.sortBy(t => (t._1, t._3))
    new Bucket(sorted.map(_._1), sorted.map(_._2), sorted.map(_._3))
  }
}
