package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k (ord, id) aggregate — the AGGREGATE spelling of
  * top-k-per-key (the [[graft.plans.TopKPerKey]] physical operator is
  * the whole-row spelling; this one is groupBy-composable, which is
  * what Structured Streaming's windowed aggregation path needs: a
  * TypedImperativeAggregate runs in streaming groupBy + watermark
  * append mode — the [[KmvAgg]] precedent — where a custom physical
  * operator does not).
  *
  * The buffer holds the k best DISTINCT (ord, id) pairs under
  * (ord DESC, id ASC); merge keeps the k best of the union. Like the
  * KMV sketch, the retained set is a pure function of the input pair
  * SET — row order, partitioning, micro-batch boundaries, and merge
  * order cannot change it — so the streamed result is bit-identical
  * to the batch twin (replay-pinned in StreamingSpec) and a DuckDB
  * oracle replays it as `row_number() OVER (ORDER BY ord DESC, id)
  * <= k` (exact when ids are unique, the usual case; a re-delivered
  * identical pair collapses, which is the right streaming semantics).
  *
  * Output: array<struct<ord double, id bigint>> in rank order
  * (best first). State: O(k) per group.
  */
case class TopKPairsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[(Double, Long), Unit]]
    with BinaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  private def ord: Expression = left
  private def id: Expression = right

  override def checkInputDataTypes(): TypeCheckResult =
    (ord.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (o, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk_pairs requires (double, bigint), got (${o.sql}, ${i.sql})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  private def cmp = TopKPairsAgg.RankOrder

  override def createAggregationBuffer(): java.util.TreeMap[(Double, Long), Unit] =
    new java.util.TreeMap[(Double, Long), Unit](cmp)

  private def add(
      buf: java.util.TreeMap[(Double, Long), Unit], p: (Double, Long)): Unit = {
    if (buf.size < k) { buf.put(p, ()); () }
    else if (cmp.compare(p, buf.lastKey()) < 0) {
      buf.put(p, ())
      if (buf.size > k) { buf.pollLastEntry(); () }
    }
  }

  override def update(
      buf: java.util.TreeMap[(Double, Long), Unit],
      input: InternalRow): java.util.TreeMap[(Double, Long), Unit] = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null)
      add(buf, (o.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: java.util.TreeMap[(Double, Long), Unit],
      other: java.util.TreeMap[(Double, Long), Unit]): java.util.TreeMap[(Double, Long), Unit] = {
    val it = other.keySet().iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeMap[(Double, Long), Unit]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.keySet().iterator() // iterates best-first
    var i = 0
    while (it.hasNext) {
      val (o, d) = it.next()
      out(i) = new GenericInternalRow(Array[Any](o, d))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[(Double, Long), Unit]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.keySet().iterator()
    while (it.hasNext) {
      val (o, d) = it.next()
      bb.putDouble(o); bb.putLong(d)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[(Double, Long), Unit] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put((bb.getDouble, bb.getLong), ()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_topk_pairs"
}

object TopKPairsAgg {
  /** Rank order: ord DESC, id ASC — the map's head is the current
    * best. A static serializable singleton: the comparator ships to
    * executors inside the plan's aggregate expression. */
  private[functions] object RankOrder
      extends java.util.Comparator[(Double, Long)] with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}
