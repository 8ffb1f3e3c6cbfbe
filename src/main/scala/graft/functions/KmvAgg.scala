package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k minimum values) sketch build aggregate — the theta-sketch
  * family's bounded, mergeable distinct-set summary (Bar-Yossef et al.
  * RANDOM '02; Beyer et al. SIGMOD '07). The buffer holds the k
  * SMALLEST DISTINCT hash values seen; merge is k-smallest-of-union.
  * Deterministic by construction: the retained set is a pure function
  * of the input VALUE SET — row order, partitioning, and merge order
  * cannot change it, so the sketch is bit-reproducible and the DuckDB
  * oracle replays it as `row_number() OVER (ORDER BY h) <= k`.
  *
  * What it adds over the existing sketch family: [[HllRegisterAgg]]
  * estimates distinct counts but supports no set algebra;  KMV
  * sketches COMPOSE — k-smallest-of-union is a valid sketch of the
  * union, and two sketches' retained sets below their common theta
  * estimate the INTERSECTION (the theta-sketch trick, estimators in
  * [[graft.stats.Kmv]]). The price is k longs per group instead of
  * HLL's packed registers.
  *
  * Input: a 56-bit non-negative hash (the [[graft.text.TextOps]]
  * hash56 family — hashing stays in the DataFrame layer so the oracle
  * can replay it verbatim, the [[BloomBitsAgg]] convention). Output:
  * the retained values as an ASCENDING array<bigint> — the mergeable,
  * persistable artifact (parquet-safe; the order makes the dump
  * deterministic byte-for-byte).
  *
  * Constructed via the graftbridge (carries `k`; the [[CovarMoments]]
  * precedent).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv requires a bigint hash input, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // skip values already above the current k-th smallest — O(log k)
    // membership work only for candidates that could enter the sketch
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next().longValue())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_kmv"
}
