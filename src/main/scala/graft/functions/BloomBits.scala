package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Bloom-filter bitset build aggregate for incremental corpus dedup
  * ([[graft.text.Bloom]]).
  *
  * Input: the array of k bit positions of one key (computed in the
  * DataFrame layer by [[graft.text.Bloom.positions]] — the hashing
  * scheme stays in plain builtin functions so the DuckDB oracle can
  * replay it verbatim). Each task folds its rows into ONE fixed
  * `mBits`-bit buffer (4 KB at m=2^15, 16 MB at m=2^27); merge is a
  * word-wise OR. The shuffle therefore carries one buffer per map
  * partition regardless of corpus size — the whole point: dedup a new
  * crawl against an N-row existing corpus without ever joining it.
  *
  * Output is the bitset as packed binary: ascending word order
  * (word w covers bits [64w, 64w+64)), bit b set iff
  * `words(b >>> 6) & (1L << (b & 63))` — exactly the layout
  * [[graft.text.Bloom.probe]] tests against.
  *
  * Constructed directly via the graftbridge (carries the `mBits`
  * parameter; the [[CovarMoments]] precedent).
  */
case class BloomBitsAgg(
    child: Expression,
    mBits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(mBits >= 64 && mBits % 64 == 0,
    s"mBits must be a positive multiple of 64, got $mBits")

  private val nWords = mBits / 64

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_bits requires array<bigint> positions, got ${t.sql}")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val pos = arr.getLong(i)
        require(pos >= 0 && pos < mBits,
          s"bloom position $pos out of range [0, $mBits)")
        buffer((pos >>> 6).toInt) |= 1L << (pos & 63)
      }
      i += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var w = 0
    while (w < nWords) { buffer(w) |= other(w); w += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = serialize(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(nWords * 8)
    var w = 0
    while (w < nWords) { bb.putLong(buffer(w)); w += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](nWords)
    var w = 0
    while (w < nWords) { buf(w) = bb.getLong(); w += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BloomBitsAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_bits"
}
