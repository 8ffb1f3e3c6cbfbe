package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass exact second-moment aggregate for PCA/whitening
  * ([[graft.vector.Pca.covarianceLong]]).
  *
  * Replaces the in-row upper-triangle pair EXPLOSION (d*(d+1)/2
  * `inline` struct rows per input vector — 2,080/row at d=64, but
  * 295k-8.4M/row at real LLM embedding widths d=768-4096) with a
  * buffering [[TypedImperativeAggregate]]: each task accumulates the
  * upper-triangle product sums, per-dimension sums, and the row count
  * in ONE flat long buffer, so the per-row cost is d*(d+1)/2 fused
  * multiply-adds into task-local memory — no rows are materialized,
  * nothing is shuffled except one buffer per partition.
  *
  * Arithmetic is bit-identical to the exploded form: inputs snap to
  * the repo's 1e6 fixed-point grid with exactly Spark's
  * `round(x * 1e6, 0).cast("long")` semantics (BigDecimal-of-
  * decimal-string HALF_UP — mirrored verbatim in [[scaleTo1e6]]), and
  * sums are exact signed 128-bit integers (hi/lo long pairs; a single
  * product of two 1e6-scaled components fits a long for |x| < ~90k,
  * only the SUMS need 128 bits). The result exposes the sums as
  * DECIMAL(38,0) — the same type the old `sum(cast(decimal))`
  * produced — so the downstream covariance expression is token-
  * identical and the DuckDB oracle (HUGEINT replay) still matches
  * bitwise.
  *
  * Buffer size is 1 + 2d + d*(d+1)/2 * 2 longs (~2.1 MB at d=512,
  * ~34 MB at d=2048) — one per task plus one per partial buffer in
  * flight, independent of corpus size. Past d≈4096 the O(d^2) buffer
  * itself (~134 MB) is the ceiling; at that width a sketched or
  * blocked covariance is the right primitive, not this one.
  *
  * Constructed directly (not registry-routed) because it carries the
  * `dim` parameter; see the [[CellDistsBcast]] precedent and
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]].
  */
case class CovarMoments(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dim >= 1, s"dim must be positive, got $dim")

  private val nPairs = dim * (dim + 1) / 2
  // buffer layout: [0]=n, [1..d]=dimHi, [1+d..2d]=dimLo,
  // [1+2d..1+2d+m)=pairHi, [1+2d+m..1+2d+2m)=pairLo
  private val dimHiOff = 1
  private val dimLoOff = 1 + dim
  private val pairHiOff = 1 + 2 * dim
  private val pairLoOff = 1 + 2 * dim + nPairs
  private val bufLen = 1 + 2 * dim + 2 * nPairs

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(vt, _) if vt == FloatType || vt == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_covar_moments requires array<float|double>, got ${other.sql}")
    }

  private val sppField = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("spp", DecimalType(38, 0), nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("pairs", ArrayType(sppField, containsNull = false),
      nullable = false),
    StructField("dims", ArrayType(DecimalType(38, 0), containsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  @transient private lazy val vecIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Exactly Spark's `round(x.cast("double") * 1e6, 0).cast("long")`:
    * BigDecimal of the double's SHORTEST DECIMAL STRING (valueOf), not
    * its exact binary expansion, HALF_UP to scale 0, back to double,
    * truncating long cast. Token-for-token the old plan's semantics. */
  private def scaleTo1e6(x: Double): Long =
    JBigDecimal.valueOf(x * 1e6)
      .setScale(0, RoundingMode.HALF_UP).doubleValue().toLong

  // signed-128-bit accumulate of a signed 64-bit value at (hi, lo)
  private def add128(buf: Array[Long], hiIdx: Int, loIdx: Int, v: Long): Unit = {
    val lo = buf(loIdx)
    val nl = lo + v
    val carry = if (java.lang.Long.compareUnsigned(nl, lo) < 0) 1L else 0L
    buf(loIdx) = nl
    buf(hiIdx) += (v >> 63) + carry
  }

  // signed-128-bit accumulate of a signed 128-bit value
  private def add128w(buf: Array[Long], hiIdx: Int, loIdx: Int,
      vHi: Long, vLo: Long): Unit = {
    val lo = buf(loIdx)
    val nl = lo + vLo
    val carry = if (java.lang.Long.compareUnsigned(nl, lo) < 0) 1L else 0L
    buf(loIdx) = nl
    buf(hiIdx) += vHi + carry
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val len = math.min(arr.numElements(), dim)
    val s = new Array[Long](len)
    var d = 0
    while (d < len) {
      val xd = if (vecIsFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      s(d) = scaleTo1e6(xd)
      d += 1
    }
    buffer(0) += 1L
    var i = 0
    while (i < len) {
      add128(buffer, dimHiOff + i, dimLoOff + i, s(i))
      // upper-triangle row-major offset of (i, i): i*dim - i*(i-1)/2
      val rowOff = i * dim - i * (i - 1) / 2 - i
      var j = i
      while (j < len) {
        val t = rowOff + j
        add128(buffer, pairHiOff + t, pairLoOff + t, s(i) * s(j))
        j += 1
      }
      i += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    buffer(0) += other(0)
    var k = 0
    while (k < dim) {
      add128w(buffer, dimHiOff + k, dimLoOff + k,
        other(dimHiOff + k), other(dimLoOff + k))
      k += 1
    }
    k = 0
    while (k < nPairs) {
      add128w(buffer, pairHiOff + k, pairLoOff + k,
        other(pairHiOff + k), other(pairLoOff + k))
      k += 1
    }
    buffer
  }

  private def toDecimal(hi: Long, lo: Long): Decimal = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(hi).putLong(lo)
    // two's-complement big-endian 16 bytes == our signed 128-bit value
    Decimal(BigDecimal(new JBigDecimal(new BigInteger(bb.array()))), 38, 0)
  }

  override def eval(buffer: Array[Long]): Any = {
    val n = buffer(0)
    if (n == 0L) {
      // mirror the exploded form: no input rows -> no pair rows
      return new GenericInternalRow(Array[Any](
        new GenericArrayData(Array.empty[Any]),
        new GenericArrayData(Array.empty[Any]), 0L))
    }
    val pairs = new Array[Any](nPairs)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        pairs(t) = new GenericInternalRow(Array[Any](i, j,
          toDecimal(buffer(pairHiOff + t), buffer(pairLoOff + t))))
        t += 1
        j += 1
      }
      i += 1
    }
    val dims = new Array[Any](dim)
    var k = 0
    while (k < dim) {
      dims(k) = toDecimal(buffer(dimHiOff + k), buffer(dimLoOff + k))
      k += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(pairs), new GenericArrayData(dims), n))
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    var k = 0
    while (k < bufLen) { bb.putLong(buffer(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bufLen)
    var k = 0
    while (k < bufLen) { buf(k) = bb.getLong(); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovarMoments =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CovarMoments =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CovarMoments =
    copy(child = newChild)

  override def prettyName: String = "graft_covar_moments"
}
