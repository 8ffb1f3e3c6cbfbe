package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Byte-level content-defined chunking over a binary column — the
  * Gear-hash scheme (Xia et al., FastCDC, USENIX ATC '16 §3.1, minus
  * the min/max clamps that would reintroduce a sequential cut
  * dependency; see [[graft.text.Cdc]] for why the clamp-free form is
  * the right one here). This extends the token-level CDC machinery to
  * MULTIMODAL payloads: a WAV/PPM/WARC payload re-fetched with a
  * splice re-ships only the chunks in the edit's neighbourhood,
  * because boundaries are functions of content, not offsets.
  *
  * Rolling state over bytes b_0..b_{n-1}:
  *
  *   h_i = (h_{i-1} << 1) + GEAR[b_i]      (64-bit wrapping, h_{-1}=0)
  *
  * with a boundary cut AFTER byte i when the low `maskBits` bits of
  * h_i are all zero; the final byte is always an implicit boundary.
  * Expected chunk length is 2^maskBits bytes. GEAR[b] is the 56-bit
  * md5 prefix of the string `"gear:" + b` (b the unsigned byte value
  * in decimal) — derivable by ANY engine from md5 alone, which is
  * what makes the oracle twin possible.
  *
  * The shift-left gives the WINDOW property that keeps every position
  * independently decidable (embarrassingly parallel, exactly like the
  * Karp-Rabin token chunker): GEAR[b_j]'s contribution to the low
  * `maskBits` bits of h_i vanishes once i-j >= maskBits, so the cut
  * test at i depends only on the last `maskBits` bytes —
  *
  *   (sum_{j=i-maskBits+1..i} GEAR[b_j] << (i-j))  mod 2^maskBits == 0
  *
  * which is the lag-window spelling the DuckDB oracle replays.
  *
  * Output: array of (start, len, chunk_hash) structs in document
  * order, chunk_hash the 56-bit md5 prefix of the chunk's bytes
  * (= [[Hash56]] on the byte slice). Empty input yields an empty
  * array. One pass, no hex round-trips, codegen'd via a static call.
  *
  * Registered as `graft_gear_chunks(bin, maskBits)` via
  * [[GraftExtensions]]; maskBits must be a foldable integer in 1..30.
  */
case class GearChunks(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = GearChunks.OutType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) if right.foldable =>
        val m = right.eval()
        if (m == null || m.asInstanceOf[Int] < 1 || m.asInstanceOf[Int] > 30)
          TypeCheckResult.TypeCheckFailure(
            s"graft_gear_chunks maskBits must be a literal in 1..30, got $m")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_gear_chunks requires (binary, int literal), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(bin: Any, mask: Any): Any =
    GearChunks.chunks(bin.asInstanceOf[Array[Byte]], mask.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, m) => s"graft.functions.GearChunks.chunks($b, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GearChunks =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_gear_chunks"
}

object GearChunks {

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("chunk_hash", LongType, nullable = false))),
    containsNull = false)

  /** GEAR[b] = hash56("gear:" + b) — the oracle regenerates the same
    * 256 constants from md5, so the table itself never ships. */
  private val Gear: Array[Long] = Array.tabulate(256) { b =>
    val s = s"gear:$b".getBytes("US-ASCII")
    md5Prefix56(s, 0, s.length)
  }

  def chunks(bytes: Array[Byte], maskBits: Int): ArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1L
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      if ((h & mask) == 0L || i == n - 1) {
        val len = i - start + 1
        out += InternalRow(start, len, md5Prefix56(bytes, start, len))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** First 7 md5 digest bytes of `b[off, off+len)`, big-endian, as a
    * non-negative long — [[Hash56.hash]] on a slice without copying. */
  private def md5Prefix56(b: Array[Byte], off: Int, len: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(b, off, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) | ((d(2) & 0xffL) << 32) |
      ((d(3) & 0xffL) << 24) | ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) |
      (d(6) & 0xffL)
  }
}
