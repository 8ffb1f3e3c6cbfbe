package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom membership test against a BROADCAST bitset: true iff every
  * position in the child array has its bit set in the filter words
  * (ascending word order, bit b = words[b >>> 6] & (1L << (b & 63)) —
  * the [[BloomBitsAgg]] layout).
  *
  * The HOF-literal probe in [[graft.text.Bloom.probe]] is right for
  * small filters, but it embeds m/64 longs in every task binary; at
  * the m = 2^24..2^30 bits (2 MB..128 MB) a 100 TB corpus needs for a
  * useful false-positive rate, this expression carries only the
  * broadcast HANDLE — each executor fetches the words once (torrent
  * blocks), and codegen reads them from a lazily-initialized field
  * (the [[CellDistsBcast]] precedent). Verdicts are bit-identical to
  * the literal probe (BloomSpec pins parity).
  *
  * Constructed directly via the sql-namespace column bridge (a
  * registry builder cannot receive a Broadcast handle).
  */
case class BloomContainsBcast(
    child: Expression,
    bc: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains_bcast requires array<bigint> positions, " +
          s"got ${other.sql}")
    }

  @transient private lazy val words: Array[Long] = bc.value

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val pos = arr.getLong(i)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bcRef = ctx.addReferenceObj("bloomBc", bc,
        classOf[Broadcast[Array[Long]]].getName)
      val w = ctx.addMutableState("long[]", "bloomWords",
        m => s"$m = (long[]) $bcRef.value();")
      val i = ctx.freshName("i"); val pos = ctx.freshName("pos")
      val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = true;
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  final long $pos = $v.getLong($i);
         |  if (($w[(int)($pos >>> 6)] & (1L << ($pos & 63))) == 0L) {
         |    $ok = false; break;
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): BloomContainsBcast =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_contains_bcast"
}
