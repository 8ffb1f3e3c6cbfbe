package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence counts of a BROADCAST phrase set in one token array —
  * the stateless per-row spelling of the multi-phrase batch walk
  * ([[graft.text.Search.phraseOccurrencesBatch]]), for the gate form:
  * returns `counts(pid)` = number of start positions where phrase
  * `pid` matches exactly (overlaps included), one kernel pass per row
  * regardless of phrase count.
  *
  * A per-phrase HOF column would re-scan the token array once per
  * phrase AND grow the plan linearly with the set (decontamination
  * sets run to thousands of n-grams); here the set rides one
  * broadcast handle and the plan is one expression. Work per row is
  * Σ_p (starts x early-exit compares) — the same candidate walk the
  * HOF spelling performs, fused. Like the other *Bcast kernels the
  * expression carries only the broadcast HANDLE; constructed via the
  * sql-namespace column bridge. */
case class PhraseSetHitsBcast(
    child: Expression,
    bc: Broadcast[Array[Array[String]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_phrase_set_hits_bcast requires array<string> tokens, " +
          s"got ${t.sql}")
    }

  @transient private lazy val phrases: Array[Array[UTF8String]] =
    PhraseSetHitsBcast.convert(bc.value)

  override def nullSafeEval(toksV: Any): Any =
    PhraseSetHitsBcast.hits(phrases, toksV.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val bcRef = ctx.addReferenceObj("phraseBc", bc,
        classOf[Broadcast[Array[Array[String]]]].getName)
      val cls = PhraseSetHitsBcast.getClass.getName.stripSuffix("$")
      val p = ctx.addMutableState(
        "org.apache.spark.unsafe.types.UTF8String[][]", "phraseSet",
        v => s"$v = $cls.convert((String[][]) $bcRef.value());")
      s"""
         |${ev.value} = $cls.hits($p, $toks);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PhraseSetHitsBcast =
    copy(child = c)

  override def prettyName: String = "graft_phrase_set_hits_bcast"
}

object PhraseSetHitsBcast {

  def convert(raw: Array[Array[String]]): Array[Array[UTF8String]] =
    raw.map(_.map(UTF8String.fromString))

  /** Shared by the interpreted and generated paths. */
  def hits(phrases: Array[Array[UTF8String]], toks: ArrayData)
      : GenericArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](phrases.length)
    var pid = 0
    while (pid < phrases.length) {
      val p = phrases(pid)
      val k = p.length
      var c = 0L
      var s = 0
      val maxStart = n - k
      while (s <= maxStart) {
        var i = 0
        var ok = true
        while (ok && i < k) {
          val t = if (toks.isNullAt(s + i)) null else toks.getUTF8String(s + i)
          ok = t != null && t.equals(p(i))
          i += 1
        }
        if (ok) c += 1L
        s += 1
      }
      out(pid) = c
      pid += 1
    }
    new GenericArrayData(out)
  }
}
