package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import graft.text.LmPerplexity.LmModel

/** KN-bigram log-prob sum against a BROADCAST pruned model — the
  * stateless face of [[graft.text.LmPerplexity.score]]: the child is
  * the document's token array and the result is the exact
  * 1e-6-snapped per-bigram log-prob sum (a long), computed by one
  * left-to-right walk with the `<s>` BOS context. Because each
  * per-bigram value snaps to the integer grid before summing, the
  * fold equals the join-based aggregation BITWISE (long addition is
  * order-free — the [[graft.text.Classifier.classifyStateless]]
  * linearity argument), so the same model scores an unbounded stream
  * and a batch identically.
  *
  * The model rides a real Spark broadcast (fetched once per executor,
  * codegen reads a lazily-initialized field — the [[CmsMinBcast]]
  * precedent); its size is bounded by the PRUNED reference vocabulary
  * ([[graft.text.LmPerplexity.pruneVocab]]), the contract every
  * shipped LM honors. Constructed via the sql-namespace column bridge
  * (a registry builder cannot receive a Broadcast handle).
  */
case class LmScoreBcast(
    child: Expression,
    bc: Broadcast[LmModel])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_lm_score_bcast requires array<string> tokens, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    LmScoreBcast.score(bc.value, v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bcRef = ctx.addReferenceObj("lmBc", bc,
        classOf[Broadcast[LmModel]].getName)
      val m = ctx.addMutableState(classOf[LmModel].getName, "lmModel",
        f => s"$f = (${classOf[LmModel].getName}) $bcRef.value();")
      s"${ev.value} = graft.functions.LmScoreBcast.score($m, $v);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): LmScoreBcast =
    copy(child = newChild)

  override def prettyName: String = "graft_lm_score_bcast"
}

object LmScoreBcast {

  /** Walk the token array once; `<s>` opens the context chain.
    * Token-less docs score 0 (no bigrams). */
  def score(m: LmModel, toks: ArrayData): Long = {
    val n = toks.numElements()
    var lp = 0L
    var w1 = "<s>"
    var i = 0
    while (i < n) {
      val w2 = toks.getUTF8String(i).toString
      lp += bigramLp(m, w1, w2)
      w1 = w2
      i += 1
    }
    lp
  }

  /** One bigram's 1e-6-snapped ln P — the IDENTICAL IEEE expression
    * shape as the Column formulation in [[graft.text.LmPerplexity
    * .score]] (same operand order, same promotions, java.lang.Math.log
    * like Spark's codegen'd LOG), so the snap lands on the same grid
    * cell. */
  private def bigramLp(m: LmModel, w1: String, w2: String): Long = {
    val nc: Long = {
      val v: java.lang.Long = m.cont.get(w2)
      if (v == null) 0L else v.longValue
    }
    val pc = (nc + 1L).toDouble / (m.nn + m.v + 1L)
    val cx = m.ctx.get(w1)
    val p =
      if (cx != null) {
        val c12: Long = {
          val v: java.lang.Long = m.big.get(w1 + " " + w2)
          if (v == null) 0L else v.longValue
        }
        (math.max(c12.toDouble - m.d, 0.0) + m.d * cx(1) * pc) / cx(0)
      } else pc
    // Spark round(double, 0): HALF_UP on the decimal (valueOf) repr
    java.math.BigDecimal.valueOf(math.log(p) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
  }
}
