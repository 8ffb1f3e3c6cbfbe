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

/** KN-TRIGRAM log-prob sum against a broadcast pruned model — the
  * stateless face of [[graft.text.LmPerplexity.score3]] (round 18:
  * the trigram tier's DEPLOYMENT form, mirroring [[LmScoreBcast]]):
  * one left-to-right walk with the double-`<s>` BOS pad, each
  * trigram's probability assembled with the IDENTICAL IEEE shape as
  * the Column formulation (seen context discounts and interpolates
  * into the exact bigram value; unseen falls through to it), snapped
  * at 1e-6 before the order-free long sum — so the fold equals the
  * join-based score3 BITWISE and one model scores streams and
  * batches identically. */
case class LmScore3Bcast(
    child: Expression,
    bc: Broadcast[graft.text.LmPerplexity.LmModel3])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_lm_score3_bcast requires array<string> tokens, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    LmScore3Bcast.score(bc.value, v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = classOf[graft.text.LmPerplexity.LmModel3].getName
      val bcRef = ctx.addReferenceObj("lm3Bc", bc,
        classOf[Broadcast[graft.text.LmPerplexity.LmModel3]].getName)
      val m = ctx.addMutableState(cls, "lm3Model",
        f => s"$f = ($cls) $bcRef.value();")
      s"${ev.value} = graft.functions.LmScore3Bcast.score($m, $v);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): LmScore3Bcast =
    copy(child = newChild)

  override def prettyName: String = "graft_lm_score3_bcast"
}

object LmScore3Bcast {

  /** Walk the token array once; (`<s>`, `<s>`) opens the context
    * chain — one event per token, like the distributed [[graft.text
    * .LmPerplexity.trigrams]] stream. */
  def score(m: graft.text.LmPerplexity.LmModel3, toks: ArrayData): Long = {
    val n = toks.numElements()
    var lp = 0L
    var w1 = "<s>"
    var w2 = "<s>"
    var i = 0
    while (i < n) {
      val w3 = toks.getUTF8String(i).toString
      lp += LmScoreBcast.snapLn(trigramP(m, w1, w2, w3))
      w1 = w2
      w2 = w3
      i += 1
    }
    lp
  }

  /** One trigram's P — the exact operand order of [[graft.text
    * .LmPerplexity.score3]]'s Column expression: seen (w1,w2) context
    * discounts c123 and re-spends the freed mass on the BIGRAM value
    * (same `bigramP` core as [[LmScoreBcast]]); unseen falls through
    * to it. */
  private def trigramP(m: graft.text.LmPerplexity.LmModel3,
      w1: String, w2: String, w3: String): Double = {
    val p2 = LmScoreBcast.bigramP(m.bi, w2, w3)
    val cx3 = m.ctx3.get(w1 + " " + w2)
    if (cx3 != null) {
      val c123: Long = {
        val v: java.lang.Long = m.tri.get(w1 + " " + w2 + " " + w3)
        if (v == null) 0L else v.longValue
      }
      (math.max(c123.toDouble - m.bi.d, 0.0) + m.bi.d * cx3(1) * p2) / cx3(0)
    } else p2
  }
}

/** ORDER-n KN log-prob sum against a broadcast pruned model — the
  * stateless face of [[graft.text.LmPerplexity.scoreN]] (round 14:
  * the order-generic deployment form, mirroring [[LmScore3Bcast]]):
  * one left-to-right walk over an (n−1)-token sliding context seeded
  * with `<s>` pads, each event's probability assembled BOTTOM-UP
  * through the backoff chain with the IDENTICAL IEEE shape as the
  * Column formulation (seen context discounts and interpolates into
  * the next-lower order's value; unseen passes it through), snapped
  * at 1e-6 before the order-free long sum — so the fold equals the
  * join-based scoreN BITWISE and one model scores streams and
  * batches identically at any order. */
case class LmScoreNBcast(
    child: Expression,
    bc: Broadcast[graft.text.LmPerplexity.LmModelN])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_lm_score_n_bcast requires array<string> tokens, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    LmScoreNBcast.score(bc.value, v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = classOf[graft.text.LmPerplexity.LmModelN].getName
      val bcRef = ctx.addReferenceObj("lmNBc", bc,
        classOf[Broadcast[graft.text.LmPerplexity.LmModelN]].getName)
      val m = ctx.addMutableState(cls, "lmNModel",
        f => s"$f = ($cls) $bcRef.value();")
      s"${ev.value} = graft.functions.LmScoreNBcast.score($m, $v);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): LmScoreNBcast =
    copy(child = newChild)

  override def prettyName: String = "graft_lm_score_n_bcast"
}

object LmScoreNBcast {

  /** Walk the token array once with an (n−1)-slot sliding context
    * initialized to `<s>` — one event per token, like the distributed
    * [[graft.text.LmPerplexity.ngrams]] stream. */
  def score(m: graft.text.LmPerplexity.LmModelN, toks: ArrayData): Long = {
    val n = m.n
    val ctx = Array.fill(n - 1)("<s>")
    val cnt = toks.numElements()
    var lp = 0L
    var i = 0
    while (i < cnt) {
      val w = toks.getUTF8String(i).toString
      lp += LmScoreBcast.snapLn(orderP(m, ctx, w))
      var j = 0
      while (j < n - 2) { ctx(j) = ctx(j + 1); j += 1 }
      ctx(n - 2) = w
      i += 1
    }
    lp
  }

  /** One event's P, built bottom-up through the backoff chain — the
    * exact operand order of [[graft.text.LmPerplexity.scoreN]]'s
    * Column expression at every order: the bigram floor first (same
    * `bigramP` core as [[LmScoreBcast]]), then each seen order-m
    * context discounts its gram count and re-spends the freed mass on
    * the value below; unseen contexts pass it through unchanged. */
  private def orderP(m: graft.text.LmPerplexity.LmModelN,
      ctx: Array[String], w: String): Double = {
    var p = LmScoreBcast.bigramP(m.bi, ctx(m.n - 2), w)
    var ord = 3
    while (ord <= m.n) {
      // the order's context = the last (ord − 1) tokens of the window
      val start = (m.n - 1) - (ord - 1)
      val sb = new java.lang.StringBuilder()
      var j = start
      while (j < m.n - 1) {
        if (j > start) sb.append(' ')
        sb.append(ctx(j))
        j += 1
      }
      val key = sb.toString
      val cx = m.ctxs(ord - 3).get(key)
      if (cx != null) {
        val g: Long = {
          val v: java.lang.Long = m.grams(ord - 3).get(key + " " + w)
          if (v == null) 0L else v.longValue
        }
        p = (math.max(g.toDouble - m.bi.d, 0.0) + m.bi.d * cx(1) * p) / cx(0)
      }
      ord += 1
    }
    p
  }
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
      lp += snapLn(bigramP(m, w1, w2))
      w1 = w2
      i += 1
    }
    lp
  }

  /** Spark round(double, 0): HALF_UP on the decimal (valueOf) repr. */
  private[functions] def snapLn(p: Double): Long =
    java.math.BigDecimal.valueOf(math.log(p) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact

  /** One bigram's P — the IDENTICAL IEEE expression shape as the
    * Column formulation in [[graft.text.LmPerplexity.score]] (same
    * operand order, same promotions, java.lang.Math.log like Spark's
    * codegen'd LOG), so the 1e-6 snap lands on the same grid cell.
    * Exposed UN-logged because the trigram model interpolates on the
    * probability VALUE ([[LmScore3Bcast]]). */
  private[functions] def bigramP(m: LmModel, w1: String, w2: String)
      : Double = {
    val nc: Long = {
      val v: java.lang.Long = m.cont.get(w2)
      if (v == null) 0L else v.longValue
    }
    val pc = (nc + 1L).toDouble / (m.nn + m.v + 1L)
    val cx = m.ctx.get(w1)
    if (cx != null) {
      val c12: Long = {
        val v: java.lang.Long = m.big.get(w1 + " " + w2)
        if (v == null) 0L else v.longValue
      }
      (math.max(c12.toDouble - m.d, 0.0) + m.d * cx(1) * pc) / cx(0)
    } else pc
  }
}
