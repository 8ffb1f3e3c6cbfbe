package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary pruning against a BROADCAST kept-set: every token of the
  * child array outside the set maps to `<unk>` — O(1) per token via
  * one hash probe, where the literal-array formulation
  * ([[graft.text.LmPerplexity.pruneVocab]]'s `array_contains`) scans
  * the whole vocabulary per token (O(v)); at shipped-LM vocab sizes
  * (32k-256k) the literal also bloats every task binary. The set
  * rides a real Spark broadcast — fetched once per executor, codegen
  * reads a lazily-initialized field (the [[CmsMinBcast]] precedent).
  * Constructed via the sql-namespace column bridge. */
case class VocabPruneBcast(
    child: Expression,
    bc: Broadcast[java.util.HashSet[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_vocab_prune_bcast requires array<string> tokens, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    VocabPruneBcast.prune(bc.value, v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bcRef = ctx.addReferenceObj("vocabBc", bc,
        classOf[Broadcast[java.util.HashSet[String]]].getName)
      val setCls = "java.util.HashSet<String>"
      val f = ctx.addMutableState("java.util.HashSet", "vocabSet",
        m => s"$m = ($setCls) $bcRef.value();")
      s"${ev.value} = graft.functions.VocabPruneBcast.prune($f, $v);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): VocabPruneBcast =
    copy(child = newChild)

  override def prettyName: String = "graft_vocab_prune_bcast"
}

object VocabPruneBcast {

  private val Unk = UTF8String.fromString("<unk>")

  def prune(kept: java.util.HashSet[String], toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      out(i) = if (kept.contains(t.toString)) t.clone() else Unk
      i += 1
    }
    new GenericArrayData(out)
  }
}
