package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CurrentRow, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer rule giving the idiomatic window top-k spelling
  *
  * {{{ df.withColumn("rn", row_number().over(Window.partitionBy(K).orderBy(O)))
  *     .filter($"rn" <= k).drop("rn") }}}
  *
  * the [[TopKPerKeyPlan]] partial-heap physical plan with NO API
  * change. Spark's own InferWindowGroupLimit already prunes the
  * shuffle for this shape, but its exec sorts every partition on both
  * sides of the exchange and still runs the Window to materialize the
  * rank the filter consumes; when the rank column is DROPPED above
  * the filter, none of that machinery is observable and the bounded
  * heaps compute the identical row set.
  *
  * Matches conservatively — all of:
  *  - the window list is a single `row_number()` over a non-empty
  *    partitionSpec + orderSpec with the standard running row frame
  *    (empty partitionSpec = global top-k stays on the builtin path);
  *  - the filter condition is exactly one rank comparison with an
  *    integer literal (`rn <= k`, `rn < k`, `k >= rn`, `k > rn`,
  *    `rn = 1`) and references nothing else;
  *  - a Project ABOVE the filter drops the rank column (if the rank
  *    survives, the builtin path must produce it).
  *
  * Tie semantics are unchanged in the only sense that exists: with a
  * non-total order, which tied boundary rows row_number keeps is
  * already arbitrary in distributed Spark; the heap keeps an equally
  * arbitrary choice.
  *
  * The rule runs in the user-provided optimizer batch, AFTER
  * InferWindowGroupLimit — the WindowGroupLimit node it may have
  * inserted below the Window is stripped (its pre-pruning is
  * subsumed by the partial heaps). Disable with
  * `spark.graft.topkRewrite.enabled=false`.
  *
  * Memory safety of the rerouted plan matches the builtin path it
  * replaces: the heaps buffer at most
  * `spark.graft.topk.maxBufferedRows` row copies per partition — past
  * that the partial side flushes candidates and the final side falls
  * back to the spillable external sort (see [[TopKPerKey.prune]]), so
  * rerouting a high-key-cardinality query trades speed, never
  * stability. */
object RewriteTopKWindow extends Rule[LogicalPlan] {

  private val ConfKey = "graft.topkRewrite.enabled"

  /** k such that the condition is rank <= k, else None. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private def enabled: Boolean =
    SQLConf.get.getConfString(s"spark.$ConfKey", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case p @ Project(projList,
          Filter(cond,
            Window(Seq(alias @ Alias(
                WindowExpression(RowNumber(),
                  WindowSpecDefinition(part, order,
                    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
                _)),
              _, _, wchild, _)))
          if part.nonEmpty && order.nonEmpty => {
        val rn = alias.toAttribute
        limitOf(cond, rn) match {
          case Some(k) if k > 0 &&
              !projList.exists(_.references.contains(rn)) =>
            // InferWindowGroupLimit's pre-prune below the Window is
            // subsumed by the partial heaps — strip it when present
            val base = wchild match {
              case WindowGroupLimit(_, _, _, _, gchild) => gchild
              case other => other
            }
            Project(projList, TopKPerKeyPlan(part, order, k, base))
          case _ => p
        }
      }
    }
  }
}
