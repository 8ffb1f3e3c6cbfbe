package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.GraftPlanApi

/** Top-k rows per key as a FIRST-CLASS physical operator. The
  * DataFrame spelling
  *
  * {{{ row_number().over(Window.partitionBy(K).orderBy(O)) <= k }}}
  *
  * does get Spark's own rank-limit pushdown (WindowGroupLimit,
  * SPARK-37099): partial group-limit → exchange → final group-limit →
  * Window → Filter. But WindowGroupLimitExec REQUIRES SORTED
  * CHILDREN, so the builtin plan fully sorts every input partition
  * (all n rows, O(n log n), sort buffers and spill paths engaged)
  * before the partial prune, sorts again after the shuffle, and then
  * still runs the whole Window machinery to materialize a rank column
  * the filter immediately consumes. This operator plans as
  *
  *   partial per-partition bounded heaps   (≤ k rows per key per
  *       input partition survive — the map-side-combine shape of
  *       partial aggregation, applied to an order statistic)
  *   → hash exchange on the keys           (candidates only)
  *   → final per-key bounded heaps
  *
  * — the same candidates-only shuffle as WindowGroupLimit, with the
  * four sort/window passes replaced by O(n log k) heap maintenance:
  * no sort is ever materialized, no rank column is projected, and
  * executor memory is bounded by k × (keys per partition) row copies
  * (the hash-aggregate scale story) instead of a full sort buffer.
  * TopKPerKeySpec pins the comparison: the builtin's executed plan
  * carries two Sorts + Window, this one carries neither.
  *
  * Implemented at rung (c) of the extension ladder: a logical
  * [[TopKPerKeyPlan]], a [[SparkStrategy]] emitting the
  * partial/final [[SparkPlan]] pair, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (the
  * [[graft.functions.GraftExtensions]] session wiring), with the
  * exchange inserted by Spark's own `EnsureRequirements` from the
  * final node's required distribution — AQE and exchange reuse apply
  * untouched.
  *
  * CONTRACT: `order` must be a total order over rows within a key
  * (append a unique id as the last sort key); under a non-total order
  * which of the tied boundary rows survive is unspecified (the window
  * spelling has the same property). Row order WITHIN the output is
  * unspecified — sort downstream if needed.
  */
object TopKPerKey {

  /** Top `k` rows of every `keyCols` group under `orderCols`
    * ((column, ascending) pairs, compared in sequence). Output columns
    * = input columns, output row order unspecified. */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(keyCols.nonEmpty, "at least one key column")
    require(orderCols.nonEmpty, "at least one order column")
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(a => df.sparkSession.sessionState.conf.resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val keys = keyCols.map(attr)
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftPlanApi.ofRows(df.sparkSession, TopKPerKeyPlan(keys, order, k, analyzed))
  }

  /** Bottom `k` rows per group — [[topKPerKey]] under the reversed
    * order. Pure sugar: flipping every direction flips which end of
    * the total order the heaps retain. */
  def bottomKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame =
    topKPerKey(df, keyCols, orderCols.map { case (n, asc) => (n, !asc) }, k)

  /** The single best row per group (k=1 arg-max under `orderCols`) —
    * hits the slot fast path in [[prune]]: no heap is ever built. */
  def argMaxPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)]): DataFrame =
    topKPerKey(df, keyCols, orderCols, k = 1)

  /** Shared per-partition pruning kernel: one bounded heap per key
    * seen in this partition (a MAX-heap under the requested order, so
    * the worst survivor is evicted first), emitting ≤ k rows per key.
    * Memory is k × (distinct keys in the partition) row copies. */
  private[plans] def prune(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      input: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, input)
    val ord: Ordering[InternalRow] =
      GenerateOrdering.generate(order, input)
    if (k == 1) {
      // arg-max fast path: one row slot per key, no heap — the common
      // latest-version/best-candidate shape pays a compare + maybe a
      // copy per row instead of heap sift costs
      val slots = mutable.LinkedHashMap.empty[UnsafeRow, InternalRow]
      iter.foreach { row =>
        val key = keyProj(row)
        slots.get(key) match {
          case Some(best) => if (ord.lt(row, best)) slots.update(key, row.copy())
          case None => slots.put(key.copy(), row.copy())
        }
      }
      return slots.valuesIterator
    }
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(q) =>
          if (q.size < k) q.add(row.copy())
          else if (ord.lt(row, q.peek())) { q.poll(); q.add(row.copy()) }
        case None =>
          val q = new java.util.PriorityQueue[InternalRow](k, ord.reverse)
          q.add(row.copy())
          heaps.put(key.copy(), q)
      }
    }
    heaps.valuesIterator.flatMap(_.iterator.asScala)
  }
}

/** Logical node: top `k` rows per `keys` group under `order`. Built
  * from an ANALYZED child, so it is resolved by construction. */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override def references: AttributeSet =
    AttributeSet(keys.flatMap(_.references) ++ order.flatMap(_.references))
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

/** Plans [[TopKPerKeyPlan]] as partial heaps → (exchange by keys,
  * inserted by EnsureRequirements) → final heaps. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyFinalExec(keys, order, k,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Map-side candidate pruning: runs on whatever partitioning the
  * child already has and keeps ≤ k rows per key per partition. */
case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, in) = (keys, order, k, child.output)
    child.execute().mapPartitions(TopKPerKey.prune(_, ks, os, kk, in))
  }
  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyPartialExec =
    copy(child = c)
}

/** Reduce-side exact pick: requires clustering by the keys (Spark
  * inserts the hash exchange), merges each key's candidates with the
  * same bounded heap. No sort is required or produced. */
case class TopKPerKeyFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, in) = (keys, order, k, child.output)
    child.execute().mapPartitions(TopKPerKey.prune(_, ks, os, kk, in))
  }
  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyFinalExec =
    copy(child = c)
}
