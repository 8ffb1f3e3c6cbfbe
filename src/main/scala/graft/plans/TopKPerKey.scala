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
  * executor memory is bounded by `spark.graft.topk.maxBufferedRows`
  * row copies (the hash-aggregate scale story): past the bound the
  * map side flushes candidates and restarts, the reduce side falls
  * back to Spark's spillable external sort — so a high-cardinality
  * key domain degrades to the builtin path's memory profile instead
  * of OOMing.
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

  /** Conf key bounding per-partition heap memory: the maximum number
    * of row copies the prune kernel may buffer before it stops growing
    * the hash-of-heaps (partial side: flush candidates and restart;
    * final side: hand the remainder to a spillable sort). */
  val MaxBufferedRowsKey = "spark.graft.topk.maxBufferedRows"
  val MaxBufferedRowsDefault = 1 << 20

  /** Shared per-partition pruning kernel: one bounded heap per key
    * seen in this partition (a MAX-heap under the requested order, so
    * the worst survivor is evicted first), emitting ≤ k rows per key.
    *
    * Memory is bounded at `maxBufferedRows` row copies, NOT k × keys:
    * when a partition carries more distinct keys than fit, the kernel
    * does not OOM the way an unbounded hash-of-heaps would —
    *  - `exact = false` (map side): the buffered survivors are FLUSHED
    *    downstream and the map restarts. Emitting a key's candidates
    *    in more than one epoch is harmless there — the output is only
    *    a candidate superset and the final pass re-prunes;
    *  - `exact = true` (reduce side, must emit exactly ≤ k per key):
    *    buffered rows plus the unread remainder are handed to Spark's
    *    spillable UnsafeExternalRowSorter on (keys, order) and the
    *    sorted run is streamed group-wise taking the first k — the
    *    same memory-safety story as the builtin WindowGroupLimit path,
    *    paid only on partitions that actually exceed the bound. */
  private[plans] def prune(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      input: Seq[Attribute],
      maxBufferedRows: Int = MaxBufferedRowsDefault,
      exact: Boolean = true): Iterator[InternalRow] = {
    // A non-positive bound would make the partial-mode epoch loop emit
    // empty epochs without consuming input — an executor spin, not an
    // error — so reject it eagerly (covers bad conf values too).
    require(maxBufferedRows >= 1,
      s"$MaxBufferedRowsKey must be >= 1, got $maxBufferedRows")
    val keyProj = UnsafeProjection.create(keys, input)
    val ord: Ordering[InternalRow] =
      GenerateOrdering.generate(order, input)

    // One "epoch" = consume input until the buffer bound trips or the
    // input ends, then emit. Exact mode never starts a second heap
    // epoch — overflow routes everything left through the sorter.
    val epochs: Iterator[Iterator[InternalRow]] =
      new Iterator[Iterator[InternalRow]] {
        override def hasNext: Boolean = iter.hasNext
        override def next(): Iterator[InternalRow] = {
          var buffered = 0
          if (k == 1) {
            // arg-max fast path: one row slot per key, no heap — the
            // common latest-version/best-candidate shape pays a
            // compare + maybe a copy per row instead of heap sifts
            val slots = mutable.LinkedHashMap.empty[UnsafeRow, InternalRow]
            while (iter.hasNext && buffered < maxBufferedRows) {
              val row = iter.next()
              val key = keyProj(row)
              slots.get(key) match {
                case Some(best) =>
                  if (ord.lt(row, best)) slots.update(key, row.copy())
                case None =>
                  slots.put(key.copy(), row.copy()); buffered += 1
              }
            }
            if (iter.hasNext && exact)
              sortedTopK(slots.valuesIterator ++ iter, keys, order, k, input)
            else slots.valuesIterator
          } else {
            val heaps =
              mutable.LinkedHashMap.empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
            while (iter.hasNext && buffered < maxBufferedRows) {
              val row = iter.next()
              val key = keyProj(row)
              heaps.get(key) match {
                case Some(q) =>
                  if (q.size < k) { q.add(row.copy()); buffered += 1 }
                  else if (ord.lt(row, q.peek())) { q.poll(); q.add(row.copy()) }
                case None =>
                  val q = new java.util.PriorityQueue[InternalRow](k, ord.reverse)
                  q.add(row.copy())
                  heaps.put(key.copy(), q); buffered += 1
              }
            }
            val drained = heaps.valuesIterator.flatMap(_.iterator.asScala)
            if (iter.hasNext && exact)
              sortedTopK(drained ++ iter, keys, order, k, input)
            else drained
          }
        }
      }
    epochs.flatten
  }

  /** Spillable exact fallback: external-sort `rows` on (keys, order)
    * and stream the run group-wise, keeping the first k of each key.
    * O(k) live rows; the sorter spills under memory pressure. */
  private def sortedTopK(
      rows: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      input: Seq[Attribute]): Iterator[InternalRow] = {
    import org.apache.spark.SparkEnv
    import org.apache.spark.sql.catalyst.types.DataTypeUtils
    import org.apache.spark.sql.execution.UnsafeExternalRowSorter
    import org.apache.spark.util.collection.unsafe.sort.PrefixComparators
    val fullOrder = keys.map(SortOrder(_, Ascending)) ++ order
    val sortOrd: Ordering[InternalRow] = GenerateOrdering.generate(fullOrder, input)
    val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
      private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(row: InternalRow)
          : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        p.value = 0L; p.isNull = false; p
      }
    }
    val sorter = UnsafeExternalRowSorter.create(
      DataTypeUtils.fromAttributes(input.toIndexedSeq), sortOrd,
      PrefixComparators.LONG, prefixComputer,
      SparkEnv.get.memoryManager.pageSizeBytes, false)
    val toUnsafe = UnsafeProjection.create(input, input)
    val sorted = sorter.sort(rows.map {
      case u: UnsafeRow => u
      case other => toUnsafe(other)
    })
    val keyProj = UnsafeProjection.create(keys, input)
    new Iterator[InternalRow] {
      private var curKey: UnsafeRow = _
      private var kept = 0
      private var pending: InternalRow = _
      private def advance(): Unit = {
        while (pending == null && sorted.hasNext) {
          val row = sorted.next()
          val key = keyProj(row)
          if (curKey == null || key != curKey) { curKey = key.copy(); kept = 0 }
          if (kept < k) { kept += 1; pending = row }
        }
      }
      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): InternalRow = {
        advance()
        val r = pending; pending = null; r
      }
    }
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
  * child already has and keeps ≤ k rows per key per partition
  * (overflow past the buffer bound flushes candidates — safe, the
  * final pass re-prunes). */
case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, in) = (keys, order, k, child.output)
    val maxBuf = conf.getConfString(TopKPerKey.MaxBufferedRowsKey,
      TopKPerKey.MaxBufferedRowsDefault.toString).toInt
    child.execute().mapPartitions(
      TopKPerKey.prune(_, ks, os, kk, in, maxBuf, exact = false))
  }
  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyPartialExec =
    copy(child = c)
}

/** Reduce-side exact pick: requires clustering by the keys (Spark
  * inserts the hash exchange), merges each key's candidates with the
  * same bounded heap. No sort is required or produced on the in-memory
  * path; partitions whose key cardinality exceeds the buffer bound
  * fall back to a spillable external sort instead of OOMing. */
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
    val maxBuf = conf.getConfString(TopKPerKey.MaxBufferedRowsKey,
      TopKPerKey.MaxBufferedRowsDefault.toString).toInt
    child.execute().mapPartitions(
      TopKPerKey.prune(_, ks, os, kk, in, maxBuf, exact = true))
  }
  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyFinalExec =
    copy(child = c)
}
