package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level distributed prefix sum over an ordered distinct-value
  * histogram — the shared shape behind [[Zorder.rankBuckets]]'
  * equi-depth layout buckets and [[graft.stats.Quantiles]]' exact
  * rank arithmetic: per-range-partition running sums computed in
  * parallel, plus one bounded window over the numParts per-partition
  * totals broadcast back. Never a corpus-wide single-partition window.
  *
  * Determinism contract (advice r8): the range-partitioned,
  * partition-id-tagged histogram is eagerly `localCheckpoint`ed, so
  * the two consumers of the partition ids — the within-partition
  * running sums and the cross-partition offsets — read ONE frozen
  * materialization. Without that, correctness rode on ReuseExchange
  * deduplicating the two plan branches' range exchanges:
  * RangePartitioner samples with an RDD-derived seed, so with
  * `spark.sql.exchange.reuse=false` (or any canonicalization drift)
  * the branches could draw different boundaries and the ranks —
  * billed as EXACT — would silently disagree. The checkpoint is one
  * extra job over the bounded histogram (distinct values, not rows);
  * its blocks are session-local and value-histogram-sized. The
  * OUTPUT (`rows_before` per value) is partitioning-independent
  * either way — only the internal block ids needed freezing.
  */
private[graft] object PrefixSum {

  /** Attach `__rb` = 0-based count of rows strictly before each
    * distinct value (in `dim` order) to a histogram `counts` carrying
    * (dim, __c = per-value row count). Output: (dim, __c, __rb). */
  def rowsBefore(counts: DataFrame, dim: String,
      numParts: Int = 0): DataFrame =
    rowsBefore(counts, Seq(dim), numParts)

  /** [[rowsBefore]] over a COMPOSITE key (lexicographic order of
    * `dims`) — the shape [[SuffixRank]]'s per-round (rank, rank+h)
    * pair re-ranking needs. Range partitioning colocates equal keys,
    * so ties share one `__rb` exactly.
    *
    * `numParts <= 0` resolves to the session's shuffle-partition
    * count, so callers that don't pin a width scale with the
    * deployment (the Bench contract sets shuffle partitions to the
    * driver's core count) instead of inheriting a constant tuned to
    * one machine. The OUTPUT is partitioning-independent either way —
    * rows_before(v) is defined by the value order alone. */
  def rowsBefore(counts: DataFrame, dims: Seq[String],
      numParts: Int): DataFrame = {
    val np = if (numParts > 0) numParts
      else counts.sparkSession.sessionState.conf.numShufflePartitions
    val parted = counts.repartitionByRange(np, dims.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val wIn = Window.partitionBy("__pid").orderBy(dims.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = parted.withColumn("__cw",
      coalesce(sum("__c").over(wIn), lit(0L)))
    // numParts rows total — the bounded level-2 window
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("__pid").agg(sum("__c").as("__pt"))
      .withColumn("__off", coalesce(sum("__pt").over(wOff), lit(0L)))
      .select("__pid", "__off")
    within.join(broadcast(offsets), "__pid")
      .withColumn("__rb", col("__cw") + col("__off"))
      .drop("__pid", "__cw", "__off")
  }
}
