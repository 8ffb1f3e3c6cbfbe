package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for expressions that cannot go
  * through the function registry because they carry runtime state a
  * registry builder cannot receive (e.g. a Broadcast handle —
  * [[graft.functions.CellDistsBcast]]). Lives under org.apache.spark.sql
  * to reach the private[sql] converter; the standard extension-library
  * pattern for plugging custom expressions into the classic DataFrame
  * API (the sanctioned SparkSessionExtensions route only covers
  * registry-constructible expressions). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the cache blocks backing a `localCheckpoint()`ed Dataset.
    * `Dataset.unpersist` only clears CacheManager entries (from
    * `persist()`), never the blocks a local checkpoint parked in the
    * block manager — an iterative caller that checkpoints per round
    * (e.g. [[graft.text.Bpe.train]]'s distributed venue) would
    * otherwise pile up blocks freed only by driver GC. Safe once no
    * later computation reads the dataset: local-checkpoint data cannot
    * be recomputed after unpersist (lineage is truncated), so callers
    * must only release a superseded iteration. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Union that PRESERVES each input's partitioning. Catalyst's Union
    * treats per-branch `coalesce`/`repartition` as collapsible hints —
    * a union of N single-partition branches plans back to ONE
    * partition (measured), which defeats any operator that encodes
    * "one output file per branch" in the partitioning (the
    * [[graft.operators.Compact]] bin-packer). This goes under the
    * planner: each branch executes its own physical plan and the
    * branches concatenate at the RDD level (`SparkContext.union` —
    * still one job, one task per branch partition, no shuffle), so
    * partition COUNT and ORDER are exactly the branch list's. All
    * inputs must share one schema. */
  def unionKeepingPartitions(
      dfs: Seq[org.apache.spark.sql.DataFrame])
      : org.apache.spark.sql.DataFrame = {
    require(dfs.nonEmpty, "unionKeepingPartitions needs at least one input")
    val spark = dfs.head.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = spark.sparkContext.union(dfs.map(_.queryExecution.toRdd))
    spark.internalCreateDataFrame(rdd, dfs.head.schema)
  }

  /** The bucket id encoded in a bucketed-table part-file name (Spark's
    * own parser — `part-00000-<uuid>_00003.c000.snappy.parquet` →
    * Some(3)), and the writer's suffix spelling for producing names the
    * parser accepts. Bridged because BucketingUtils is private[sql];
    * [[graft.operators.Compact.binPackBucketed]] needs both to compact
    * a bucketed layout without breaking it. */
  def bucketIdOfFile(name: String): Option[Int] =
    org.apache.spark.sql.execution.datasources.BucketingUtils
      .getBucketId(name)

  def bucketIdSuffix(id: Int): String =
    org.apache.spark.sql.execution.datasources.BucketingUtils
      .bucketIdToString(id)

  /** The block-manager RDD id backing a `localCheckpoint()`ed Dataset
    * (None for non-checkpoint plans). Lets an iterative builder record
    * exactly WHICH persistent RDDs it created, so a retention probe can
    * set-intersect against `sparkContext.getPersistentRDDs` instead of
    * counting the context-GLOBAL registry — concurrent suites sharing
    * the SparkContext made the global count nondeterministic (the
    * round-12 flaky-gate finding). */
  def checkpointRddId(df: org.apache.spark.sql.Dataset[_]): Option[Int] =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd.id)
      case _ => None
    }

  /** Drain the listener bus (private[spark]) — lets a spec assert on
    * job/stage listener events deterministically instead of sleeping
    * (LayoutProbeSpec pins that compaction's copy arm runs as a Spark
    * job, one task per file, never on the driver). */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
