package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic point-in-interval range join via bucket expansion — the
  * operator Spark lacks natively (an inequality join plans as
  * BroadcastNestedLoopJoin, which evaluates |points| x |intervals|
  * predicates; commercial engines special-case this with range-join
  * hints). Both sides map to fixed-width buckets: a point lands in
  * one bucket, an interval replicates into every bucket it covers
  * (`sequence` + explode), the join is a plain EQUI-join on the
  * bucket id, and the residual lo <= p <= hi predicate filters the
  * within-bucket false pairs. Shuffle volume is |points| +
  * Σ(span/width + 1) interval replicas — linear, shufflable,
  * AQE/salting-compatible — instead of the quadratic predicate scan.
  *
  * `bucketWidth` trades replication against residual selectivity:
  * width ~ the median interval span keeps replicas ~2x and buckets
  * selective (the standard range-join-hint guidance). Intervals are
  * inclusive on both ends; callers wanting half-open subtract one
  * from `hi` first. Columns are LONGs (epoch days/seconds/micros —
  * callers pick the granularity).
  *
  * `maxBucketsPerInterval` fails fast (raise_error in-plan) on an
  * interval that would replicate pathologically — the open-interval /
  * fat-outlier guard; widen the width or cap the spans upstream.
  *
  * The two frames must carry DISJOINT column names (rename before
  * joining, as [[intervalOverlap]] documents): the residual
  * lo <= p <= hi filter resolves by NAME after the using-column join,
  * so a shared name would be ambiguous or silently bind to the wrong
  * side. `__bk` / `__nb` are reserved working names on either input.
  * Both are validated eagerly, not left to Catalyst's resolver.
  */
object RangeJoin {

  private def requireDisjointColumns(
      points: DataFrame, intervals: DataFrame, op: String): Unit = {
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"$op requires disjoint column names between the point and interval " +
        s"frames (the residual filter resolves by name); shared: " +
        s"${shared.toSeq.sorted.mkString(", ")} — rename one side first")
    val reserved = (points.columns ++ intervals.columns)
      .filter(c => c == "__bk" || c == "__nb")
    require(reserved.isEmpty,
      s"$op reserves the working column names __bk and __nb; " +
        s"rename the caller's ${reserved.distinct.mkString(", ")}")
  }

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    requireDisjointColumns(points, intervals, "pointInInterval")
    def bucket(c: Column): Column = floor(c / bucketWidth)
    val p = points.withColumn("__bk", bucket(col(pointCol)))
    val nb = bucket(col(hiCol)) - bucket(col(loCol)) + 1L
    val i = intervals
      .withColumn("__nb",
        when(col(hiCol) < col(loCol), lit(0L))
          .when(nb > maxBucketsPerInterval,
            raise_error(concat(
              lit(s"range-join interval spans more than $maxBucketsPerInterval " +
                s"buckets at width $bucketWidth ("), col(loCol), lit(".."),
              col(hiCol), lit("); widen bucketWidth or cap spans")))
              .cast("long"))
          .otherwise(nb))
      .filter(col("__nb") > 0)
      .withColumn("__bk",
        explode(sequence(bucket(col(loCol)), bucket(col(hiCol)))))
      .drop("__nb")
    p.join(i, Seq("__bk"))
      .filter(col(loCol) <= col(pointCol) && col(pointCol) <= col(hiCol))
      .drop("__bk")
  }

  /** Interval STABBING COUNTS by sweep-line — the aggregation-only
    * twin of [[pointInInterval]] + count: when the question is "how
    * many intervals cover each point" (inventory in flight, open
    * sessions, concurrent transfers), materializing the point×interval
    * pair table just to count it wastes the join's entire output.
    * The sweep needs no pairs at all: every interval contributes two
    * delta events (+1 at lo, −1 at hi+1), one map-side-combinable
    * aggregate collapses them to a DISTINCT-DATE histogram (bounded by
    * the value domain — calendar-sized, not interval-sized), a
    * two-level [[PrefixSum]] turns deltas into running coverage, and
    * each point reads the count at its preceding event via the
    * bounded as-of union. Linear in intervals with a ~2× constant,
    * zero pair materialization — the measured bench twin
    * (q_in_transit vs q_in_transit_sweep) quantifies the gap.
    *
    * Output: (pointCol, n_covering) — inclusive interval ends,
    * points covered by nothing report 0. */
  def stabbingCounts(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String): DataFrame = {
    val iv = intervals.filter(col(hiCol) >= col(loCol))
    val ev = iv.select(col(loCol).as("__d"), lit(1L).as("__c"))
      .unionByName(iv.select((col(hiCol) + 1L).as("__d"), lit(-1L).as("__c")))
      .groupBy("__d").agg(sum("__c").as("__c"))
    // running coverage at each event date: deltas strictly before + own
    val cum = PrefixSum.rowsBefore(ev, "__d")
      .select(col("__d").as(pointCol), (col("__rb") + col("__c")).as("__cnt"))
    AsOfJoin.asof(points.select(col(pointCol)), cum, pointCol,
        byCols = Nil, payloadCols = Seq("__cnt"))
      .select(col(pointCol),
        coalesce(col("asof___cnt"), lit(0L)).as("n_covering"))
  }

  /** INTERVAL-overlap equi-join via the same bucket expansion: both
    * sides replicate into their covered buckets, join on (equiKeys,
    * bucket), and the residual `loA <= hiB && loB <= hiA` keeps true
    * overlaps (inclusive ends). A pair overlapping across several
    * buckets would match once per shared bucket — instead of a
    * `distinct` (a full extra shuffle of the output), each pair is
    * attributed to EXACTLY the bucket containing the overlap START
    * (`greatest(loA, loB)`), so the join emits each pair once by
    * construction. `equiKeys` carve the corpus into join cells first
    * (sessions per user, lines per supplier …) — the difference
    * between a bounded per-key overlap graph and an all-pairs one.
    * Left columns must not collide with right columns (rename first).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      loA: String, hiA: String,
      loB: String, hiB: String,
      bucketWidth: Long,
      equiKeys: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val shared =
      left.columns.toSet.intersect(right.columns.toSet) -- equiKeys
    require(shared.isEmpty,
      s"intervalOverlap requires left/right column names disjoint outside " +
        s"equiKeys; shared: ${shared.toSeq.sorted.mkString(", ")} — " +
        s"rename one side first")
    val reserved = (left.columns ++ right.columns)
      .filter(c => c == "__bk" || c == "__nb")
    require(reserved.isEmpty,
      s"intervalOverlap reserves the working column names __bk and __nb; " +
        s"rename the caller's ${reserved.distinct.mkString(", ")}")
    def bucket(c: Column): Column = floor(c / bucketWidth)
    def expand(df: DataFrame, lo: String, hi: String): DataFrame = {
      val nb = bucket(col(hi)) - bucket(col(lo)) + 1L
      df.withColumn("__nb",
          when(col(hi) < col(lo), lit(0L))
            .when(nb > maxBucketsPerInterval,
              raise_error(concat(
                lit(s"overlap-join interval spans more than " +
                  s"$maxBucketsPerInterval buckets at width $bucketWidth ("),
                col(lo), lit(".."), col(hi),
                lit("); widen bucketWidth or cap spans"))).cast("long"))
            .otherwise(nb))
        .filter(col("__nb") > 0)
        .withColumn("__bk", explode(sequence(bucket(col(lo)), bucket(col(hi)))))
        .drop("__nb")
    }
    expand(left, loA, hiA)
      .join(expand(right, loB, hiB), equiKeys :+ "__bk")
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA) &&
        col("__bk") === bucket(greatest(col(loA), col(loB))))
      .drop("__bk")
  }
}
