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

  /** Conf key bounding the collected point spine for
    * [[pointInIntervalBroadcast]] — 4M longs = 32 MB, comfortably a
    * broadcast block, far past any calendar/date-spine use. */
  val MaxBroadcastPointsKey = "spark.graft.rangejoin.maxBroadcastPoints"
  val MaxBroadcastPointsDefault: Int = 4 << 20

  /** [[pointInInterval]] with the POINT side broadcast — the scale
    * path when points are a small spine (distinct dates, a calendar)
    * and intervals are huge. Bucket expansion replicates and shuffles
    * the big interval side ~(span/width + 1)× just to meet a spine
    * that fits in one broadcast block; here the interval side is
    * scanned ONCE in place: each row binary-searches the broadcast
    * sorted spine ([[graft.functions.PointsInRangeBcast]]) and
    * explodes directly into its covered points — no expansion, no
    * shuffle, no bucket join. A final broadcast equi-join back to the
    * caller's point frame restores point payload columns and
    * duplicate-row multiplicity, so the output row set is identical
    * to [[pointInInterval]] (RangeJoinSpec pins parity).
    *
    * Fails fast if the distinct point count exceeds
    * `spark.graft.rangejoin.maxBroadcastPoints` — fall back to the
    * shuffling [[pointInInterval]] for genuinely large point sides. */
  def pointInIntervalBroadcast(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String): DataFrame = {
    requireDisjointColumns(points, intervals, "pointInIntervalBroadcast")
    // the kernel works in long space — require integral columns eagerly
    // instead of an NPE at getLong / a silent LongType retype (advice r11)
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    Seq(pointCol -> points.schema(pointCol).dataType,
        loCol -> intervals.schema(loCol).dataType,
        hiCol -> intervals.schema(hiCol).dataType).foreach { case (n, t) =>
      require(integral(t),
        s"pointInIntervalBroadcast requires integral (byte/short/int/long) " +
          s"columns — epoch days/seconds/micros; $n is $t. Cast upstream " +
          "(e.g. unix_date/unix_micros) or use pointInInterval")
    }
    val pointType = points.schema(pointCol).dataType
    val spark = points.sparkSession
    val max = spark.conf.getOption(MaxBroadcastPointsKey)
      .map(_.toInt).getOrElse(MaxBroadcastPointsDefault)
    require(max >= 1, s"$MaxBroadcastPointsKey must be >= 1, got $max")
    // limit(max+1) bounds the driver fetch itself (the CalendarIndex
    // guard pattern): the failure mode is an error, never an OOM
    val vals = points.filter(col(pointCol).isNotNull)
      .select(col(pointCol).cast("long")).distinct()
      .limit(max + 1).collect().map(_.getLong(0))
    require(vals.length <= max,
      s"pointInIntervalBroadcast collected more than $max distinct " +
        s"points; raise $MaxBroadcastPointsKey or use pointInInterval")
    java.util.Arrays.sort(vals)
    val bc = spark.sparkContext.broadcast(vals)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val covered = column(graft.functions.PointsInRangeBcast(
      expression(col(loCol).cast("long")),
      expression(col(hiCol).cast("long")), bc))
    intervals.withColumn(pointCol, explode(covered))
      .withColumn(pointCol, col(pointCol).cast(pointType))
      .join(broadcast(points), Seq(pointCol))
      .select((points.columns ++ intervals.columns).map(col): _*)
  }

  /** Conf key bounding the collected interval side for
    * [[intervalOverlapBroadcast]] — 2M rows of (lo, hi, rid) plus
    * payload is a comfortable broadcast block. */
  val MaxBroadcastIntervalsKey = "spark.graft.rangejoin.maxBroadcastIntervals"
  val MaxBroadcastIntervalsDefault: Int = 2 << 20

  /** [[intervalOverlap]] with the RIGHT side broadcast — the pair-
    * producing twin of [[pointInIntervalBroadcast]]: when one interval
    * set is small (audit windows, outage periods, a dimension of
    * validity ranges — or a self-join whose table fits the bound),
    * bucket expansion replicates and shuffles BOTH sides just to meet
    * a frame that fits in one broadcast block. Here the left side is
    * scanned ONCE in place: each row probes a per-key lo-sorted /
    * max-hi-segment-tree index of the broadcast side
    * ([[graft.functions.OverlapRidsBcast]], O(log n + matches) per
    * probe) and explodes directly into its partner row ids; one
    * broadcast equi-join on the rid restores the right payload. No
    * expansion, no shuffle, no bucketWidth to tune — and the output
    * row set is identical to [[intervalOverlap]] (RangeJoinSpec pins
    * parity), including duplicate-row multiplicity on both sides.
    *
    * `equiKeys` (present in both frames, like [[intervalOverlap]])
    * carve the index into cells; key columns must be integral or
    * string (they ride a concatenated key — a null in any key drops
    * the row, matching the equi-join). lo/hi columns must be integral
    * on both sides. Fails fast past
    * `spark.graft.rangejoin.maxBroadcastIntervals` distinct right
    * rows — fall back to the shuffling [[intervalOverlap]] when
    * neither side fits a broadcast. */
  def intervalOverlapBroadcast(
      left: DataFrame,
      right: DataFrame,
      loA: String, hiA: String,
      loB: String, hiB: String,
      equiKeys: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType}
    val shared =
      left.columns.toSet.intersect(right.columns.toSet) -- equiKeys
    require(shared.isEmpty,
      s"intervalOverlapBroadcast requires left/right column names disjoint " +
        s"outside equiKeys; shared: ${shared.toSeq.sorted.mkString(", ")} — " +
        s"rename one side first")
    val working = Set("__rid", "__rids", "__ks")
    val reserved = (left.columns ++ right.columns).filter(working.contains) ++
      right.columns.filter(c => c.startsWith("__rk"))
    require(reserved.isEmpty,
      s"intervalOverlapBroadcast reserves __rid, __rids, __ks and __rk*; " +
        s"rename the caller's ${reserved.distinct.mkString(", ")}")
    val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
    Seq(loA -> left.schema(loA).dataType, hiA -> left.schema(hiA).dataType,
        loB -> right.schema(loB).dataType, hiB -> right.schema(hiB).dataType)
      .foreach { case (n, t) =>
        require(integral(t),
          s"intervalOverlapBroadcast requires integral interval bounds; " +
            s"$n is $t — cast upstream (epoch days/seconds/micros)")
      }
    equiKeys.foreach { k =>
      val t = left.schema(k).dataType
      require(integral(t) || t == StringType,
        s"intervalOverlapBroadcast equiKeys must be integral or string " +
          s"(they ride the concatenated cell key); $k is $t")
    }
    val spark = left.sparkSession
    val max = spark.conf.getOption(MaxBroadcastIntervalsKey)
      .map(_.toInt).getOrElse(MaxBroadcastIntervalsDefault)
    require(max >= 1, s"$MaxBroadcastIntervalsKey must be >= 1, got $max")
    // single integral key -> raw long cell keys (no per-row string
    // materialization, the Bloom integral-probe lesson); otherwise the
    // concatenated string key
    val integralKey =
      equiKeys.lengthCompare(1) == 0 && integral(left.schema(equiKeys.head).dataType)
    def keyCol(df: DataFrame): Column =
      if (integralKey) col(equiKeys.head).cast("long")
      else equiKeys match {
        case Seq() => lit("")
        case ks => // concat (NOT concat_ws): any null key nulls the row out
          concat(ks.flatMap(k =>
            Seq(col(k).cast("string"), lit("\u0001"))).init: _*)
      }
    // rid = monotonically_increasing_id PINNED by an eager
    // localCheckpoint: the index build and the join-back read the same
    // materialized numbering, and the join-back broadcast carries the
    // compact checkpointed frame instead of a driver-built
    // LocalRelation (which would serialize every payload row into the
    // plan — measured 1.5x SLOWER than the expansion join it is meant
    // to beat). Only the four slim index columns reach the driver,
    // bounded by limit(max+1) — the CalendarIndex guard pattern. The
    // cell key string is computed by the SAME Spark expression on both
    // sides, so driver/executor key agreement is by construction.
    val rightRid = right
      .withColumn("__rid", monotonically_increasing_id())
      .localCheckpoint()
    val slimDf = rightRid.select(keyCol(rightRid).as("__ks"),
        col(loB).cast("long").as("__lo"), col(hiB).cast("long").as("__hi"),
        col("__rid"))
      .filter(col("__ks").isNotNull && col("__hi") >= col("__lo"))
    // count-then-collect: the guard stays driver-bounded, and the
    // collect fetches partitions in parallel instead of funneling
    // through a GlobalLimit's single partition
    val nSlim = slimDf.limit(max + 1).count()
    require(nSlim <= max,
      s"intervalOverlapBroadcast collected more than $max right rows; " +
        s"raise $MaxBroadcastIntervalsKey or use intervalOverlap")
    val slim = slimDf.collect()
    val byKey = new scala.collection.mutable.HashMap[
      AnyRef, scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]]
    var i = 0
    while (i < slim.length) {
      val r = slim(i)
      val k: AnyRef =
        if (integralKey) java.lang.Long.valueOf(r.getLong(0)) else r.getString(0)
      byKey.getOrElseUpdate(k,
        new scala.collection.mutable.ArrayBuffer) +=
        ((r.getLong(1), r.getLong(2), r.getLong(3)))
      i += 1
    }
    val idx = new java.util.HashMap[AnyRef, graft.functions.OverlapRidsBcast.Bucket]
    byKey.foreach { case (k, v) =>
      idx.put(k, graft.functions.OverlapRidsBcast.bucketOf(v.toArray))
    }
    val bc = spark.sparkContext.broadcast(idx)
    val rightRenamed = rightRid.withColumnsRenamed(equiKeys.zipWithIndex
      .map { case (k, j) => k -> s"__rk$j" }.toMap)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val ridsCol = column(graft.functions.OverlapRidsBcast(
      expression(keyCol(left)),
      expression(col(loA).cast("long")),
      expression(col(hiA).cast("long")), bc))
    val joined = left
      .withColumn("__rid", explode(ridsCol))
      .join(broadcast(rightRenamed), Seq("__rid"))
    // exact key equality re-check: a multi-part concatenated key could
    // in principle collide across a \u0001 inside a string key part
    val checked = equiKeys.zipWithIndex.foldLeft(joined) {
      case (df, (k, j)) => df.filter(col(k) === col(s"__rk$j"))
    }
    val outCols = equiKeys ++
      left.columns.filterNot(equiKeys.contains) ++
      right.columns.filterNot(equiKeys.contains)
    checked.select(outCols.map(col): _*)
  }

  /** Per-key count of OVERLAPPING interval pairs with ZERO pair
    * materialization — the aggregation-only twin of [[intervalOverlap]]
    * + count, the same way [[stabbingCounts]] twins [[pointInInterval]].
    * Inclusive ends; a pair overlaps iff loA <= hiB && loB <= hiA.
    *
    * Complement counting: within a key holding n intervals, the
    * unordered pairs that do NOT overlap are exactly those with
    * hi_a < lo_b (strict; the two disjointness orders are mutually
    * exclusive since lo <= hi per row), so
    * `overlaps = n·(n−1)/2 − Σ_b #{a : hi_a < lo_b}`. The per-b counts
    * come from ONE per-key sweep: every interval contributes a lo
    * event and an hi event, sorted by (value, lo-before-hi); a running
    * count of hi events strictly before each lo event is the rank —
    * O(n log n) per key instead of the pair table's O(n²) on hot keys,
    * and nothing leaves the key's partition but the final row.
    *
    * `equiKeys` must be non-empty (they carve the corpus into cells,
    * as in [[intervalOverlap]]); null keys and degenerate intervals
    * are dropped, and only keys with >= 1 overlapping pair are
    * emitted — all matching the pair operator + count exactly
    * (RangeJoinSpec pins parity). */
  def overlapPairCounts(
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      equiKeys: Seq[String],
      outCol: String = "n_overlaps"): DataFrame = {
    require(equiKeys.nonEmpty,
      "overlapPairCounts requires equiKeys — a keyless corpus-wide " +
        "overlap count would funnel one window partition; carve cells " +
        "first or use intervalOverlap")
    // eager reserved-name check (advice r11): a caller column matching a
    // sweep working name would otherwise fail later as an ambiguous-
    // column AnalysisException instead of a clear message
    val working = Set("__v", "__t", "__n", "__nh", "__sep")
    val clash = (equiKeys :+ loCol :+ hiCol :+ outCol)
      .filter(working.contains) ++
      intervals.columns.filter(working.contains)
    require(clash.isEmpty,
      s"overlapPairCounts reserves the working column names " +
        s"${working.toSeq.sorted.mkString(", ")}; rename the caller's " +
        s"${clash.distinct.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val iv = intervals
      .filter(equiKeys.map(col(_).isNotNull).reduce(_ && _))
      .filter(col(hiCol) >= col(loCol))
    val ev = iv.select(equiKeys.map(col) :+ col(loCol).as("__v") :+
        lit(0).as("__t"): _*)
      .unionByName(iv.select(equiKeys.map(col) :+ col(hiCol).as("__v") :+
        lit(1).as("__t"): _*))
    // hi events at the same value sort AFTER lo events (__t), so the
    // preceding-rows frame counts exactly the STRICT hi_a < lo_b set;
    // ties among equal (value, tag) rows cannot change the sum
    val w = Window.partitionBy(equiKeys.map(col): _*)
      .orderBy(col("__v"), col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = ev.withColumn("__nh", coalesce(
      sum(when(col("__t") === 1, 1L).otherwise(0L)).over(w), lit(0L)))
    ranked.filter(col("__t") === 0)
      .groupBy(equiKeys.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum("__nh").as("__sep"))
      .select(equiKeys.map(col) :+
        (expr("__n * (__n - 1L) DIV 2") - col("__sep")).as(outCol): _*)
      .filter(col(outCol) > 0)
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
