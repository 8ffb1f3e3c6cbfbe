package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("point-in-interval: inclusive bounds, bucket-boundary straddles, degenerates dropped") {
    val points = Seq(0L, 5L, 10L, 15L, 99L).toDF("p")
    val intervals = Seq(
      (1L, 0L, 10L),   // covers 0, 5, 10 (inclusive both ends)
      (2L, 11L, 14L),  // covers none of the points
      (3L, 9L, 15L),   // straddles a width-10 bucket boundary: 10, 15
      (4L, 20L, 19L)   // hi < lo: degenerate, dropped
    ).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
        bucketWidth = 10)
      .select("iid", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 0L), (1L, 5L), (1L, 10L), (3L, 10L), (3L, 15L)))
  }

  test("matches the quadratic join on random data, plans NO nested loop") {
    val rnd = new scala.util.Random(3)
    val points = (1 to 300).map(_ => rnd.nextInt(1000).toLong).distinct.toDF("p")
    val intervals = (1 to 200).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, lo, lo + rnd.nextInt(50))
    }.toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
      bucketWidth = 25)
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "range join fell back to a quadratic join")
    val got = fast.select("iid", "p").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.crossJoin(intervals)
      .filter(col("lo") <= col("p") && col("p") <= col("hi"))
      .select("iid", "p").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("intervalOverlap: inclusive touch, one row per pair despite shared buckets") {
    val a = Seq((1L, 0L, 30L), (2L, 100L, 100L)).toDF("ida", "lo_a", "hi_a")
    val b = Seq(
      (10L, 30L, 40L),  // touches interval 1 at exactly 30 (inclusive)
      (11L, 5L, 25L),   // nested in interval 1: shares 3+ width-10 buckets
      (12L, 41L, 50L),  // disjoint from both
      (13L, 100L, 100L) // point-interval touch with 2
    ).toDF("idb", "lo_b", "hi_b")
    val out = RangeJoin.intervalOverlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b",
        bucketWidth = 10)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    // no duplicates: each pair attributed to its overlap-start bucket
    assert(out.length === out.distinct.length)
    assert(out.toSet === Set((1L, 10L), (1L, 11L), (2L, 13L)))
  }

  test("intervalOverlap matches the quadratic join with equi-keys, no nested loop") {
    val rnd = new scala.util.Random(9)
    def mk(pfx: String) = (1 to 150).map { i =>
      val lo = rnd.nextInt(500).toLong
      (i.toLong, (i % 5).toLong, lo, lo + rnd.nextInt(60))
    }.toDF(s"${pfx}id", "k", s"lo_$pfx", s"hi_$pfx")
    val a = mk("a"); val b = mk("b")
    val fast = RangeJoin.intervalOverlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b",
      bucketWidth = 30, equiKeys = Seq("k"))
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
    val got = fast.select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val want = a.join(b.withColumnRenamed("k", "k2"), col("k") === col("k2"))
      .filter(col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === want)
  }

  test("stabbingCounts equals pointInInterval + count, zero-coverage points report 0") {
    val rnd = new scala.util.Random(21)
    val points = (0L to 600L by 3L).toDF("p")
    val intervals = (1 to 250).map { _ =>
      val lo = rnd.nextInt(500).toLong
      (lo, lo + rnd.nextInt(40))
    }.toDF("lo", "hi")
    val sweep = RangeJoin.stabbingCounts(points, intervals, "p", "lo", "hi")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val joined = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
        bucketWidth = 20)
      .groupBy("p").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    points.collect().map(_.getLong(0)).foreach { p =>
      assert(sweep(p) === joined.getOrElse(p, 0L), s"point $p")
    }
    // points past every interval end must be zero, not carry the tail
    assert(sweep(600L) === 0L)
  }

  test("pathological interval spans fail fast with the conf hint") {
    val points = Seq(1L).toDF("p")
    val intervals = Seq((0L, 1000000L)).toDF("lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
        bucketWidth = 1, maxBucketsPerInterval = 100).count()
    }
    assert(e.getMessage.contains("widen bucketWidth") ||
      Option(e.getCause).exists(_.getMessage.contains("widen bucketWidth")))
  }

  test("pointInIntervalBroadcast: identical rows to the expansion join, no shuffle join") {
    val rnd = new scala.util.Random(11)
    // duplicate point rows + a payload column exercise the join-back:
    // multiplicity and payload must match the expansion operator's
    val points = ((1 to 200).map(_ => rnd.nextInt(500).toLong) ++ Seq(7L, 7L))
      .map(p => (p, s"tag$p")).toDF("p", "ptag")
    val intervals = (1 to 150).map { i =>
      val lo = rnd.nextInt(500).toLong
      (i.toLong, lo, lo + rnd.nextInt(40) - 2) // some degenerate hi < lo
    }.toDF("iid", "lo", "hi")
    val key = Seq("p", "ptag", "iid", "lo", "hi")
    def counted(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(key.map(col): _*).count().collect()
        .map(r => key.indices.map(r.get).toList -> r.getLong(key.length)).toMap
    val bcast = RangeJoin.pointInIntervalBroadcast(
      points, intervals, "p", "lo", "hi")
    assert(bcast.columns.toSeq === Seq("p", "ptag", "iid", "lo", "hi"))
    val want = counted(RangeJoin.pointInInterval(
      points, intervals, "p", "lo", "hi", bucketWidth = 20))
    assert(counted(bcast) === want && want.nonEmpty)
    // the interval side must NOT shuffle: the only join is the
    // broadcast equi-join back to the point frame
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("graft_points_in_range_bcast"),
      s"missing the spine kernel:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"broadcast variant planned a shuffle/nested-loop join:\n$plan")
  }

  test("pointInIntervalBroadcast: spine cap fails fast") {
    val points = (1L to 10L).toDF("p")
    val intervals = Seq((0L, 20L)).toDF("lo", "hi")
    spark.conf.set(RangeJoin.MaxBroadcastPointsKey, "3")
    try {
      val e = intercept[IllegalArgumentException] {
        RangeJoin.pointInIntervalBroadcast(points, intervals, "p", "lo", "hi")
      }
      assert(e.getMessage.contains(RangeJoin.MaxBroadcastPointsKey))
    } finally spark.conf.unset(RangeJoin.MaxBroadcastPointsKey)
  }

  test("overlapPairCounts equals intervalOverlap + count, pair-free") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map { i =>
      val lo = rnd.nextInt(300).toLong
      (s"k${rnd.nextInt(8)}", i.toLong, lo, lo + rnd.nextInt(30) - 2)
    } ++ Seq(("lone", 900L, 5L, 9L),          // single-interval key: no pairs
      (null.asInstanceOf[String], 901L, 1L, 9L)) // null key: dropped by both
    val base = rows.toDF("k", "lid", "lo", "hi")
    val a = base.select(col("k"), col("lid").as("lid_a"),
      col("lo").as("lo_a"), col("hi").as("hi_a"))
    val b = base.select(col("k"), col("lid").as("lid_b"),
      col("lo").as("lo_b"), col("hi").as("hi_b"))
    val want = RangeJoin.intervalOverlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b",
        bucketWidth = 10, equiKeys = Seq("k"))
      .filter(col("lid_a") < col("lid_b"))
      .groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = RangeJoin.overlapPairCounts(base, "lo", "hi", Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want && want.nonEmpty)
    val plan = RangeJoin.overlapPairCounts(base, "lo", "hi", Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"the sweep must not join:\n$plan")
    intercept[IllegalArgumentException] {
      RangeJoin.overlapPairCounts(base, "lo", "hi", Nil)
    }
  }

  test("colliding and reserved column names are rejected eagerly") {
    val points = Seq(1L).toDF("p")
    val intervals = Seq((0L, 2L)).toDF("lo", "hi")
    // a shared name would make the residual by-name filter ambiguous
    val shared = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumn("lo", lit(0L)),
        intervals, "p", "lo", "hi", bucketWidth = 10)
    }
    assert(shared.getMessage.contains("disjoint") &&
      shared.getMessage.contains("lo"))
    // __bk / __nb are working names on either side
    val reserved = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumn("__bk", lit(1L)),
        intervals, "p", "lo", "hi", bucketWidth = 10)
    }
    assert(reserved.getMessage.contains("__bk"))
    // intervalOverlap: names shared OUTSIDE equiKeys rejected …
    val a = Seq((1L, 0L, 3L)).toDF("k", "lo_a", "hi_a")
    val b = Seq((1L, 2L, 5L)).toDF("k", "lo_b", "hi_b")
    val ov = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a.withColumn("lo_b", lit(9L)), b,
        "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 10, equiKeys = Seq("k"))
    }
    assert(ov.getMessage.contains("disjoint"))
    // … while equiKeys themselves may (must) be shared
    val ok = RangeJoin.intervalOverlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b",
      bucketWidth = 10, equiKeys = Seq("k")).collect()
    assert(ok.length === 1)
    // overlapPairCounts: a caller column colliding with a sweep working
    // name fails with the clear require, not an AnalysisException
    val clash = intercept[IllegalArgumentException] {
      RangeJoin.overlapPairCounts(
        a.withColumnRenamed("lo_a", "__v"), "__v", "hi_a", Seq("k"))
    }
    assert(clash.getMessage.contains("__v"))
    val clash2 = intercept[IllegalArgumentException] {
      RangeJoin.overlapPairCounts(
        a.withColumn("__sep", lit(1)), "lo_a", "hi_a", Seq("k"))
    }
    assert(clash2.getMessage.contains("__sep"))
  }

  test("intervalOverlapBroadcast: identical rows to the expansion join, no shuffle") {
    val rnd = new scala.util.Random(43)
    // duplicate rows on both sides + degenerates + null keys/bounds,
    // so multiplicity and drop semantics are all exercised
    val leftRows = (0 until 400).map { i =>
      val lo = rnd.nextInt(300).toLong
      (if (i % 37 == 0) null else java.lang.Long.valueOf(rnd.nextInt(5).toLong),
        i.toLong % 350, // dup lids
        java.lang.Long.valueOf(lo),
        if (i % 41 == 0) null
        else java.lang.Long.valueOf(lo + rnd.nextInt(30) - 3)) // some hi<lo
    }
    val rightRows = (0 until 300).map { i =>
      val lo = rnd.nextInt(300).toLong
      (if (i % 31 == 0) null else java.lang.Long.valueOf(rnd.nextInt(5).toLong),
        i.toLong % 260,
        java.lang.Long.valueOf(lo),
        java.lang.Long.valueOf(lo + rnd.nextInt(25) - 2))
    }
    val a = leftRows.toDF("k", "lid_a", "lo_a", "hi_a")
    val b = rightRows.toDF("k", "lid_b", "lo_b", "hi_b")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("k", "lid_a", "lo_a", "hi_a", "lid_b", "lo_b", "hi_b")
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val expansion = RangeJoin.intervalOverlap(a, b,
      "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 7, equiKeys = Seq("k"))
    val bcast = RangeJoin.intervalOverlapBroadcast(a, b,
      "lo_a", "hi_a", "lo_b", "hi_b", equiKeys = Seq("k"))
    assert(canon(bcast) === canon(expansion))
    assert(canon(bcast).nonEmpty)
    assert(bcast.schema === expansion.schema)
    // plan: the only join is the broadcast rid join-back — the big side
    // is never exchanged and nothing nested-loops
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("graft_overlap_rids_bcast"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("NestedLoop"), plan)
    // empty equiKeys: one global cell, still exact
    val a0 = a.filter(col("k").isNotNull).drop("k")
    val b0 = b.filter(col("k").isNotNull).drop("k")
    def canon0(df: org.apache.spark.sql.DataFrame) = df
      .select("lid_a", "lo_a", "hi_a", "lid_b", "lo_b", "hi_b")
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    assert(canon0(RangeJoin.intervalOverlapBroadcast(a0, b0,
        "lo_a", "hi_a", "lo_b", "hi_b")) ===
      canon0(RangeJoin.intervalOverlap(a0, b0,
        "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 7)))
    // right-side cap fails fast with the conf key in the message
    spark.conf.set(RangeJoin.MaxBroadcastIntervalsKey, "10")
    try {
      val e = intercept[IllegalArgumentException] {
        RangeJoin.intervalOverlapBroadcast(a, b,
          "lo_a", "hi_a", "lo_b", "hi_b", equiKeys = Seq("k"))
      }
      assert(e.getMessage.contains(RangeJoin.MaxBroadcastIntervalsKey))
    } finally spark.conf.unset(RangeJoin.MaxBroadcastIntervalsKey)
    // non-integral bounds rejected eagerly, naming the column
    val bad = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlapBroadcast(
        a.withColumn("lo_a", col("lo_a").cast("double")), b,
        "lo_a", "hi_a", "lo_b", "hi_b", equiKeys = Seq("k"))
    }
    assert(bad.getMessage.contains("lo_a"))
  }

  test("intervalOverlapBroadcast join-back broadcast prunes unused payload") {
    // the checkpointed-rid frame carries every right column, but the
    // broadcast EXCHANGE must carry only what the query references —
    // the bytes-on-the-wire detail that matters when the broadcast
    // side has fat payloads (column pruning projects above the
    // ExistingRDD scan before the exchange)
    val a = spark.range(2000).select((col("id") % 40).as("k"),
      col("id").as("lid_a"), (col("id") % 300).as("lo_a"),
      (col("id") % 300 + 10).as("hi_a"))
    val b = spark.range(100).select((col("id") % 40).as("k"),
      col("id").as("lid_b"), (col("id") * 3 % 300).as("lo_b"),
      (col("id") * 3 % 300 + 8).as("hi_b"),
      concat(lit("x"), col("id")).as("fat_payload"))
    val slim = RangeJoin.intervalOverlapBroadcast(a, b,
        "lo_a", "hi_a", "lo_b", "hi_b", equiKeys = Seq("k"))
      .select("k", "lid_a", "lid_b") // fat_payload never referenced
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val joins = slim.queryExecution.sparkPlan.collect {
      case j: BroadcastHashJoinExec => j
    }
    assert(joins.nonEmpty, "expected the rid join-back broadcast join")
    joins.foreach { j =>
      // the build side is what the exchange will broadcast; its
      // projected output must not carry the unreferenced payload
      val buildOut = (j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
        case _ => j.left
      }).output.map(_.name)
      assert(!buildOut.contains("fat_payload"),
        s"unreferenced payload rode the broadcast: $buildOut")
      assert(buildOut.contains("__rid"), s"not the rid join-back: $buildOut")
    }
    // and when referenced, it IS there (the pin is pruning, not loss)
    val wide = RangeJoin.intervalOverlapBroadcast(a, b,
        "lo_a", "hi_a", "lo_b", "hi_b", equiKeys = Seq("k"))
      .select("k", "lid_a", "fat_payload")
    assert(wide.filter(col("fat_payload").isNotNull).count() > 0)
  }

  test("pointInIntervalBroadcast requires integral columns, keeps point type") {
    // a date/timestamp point would NPE at getLong or silently retype —
    // the eager require names the offending column instead
    val datePoints = Seq("2024-01-01").toDF("s")
      .select(to_date(col("s")).as("p"))
    val intervals = Seq((0L, 5L)).toDF("lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInIntervalBroadcast(datePoints, intervals, "p", "lo", "hi")
    }
    assert(e.getMessage.contains("integral") && e.getMessage.contains("p is"))
    // INT points stay INT in the output (schema parity with the
    // expansion join, which never retypes the point column)
    val intPoints = Seq(1, 3, 9).toDF("p")
    val got = RangeJoin.pointInIntervalBroadcast(
      intPoints, intervals, "p", "lo", "hi")
    assert(got.schema("p").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(got.select("p").collect().map(_.getInt(0)).sorted.toSeq ===
      Seq(1, 3))
  }
}
