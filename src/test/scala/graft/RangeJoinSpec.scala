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
}
