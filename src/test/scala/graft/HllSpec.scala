package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Hll

class HllSpec extends AnyFunSuite with SparkSpec {

  private def estimate(keys: Seq[String], p: Int = 10): Double = {
    import spark.implicits._
    Hll.distinctEstimate(
      keys.map(k => ("g", k)).toDF("g", "k"), col("k"), Seq("g"), p)
      .head.getDouble(1)
  }

  test("raw-range estimate lands within the classic error band") {
    // 20k distinct >> 2.5m at p=10 -> the raw harmonic path; the
    // standard error is 1.04/sqrt(1024) ~ 3.25%, assert 4 sigma
    val n = 20000
    val est = estimate((1 to n).map(i => s"key-$i"))
    assert(math.abs(est / n - 1.0) < 0.13, s"est=$est for n=$n")
  }

  test("small-range estimate uses linear counting and is tight") {
    // 100 distinct << 2.5m -> linear counting, typically sub-1% here
    val n = 100
    val est = estimate((1 to n).map(i => s"lc-$i"))
    assert(math.abs(est / n - 1.0) < 0.05, s"est=$est for n=$n")
  }

  test("estimate depends only on the distinct key set") {
    val keys = (1 to 5000).map(i => s"dup-$i")
    val once = estimate(keys)
    val thrice = estimate(keys ++ keys ++ keys)
    assert(once == thrice) // identical registers, identical bits
  }

  test("build is partition-independent (bitwise)") {
    import spark.implicits._
    val df = (1 to 8000).map(i => ("g", s"pi-$i")).toDF("g", "k")
    val a = Hll.distinctEstimate(df.repartition(1), col("k"), Seq("g"), 10)
      .head.getDouble(1)
    val b = Hll.distinctEstimate(df.repartition(13), col("k"), Seq("g"), 10)
      .head.getDouble(1)
    assert(a == b)
  }

  test("groups estimate independently") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => ("big", s"k-$i")) ++
      (1 to 40).map(i => ("small", s"s-$i"))
    val out = Hll.distinctEstimate(rows.toDF("g", "k"), col("k"), Seq("g"), 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("big") / 3000.0 - 1.0) < 0.13)
    assert(math.abs(out("small") / 40.0 - 1.0) < 0.1)
  }

  test("merged register sketches equal the sketch of the union, bitwise") {
    import spark.implicits._
    // overlapping batches: A = 1..6000, B = 4000..9000
    val a = (1 to 6000).map(i => ("g", s"u-$i")).toDF("g", "k")
    val b = (4000 to 9000).map(i => ("g", s"u-$i")).toDF("g", "k")
    val union = a.unionByName(b)
    val viaMerge = Hll.estimateFromRegisters(
      Hll.mergeRegisters(Seq(
        Hll.registerTable(a, col("k"), Seq("g"), 10),
        Hll.registerTable(b, col("k"), Seq("g"), 10)), Seq("g")),
      Seq("g"), 10).head.getDouble(1)
    val direct = Hll.distinctEstimate(union, col("k"), Seq("g"), 10)
      .head.getDouble(1)
    assert(viaMerge == direct) // identical registers -> identical bits
    assert(math.abs(viaMerge / 9000.0 - 1.0) < 0.13)
  }

  test("p outside [9, 14] is rejected") {
    import spark.implicits._
    val df = Seq(("g", "x")).toDF("g", "k")
    intercept[IllegalArgumentException] {
      Hll.distinctEstimate(df, col("k"), Seq("g"), 8)
    }
    intercept[IllegalArgumentException] {
      Hll.distinctEstimate(df, col("k"), Seq("g"), 15)
    }
  }

  test("register build partial-aggregates (no raw keys cross the shuffle)") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", s"pa-$i")).toDF("g", "k").repartition(4)
    val plan = Hll.distinctEstimate(df, col("k"), Seq("g"), 10)
      .queryExecution.executedPlan.toString
    // two-phase hash aggregation around each exchange: partial_max on
    // the mapper side is what bounds per-partition output at m rows
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      plan)
  }
}
