package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Quantiles

class QuantilesSpec extends AnyFunSuite with SparkSpec {

  private def df(vals: Seq[Double]): DataFrame = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
  }

  /** Brute-force percentile_disc: value at 1-based rank
    * max(1, ceil(j*N/q)) of the sorted values. */
  private def brute(vals: Seq[Double], q: Int): Seq[(Long, Double)] = {
    val sorted = vals.sorted
    val n = sorted.length.toLong
    (0L to q.toLong).map { j =>
      val rank = math.max(1L, (j * n + q - 1) / q)
      j -> sorted((rank - 1).toInt)
    }
  }

  test("deciles of a shuffled range match the order-statistic definition") {
    val vals = scala.util.Random.shuffle((1 to 1000).map(_.toDouble)).toSeq
    val out = Quantiles.exactQuantiles(df(vals), "v", q = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq == brute(vals, 10))
    // endpoints are min and max; rank column is the ceil formula
    assert(out.head._2 == 1.0 && out.last._2 == 1000.0)
  }

  test("heavy duplicates: one value can own several cut points") {
    val vals = Seq.fill(90)(5.0) ++ Seq(1.0, 2.0, 3.0, 4.0, 6.0,
      7.0, 8.0, 9.0, 10.0, 11.0)
    val out = Quantiles.exactQuantiles(df(vals), "v", q = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq == brute(vals, 4))
    assert(out.count(_._2 == 5.0) >= 3, out.toSeq.toString)
  }

  test("n smaller than q still yields q+1 rows (clamped ranks)") {
    val vals = Seq(10.0, 20.0, 30.0)
    val out = Quantiles.exactQuantiles(df(vals), "v", q = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.length == 11)
    assert(out.map(t => (t._1, t._3)).toSeq == brute(vals, 10))
    assert(out.head._2 == 1L && out.last._2 == 3L)
  }

  test("nulls are excluded and partitioning does not matter") {
    import spark.implicits._
    val vals = (1 to 500).map(_.toDouble)
    val withNulls = vals.map(v => (v.toLong, Some(v))) ++
      Seq((9001L, Option.empty[Double]), (9002L, Option.empty[Double]))
    val d = withNulls.toDF("id", "v")
    val one = Quantiles.exactQuantiles(d.repartition(1), "v", 5).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val many = Quantiles.exactQuantiles(d.repartition(7), "v", 5).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(one == many)
    assert(one == brute(vals, 5))
  }

  test("the rank pick is a bounded broadcast, never a global row sort") {
    val d = df((1 to 200).map(_.toDouble))
    val plan = Quantiles.exactQuantiles(d, "v", 10)
      .queryExecution.executedPlan.toString
    // the only sorts are within range partitions of the DISTINCT-value
    // histogram and the q+1-row presentation; no corpus-wide exchange
    // into a single partition ahead of a full sort
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(d, "v", 0)
    }
  }

  test("sampleQuantiles: deterministic draw, DKW-bounded rank error, " +
      "full-sample degeneracy") {
    import spark.implicits._
    val n = 20000
    val vals = (0 until n).map(i => (i.toLong, ((i * 7919) % n).toDouble))
      .toDF("id", "v")
    val got = Quantiles.sampleQuantiles(vals, "v", q = 10, k = 2000,
      keyCols = Seq("id")).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    // rank error: DKW at k=2000, delta=1e-3 gives eps ~ 0.0436; assert
    // each sampled decile's TRUE rank is within 2 eps of the target
    val eps = math.sqrt(math.log(2 / 1e-3) / (2 * 2000.0))
    (0 to 10).foreach { j =>
      val trueRank = got(j.toLong) / n // values are 0..n-1, rank ~ v/n
      assert(math.abs(trueRank - j / 10.0) <= 2 * eps,
        s"decile $j: sampled value rank $trueRank")
    }
    // deterministic across repartitionings
    val a = Quantiles.sampleQuantiles(vals, "v", 10, 2000, Seq("id"))
      .collect().toSeq
    val b = Quantiles.sampleQuantiles(vals.repartition(17), "v", 10, 2000,
      Seq("id")).collect().toSeq
    assert(a === b)
    // k >= N degenerates to the exact quantiles
    val small = (0 until 300).map(i => (i.toLong, (i % 37).toDouble))
      .toDF("id", "v")
    val exact = Quantiles.exactQuantiles(small, "v", 10).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val full = Quantiles.sampleQuantiles(small, "v", 10, k = 1000,
      keyCols = Seq("id")).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(full === exact)
  }
}
