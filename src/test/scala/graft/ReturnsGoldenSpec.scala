package graft

import java.time.Duration

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.FactorData
import graft.model.{Horizon, TradingCalendar}
import graft.perf.{Information, Returns}

/** Golden ports: mean_information_coefficient time rules
  * (test_performance.py:109-164), factor_returns (:556-597), and
  * factor_alpha_beta (:599-613) on the shared 2-day 4-asset fixture. */
class ReturnsGoldenSpec extends AnyFunSuite with SparkSpec {

  private val cal = TradingCalendar(Set(1, 2, 3, 4, 5, 6, 7), Set.empty)
  private val h1D = Horizon(1, "1D", Duration.ofDays(1))
  private val dates = Seq("2015-01-01", "2015-01-02")
  private val tickers = Seq("A", "B", "C", "D")
  private val groupOf = Map("A" -> "1", "B" -> "1", "C" -> "2", "D" -> "2")

  /** Row-major fixture over the 2×4 grid. */
  private def fd(factorVals: Seq[Double], retVals: Seq[Double]): FactorData = {
    val rows = for {
      (d, di) <- dates.zipWithIndex
      (a, ai) <- tickers.zipWithIndex
    } yield Row(ts(d), a, factorVals(di * 4 + ai), groupOf(a),
      retVals(di * 4 + ai))
    val schema = StructType(Seq(
      StructField("date", TimestampType), StructField("asset", StringType),
      StructField("factor", DoubleType), StructField("group", StringType),
      StructField("1D", DoubleType)))
    FactorData(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema), Seq(h1D), cal)
  }

  private val baseFactor = Seq(1.0, 2, 3, 4, 4, 3, 2, 1)

  test("mean IC golden: by_time=D") {
    val out = Information.meanInformationCoefficient(
      fd(baseFactor, Seq(4.0, 3, 2, 1, 1, 2, 3, 4)), byTime = Some("D"))
      .orderBy("date").collect().map(_.getAs[Double]("1D"))
    // exact-sum corr: sqrt(a)*sqrt(b) can land 1 ulp off a, so a perfect
    // anticorrelation is -1 + O(eps), not bitwise -1
    out.toSeq.zip(Seq(-1.0, -1.0)).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-12, s"$a != $e")
    }
  }

  test("mean IC golden: by_time=W buckets to week-ending Sunday") {
    val out = Information.meanInformationCoefficient(
      fd(baseFactor, Seq(1.0, 2, 3, 4, 4, 3, 2, 1)), byTime = Some("W"))
      .collect()
    assert(out.length === 1)
    assert(out.head.getTimestamp(0).toString.take(10) === "2015-01-04")
    assertClose(out.head.getAs[Double]("1D"), 1.0)
  }

  test("mean IC golden: by_group") {
    val out = Information.meanInformationCoefficient(
      fd(baseFactor, Seq(1.0, 2, 3, 4, 4, 3, 2, 1)), byGroup = true)
      .orderBy("group").collect()
    assert(out.map(_.getAs[String]("group")).toSeq === Seq("1", "2"))
    out.foreach(r => assertClose(r.getAs[Double]("1D"), 1.0))
  }

  test("mean IC golden: by_time=W x by_group") {
    val out = Information.meanInformationCoefficient(
      fd(baseFactor, Seq(1.0, 2, 3, 4, 4, 3, 2, 1)), byGroup = true,
      byTime = Some("W")).orderBy("date", "group").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getTimestamp(0).toString.take(10) === "2015-01-04")
      assertClose(r.getAs[Double]("1D"), 1.0)
    }
  }

  private val frCases = Seq(
    (Seq(1.0, 2, 3, 4, 4, 3, 2, 1), Seq(4.0, 3, 2, 1, 1, 2, 3, 4), false,
      Seq(-1.25, -1.25)),
    (Seq(1.0, 1, 1, 1, 1, 1, 1, 1), Seq(4.0, 3, 2, 1, 1, 2, 3, 4), false,
      Seq(Double.NaN, Double.NaN)),
    (Seq(1.0, 2, 3, 4, 4, 3, 2, 1), Seq(4.0, 3, 2, 1, 1, 2, 3, 4), true,
      Seq(-0.5, -0.5)),
    (Seq(1.0, 2, 3, 4, 1, 2, 3, 4), Seq(1.0, 4, 1, 2, 1, 2, 2, 1), true,
      Seq(1.0, 0.0)),
    (Seq(1.0, 1, 1, 1, 1, 1, 1, 1), Seq(4.0, 3, 2, 1, 1, 2, 3, 4), true,
      Seq(Double.NaN, Double.NaN)))

  for (((factorVals, retVals, ga, expected), i) <- frCases.zipWithIndex)
    test(s"factor_returns golden case $i: groupAdjust=$ga") {
      val out = Returns.factorReturns(fd(factorVals, retVals),
        demeaned = true, groupAdjust = ga)
        .orderBy("date").collect()
        .map(r => if (r.isNullAt(1)) Double.NaN else r.getAs[Double]("1D"))
      assert(out.length === expected.length)
      out.zip(expected).foreach { case (a, e) =>
        if (e.isNaN) assert(a.isNaN || a == 0.0,
          s"expected NaN-ish, got $a") // constant factor: no weights
        else assertClose(a, e, 1e-9)
      }
    }

  test("factor_alpha_beta golden: alpha=-1, beta=5/6") {
    val out = Returns.factorAlphaBeta(
      fd(baseFactor, Seq(1.0, 2, 3, 4, 1, 1, 1, 1)))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("1D")).toMap
    assertClose(out("Ann. alpha"), -1.0, 1e-9)
    assertClose(out("beta"), 5.0 / 6.0, 1e-9)
  }
}
