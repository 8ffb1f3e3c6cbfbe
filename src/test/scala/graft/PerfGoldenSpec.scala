package graft

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.FactorData
import graft.model.{Horizon, TradingCalendar}
import graft.perf.{Cumulative, EventStudy, Information, Returns, Turnover}

/** Golden-value ports of the reference's operator tests
  * (alphalens/tests/test_performance.py) — same fixtures, same expected
  * frames. */
class PerfGoldenSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val cal = TradingCalendar(Set(1, 2, 3, 4, 5, 6, 7), Set.empty)
  private val h1D = Horizon(1, "1D", Duration.ofDays(1))

  /** factor_data fixture builder: row-major (date-major) values over a
    * date range and tickers; NaN cells dropped (long format). */
  private def fdFixture(
      dates: Seq[String],
      tickers: Seq[String],
      factorRows: Seq[Seq[Double]],
      groupOf: Map[String, String] = Map.empty,
      retRows: Seq[Seq[Double]] = Nil,
      quantOf: Map[String, Int] = Map.empty): FactorData = {
    val rows = for {
      (d, di) <- dates.zipWithIndex
      (a, ai) <- tickers.zipWithIndex
      if !factorRows(di)(ai).isNaN
    } yield Row(
      ts(d), a, factorRows(di)(ai),
      if (groupOf.isEmpty) null else groupOf(a),
      if (retRows.isEmpty) null else java.lang.Double.valueOf(retRows(di)(ai)),
      if (quantOf.isEmpty) null else java.lang.Integer.valueOf(quantOf(a)))
    val schema = StructType(Seq(
      StructField("date", TimestampType), StructField("asset", StringType),
      StructField("factor", DoubleType), StructField("group", StringType),
      StructField("1D", DoubleType), StructField("factor_quantile", IntegerType)))
    FactorData(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema), Seq(h1D), cal)
  }

  private val icDates = Seq("2015-01-01", "2015-01-02")
  private val icTickers = Seq("A", "B", "C", "D")
  private val icFactor = Seq(Seq(1.0, 2, 3, 4), Seq(4.0, 3, 2, 1))
  private val icGroups = Map("A" -> "1", "B" -> "1", "C" -> "2", "D" -> "2")

  // test_information_coefficient (test_performance.py:66-107)
  for ((rets, ga, bg, expected) <- Seq(
    (Seq(Seq(4.0, 3, 2, 1), Seq(1.0, 2, 3, 4)), false, false,
      Map(("2015-01-01", "") -> -1.0, ("2015-01-02", "") -> -1.0)),
    (Seq(Seq(1.0, 2, 3, 4), Seq(4.0, 3, 2, 1)), false, false,
      Map(("2015-01-01", "") -> 1.0, ("2015-01-02", "") -> 1.0)),
    (Seq(Seq(1.0, 2, 3, 4), Seq(4.0, 3, 2, 1)), false, true,
      Map(("2015-01-01", "1") -> 1.0, ("2015-01-01", "2") -> 1.0,
        ("2015-01-02", "1") -> 1.0, ("2015-01-02", "2") -> 1.0)),
    (Seq(Seq(1.0, 2, 3, 4), Seq(4.0, 3, 2, 1)), true, true,
      Map(("2015-01-01", "1") -> 1.0, ("2015-01-01", "2") -> 1.0,
        ("2015-01-02", "1") -> 1.0, ("2015-01-02", "2") -> 1.0))))
    test(s"IC golden: groupAdjust=$ga byGroup=$bg ic=${expected.values.head}") {
      val fd = fdFixture(icDates, icTickers, icFactor, icGroups, rets)
      val ic = Information.factorInformationCoefficient(fd, ga, bg)
      val out = ic.collect().map { r =>
        val d = r.getTimestamp(0).toString.take(10)
        val g = if (bg) r.getAs[String]("group") else ""
        (d, g) -> r.getAs[Double]("1D")
      }.toMap
      assert(out.keySet === expected.keySet)
      expected.foreach { case (k, v) => assertClose(out(k), v, 1e-9) }
    }

  // test_factor_weights — all 8 flag combos (test_performance.py:437-554)
  private val wTickers = Seq("A", "B", "C", "D", "E")
  private val wGroups = Map("A" -> "Group1", "B" -> "Group2", "C" -> "Group1",
    "D" -> "Group2", "E" -> "Group1")
  private val nan = Double.NaN
  private val weightCases: Seq[(Seq[Seq[Double]], Boolean, Boolean, Boolean, Seq[Double])] = Seq(
    (Seq(Seq(3, 4, 2, 1, nan), Seq(3, 4, -2, -1, nan), Seq(3, nan, nan, 1, 4)),
      false, false, false,
      Seq(0.30, 0.40, 0.20, 0.10, 0.30, 0.40, -0.20, -0.10, 0.375, 0.125, 0.50)),
    (Seq(Seq(3, 4, 2, 1, nan), Seq(3, 4, -2, -1, nan), Seq(3, nan, nan, 1, 4)),
      true, false, false,
      Seq(0.125, 0.375, -0.125, -0.375, 0.20, 0.30, -0.30, -0.20, 0.10, -0.50, 0.40)),
    (Seq(Seq(3, 4, 2, 1, nan), Seq(-3, 4, -2, 1, nan), Seq(2, 2, 2, 3, 1)),
      false, true, false,
      Seq(0.30, 0.40, 0.20, 0.10, -0.30, 0.40, -0.20, 0.10, 0.20, 0.20, 0.20, 0.30, 0.10)),
    (Seq(Seq(3, 4, 2, 1, nan), Seq(3, 4, -2, -1, nan), Seq(3, nan, nan, 1, 4)),
      true, true, false,
      Seq(0.25, 0.25, -0.25, -0.25, 0.25, 0.25, -0.25, -0.25, -0.50, nan, 0.50)),
    (Seq(Seq(3, 4, 2, 1, 5), Seq(3, 4, -2, -1, 5), Seq(3, nan, nan, 1, nan)),
      false, false, true,
      Seq(0.20, 0.20, 0.20, 0.20, 0.20, 0.20, 0.20, -0.20, -0.20, 0.20, 0.50, 0.50)),
    (Seq(Seq(1, 4, 2, 3, nan), Seq(1, 4, -2, -3, nan), Seq(3, nan, nan, 2, 7)),
      true, false, true,
      Seq(-0.25, 0.25, -0.25, 0.25, 0.25, 0.25, -0.25, -0.25, 0.0, -0.50, 0.50)),
    (Seq(Seq(3, 4, 2, 1, nan), Seq(-3, 4, -2, 1, nan), Seq(3, nan, nan, 1, 4),
      Seq(3, nan, nan, -1, 4), Seq(3, nan, nan, 1, -4)),
      false, true, true,
      Seq(0.25, 0.25, 0.25, 0.25, -0.25, 0.25, -0.25, 0.25, 0.25, 0.50, 0.25,
        0.25, -0.50, 0.25, 0.25, 0.50, -0.25)),
    (Seq(Seq(1, 4, 2, 3, nan), Seq(3, 4, -2, -1, nan), Seq(3, nan, nan, 2, 7),
      Seq(3, nan, nan, 2, -7)),
      true, true, true,
      Seq(-0.25, 0.25, 0.25, -0.25, 0.25, 0.25, -0.25, -0.25, -0.50, nan, 0.50,
        0.50, nan, -0.50)))

  for (((factorRows, dm, ga, eq), i) <- weightCases.map(c => (c._1, c._2, c._3, c._4)).zipWithIndex)
    test(s"factor_weights golden combo $i: demeaned=$dm groupAdjust=$ga equalWeight=$eq") {
      val expectedVals = weightCases(i)._5
      val dates = (0 until factorRows.size).map(d => f"2000-01-${12 + d}%02d")
      val fd = fdFixture(dates, wTickers, factorRows, wGroups)
      val out = Returns.factorWeights(fd, dm, ga, eq)
        .orderBy("date", "asset").collect()
        .map(r => if (r.isNullAt(r.fieldIndex("weight"))) Double.NaN
             else r.getAs[Double]("weight"))
      assert(out.length === expectedVals.length)
      out.zip(expectedVals).foreach { case (a, e) => assertClose(a, e, 1e-9) }
    }

  // test_mean_return_by_quantile (test_performance.py:166-263) — full
  // ingest with equal-width bins, then the two-stage estimator
  private val mrTickers = Seq("A", "B", "C", "D", "E", "F")
  private val mrGroups = Map("A" -> "1", "B" -> "1", "C" -> "1",
    "D" -> "2", "E" -> "2", "F" -> "2")
  private val mrCases = Seq(
    (Seq(1.1, 1.2, 1.1, 1.2, 1.1, 1.2),
      Seq(Seq(1.0, 2, 1, 2, 1, 2), Seq(1.0, 2, 1, 2, 1, 2), Seq(1.0, 2, 1, 2, 1, 2)),
      2, false, Seq(0.1, 0.2)),
    (Seq(1.1, 1.2, 1.1, 1.2, 1.1, 1.2),
      Seq(Seq(1.0, 2, 1, 2, 1, 2), Seq(1.0, 2, 1, 2, 1, 2), Seq(1.0, 2, 1, 2, 1, 2)),
      2, true, Seq(0.1, 0.1, 0.2, 0.2)),
    (Seq(1.1, 1.1, 1.1, 1.2, 1.2, 1.2),
      Seq(Seq(1.0, 2, 3, 1, 2, 3), Seq(1.0, 2, 3, 1, 2, 3), Seq(1.0, 2, 3, 1, 2, 3)),
      3, false, Seq(0.15, 0.15, 0.15)),
    (Seq(1.1, 1.1, 1.1, 1.2, 1.2, 1.2),
      Seq(Seq(1.0, 2, 3, 1, 2, 3), Seq(1.0, 2, 3, 1, 2, 3), Seq(1.0, 2, 3, 1, 2, 3)),
      3, true, Seq(0.1, 0.2, 0.1, 0.2, 0.1, 0.2)),
    (Seq(1.5, 1.5, 1.2, 1.0, 1.0, 1.0),
      Seq(Seq(1.0, 1, 2, 2, 2, 2), Seq(2.0, 2, 1, 2, 2, 2), Seq(2.0, 2, 1, 2, 2, 2)),
      2, false, Seq(0.3, 0.15)),
    (Seq(1.5, 1.5, 1.2, 1.0, 1.0, 1.0),
      Seq(Seq(1.0, 1, 3, 2, 2, 2), Seq(3.0, 3, 1, 2, 2, 2), Seq(3.0, 3, 1, 2, 2, 2)),
      3, false, Seq(0.3, 0.0, 0.4)),
    (Seq(1.6, 1.6, 1.0, 1.0, 1.0, 1.0),
      Seq(Seq(1.0, 1, 2, 2, 2, 2), Seq(2.0, 2, 1, 1, 1, 1), Seq(2.0, 2, 1, 1, 1, 1)),
      2, false, Seq(0.2, 0.4)),
    (Seq(1.6, 1.6, 1.0, 1.6, 1.6, 1.0),
      Seq(Seq(1.0, 1, 2, 1, 1, 2), Seq(2.0, 2, 1, 2, 2, 1), Seq(2.0, 2, 1, 2, 2, 1)),
      2, true, Seq(0.2, 0.2, 0.4, 0.4)))

  for (((dailyRets, factorRows, bins, byGroup, expected), i) <- mrCases.zipWithIndex)
    test(s"mean_return_by_quantile golden case $i: bins=$bins byGroup=$byGroup") {
      val dates = (11 to 14).map(d => s"2015-01-$d")
      val priceRows = (1 to 4).map(i => dailyRets.map(r => math.pow(r, i)))
      val prices = longPanel(dates, mrTickers, priceRows, "price")
      val factor = longPanel(dates.take(3), mrTickers, factorRows, "factor")
      val groupDf = mrGroups.toSeq.toDF("asset", "group")
      val fd = graft.ingest.CleanFactor.getCleanFactorAndForwardReturns(
        spark, factor, prices, groupby = Some(groupDf),
        spec = graft.ingest.Quantize.BinsInt(bins), periods = Seq(1),
        filterZscore = None, verbose = false)
      val mqr = Returns.meanReturnByQuantile(fd, byDate = false,
        byGroup = byGroup, demeaned = false, groupAdjust = false)
      val label = fd.horizons.head.label
      val out =
        if (byGroup)
          mqr.orderBy("factor_quantile", "group").collect()
            .map(_.getAs[Double](label))
        else mqr.orderBy("factor_quantile").collect().map(_.getAs[Double](label))
      assert(out.length === expected.length)
      out.zip(expected).foreach { case (a, e) => assertClose(a, e, 1e-6) }
    }

  // test_quantile_turnover (test_performance.py:265-435), distinct cases
  private val toCases = Seq(
    (Seq(Seq(1.0, 2, 3, 4), Seq(4.0, 3, 2, 1), Seq(1.0, 2, 3, 4), Seq(1.0, 2, 3, 4)),
      4, 1, Seq(1.0, 1.0, 0.0)),
    (Seq(Seq(1.0, 2, 3, 4), Seq(4.0, 3, 2, 1), Seq(1.0, 2, 3, 4), Seq(1.0, 2, 3, 4)),
      4, 2, Seq(0.0, 1.0)),
    (Seq(Seq(1.0, 2, 3, 4), Seq(4.0, 3, 2, 1), Seq(1.0, 2, 3, 4), Seq(1.0, 2, 3, 4)),
      4, 3, Seq(0.0)),
    (Seq(Seq(1.0, 2, 3, 4), Seq(1.0, 2, 3, 4), Seq(1.0, 2, 3, 4), Seq(1.0, 2, 3, 4)),
      3, 1, Seq(0.0, 0.0, 0.0)),
    (Seq(Seq(1.0, 2, 3, 4), Seq(4.0, 3, 2, 1), Seq(1.0, 2, 3, 4), Seq(4.0, 3, 2, 1)),
      2, 1, Seq(1.0, 1.0, 1.0)),
    // the long-period sequences (test_performance.py:349-412): 12 dates
    // alternating two quantile layouts, lag 4 / lag 10
    (Seq(Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4), Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4),
      Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4), Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4),
      Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4), Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4)),
      3, 4, Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
    (Seq(Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4), Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4),
      Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4), Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4),
      Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4), Seq(1.0, 2, 3, 4), Seq(1.0, 2, 3, 4)),
      3, 10, Seq(0.0, 1.0)))

  for (((quantRows, q, period, expected), i) <- toCases.zipWithIndex)
    test(s"quantile_turnover golden case $i: quantile=$q period=$period") {
      val dates = (0 until quantRows.size).map(d => f"2015-01-${1 + d}%02d")
      val rows = for {
        (d, di) <- dates.zipWithIndex
        (a, ai) <- Seq("A", "B", "C", "D").zipWithIndex
      } yield (ts(d), a, quantRows(di)(ai).toInt)
      val df = rows.toDF("date", "asset", "factor_quantile")
      val fd = FactorData(df, Seq(h1D), cal)
      val out = Turnover.quantileTurnover(fd, q, period)
        .orderBy("date").collect().map(_.getAs[Double]("turnover"))
      assert(out.length === expected.length)
      out.zip(expected).foreach { case (a, e) => assertClose(a, e, 1e-9) }
    }

  // test_cumulative_returns (test_performance.py:615-692)
  for (((rets, expected), i) <- Seq(
    (Seq(1.0, 0.5, 1.0, 0.5, 0.5), Seq(2.0, 3.0, 6.0, 9.0, 13.50)),
    (Seq(0.1, 0.1, 0.1, 0.1, 0.1), Seq(1.1, 1.21, 1.331, 1.4641, 1.61051)),
    (Seq(-0.1, -0.1, -0.1, -0.1, -0.1), Seq(0.9, 0.81, 0.729, 0.6561, 0.59049))).zipWithIndex)
    test(s"cumulative_returns golden case $i") {
      val dates = (0 until rets.size).map(d => f"1999-01-${1 + d}%02d")
      val df = dates.zip(rets).map { case (d, r) => (ts(d), r) }.toDF("date", "ret")
      val out = Cumulative.cumulativeReturns(df, "ret")
        .orderBy("date").collect().map(_.getAs[Double]("cum_ret"))
      out.zip(expected).foreach { case (a, e) => assertClose(a, e, 1e-6) }
    }

  // test_factor_rank_autocorrelation (test_performance.py:694-773)
  private val acCases = Seq(
    (Seq(Seq(1.0, 2, 3, 4), Seq(1.0, 2, 3, 4), Seq(1.0, 2, 3, 4), Seq(1.0, 2, 3, 4)),
      1, Seq(1.0, 1.0, 1.0)),
    (Seq(Seq(4.0, 3, 2, 1), Seq(1.0, 2, 3, 4), Seq(4.0, 3, 2, 1), Seq(1.0, 2, 3, 4)),
      1, Seq(-1.0, -1.0, -1.0)),
    (Seq(
      Seq(1.0, 2, 3, 4), Seq(2.0, 1, 4, 3), Seq(4.0, 3, 2, 1), Seq(1.0, 2, 3, 4),
      Seq(2.0, 1, 4, 3), Seq(4.0, 3, 2, 1), Seq(2.0, 1, 4, 3), Seq(4.0, 3, 2, 1),
      Seq(1.0, 2, 3, 4), Seq(2.0, 1, 4, 3), Seq(2.0, 1, 4, 3), Seq(4.0, 3, 2, 1)),
      3, Seq(1.0, 1.0, 1.0, 0.6, -0.6, -1.0, 1.0, -0.6, -1.0)))

  for (((factorRows, period, expected), i) <- acCases.zipWithIndex)
    test(s"factor_rank_autocorrelation golden case $i: period=$period") {
      val dates = (0 until factorRows.size).map(d => f"2015-01-${1 + d}%02d")
      val fd = fdFixture(dates, Seq("A", "B", "C", "D"), factorRows)
      val out = Turnover.factorRankAutocorrelation(fd, period)
        .orderBy("date").collect().map(_.getAs[Double]("autocorr"))
      assert(out.length === expected.length)
      out.zip(expected).foreach { case (a, e) => assertClose(a, e, 1e-9) }
    }

  // ---- event-study fixtures (test_performance.py:775-1042) ------------

  /** (date, asset, ret) LEVEL series r^i over a date range. */
  private def levelPanel(dates: Seq[String], rs: Seq[Double]): DataFrame = {
    val tickers = Seq("A", "B", "C", "D")
    val rows = for {
      (d, di) <- dates.zipWithIndex
      (a, ai) <- tickers.zipWithIndex
    } yield (ts(d), a, math.pow(rs(ai), di + 1))
    rows.toDF("date", "asset", "ret")
  }

  private def dateRange(start: String, n: Int): Seq[String] = {
    val d0 = java.time.LocalDate.parse(start)
    (0 until n).map(i => d0.plusDays(i).toString)
  }

  // test_common_start_returns — all 8 cases
  private val csrDates = dateRange("2015-01-17", 17)
  private val csrEvDates = dateRange("2015-01-21", 9)
  private val csrCases: Seq[(Int, Int, Boolean, Boolean, Seq[(Double, Double)])] = Seq(
    (2, 3, false, false, Seq((4.93048307, 8.68843922), (6.60404312, 12.22369139),
      (8.92068367, 17.1794088), (12.1275523, 24.12861778), (16.5694159, 33.8740100),
      (22.7273233, 47.53995233))),
    (3, 2, false, true, Seq((0.0, 5.63219176), (0.0, 7.96515233), (0.0, 11.2420646),
      (0.0, 15.8458720), (0.0, 22.3134160), (0.0, 31.3970961))),
    (3, 5, true, false, Seq((3.7228318, 2.6210478), (4.9304831, 3.6296796),
      (6.6040431, 5.0193734), (8.9206837, 6.9404046), (12.127552, 9.6023405),
      (16.569416, 13.297652), (22.727323, 18.434747), (31.272682, 25.584180),
      (34.358565, 25.497254))),
    (1, 4, true, true, Seq((0.0, 0.0), (0.0, 0.0), (0.0, 0.0), (0.0, 0.0),
      (0.0, 0.0), (0.0, 0.0))),
    (6, 6, false, false, Seq((2.02679565, 2.38468223), (2.38769454, 3.22602748),
      (2.85413029, 4.36044469), (3.72283181, 6.16462715), (4.93048307, 8.68843922),
      (6.60404312, 12.2236914), (8.92068367, 17.1794088), (12.1275523, 24.1286178),
      (16.5694159, 33.8740100), (22.7273233, 47.5399523), (31.2726821, 66.7013483),
      (34.3585654, 70.1828776), (37.9964585, 74.3294620))),
    (6, 6, false, true, Seq((0.0, 2.20770299), (0.0, 2.95942924), (0.0, 3.97022414),
      (0.0, 5.63219176), (0.0, 7.96515233), (0.0, 11.2420646), (0.0, 15.8458720),
      (0.0, 22.3134160), (0.0, 31.3970962), (0.0, 44.1512888), (0.0, 62.0533954),
      (0.0, 65.8668371), (0.0, 70.4306483))),
    (6, 6, true, false, Seq((2.0267957, 0.9562173), (2.3876945, 1.3511898),
      (2.8541303, 1.8856194), (3.7228318, 2.6210478), (4.9304831, 3.6296796),
      (6.6040431, 5.0193734), (8.9206837, 6.9404046), (12.127552, 9.6023405),
      (16.569416, 13.297652), (22.727323, 18.434747), (31.272682, 25.584180),
      (34.358565, 25.497254), (37.996459, 25.198051))),
    (6, 6, true, true, Seq.fill(13)((0.0, 0.0))))

  for (((before, after, meanByDate, demeaned, expected), i) <- csrCases.zipWithIndex)
    test(s"common_start_returns golden case $i: before=$before after=$after " +
      s"meanByDate=$meanByDate demeaned=$demeaned") {
      val levels = levelPanel(csrDates, Seq(1.20, 1.40, 0.90, 0.80))
      val events = (for (d <- csrEvDates; a <- Seq("A", "B", "C", "D"))
        yield (ts(d), a)).toDF("date", "asset")
      val dm = if (demeaned) Some(events) else None
      val csr = EventStudy.commonStartReturns(events, levels, before, after,
        meanByDate, dm)
      val out = csr.groupBy("offset")
        .agg(avg("value").as("mean"), stddev_samp(col("value")).as("std"))
        .orderBy("offset").collect()
        .map(r => (r.getAs[Double]("mean"), r.getAs[Double]("std")))
      assert(out.length === expected.length)
      out.zip(expected).foreach { case ((am, as_), (em, es)) =>
        assertClose(am, em, 1e-6); assertClose(as_, es, 1e-6)
      }
    }

  // test_average_cumulative_return_by_quantile — raw-level cases
  private val acrDates = dateRange("2015-01-15", 18)
  private val acrEvDates = dateRange("2015-01-21", 6)
  private val q4 = Map("A" -> 3, "B" -> 4, "C" -> 2, "D" -> 1)
  private val q2 = Map("A" -> 2, "B" -> 2, "C" -> 1, "D" -> 1)
  private val acrCases: Seq[(Int, Int, Boolean, Map[String, Int], Seq[Seq[Double]])] = Seq(
    (1, 2, false, q4, Seq(
      Seq(0.00512695, 0.00256348, 0.00128174, 6.40869e-4),
      Seq(0.00579185, 0.00289592, 0.00144796, 7.23981e-4),
      Seq(1.0, 1.0, 1.0, 1.0),
      Seq(0.0, 0.0, 0.0, 0.0),
      Seq(7.15814531, 8.94768164, 11.1846020, 13.9807526),
      Seq(2.93784787, 3.67230984, 4.59038730, 5.73798413),
      Seq(39.4519043, 59.1778564, 88.7667847, 133.150177),
      Seq(28.3717330, 42.5575995, 63.8363992, 95.7545989))),
    (1, 2, true, q4, Seq(
      Seq(-11.898667, -17.279462, -25.236885, -37.032252),
      Seq(7.82587034, 11.5529583, 17.0996881, 25.3636472),
      Seq(-10.903794, -16.282025, -24.238167, -36.032893),
      Seq(7.82140124, 11.5507268, 17.0985737, 25.3630906),
      Seq(-4.7456488, -8.3343438, -14.053565, -23.052140),
      Seq(4.91184665, 7.91180853, 12.5481552, 19.6734224),
      Seq(27.5481102, 41.8958311, 63.5286176, 96.1172844),
      Seq(20.5510133, 31.0075980, 46.7385910, 70.3923129))),
    (0, 3, true, q4, Seq(
      Seq(-17.279462, -25.236885, -37.032252, -54.550061),
      Seq(11.5529583, 17.0996881, 25.3636472, 37.6887906),
      Seq(-16.282025, -24.238167, -36.032893, -53.550382),
      Seq(11.5507268, 17.0985737, 25.3630906, 37.6885125),
      Seq(-8.3343438, -14.053565, -23.052140, -37.074441),
      Seq(7.91180853, 12.5481552, 19.6734224, 30.5748605),
      Seq(41.8958311, 63.5286176, 96.1172844, 145.174884),
      Seq(31.0075980, 46.7385910, 70.3923129, 105.944230))),
    (3, 3, false, q2, Seq(
      Seq(0.5102539, 0.50512695, 0.50256348, 0.50128174, 0.50064087, 0.50032043, 0.50016022),
      Seq(0.0115837, 0.00579185, 0.00289592, 1.44796e-3, 7.23981e-4, 3.61990e-4, 1.80995e-4),
      Seq(11.057696, 16.0138929, 23.3050248, 34.0627690, 49.9756934, 73.5654648, 108.600603),
      Seq(7.2389454, 10.6247239, 15.6450367, 23.1025693, 34.1977045, 50.7264595, 75.3771641))),
    (3, 3, true, q2, Seq(
      Seq(-5.273721, -7.754383, -11.40123, -16.78074, -24.73753, -36.53257, -54.05022),
      Seq(3.6239580, 5.3146000, 7.8236356, 11.551843, 17.099131, 25.363369, 37.688652),
      Seq(5.2737212, 7.7543830, 11.401231, 16.780744, 24.737526, 36.532572, 54.050221),
      Seq(3.6239580, 5.3146000, 7.8236356, 11.551843, 17.099131, 25.363369, 37.688652))))

  for (((before, after, demeaned, quantMap, expected), i) <- acrCases.zipWithIndex)
    test(s"average_cumulative_return_by_quantile golden case $i: " +
      s"before=$before after=$after demeaned=$demeaned") {
      val levels = levelPanel(acrDates, Seq(1.25, 1.50, 1.00, 0.50))
      val factorRows = acrEvDates.map(_ => Seq(3.0, 4.0, 2.0, 1.0))
      val fd = fdFixture(acrEvDates, Seq("A", "B", "C", "D"), factorRows,
        quantOf = quantMap)
      val out = EventStudy.averageCumulativeReturnByQuantile(
        fd, levels, before, after, demeaned)
        .orderBy("factor_quantile", "offset").collect()
      // expected rows: per quantile ascending, (mean row, std row),
      // columns = offsets ascending
      val nQ = expected.size / 2
      val offs = expected.head.size
      assert(out.length === nQ * offs)
      // reference expected values are printed to ~7 significant digits:
      // compare with a relative tolerance
      def tol(e: Double) = math.max(1e-6, math.abs(e) * 1e-6)
      for (qi <- 0 until nQ; oi <- 0 until offs) {
        val r = out(qi * offs + oi)
        assertClose(r.getAs[Double]("mean"), expected(2 * qi)(oi),
          tol(expected(2 * qi)(oi)))
        assertClose(r.getAs[Double]("std"), expected(2 * qi + 1)(oi),
          tol(expected(2 * qi + 1)(oi)))
      }
    }
}
