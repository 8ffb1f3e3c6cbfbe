package graft

import java.time.{DayOfWeek, LocalDate}

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{CleanFactor, Quantize}

/** End-to-end get_clean_factor_and_forward_returns golden ports
  * (reference: alphalens/tests/test_utils.py:188-297, 485-546): daily,
  * business-day, and business-day-with-holidays calendars — exercising
  * horizon-label inference over the trading calendar. */
class IngestGoldenSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val tickers = Seq("A", "B", "C", "D", "E", "F")
  private val groups = Map("A" -> "1", "B" -> "2", "C" -> "1",
    "D" -> "2", "E" -> "1", "F" -> "2")
  private val rets = Seq(1.10, 0.50, 3.00, 0.90, 0.50, 1.00)
  private val nan = Double.NaN
  private val factorCycle = Seq(
    Seq(3.0, 4.0, 2.0, 1.0, nan, nan),
    Seq(3.0, nan, nan, 1.0, 4.0, 2.0),
    Seq(3.0, 4.0, 2.0, 1.0, nan, nan))
  // expected (1D, 2D, 3D, factor, group, quantile) per surviving row of
  // each 3-day cycle, in (date, asset) order
  private val expectedCycle = Seq(
    (0.1, 0.21, 0.331, 3.0, "1", 3), (-0.5, -0.75, -0.875, 4.0, "2", 4),
    (2.0, 8.00, 26.000, 2.0, "1", 2), (-0.1, -0.19, -0.271, 1.0, "2", 1),
    (0.1, 0.21, 0.331, 3.0, "1", 3), (-0.1, -0.19, -0.271, 1.0, "2", 1),
    (-0.5, -0.75, -0.875, 4.0, "1", 4), (0.0, 0.00, 0.000, 2.0, "2", 2),
    (0.1, 0.21, 0.331, 3.0, "1", 3), (-0.5, -0.75, -0.875, 4.0, "2", 4),
    (2.0, 8.00, 26.000, 2.0, "1", 2), (-0.1, -0.19, -0.271, 1.0, "2", 1))

  private def runCase(
      priceDates: Seq[String], factorDates: Seq[String]): Unit = {
    val nCycles = factorDates.size / 3
    val priceRows = (1 to priceDates.size).map(i => rets.map(r => math.pow(r, i)))
    val factorRows = (0 until factorDates.size).map(d => factorCycle(d % 3))
    val prices = longPanel(priceDates, tickers, priceRows, "price")
    val factor = longPanel(factorDates, tickers, factorRows, "factor")
    val fd = CleanFactor.getCleanFactorAndForwardReturns(
      spark, factor, prices, groupby = Some(groups.toSeq.toDF("asset", "group")),
      spec = Quantize.QuantilesInt(4), periods = Seq(1, 2, 3),
      filterZscore = None, verbose = false)
    assert(fd.horizons.map(_.label) === Seq("1D", "2D", "3D"))
    val rows = fd.df.orderBy("date", "asset").collect()
    assert(rows.length === expectedCycle.size * nCycles)
    rows.zipWithIndex.foreach { case (r, i) =>
      val (e1, e2, e3, ef, eg, eq) = expectedCycle(i % 12)
      assertClose(r.getAs[Double]("1D"), e1, 1e-9)
      assertClose(r.getAs[Double]("2D"), e2, 1e-9)
      assertClose(r.getAs[Double]("3D"), e3, 1e-9)
      assertClose(r.getAs[Double]("factor"), ef, 1e-9)
      assert(r.getAs[String]("group") === eg)
      assert(r.getAs[Int]("factor_quantile") === eq)
    }
  }

  private def businessDays(start: String, n: Int,
      holidays: Set[String] = Set.empty): Seq[String] = {
    Iterator.iterate(LocalDate.parse(start))(_.plusDays(1))
      .filter(d => d.getDayOfWeek != DayOfWeek.SATURDAY &&
        d.getDayOfWeek != DayOfWeek.SUNDAY && !holidays(d.toString))
      .take(n).map(_.toString).toSeq
  }

  test("mismatched date types raise NonMatchingTimezoneError (utils.py:263)") {
    val dates = (1 to 4).map(d => f"2015-01-$d%02d")
    val prices = longPanel(dates, tickers,
      (1 to 4).map(i => rets.map(math.pow(_, i))), "price")
    val factor = longPanel(dates, tickers,
      (0 until 4).map(d => factorCycle(d % 3)), "factor")
      .withColumn("date", org.apache.spark.sql.functions.col("date").cast("date"))
    val e = intercept[graft.ingest.NonMatchingTimezoneError] {
      CleanFactor.getCleanFactorAndForwardReturns(spark, factor, prices,
        periods = Seq(1), filterZscore = None, verbose = false)
    }
    assert(e.getMessage.contains("timezone of 'factor'"))
  }

  test("get_clean_factor_and_forward_returns: daily calendar (test_utils 1)") {
    val priceDates = (11 to 16).map(d => s"2015-01-$d")
    runCase(priceDates, priceDates.take(3))
  }

  test("get_clean_factor_and_forward_returns: business days (test_utils 2)") {
    val priceDates = businessDays("2017-01-12", 6)
    runCase(priceDates, priceDates.take(3))
  }

  test("get_clean_factor_and_forward_returns: intraday mixed horizons (test_utils 3)") {
    import java.sql.Timestamp
    val days = businessDays("2017-01-12", 4)
    // three price rows per session: open (9:30), +1h (*1.001), +3h (*0.998)
    val priceRows = for {
      (d, di) <- days.zipWithIndex
      (off, fac) <- Seq(("09:30:00", 1.0), ("10:30:00", 1.001), ("12:30:00", 0.998))
    } yield (Timestamp.valueOf(s"$d $off"), di, fac)
    val prices = (for {
      (t, di, fac) <- priceRows
      (a, ai) <- tickers.zipWithIndex
    } yield (t, a, math.pow(rets(ai), di + 1) * fac)).toDF("date", "asset", "price")
    val factor = (for {
      (d, di) <- days.take(3).zipWithIndex
      (a, ai) <- tickers.zipWithIndex
      if !factorCycle(di % 3)(ai).isNaN
    } yield (Timestamp.valueOf(s"$d 09:30:00"), a, factorCycle(di % 3)(ai)))
      .toDF("date", "asset", "factor")
    val fd = CleanFactor.getCleanFactorAndForwardReturns(
      spark, factor, prices, groupby = Some(groups.toSeq.toDF("asset", "group")),
      spec = Quantize.QuantilesInt(4), periods = Seq(1, 2, 3),
      filterZscore = None, verbose = false)
    assert(fd.horizons.map(_.label) === Seq("1h", "3h", "1D"))
    val rows = fd.df.orderBy("date", "asset").collect()
    assert(rows.length === 12)
    rows.zipWithIndex.foreach { case (r, i) =>
      val (e1D, _, _, ef, eg, eq) = expectedCycle(i % 12)
      assertClose(r.getAs[Double]("1h"), 0.001, 1e-9)
      assertClose(r.getAs[Double]("3h"), -0.002, 1e-9)
      // the 1D horizon here is the daily 1-step return of the base cycle
      assertClose(r.getAs[Double]("1D"), e1D, 1e-9)
      assertClose(r.getAs[Double]("factor"), ef, 1e-9)
      assert(r.getAs[String]("group") === eg)
      assert(r.getAs[Int]("factor_quantile") === eq)
    }
  }

  test("get_clean_factor_and_forward_returns: intraday + holidays (test_utils 5)") {
    import java.sql.Timestamp
    val holidays = Set("2017-01-13", "2017-01-18", "2017-01-30", "2017-02-07")
    val days = businessDays("2017-01-12", 19, holidays)
    val priceRows = for {
      (d, di) <- days.zipWithIndex
      (off, fac) <- Seq(("09:30:00", 1.0), ("10:30:00", 1.001), ("12:30:00", 0.998))
    } yield (Timestamp.valueOf(s"$d $off"), di, fac)
    val prices = (for {
      (t, di, fac) <- priceRows
      (a, ai) <- tickers.zipWithIndex
    } yield (t, a, math.pow(rets(ai), di + 1) * fac)).toDF("date", "asset", "price")
    val factor = (for {
      (d, di) <- days.take(18).zipWithIndex
      (a, ai) <- tickers.zipWithIndex
      if !factorCycle(di % 3)(ai).isNaN
    } yield (Timestamp.valueOf(s"$d 09:30:00"), a, factorCycle(di % 3)(ai)))
      .toDF("date", "asset", "factor")
    val fd = CleanFactor.getCleanFactorAndForwardReturns(
      spark, factor, prices, groupby = Some(groups.toSeq.toDF("asset", "group")),
      spec = Quantize.QuantilesInt(4), periods = Seq(1, 2, 3),
      filterZscore = None, verbose = false)
    assert(fd.horizons.map(_.label) === Seq("1h", "3h", "1D"))
    val rows = fd.df.orderBy("date", "asset").collect()
    assert(rows.length === 72) // 12 per 3-day cycle × 6 cycles
    rows.zipWithIndex.foreach { case (r, i) =>
      val (e1D, _, _, ef, eg, eq) = expectedCycle(i % 12)
      assertClose(r.getAs[Double]("1h"), 0.001, 1e-9)
      assertClose(r.getAs[Double]("3h"), -0.002, 1e-9)
      assertClose(r.getAs[Double]("1D"), e1D, 1e-9)
      assertClose(r.getAs[Double]("factor"), ef, 1e-9)
      assert(r.getAs[String]("group") === eg)
      assert(r.getAs[Int]("factor_quantile") === eq)
    }
    // holidays recovered from the intraday timestamps
    assert(fd.calendar.holidays.map(_.toString) === holidays)
  }

  test("get_clean_factor_and_forward_returns: sparse events (test_utils 4)") {
    val priceDates = businessDays("2017-01-12", 8)
    val factorDates = priceDates.take(5)
    val factorRows = Seq(
      Seq(1.0, nan, nan, nan, nan, 6.0),
      Seq(4.0, nan, nan, 7.0, nan, nan),
      Seq(nan, nan, nan, nan, nan, nan),
      Seq(nan, 3.0, nan, 2.0, nan, nan),
      Seq(nan, nan, 1.0, nan, 3.0, nan))
    val prices = longPanel(priceDates, tickers,
      (1 to 8).map(i => rets.map(r => math.pow(r, i))), "price")
    // pandas stack() drops NaN cells before get_clean_factor counts the
    // initial rows for max-loss accounting — mirror that here
    val factor = longPanel(factorDates, tickers, factorRows, "factor").na.drop()
    val fd = CleanFactor.getCleanFactorAndForwardReturns(
      spark, factor, prices, groupby = Some(groups.toSeq.toDF("asset", "group")),
      spec = Quantize.QuantilesInt(4), periods = Seq(1, 2, 3),
      filterZscore = None, verbose = false)
    assert(fd.horizons.map(_.label) === Seq("1D", "2D", "3D"))
    val expected = Seq( // (1D, 2D, 3D, factor, group, quantile)
      (0.1, 0.21, 0.331, 1.0, "1", 1), (0.0, 0.00, 0.000, 6.0, "2", 4),
      (0.1, 0.21, 0.331, 4.0, "1", 1), (-0.1, -0.19, -0.271, 7.0, "2", 4),
      (-0.5, -0.75, -0.875, 3.0, "2", 4), (-0.1, -0.19, -0.271, 2.0, "2", 1),
      (2.0, 8.00, 26.000, 1.0, "1", 1), (-0.5, -0.75, -0.875, 3.0, "1", 4))
    val rows = fd.df.orderBy("date", "asset").collect()
    assert(rows.length === expected.size)
    rows.zip(expected).foreach { case (r, (e1, e2, e3, ef, eg, eq)) =>
      assertClose(r.getAs[Double]("1D"), e1, 1e-9)
      assertClose(r.getAs[Double]("2D"), e2, 1e-9)
      assertClose(r.getAs[Double]("3D"), e3, 1e-9)
      assertClose(r.getAs[Double]("factor"), ef, 1e-9)
      assert(r.getAs[String]("group") === eg)
      assert(r.getAs[Int]("factor_quantile") === eq)
    }
  }

  test("get_clean_factor_and_forward_returns: business days + holidays (test_utils 6)") {
    val holidays = Set("2017-01-13", "2017-01-18", "2017-01-30", "2017-02-07")
    val priceDates = businessDays("2017-01-12", 21, holidays)
    runCase(priceDates, priceDates.take(18))
    // calendar inference recovers the holidays (test_utils.py:544-546)
    val factor = longPanel(priceDates.take(18), tickers,
      (0 until 18).map(d => factorCycle(d % 3)), "factor")
    val prices = longPanel(priceDates, tickers,
      (1 to 21).map(i => rets.map(r => math.pow(r, i))), "price")
    val fd = CleanFactor.getCleanFactorAndForwardReturns(
      spark, factor, prices, groupby = None,
      spec = Quantize.QuantilesInt(4), periods = Seq(1),
      filterZscore = None, verbose = false)
    assert(fd.calendar.holidays.map(_.toString) === holidays)
  }

  test("groupby_labels remaps group codes to names; missing label raises " +
      "(utils.py:613-625)") {
    import org.apache.spark.sql.functions.col
    val dates = (1 to 5).map(d => f"2015-01-0$d")
    val prices = longPanel(dates, tickers,
      (1 to 5).map(i => rets.map(math.pow(_, i))), "price")
    val factor = longPanel(dates.take(4), tickers,
      (0 until 4).map(d => factorCycle(d % 3)), "factor")
    val labels = Seq(("1", "TECH"), ("2", "FIN")).toDF("group", "label")
    val fd = CleanFactor.getCleanFactorAndForwardReturns(
      spark, factor, prices,
      groupby = Some(groups.toSeq.toDF("asset", "group")),
      groupbyLabels = Some(labels),
      spec = Quantize.QuantilesInt(4), periods = Seq(1),
      filterZscore = None, verbose = false)
    val got = fd.df.select("asset", "group").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    groups.foreach { case (a, g) =>
      if (got.contains(a))
        assert(got(a) === (if (g == "1") "TECH" else "FIN"), a)
    }
    // a group value without a label raises the reference's KeyError
    val partial = Seq(("1", "TECH")).toDF("group", "label")
    val e = intercept[NoSuchElementException] {
      CleanFactor.getCleanFactorAndForwardReturns(
        spark, factor, prices,
        groupby = Some(groups.toSeq.toDF("asset", "group")),
        groupbyLabels = Some(partial),
        spec = Quantize.QuantilesInt(4), periods = Seq(1),
        filterZscore = None, verbose = false)
    }
    assert(e.getMessage.contains("not in passed group names"))
  }

  test("time-varying (date, asset) -> group mapping: mid-panel " +
      "reclassification + NaN-alignment dropout (utils.py:517-522, 600-625)") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val dates = (1 to 5).map(d => f"2015-01-0$d")
    val factorDates = dates.take(4)
    val prices = longPanel(dates, tickers,
      (1 to 5).map(i => rets.map(math.pow(_, i))), "price")
    val factor = longPanel(factorDates, tickers,
      (0 until 4).map(d => factorCycle(d % 3)), "factor")
    def run(g: org.apache.spark.sql.DataFrame) =
      CleanFactor.getCleanFactorAndForwardReturns(
        spark, factor, prices, groupby = Some(g),
        spec = Quantize.QuantilesInt(4), periods = Seq(1),
        filterZscore = None, maxLoss = 0.6, verbose = false)

    val static = run(groups.toSeq.toDF("asset", "group"))
      .df.orderBy("date", "asset").collect()

    // tv map = the static map materialized per (date, asset), except:
    // A is RECLASSIFIED "1" -> "9" from 2015-01-03 on, and the pair
    // (D, 2015-01-02) is ABSENT from the mapping (D's factor is finite
    // that day, so its disappearance must come from the mapping)
    val grid = for {
      d <- factorDates; t <- tickers
      if !(t == "D" && d == "2015-01-02")
    } yield (d, t, if (t == "A" && d >= "2015-01-03") "9" else groups(t))
    val tv = grid.toDF("ds", "asset", "group")
      .withColumn("date", to_timestamp(col("ds"))).drop("ds")
    val rows = run(tv).df.orderBy("date", "asset").collect()

    def day(r: org.apache.spark.sql.Row) =
      r.getAs[java.sql.Timestamp]("date").toString.take(10)
    // per-date group stats flip: A carries its original group before the
    // pivot and the reclassified one after
    val aGroups = rows.filter(_.getAs[String]("asset") == "A")
      .map(r => day(r) -> r.getAs[String]("group")).toMap
    assert(aGroups("2015-01-01") === "1" && aGroups("2015-01-02") === "1")
    assert(aGroups("2015-01-03") === "9" && aGroups("2015-01-04") === "9")
    // the unmapped pair is dropped (reference NaN alignment, no KeyError),
    // while the static control keeps it
    assert(!rows.exists(r => r.getAs[String]("asset") == "D" && day(r) == "2015-01-02"))
    assert(static.exists(r => r.getAs[String]("asset") == "D" && day(r) == "2015-01-02"))
    // quantization happens AFTER the mapping drop: the 01-02 cross-
    // section re-cuts over the remaining assets, and every other date's
    // rows match the static control column-for-column (binning is
    // per-date, so reclassification alone must not move quantiles)
    val staticByKey = static.map(r => (day(r), r.getAs[String]("asset")) -> r).toMap
    rows.filter(r => day(r) != "2015-01-02").foreach { r =>
      val s = staticByKey((day(r), r.getAs[String]("asset")))
      assert(r.getAs[Double]("factor") === s.getAs[Double]("factor"))
      assert(r.getAs[Double]("1D") === s.getAs[Double]("1D"))
      assert(r.getAs[Int]("factor_quantile") === s.getAs[Int]("factor_quantile"))
      val expGroup =
        if (r.getAs[String]("asset") == "A" && day(r) >= "2015-01-03") "9"
        else s.getAs[String]("group")
      assert(r.getAs[String]("group") === expGroup)
    }
    // a mapping constant in time reproduces the static result exactly
    val constGrid = for { d <- factorDates; t <- tickers }
      yield (d, t, groups(t))
    val constTv = constGrid.toDF("ds", "asset", "group")
      .withColumn("date", to_timestamp(col("ds"))).drop("ds")
    val constRows = run(constTv).df.orderBy("date", "asset").collect()
    assert(constRows.map(_.toString).toSeq === static.map(_.toString).toSeq)
  }
}
