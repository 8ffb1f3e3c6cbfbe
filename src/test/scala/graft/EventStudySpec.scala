package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{CleanFactor, ForwardReturns, Quantize}
import graft.perf.EventStudy

class EventStudySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dates = Seq("2020-01-01", "2020-01-02", "2020-01-03", "2020-01-06")

  test("toCumulative zero-fills missing returns (empyrical cum_returns)") {
    // asset A: 0.1, null, 0.1 -> levels 1.1, 1.1, 1.21 (null treated as 0)
    val r = longPanel(dates.take(3), Seq("A"),
      Seq(Seq(0.1), Seq(Double.NaN), Seq(0.1)), "ret")
    val out = EventStudy.toCumulative(r).orderBy("date")
      .collect().map(_.getAs[Double]("ret"))
    assertClose(out(0), 1.1)
    assertClose(out(1), 1.1)
    assertClose(out(2), 1.21)
  }

  test("backshift re-keys rows even when the earlier (date, asset) row is absent") {
    // asset B exists only on the last two dates; shifting by 2 must
    // re-key its day-3 value to day-1 even though (B, day1) never existed
    val df = Seq(
      (ts("2020-01-01"), "A", 1.0),
      (ts("2020-01-02"), "A", 2.0),
      (ts("2020-01-03"), "A", 3.0),
      (ts("2020-01-03"), "B", 30.0),
      (ts("2020-01-06"), "B", 60.0)).toDF("date", "asset", "v")
    val out = EventStudy.backshift(df, "v", 2).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out === Map(
      (ts("2020-01-01"), "A") -> 3.0,
      (ts("2020-01-01"), "B") -> 30.0,
      (ts("2020-01-02"), "B") -> 60.0))
  }

  test("binningByGroup without a groupby mapping fails fast") {
    val f = longPanel(dates, Seq("A", "B"),
      Seq(Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(1.0, 2.0)), "factor")
    val p = longPanel(dates, Seq("A", "B"),
      Seq(Seq(1.0, 2.0), Seq(1.1, 2.2), Seq(1.2, 2.4), Seq(1.3, 2.6)), "price")
    val e = intercept[IllegalArgumentException] {
      CleanFactor.getCleanFactorAndForwardReturns(spark, f, p,
        groupby = None, binningByGroup = true, periods = Seq(1), verbose = false)
    }
    assert(e.getMessage.contains("groupby"))
  }

  test("forward returns are null across per-asset date gaps (sparse panel)") {
    // asset B has no price on day 2: its 1-period return at day 1 must be
    // null (the dense reindex), NOT the day1->day3 spanning return.
    val f = Seq(
      (ts("2020-01-01"), "A", 1.0), (ts("2020-01-02"), "A", 1.0),
      (ts("2020-01-03"), "A", 1.0), (ts("2020-01-01"), "B", 1.0),
      (ts("2020-01-03"), "B", 1.0)).toDF("date", "asset", "factor")
    val p = Seq(
      (ts("2020-01-01"), "A", 10.0), (ts("2020-01-02"), "A", 11.0),
      (ts("2020-01-03"), "A", 12.1), (ts("2020-01-01"), "B", 100.0),
      (ts("2020-01-03"), "B", 400.0)).toDF("date", "asset", "price")
    val fwd = ForwardReturns.computeForwardReturns(spark, f, p, Seq(1))
    val m = collectMap(fwd.df, fwd.horizons.head.label)
    assertClose(m((ts("2020-01-01"), "A")), 0.1)
    assert(!m.contains((ts("2020-01-01"), "B"))) // gap -> null, not 3.0
    // B's day-3 row exists with a null (no day-4 price): also absent
    assert(m.keySet === Set(
      (ts("2020-01-01"), "A") -> 0, (ts("2020-01-02"), "A") -> 0).map(_._1))
  }

  test("averageCumulativeReturnByQuantile by-group is one plan (no per-group union)") {
    val fdDf = Seq(
      (ts("2020-01-01"), "A", 0.01, 1.0, 1, "G1"),
      (ts("2020-01-01"), "B", 0.02, 2.0, 2, "G2"),
      (ts("2020-01-02"), "A", 0.01, 1.0, 1, "G1"),
      (ts("2020-01-02"), "B", 0.02, 2.0, 2, "G2"))
      .toDF("date", "asset", "ret_1", "factor", "factor_quantile", "group")
    val fd = graft.ingest.FactorData(fdDf,
      Seq(graft.model.Horizon(1, "ret_1", java.time.Duration.ofDays(1))),
      graft.model.TradingCalendar(Set(1, 2, 3, 4, 5, 6, 7), Set.empty))
    val levels = Seq(
      (ts("2020-01-01"), "A", 1.0), (ts("2020-01-02"), "A", 1.1),
      (ts("2020-01-01"), "B", 1.0), (ts("2020-01-02"), "B", 1.2))
      .toDF("date", "asset", "ret")
    val out = EventStudy.averageCumulativeReturnByQuantile(
      fd, levels, periodsBefore = 0, periodsAfter = 1,
      demeaned = false, byGroup = true)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"), "by-group path must not union per-group plans")
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("group")).toSet === Set("G1", "G2"))
  }
}
