package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ForwardReturns

/** Golden port of forward-return tests
  * (reference: alphalens/tests/test_utils.py:68-120). */
class ForwardReturnsSpec extends AnyFunSuite with SparkSpec {

  private val N = Double.NaN

  private def expect(df: org.apache.spark.sql.DataFrame, label: String,
                     dates: Seq[String], assets: Seq[String],
                     vals: Seq[Double]): Unit = {
    val m = collectMap(df, label)
    val keys = for (d <- dates; a <- assets) yield (ts(d), a)
    keys.zip(vals).foreach { case (k, v) =>
      if (v.isNaN) assert(!m.contains(k), s"$label@$k should be null, got ${m.get(k)}")
      else assertClose(m(k), v)
    }
  }

  test("basic forward returns, periods (1,2)") {
    val dates = Seq("2015-01-01", "2015-01-02", "2015-01-03")
    val prices = longPanel(dates, Seq("A", "B"),
      Seq(Seq(1.0, 1), Seq(1.0, 2), Seq(2.0, 1)), "price")
    val factor = prices.withColumnRenamed("price", "factor")
    val res = ForwardReturns.computeForwardReturns(spark, factor, prices, Seq(1, 2))
    assert(res.horizons.map(_.label) == Seq("1D", "2D"))
    expect(res.df, "1D", dates, Seq("A", "B"), Seq(0, 1, 1, -0.5, N, N))
    expect(res.df, "2D", dates, Seq("A", "B"), Seq(1, 0, N, N, N, N))
  }

  test("out-of-bounds price rows (leading nulls) are inert") {
    val pDates = Seq("2014-12-29", "2014-12-30", "2014-12-31",
      "2015-01-01", "2015-01-02", "2015-01-03")
    val prices = longPanel(pDates, Seq("A", "B"),
      Seq(Seq(N, N), Seq(N, N), Seq(N, N),
        Seq(1.0, 1), Seq(1.0, 2), Seq(2.0, 1)), "price")
    val fDates = Seq("2015-01-01", "2015-01-02", "2015-01-03")
    val factor = longPanel(fDates, Seq("A", "B"),
      Seq(Seq(1.0, 1), Seq(1.0, 2), Seq(2.0, 1)), "factor")
    val res = ForwardReturns.computeForwardReturns(spark, factor, prices, Seq(1, 2))
    expect(res.df, "1D", fDates, Seq("A", "B"), Seq(0, 1, 1, -0.5, N, N))
    expect(res.df, "2D", fDates, Seq("A", "B"), Seq(1, 0, N, N, N, N))
  }

  test("non-cumulative returns") {
    val dates = Seq("2015-01-01", "2015-01-02", "2015-01-03")
    val prices = longPanel(dates, Seq("A", "B"),
      Seq(Seq(1.0, 1), Seq(1.0, 2), Seq(2.0, 1)), "price")
    val factor = prices.withColumnRenamed("price", "factor")
    val res = ForwardReturns.computeForwardReturns(spark, factor, prices,
      Seq(1, 2), cumulativeReturns = false)
    expect(res.df, "1D", dates, Seq("A", "B"), Seq(0, 1, 1, -0.5, N, N))
    expect(res.df, "2D", dates, Seq("A", "B"), Seq(1, -0.5, N, N, N, N))
  }

  test("driver-side calendar index fails fast past the instant bound") {
    // 5 distinct dates, bound 3: the collect must raise (not OOM the
    // driver at tick granularity), and raising the conf restores it
    val dates = Seq("2015-01-01", "2015-01-02", "2015-01-03",
      "2015-01-04", "2015-01-05")
    val panel = longPanel(dates, Seq("A"),
      dates.map(_ => Seq(1.0)), "price")
    spark.conf.set(graft.model.CalendarIndex.MaxInstantsKey, "3")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.model.CalendarIndex.collectInstants(panel, "test panel")
      }
      assert(e.getMessage.contains("maxInstants"))
      spark.conf.set(graft.model.CalendarIndex.MaxInstantsKey, "5")
      val got = graft.model.CalendarIndex.collectInstants(panel, "test panel")
      assert(got.length == 5 && got.toSeq == got.toSeq.sorted)
    } finally spark.conf.unset(graft.model.CalendarIndex.MaxInstantsKey)
  }
}
