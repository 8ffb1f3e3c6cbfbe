package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Quantize
import graft.ingest.Quantize._

/** Golden port of the reference quantize tests
  * (reference: alphalens/tests/test_utils.py:122-186 — all parameter
  * combos over the 2-day fixtures). */
class QuantizeSpec extends AnyFunSuite with SparkSpec {

  private val dates = Seq("2015-01-01", "2015-01-02")

  // factor fixture: 4 assets, groups (A,B)->g1 (C,D)->g2
  private val assets4 = Seq("A", "B", "C", "D")
  private val vals4 = Seq(Seq(1.0, 2, 3, 4), Seq(4.0, 3, 2, 1))
  private val groups4 = Map("A" -> "1", "B" -> "1", "C" -> "2", "D" -> "2")

  // biased (zero-aware) fixture: 8 assets
  private val assets8 = Seq("A", "B", "C", "D", "E", "F", "G", "H")
  private val vals8 = Seq(
    Seq(-1.0, 3, -2, 4, -5, 7, -6, 8),
    Seq(-4.0, 2, -3, 1, -8, 6, -7, 5))
  private val groups8 = Map("A" -> "1", "B" -> "1", "C" -> "2", "D" -> "2",
    "E" -> "1", "F" -> "1", "G" -> "2", "H" -> "2")

  private def run(assets: Seq[String], vals: Seq[Seq[Double]],
                  groups: Map[String, String], spec: Spec,
                  byGroup: Boolean, zeroAware: Boolean): Seq[Option[Int]] = {
    import org.apache.spark.sql.functions._
    val base = longPanel(dates, assets, vals, "factor")
    val g = spark.createDataFrame(groups.toSeq).toDF("asset", "group")
    val df = base.join(broadcast(g), Seq("asset"), "left")
    val out = Quantize.quantizeFactor(df, spec, byGroup, noRaise = false, zeroAware)
    val m = out.select("date", "asset", "factor_quantile").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    for (d <- dates; a <- assets) yield m((ts(d), a))
  }

  private def check(name: String, assets: Seq[String], vals: Seq[Seq[Double]],
                    groups: Map[String, String], spec: Spec, byGroup: Boolean,
                    zeroAware: Boolean, expected: Seq[Double]): Unit =
    test(name) {
      val got = run(assets, vals, groups, spec, byGroup, zeroAware)
      val exp = expected.map(v => if (v.isNaN) None else Some(v.toInt))
      assert(got == exp)
    }

  private val N = Double.NaN

  check("quantiles=4", assets4, vals4, groups4, QuantilesInt(4), false, false,
    Seq(1, 2, 3, 4, 4, 3, 2, 1))
  check("quantiles=2", assets4, vals4, groups4, QuantilesInt(2), false, false,
    Seq(1, 1, 2, 2, 2, 2, 1, 1))
  check("quantiles=2 by_group", assets4, vals4, groups4, QuantilesInt(2), true, false,
    Seq(1, 2, 1, 2, 2, 1, 2, 1))
  check("zero_aware quantiles=4", assets8, vals8, groups8, QuantilesInt(4), false, true,
    Seq(2, 3, 2, 3, 1, 4, 1, 4, 2, 3, 2, 3, 1, 4, 1, 4))
  check("zero_aware quantiles=2", assets8, vals8, groups8, QuantilesInt(2), false, true,
    Seq(1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2))
  check("zero_aware quantiles=2 by_group", assets8, vals8, groups8, QuantilesInt(2), true, true,
    Seq(1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2))
  check("zero_aware bins=4", assets8, vals8, groups8, BinsInt(4), false, true,
    Seq(2, 3, 2, 3, 1, 4, 1, 4, 2, 3, 2, 3, 1, 4, 1, 4))
  check("zero_aware bins=2", assets8, vals8, groups8, BinsInt(2), false, true,
    Seq(1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2))
  check("zero_aware bins=2 by_group", assets8, vals8, groups8, BinsInt(2), true, true,
    Seq(1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2))
  check("quantile seq [0,.25,.5,.75,1]", assets4, vals4, groups4,
    QuantilesSeq(Seq(0, .25, .5, .75, 1)), false, false,
    Seq(1, 2, 3, 4, 4, 3, 2, 1))
  check("quantile seq [0,.5,.75,1]", assets4, vals4, groups4,
    QuantilesSeq(Seq(0, .5, .75, 1)), false, false,
    Seq(1, 1, 2, 3, 3, 2, 1, 1))
  check("quantile seq [0,.25,.5,1]", assets4, vals4, groups4,
    QuantilesSeq(Seq(0, .25, .5, 1)), false, false,
    Seq(1, 2, 3, 3, 3, 3, 2, 1))
  check("quantile seq [0,.5,1]", assets4, vals4, groups4,
    QuantilesSeq(Seq(0, .5, 1)), false, false,
    Seq(1, 1, 2, 2, 2, 2, 1, 1))
  check("quantile seq [.25,.5,.75] outside->null", assets4, vals4, groups4,
    QuantilesSeq(Seq(.25, .5, .75)), false, false,
    Seq(N, 1, 2, N, N, 2, 1, N))
  check("quantile seq [0,.5,1] by_group", assets4, vals4, groups4,
    QuantilesSeq(Seq(0, .5, 1)), true, false,
    Seq(1, 2, 1, 2, 2, 1, 2, 1))
  check("quantile seq [.5,1] by_group", assets4, vals4, groups4,
    QuantilesSeq(Seq(.5, 1)), true, false,
    Seq(N, 1, N, 1, 1, N, 1, N))
  check("quantile seq [0,1] by_group", assets4, vals4, groups4,
    QuantilesSeq(Seq(0, 1)), true, false,
    Seq(1, 1, 1, 1, 1, 1, 1, 1))
  check("bins=4", assets4, vals4, groups4, BinsInt(4), false, false,
    Seq(1, 2, 3, 4, 4, 3, 2, 1))
  check("bins=2", assets4, vals4, groups4, BinsInt(2), false, false,
    Seq(1, 1, 2, 2, 2, 2, 1, 1))
  check("bins=3", assets4, vals4, groups4, BinsInt(3), false, false,
    Seq(1, 1, 2, 3, 3, 2, 1, 1))
  check("bins=8", assets4, vals4, groups4, BinsInt(8), false, false,
    Seq(1, 3, 6, 8, 8, 6, 3, 1))
  check("bin edges [0,1,2,3,5]", assets4, vals4, groups4,
    BinsSeq(Seq(0, 1, 2, 3, 5)), false, false,
    Seq(1, 2, 3, 4, 4, 3, 2, 1))
  check("bin edges [1,2,3] outside->null", assets4, vals4, groups4,
    BinsSeq(Seq(1, 2, 3)), false, false,
    Seq(N, 1, 2, N, N, 2, 1, N))
  check("bin edges [0,2,5]", assets4, vals4, groups4,
    BinsSeq(Seq(0, 2, 5)), false, false,
    Seq(1, 1, 2, 2, 2, 2, 1, 1))
  check("bin edges [0.5,2.5,4.5]", assets4, vals4, groups4,
    BinsSeq(Seq(0.5, 2.5, 4.5)), false, false,
    Seq(1, 1, 2, 2, 2, 2, 1, 1))
  check("bin edges [0.5,2.5] by_group outside->null", assets4, vals4, groups4,
    BinsSeq(Seq(0.5, 2.5)), true, false,
    Seq(1, 1, N, N, N, N, 1, 1))
  check("bins=2 by_group", assets4, vals4, groups4, BinsInt(2), true, false,
    Seq(1, 2, 1, 2, 2, 1, 2, 1))

  test("duplicate quantile edges raise unless noRaise") {
    val df = longPanel(Seq("2015-01-01"), Seq("A", "B", "C"),
      Seq(Seq(1.0, 1.0, 1.0)), "factor")
    val ex = intercept[Exception] {
      Quantize.quantizeFactor(df, QuantilesInt(2)).collect()
    }
    assert(ex.getMessage.contains("Bin edges must be unique") ||
      ex.getCause != null &&
        ex.getCause.getMessage.contains("Bin edges must be unique"))
    val ok = Quantize.quantizeFactor(df, QuantilesInt(2), noRaise = true)
      .select("factor_quantile").collect()
    assert(ok.forall(_.isNullAt(0)))
  }
}
