package graft.perf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.FactorData

/** Weighting and return attribution
  * (reference: alphalens/performance.py:129-330, 453-565). */
object Returns {

  /** Per-date (± group-neutral) portfolio weights
    * (reference: alphalens/performance.py:129-205).
    *
    * All paths are window aggregates over the cross-section — mean /
    * exact median / sign counts / sum(abs) — followed by the gross-
    * leverage normalization; group_adjust triggers the reference's second
    * normalization pass across the whole date (performance.py:203).
    */
  def factorWeights(
      fd: FactorData,
      demeaned: Boolean = true,
      groupAdjust: Boolean = false,
      equalWeight: Boolean = false): DataFrame = {
    val part: Seq[Column] = col("date") +:
      (if (groupAdjust) Seq(col("group")) else Nil)
    val w = Window.partitionBy(part: _*)
    val f = col("factor")

    val pre: Column =
      if (equalWeight) {
        val centered = if (demeaned) f - percentile(f, lit(0.5)).over(w) else f
        val sgn = when(centered < 0, -1.0).when(centered > 0, 1.0).otherwise(0.0)
        if (demeaned) {
          val negN = sum(when(centered < 0, 1).otherwise(0)).over(w)
          val posN = sum(when(centered > 0, 1).otherwise(0)).over(w)
          when(sgn < 0, sgn / negN).when(sgn > 0, sgn / posN).otherwise(sgn)
        } else sgn
      } else if (demeaned) f - avg(f).over(w)
      else f

    // gross-leverage normalization; a zero gross (e.g. a single-asset
    // group demeaned to 0) yields null, matching pandas 0/0 -> NaN
    def norm(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column = {
      val gross = sum(abs(c)).over(w)
      when(gross === 0.0, lit(null)).otherwise(c / gross)
    }
    val withPre = fd.df.withColumn("__pre", pre)
    var out = withPre.withColumn("weight",
      norm(col("__pre"), Window.partitionBy(part: _*))).drop("__pre")

    if (groupAdjust) {
      // second pass: renormalize across the full date (performance.py:203)
      out = out.withColumn("weight",
        norm(col("weight"), Window.partitionBy(col("date"))))
    }
    out
  }

  /** Period-wise factor-weighted portfolio returns
    * (reference: alphalens/performance.py:208-255). */
  def factorReturns(
      fd: FactorData,
      demeaned: Boolean = true,
      groupAdjust: Boolean = false,
      equalWeight: Boolean = false,
      byAsset: Boolean = false): DataFrame = {
    val weighted = factorWeights(fd, demeaned, groupAdjust, equalWeight)
    val cols = fd.returnCols.map(rc => (col(rc) * col("weight")).as(rc))
    if (byAsset)
      weighted.select((Seq(col("date"), col("asset")) ++ cols): _*)
    else {
      // CANONICAL-ORDER fold, not sum(): a float sum's low bits depend
      // on summation order, and when a per-date sum lands within an ulp
      // of a .5e-9 boundary the final round(_, 9) flips with the order
      // — across partitionings here, across thread schedules in the
      // DuckDB twin (the 9x panel probe caught exactly one such date:
      // SURVEY §5 probe #12). Folding the per-asset contributions in
      // asset order makes the value a function of the DATA alone; the
      // oracle folds the identical sequence via list_reduce. The
      // per-date state is one struct array bounded by the universe
      // width (the positions-grid precedent), combinable map-side by
      // collect_list.
      // sum() semantics preserved exactly: nulls are skipped (possible
      // under equal-weight on a degenerate date) and an all-null group
      // yields null — tracked in the fold state, one pass
      val aggs = fd.returnCols.map { rc =>
        val arr = filter(
          array_sort(collect_list(struct(col("asset").as("a"),
            (col(rc) * col("weight")).as("x")))),
          s => s.getField("x").isNotNull)
        aggregate(arr,
          struct(lit(0.0).as("s"), lit(0L).as("n")),
          (acc, e) => struct(
            (acc.getField("s") + e.getField("x")).as("s"),
            (acc.getField("n") + 1L).as("n")),
          acc => when(acc.getField("n") > 0, acc.getField("s"))).as(rc)
      }
      weighted.groupBy("date").agg(aggs.head, aggs.tail: _*).orderBy("date")
    }
  }

  /** Closed-form OLS alpha/beta of factor returns on the period-wise
    * universe mean return (reference: alphalens/performance.py:258-330).
    * beta = cov(x,y)/var(x); Ann. alpha = (1+a)^(252D/period) - 1.
    * Output: rows "Ann. alpha" and "beta", one column per horizon. */
  def factorAlphaBeta(
      fd: FactorData,
      returns: Option[DataFrame] = None,
      demeaned: Boolean = true,
      groupAdjust: Boolean = false,
      equalWeight: Boolean = false): DataFrame = {
    val rets = returns.getOrElse(factorReturns(fd, demeaned, groupAdjust, equalWeight))
    val uniAggs = fd.returnCols.map(rc => avg(col(rc)).as(s"__u_$rc"))
    val universe = fd.df.groupBy("date").agg(uniAggs.head, uniAggs.tail: _*)
    val joined = rets.join(universe, Seq("date"), "inner")

    val aggs = fd.horizons.flatMap { h =>
      val x = col(s"__u_${h.label}"); val y = col(h.label)
      val beta = covar_samp(x, y) / var_samp(x)
      val alpha = avg(y) - beta * avg(x)
      Seq(
        (pow(alpha + 1.0, lit(h.freqAdjust)) - 1.0).as(s"__a_${h.label}"),
        beta.as(s"__b_${h.label}"))
    }
    val one = joined.agg(aggs.head, aggs.tail: _*)
    val alphaRow = one.select((lit("Ann. alpha").as("stat") +:
      fd.returnCols.map(rc => col(s"__a_$rc").as(rc))): _*)
    val betaRow = one.select((lit("beta").as("stat") +:
      fd.returnCols.map(rc => col(s"__b_$rc").as(rc))): _*)
    alphaRow.unionAll(betaRow)
  }

  /** Mean period-wise returns by factor quantile, with the reference's
    * two-stage estimator when by_date=False: the overall quantile mean is
    * the mean of daily means, and the standard error comes from the
    * second-stage std/sqrt(count)
    * (reference: alphalens/performance.py:453-517).
    * Output columns per horizon: `<label>` (mean) and `<label>_std_err`.
    */
  def meanReturnByQuantile(
      fd: FactorData,
      byDate: Boolean = false,
      byGroup: Boolean = false,
      demeaned: Boolean = true,
      groupAdjust: Boolean = false): DataFrame =
    meanReturnFromStage1(fd,
      meanReturnsStage1(fd, byGroup, demeaned, groupAdjust), byDate, byGroup)

  /** First-stage estimator shared by both `by_date` variants: per
    * (factor_quantile, date[, group]) mean/std/count per horizon over
    * the (optionally demeaned) panel. Exposed so the tear-sheet
    * composites can compute this one panel-wide aggregate ONCE, persist
    * its bounded output (quantiles × dates rows), and derive every
    * downstream table — by-date means, overall two-stage means,
    * spread, cumulative curves — without re-scanning the panel per
    * component. */
  private[graft] def meanReturnsStage1(
      fd: FactorData,
      byGroup: Boolean = false,
      demeaned: Boolean = true,
      groupAdjust: Boolean = false): DataFrame = {
    val base =
      if (groupAdjust) Information.demeanForwardReturns(fd, byGroup = true)
      else if (demeaned) Information.demeanForwardReturns(fd)
      else fd.df
    val keys1 = Seq("factor_quantile", "date") ++ (if (byGroup) Seq("group") else Nil)
    val aggs1 = fd.returnCols.flatMap { rc =>
      Seq(avg(col(rc)).as(rc),
        stddev_samp(col(rc)).as(s"__std_$rc"),
        count(col(rc)).as(s"__cnt_$rc"))
    }
    base.groupBy(keys1.map(col): _*).agg(aggs1.head, aggs1.tail: _*)
  }

  /** Second half of [[meanReturnByQuantile]] over a precomputed
    * [[meanReturnsStage1]] table (same flags). */
  private[graft] def meanReturnFromStage1(
      fd: FactorData,
      stage1: DataFrame,
      byDate: Boolean = false,
      byGroup: Boolean = false): DataFrame = {
    val keys1 = Seq("factor_quantile", "date") ++ (if (byGroup) Seq("group") else Nil)
    val (stats, keys) =
      if (byDate) (stage1, keys1)
      else {
        val keys2 = "factor_quantile" +: (if (byGroup) Seq("group") else Nil)
        val aggs2 = fd.returnCols.flatMap { rc =>
          Seq(avg(col(rc)).as(rc),
            stddev_samp(col(rc)).as(s"__std_$rc"),
            count(col(rc)).as(s"__cnt_$rc"))
        }
        (stage1.groupBy(keys2.map(col): _*).agg(aggs2.head, aggs2.tail: _*), keys2)
      }

    val outCols = keys.map(col) ++ fd.returnCols.flatMap { rc =>
      Seq(col(rc),
        (col(s"__std_$rc") / sqrt(col(s"__cnt_$rc"))).as(s"${rc}_std_err"))
    }
    stats.select(outCols: _*).orderBy(keys.map(col): _*)
  }

  /** Difference between upper- and lower-quantile mean returns with joint
    * standard error sqrt(s1^2 + s2^2)
    * (reference: alphalens/performance.py:520-565). Expects the by-date
    * output of meanReturnByQuantile. */
  def computeMeanReturnsSpread(
      meanReturns: DataFrame,
      upperQuant: Int,
      lowerQuant: Int,
      returnCols: Seq[String]): DataFrame = {
    val up = meanReturns.filter(col("factor_quantile") === upperQuant)
    val lo = meanReturns.filter(col("factor_quantile") === lowerQuant)
    val upSel = up.select((col("date") +: returnCols.flatMap(rc =>
      Seq(col(rc).as(s"__u_$rc"), col(s"${rc}_std_err").as(s"__ue_$rc")))): _*)
    val loSel = lo.select((col("date") +: returnCols.flatMap(rc =>
      Seq(col(rc).as(s"__l_$rc"), col(s"${rc}_std_err").as(s"__le_$rc")))): _*)
    val j = upSel.join(loSel, Seq("date"), "inner")
    val outCols = col("date") +: returnCols.flatMap { rc =>
      Seq((col(s"__u_$rc") - col(s"__l_$rc")).as(rc),
        sqrt(pow(col(s"__ue_$rc"), 2) + pow(col(s"__le_$rc"), 2)).as(s"${rc}_std_err"))
    }
    j.select(outCols: _*).orderBy("date")
  }

  /** Top and bottom factor_quantile ids of a factor_data table
    * (reference: tears.py:121-123, plotting.py:644-648). */
  def quantileExtremes(fd: FactorData): (Int, Int) = {
    val r = fd.df.agg(max(col("factor_quantile")), min(col("factor_quantile"))).first()
    (r.getInt(0), r.getInt(1))
  }

  /** Convert a 1-period return to a `base`-period rate of return:
    * (1+r)^(base/period) - 1 (reference: alphalens/utils.py:844-869). */
  def rateOfReturn(c: Column, conversionFactor: Double): Column =
    pow(c + 1.0, conversionFactor) - 1.0

  /** Standard-deviation horizon conversion: s / sqrt(period/base)
    * (reference: alphalens/utils.py:872-895). */
  def stdConversion(c: Column, periodOverBase: Double): Column =
    c / math.sqrt(periodOverBase)
}
