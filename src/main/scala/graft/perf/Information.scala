package graft.perf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.FactorData

/** Rank-correlation information analysis
  * (reference: alphalens/performance.py:28-126). */
object Information {

  /** Average (midrank) rank of `c` within the cross-section `part` —
    * rank() gives the min rank of a tie group; the average rank adds
    * (ties-1)/2. Spearman = Pearson on these
    * (reference: performance.py:56-59 uses scipy.stats.spearmanr). */
  private[graft] def avgRank(c: Column, part: Seq[Column]): Column = {
    val r = rank().over(Window.partitionBy(part: _*).orderBy(c))
    val ties = count(lit(1)).over(Window.partitionBy((part :+ c): _*))
    r + (ties - lit(1)) / 2.0
  }

  /** Demean forward-return columns by cross-section (date [, group]) mean
    * (reference: alphalens/utils.py:379-416). */
  def demeanForwardReturns(fd: FactorData, byGroup: Boolean = false): DataFrame = {
    val keys: Seq[Column] = col("date") +:
      (if (byGroup) Seq(col("group")) else Nil)
    val w = Window.partitionBy(keys: _*)
    fd.returnCols.foldLeft(fd.df) { (df, rc) =>
      df.withColumn(rc, col(rc) - avg(col(rc)).over(w))
    }
  }

  /** Per-date (± per-group) Spearman IC between factor and each horizon's
    * forward return (reference: alphalens/performance.py:28-74).
    * Output: one row per date [, group], one column per horizon. */
  def factorInformationCoefficient(
      fd: FactorData,
      groupAdjust: Boolean = false,
      byGroup: Boolean = false): DataFrame = {
    val base = if (groupAdjust) demeanForwardReturns(fd, byGroup = true) else fd.df
    val keyCols: Seq[String] = "date" +: (if (byGroup) Seq("group") else Nil)
    val part = keyCols.map(col)

    val fRank = avgRank(col("factor"), part)
    val ranked = fd.returnCols.foldLeft(base.withColumn("__rf", fRank)) {
      (df, rc) => df.withColumn(s"__rr_$rc", avgRank(col(rc), part))
    }
    // by-group cross-sections can be single-asset (or constant-rank):
    // Spark's corr divides by zero under ANSI there, so guard with the
    // equivalent covar/stddev formulation that yields null like pandas
    def safeCorr(x: Column, y: Column): Column = {
      val d = stddev_samp(x) * stddev_samp(y)
      when(d === 0.0, lit(null)).otherwise(covar_samp(x, y) / d)
    }
    val aggs = fd.returnCols.map { rc =>
      (if (byGroup) safeCorr(col("__rf"), col(s"__rr_$rc"))
       else corr(col("__rf"), col(s"__rr_$rc"))).as(rc)
    }
    ranked.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .orderBy(keyCols.map(col): _*)
  }

  /** Time bucket column for a pandas resample rule subset: "M" labels the
    * month end, "W" the week-ending Sunday, "D" the day
    * (reference: performance.py:107-124 uses pd.Grouper(freq=by_time)). */
  private def timeBucket(rule: String): Column = rule match {
    case "M" | "1M" => last_day(col("date")).cast("timestamp")
    case "W" | "1W" =>
      // dayofweek: Sun=1..Sat=7; label = this week's Sunday (inclusive)
      date_add(col("date").cast("date"),
        (lit(8) - dayofweek(col("date"))) % 7).cast("timestamp")
    case "D" | "1D" => date_trunc("day", col("date"))
    case "Y" | "1Y" =>
      last_day(make_date(year(col("date")), lit(12), lit(1))).cast("timestamp")
    case other => throw new IllegalArgumentException(s"unsupported time rule $other")
  }

  /** Mean IC, optionally bucketed by a time rule and/or group
    * (reference: alphalens/performance.py:77-126). */
  def meanInformationCoefficient(
      fd: FactorData,
      groupAdjust: Boolean = false,
      byGroup: Boolean = false,
      byTime: Option[String] = None): DataFrame = {
    val ic = factorInformationCoefficient(fd, groupAdjust, byGroup)
    val keys: Seq[(String, Column)] =
      byTime.map(r => "date" -> timeBucket(r)).toSeq ++
      (if (byGroup) Seq("group" -> col("group")) else Nil)
    val aggs = fd.returnCols.map(rc => avg(col(rc)).as(rc))
    if (keys.isEmpty) ic.agg(aggs.head, aggs.tail: _*)
    else {
      val keyed = keys.foldLeft(ic) { case (df, (n, c)) => df.withColumn(n, c) }
      keyed.groupBy(keys.map(k => col(k._1)): _*).agg(aggs.head, aggs.tail: _*)
        .orderBy(keys.map(k => col(k._1)): _*)
    }
  }

  /** IC summary statistics per horizon: mean, std, IR, t-stat, p-value,
    * skew, kurtosis (reference: alphalens/plotting.py:166-179). One row
    * per horizon; p-value via the regularized incomplete beta (exact
    * Student-t two-sided), computed in-plan with codegen'd arithmetic on
    * the tiny aggregated row. */
  def icSummary(fd: FactorData, groupAdjust: Boolean = false): DataFrame = {
    val ic = factorInformationCoefficient(fd, groupAdjust)
    val perH = fd.returnCols.map { rc =>
      val c = col(rc)
      ic.agg(
        lit(rc).as("period"),
        avg(c).as("ic_mean"),
        stddev_samp(c).as("ic_std"),
        (avg(c) / stddev_samp(c)).as("risk_adjusted_ic"),
        count(c).as("n"),
        skewness(c).as("ic_skew"),
        kurtosis(c).as("ic_kurtosis"))
    }
    val stats = perH.reduce(_.unionAll(_))
      .withColumn("t_stat", col("ic_mean") / (col("ic_std") / sqrt(col("n"))))
    // two-sided p-value driver-free would need a t-CDF expression; the
    // result table is one row per horizon, so evaluate via a deterministic
    // UDF over commons-math-free continued-fraction betainc.
    val pval = udf((t: Double, n: Long) =>
      if (n < 2 || t.isNaN) Double.NaN
      else graft.perf.StatFunctions.tTwoSidedPValue(t, (n - 1).toDouble))
    stats.withColumn("p_value", pval(col("t_stat"), col("n")))
      .select("period", "ic_mean", "ic_std", "risk_adjusted_ic", "t_stat",
        "p_value", "ic_skew", "ic_kurtosis", "n")
  }
}
