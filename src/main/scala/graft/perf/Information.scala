package graft.perf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.FactorData

/** Rank-correlation information analysis
  * (reference: alphalens/performance.py:28-126). */
object Information {

  /** DOUBLED average (midrank) rank = min rank + max rank of the tie
    * group — always an integer, so downstream sums are exact long
    * arithmetic. Pearson corr is scale-invariant, so corr over doubled
    * ranks equals Spearman (reference: performance.py:56-59 uses
    * scipy.stats.spearmanr).
    *
    * Both terms use the SAME ordered window spec — rank() gives the
    * minimum rank, and count(*) with an ORDER BY defaults to the RANGE
    * unbounded-to-current frame (tie peers included) = maximum rank —
    * so Spark plans ONE sort per ranked column instead of two (a
    * separate tie-count partition would double the window passes). */
  private[graft] def rank2(c: Column, part: Seq[Column]): Column = {
    val w = Window.partitionBy(part: _*).orderBy(c)
    (rank().over(w) + count(lit(1)).over(w)).cast("long")
  }

  /** Pearson correlation of integer (long) rank columns via EXACT sums:
    * n, Σx, Σx², Σy, Σy², Σxy are order-independent long aggregates, so
    * the result is bit-identical across runs, partitionings, and engines
    * — Spark's streaming co-moment `corr` merges in task-completion
    * order and drifts ~1e-13 run to run, which straddles any rounding
    * grid. The DuckDB oracle mirrors the identical final float ops
    * (see Pipelines.exactCorrSql). Exact while the sums stay < 2^53 and
    * products < 2^63: cross-sections up to ~1e6 rows per key.
    * `ys` maps input rank column -> output column name. */
  private[graft] def exactRankCorr(
      ranked: DataFrame,
      keys: Seq[String],
      x: String,
      ys: Seq[(String, String)]): DataFrame = {
    val xc = col(x)
    val aggs = Seq(
      count(lit(1)).cast("double").as("__n"),
      sum(xc).cast("double").as("__sx"),
      sum(xc * xc).cast("double").as("__sxx")) ++
      ys.flatMap { case (y, out) =>
        val yc = col(y)
        Seq(
          sum(yc).cast("double").as(s"__sy_$out"),
          sum(yc * yc).cast("double").as(s"__syy_$out"),
          sum(xc * yc).cast("double").as(s"__sxy_$out"))
      }
    val s = ranked.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val n = col("__n"); val sx = col("__sx"); val sxx = col("__sxx")
    val outs = ys.map { case (_, out) =>
      val sy = col(s"__sy_$out"); val syy = col(s"__syy_$out")
      val sxy = col(s"__sxy_$out")
      val den = sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)
      // zero denominator (constant ranks, e.g. single-asset group
      // cross-sections) -> null like pandas, dodging ANSI div-by-zero
      when(den === 0.0, lit(null).cast("double"))
        .otherwise((n * sxy - sx * sy) / den).as(out)
    }
    s.select(keys.map(col) ++ outs: _*)
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
    icFromRanked(fd, rankedPanel(fd, base, keyCols), keyCols)
  }

  /** The per-date doubled-integer rank columns the IC series and the
    * rank-autocorrelation both start from: `__rf` (factor rank) and
    * `__rr_<horizon>` (forward-return ranks), one window sort per
    * column. The summary tear sheet computes this ONCE (persisted,
    * panel-sized — the one panel-scale cache a sheet owns, released by
    * its unpersist hook) and derives both series from it instead of
    * re-running the factor-rank window per component. */
  private[graft] def rankedPanel(
      fd: FactorData,
      base: DataFrame,
      keyCols: Seq[String] = Seq("date")): DataFrame = {
    val part = keyCols.map(col)
    val fRank = rank2(col("factor"), part)
    fd.returnCols.foldLeft(base.withColumn("__rf", fRank)) {
      (df, rc) => df.withColumn(s"__rr_$rc", rank2(col(rc), part))
    }
  }

  /** [[factorInformationCoefficient]] over a precomputed (ideally
    * persisted) [[rankedPanel]]. */
  private[graft] def icFromRanked(
      fd: FactorData,
      ranked: DataFrame,
      keyCols: Seq[String] = Seq("date")): DataFrame =
    exactRankCorr(ranked, keyCols, "__rf",
      fd.returnCols.map(rc => s"__rr_$rc" -> rc))
      .orderBy(keyCols.map(col): _*)

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
      byTime: Option[String] = None): DataFrame =
    meanIcFrom(fd, factorInformationCoefficient(fd, groupAdjust, byGroup),
      byGroup, byTime)

  /** [[meanInformationCoefficient]] over a precomputed (ideally
    * persisted) per-date IC table — the tear-sheet composites compute
    * the rank-window IC series once and derive every mean from it. */
  private[graft] def meanIcFrom(
      fd: FactorData,
      ic: DataFrame,
      byGroup: Boolean = false,
      byTime: Option[String] = None): DataFrame = {
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
  def icSummary(fd: FactorData, groupAdjust: Boolean = false): DataFrame =
    icSummaryFrom(fd, factorInformationCoefficient(fd, groupAdjust))

  /** [[icSummary]] over a precomputed (ideally persisted) per-date IC
    * table: the per-horizon aggregate rows all read one cached series
    * instead of re-running the rank windows per horizon. */
  private[graft] def icSummaryFrom(fd: FactorData, ic: DataFrame): DataFrame = {
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
