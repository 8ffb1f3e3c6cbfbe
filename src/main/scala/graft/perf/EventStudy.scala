package graft.perf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.FactorData

/** Event-study alignment: per (event date, asset) slice the return level
  * series at relative offsets -before..+after and aggregate
  * (reference: alphalens/performance.py:642-863).
  *
  * The pandas implementation is a per-event-date Python loop over wide
  * slices; here it is one positional RANGE JOIN: level rows get a dense
  * date index `di`, events get `ei`, and the join condition is
  * `asset-equality AND di BETWEEN ei-before AND ei+after` — Catalyst
  * plans the equi-part as a shuffled join on asset and the band as a
  * post-filter; the date index itself is tiny (#sessions) and broadcast.
  * Panel-edge clipping (performance.py:702-704) falls out of the join:
  * out-of-range offsets simply have no matching row.
  */
object EventStudy {

  /** Dense 0-based date index over the distinct dates of `df`. */
  private def dateIndex(df: DataFrame): DataFrame =
    df.select("date").distinct()
      .withColumn("__di", row_number().over(Window.orderBy("date")) - 1)

  /** Convert per-asset simple returns to cumulative levels, cumprod(1+r).
    * Missing (null/NaN) returns are zero-filled so the level series
    * continues — matching empyrical's `cum_returns` (NaN -> 0 fill) used
    * by the reference's common_start_returns(cumulative=False) path and
    * pandas cumprod's default skipna=True. */
  def toCumulative(returns: DataFrame, valueCol: String = "ret"): DataFrame = {
    val c = col(valueCol)
    val filled = when(c.isNull || isnan(c), lit(0.0)).otherwise(c)
    returns.withColumn(valueCol,
      Cumulative.runningProduct(filled + 1.0,
        Window.partitionBy("asset").orderBy("date")))
  }

  /** Aligned long event-study table.
    *
    * @param events   (date, asset) rows — one event per row
    * @param levels   (date, asset, ret) cumulative level series (pass
    *                 through [[toCumulative]] first for simple returns)
    * @param demeanBy optional (date, asset) universe: per (event date,
    *                 offset) subtract the mean level over this universe
    * @param meanByDate if true, collapse assets: one row per (event date,
    *                 offset) with the cross-asset mean
    * @param extraCols extra event columns (e.g. factor_quantile) carried
    *                 through the band join onto every aligned row
    * @return (event_date, [asset,] offset, value[, extras])
    */
  def commonStartReturns(
      events: DataFrame,
      levels: DataFrame,
      before: Int,
      after: Int,
      meanByDate: Boolean = false,
      demeanBy: Option[DataFrame] = None,
      extraCols: Seq[String] = Nil): DataFrame = {
    val dIdx = broadcast(dateIndex(levels))
    val lv = levels.join(dIdx, Seq("date"))
      .select(col("asset"), col("__di"), col("ret"))

    // events keyed to the level date index; dates absent from the level
    // index are skipped (reference KeyError -> continue)
    val ev = events.select(("date" +: "asset" +: extraCols).map(col): _*)
      .join(dIdx, Seq("date"))
      .select(col("date").as("event_date") +: col("asset") +:
        col("__di").as("__ei") +: extraCols.map(col): _*)

    // the bounded offset window explodes on the event side so the band
    // lookup is a pure (asset, date-index) EQUI-join — a direct range
    // predicate would force the join to materialize every event x level
    // pair per asset before filtering (quadratic in dates per asset)
    def band(evts: DataFrame, extras: Seq[String]): DataFrame = {
      val ex = evts
        .withColumn("offset", explode(sequence(lit(-before), lit(after))))
        .withColumn("__dj", col("__ei") + col("offset"))
      ex.join(lv.withColumnRenamed("asset", "__la"),
          col("__la") === ex("asset") && col("__di") === col("__dj"))
        .select(col("event_date") +: ex("asset") +: col("offset") +:
          col("ret").as("value") +: extras.map(col): _*)
    }

    val sliced = band(ev, extraCols)

    val demeaned = demeanBy match {
      case None => sliced
      case Some(dm) =>
        // per (event date, offset): mean level over the demean universe's
        // assets at that date (performance.py:707-720)
        val dmEv = dm.select("date", "asset").join(dIdx, Seq("date"))
          .select(col("date").as("event_date"), col("asset"), col("__di").as("__ei"))
        val dmMeans = band(dmEv, Nil)
          .groupBy("event_date", "offset")
          .agg(avg("value").as("__dm_mean"))
        sliced.join(dmMeans, Seq("event_date", "offset"), "left")
          .withColumn("value", col("value") - col("__dm_mean"))
          .drop("__dm_mean")
    }

    if (meanByDate)
      demeaned.groupBy("event_date", "offset").agg(avg("value").as("value"))
    else demeaned
  }

  /** Mean/std of aligned cumulative returns per quantile (± group)
    * (reference: alphalens/performance.py:730-863).
    *
    * @param levels (date, asset, ret) CUMULATIVE level series (the
    *               reference calls common_start_returns with
    *               cumulative=True; its golden tests pass r^i levels)
    * @return (factor_quantile[, group], offset, mean, std)
    */
  def averageCumulativeReturnByQuantile(
      fd: FactorData,
      levels: DataFrame,
      periodsBefore: Int = 10,
      periodsAfter: Int = 15,
      demeaned: Boolean = true,
      groupAdjust: Boolean = false,
      byGroup: Boolean = false): DataFrame = {

    // skip NaN per-asset values in the per-date mean (pandas skipna) but
    // let +-inf propagate — the reference replaces inf with NaN only
    // AFTER mean_by_date (performance.py:804), so one inf level excludes
    // the whole event date from the quantile's mean/std.
    val nanNull = (c: Column) => when(isnan(c), lit(null)).otherwise(c)
    val finite = (c: Column) =>
      when(isnan(c) || abs(c) === Double.PositiveInfinity, lit(null)).otherwise(c)

    val withGroup = byGroup || groupAdjust
    // ONE positional band join for every event row, carrying quantile
    // (and group) through the join — a single plan regardless of group
    // cardinality (no per-group driver loop/union).
    val evExtra = Seq("factor_quantile") ++ (if (withGroup) Seq("group") else Nil)
    val dIdx = broadcast(dateIndex(levels))
    val lv = levels.join(dIdx, Seq("date"))
      .select(col("asset").as("__la"), col("__di"), col("ret"))
    val ev = fd.df.select(("date" +: "asset" +: evExtra).map(col): _*)
      .join(dIdx, Seq("date"))
      .select(col("date").as("event_date") +: col("asset") +:
        col("__di").as("__ei") +: evExtra.map(col): _*)
    // offset-exploded equi-join — see commonStartReturns.band for why a
    // direct range predicate would be quadratic in dates per asset
    val evx = ev
      .withColumn("offset",
        explode(sequence(lit(-periodsBefore), lit(periodsAfter))))
      .withColumn("__dj", col("__ei") + col("offset"))
    val banded = evx.join(lv,
        col("__la") === evx("asset") && col("__di") === col("__dj"))
      .select(col("event_date") +: col("asset") +: col("offset") +:
        col("ret").as("value") +: evExtra.map(col): _*)

    // demean universe per (event date, offset): the whole panel when
    // demeaned, the event's group slice when groupAdjust
    val demeanedDf =
      if (groupAdjust) {
        val m = banded.groupBy("group", "event_date", "offset")
          .agg(avg("value").as("__m"))
        banded.join(m, Seq("group", "event_date", "offset"), "left")
          .withColumn("value", col("value") - col("__m")).drop("__m")
      } else if (demeaned) {
        val m = banded.groupBy("event_date", "offset")
          .agg(avg("value").as("__m"))
        banded.join(m, Seq("event_date", "offset"), "left")
          .withColumn("value", col("value") - col("__m")).drop("__m")
      } else banded

    // two-stage estimator: per-date cross-asset mean, then mean/std over
    // event dates; group stays a first-stage key whenever present
    // (group_adjust w/o by_group: population = (group, date) pairs)
    val stage1Keys = evExtra ++ Seq("event_date", "offset")
    val stage2Keys = (if (byGroup) Seq("factor_quantile", "group")
                      else Seq("factor_quantile")) :+ "offset"
    val byDate = demeanedDf.groupBy(stage1Keys.map(col): _*)
      .agg(avg(nanNull(col("value"))).as("value"))
    byDate.groupBy(stage2Keys.map(col): _*)
      .agg(avg(finite(col("value"))).as("mean"),
        stddev_samp(finite(col("value"))).as("std"))
      .orderBy(stage2Keys.map(col): _*)
  }

  /** Positional backshift of a (date, asset) keyed column by N date-level
    * steps (reference: alphalens/utils.py:346-376): every row at date
    * index di >= n is re-keyed to the date at di - n — regardless of
    * whether that (asset, date) pair existed in the input. */
  def backshift(df: DataFrame, valueCol: String, n: Int): DataFrame = {
    val dIdx = broadcast(dateIndex(df))
    val shifted = df.join(dIdx, Seq("date"))
      .filter(col("__di") >= n)
      .select(col("asset"), (col("__di") - n).as("__di"), col(valueCol))
    shifted.join(dIdx, Seq("__di"))
      .select(col("date"), col("asset"), col(valueCol))
  }
}
