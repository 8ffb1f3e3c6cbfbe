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

  /** Convert per-asset simple returns to cumulative levels, cumprod(1+r);
    * a null return poisons all later rows of that asset (pandas cumprod
    * NaN propagation). */
  def toCumulative(returns: DataFrame, valueCol: String = "ret"): DataFrame = {
    val w = Window.partitionBy("asset").orderBy("date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = col(valueCol)
    val poisoned = max(when(c.isNull || isnan(c), 1).otherwise(0)).over(w)
    returns.withColumn(valueCol,
      when(poisoned === 1, lit(null))
        .otherwise(Cumulative.runningProduct(c + 1.0, Window.partitionBy("asset").orderBy("date"))))
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
    * @return (event_date, [asset,] offset, value)
    */
  def commonStartReturns(
      events: DataFrame,
      levels: DataFrame,
      before: Int,
      after: Int,
      meanByDate: Boolean = false,
      demeanBy: Option[DataFrame] = None): DataFrame = {
    val dIdx = broadcast(dateIndex(levels))
    val lv = levels.join(dIdx, Seq("date"))
      .select(col("asset"), col("__di"), col("ret"))

    // events keyed to the level date index; dates absent from the level
    // index are skipped (reference KeyError -> continue)
    val ev = events.select("date", "asset").join(dIdx, Seq("date"))
      .select(col("date").as("event_date"), col("asset"), col("__di").as("__ei"))

    def band(evts: DataFrame): DataFrame =
      evts.join(lv.withColumnRenamed("asset", "__la"),
          col("__la") === evts("asset") &&
            col("__di").between(col("__ei") - before, col("__ei") + after))
        .select(col("event_date"), evts("asset"),
          (col("__di") - col("__ei")).as("offset"), col("ret").as("value"))

    val sliced = band(ev)

    val demeaned = demeanBy match {
      case None => sliced
      case Some(dm) =>
        // per (event date, offset): mean level over the demean universe's
        // assets at that date (performance.py:707-720)
        val dmEv = dm.select("date", "asset").join(dIdx, Seq("date"))
          .select(col("date").as("event_date"), col("asset"), col("__di").as("__ei"))
        val dmMeans = band(dmEv)
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

    val finite = (c: Column) =>
      when(isnan(c) || abs(c) === Double.PositiveInfinity, lit(null)).otherwise(c)

    if (!byGroup && !groupAdjust) {
      // events per quantile; demean universe = all rows or none
      val dm = if (demeaned) Some(fd.df.select("date", "asset")) else None
      val perEvent = commonStartReturns(
        fd.df.select("date", "asset", "factor_quantile"), levels,
        periodsBefore, periodsAfter, meanByDate = false, demeanBy = dm)
      // mean_by_date within quantile: reattach quantile via the event rows
      val withQ = perEvent.join(
        fd.df.select(col("date").as("event_date"), col("asset"), col("factor_quantile")),
        Seq("event_date", "asset"))
      val byDate = withQ.groupBy("factor_quantile", "event_date", "offset")
        .agg(avg(finite(col("value"))).as("value"))
      byDate.groupBy("factor_quantile", "offset")
        .agg(avg("value").as("mean"), stddev_samp(col("value")).as("std"))
        .orderBy("factor_quantile", "offset")
    } else {
      // per-group event slices; demean universe depends on flags
      val groups = fd.df.select("group").distinct().collect().map(_.getString(0))
      val perGroup = groups.toSeq.map { g =>
        val gData = fd.df.filter(col("group") === g)
        val dm =
          if (groupAdjust) Some(gData.select("date", "asset"))
          else if (demeaned) Some(fd.df.select("date", "asset"))
          else None
        val perEvent = commonStartReturns(
          gData.select("date", "asset", "factor_quantile"), levels,
          periodsBefore, periodsAfter, meanByDate = false, demeanBy = dm)
        perEvent.join(
          gData.select(col("date").as("event_date"), col("asset"),
            col("factor_quantile")),
          Seq("event_date", "asset"))
          .withColumn("group", lit(g))
      }
      val all = perGroup.reduce(_.unionAll(_))
      val byDate = all.groupBy("factor_quantile", "group", "event_date", "offset")
        .agg(avg(finite(col("value"))).as("value"))
      if (byGroup)
        byDate.groupBy("factor_quantile", "group", "offset")
          .agg(avg("value").as("mean"), stddev_samp(col("value")).as("std"))
          .orderBy("factor_quantile", "group", "offset")
      else
        // group_adjust without by_group: population = (group, date) pairs
        byDate.groupBy("factor_quantile", "offset")
          .agg(avg("value").as("mean"), stddev_samp(col("value")).as("std"))
          .orderBy("factor_quantile", "offset")
    }
  }

  /** Positional backshift of a (date, asset) keyed column by N date-level
    * steps (reference: alphalens/utils.py:346-376). */
  def backshift(df: DataFrame, valueCol: String, n: Int): DataFrame = {
    val dIdx = broadcast(dateIndex(df))
    val withI = df.join(dIdx, Seq("date"))
    val shifted = withI.select(col("asset"), (col("__di") - n).as("__di"),
      col(valueCol).as("__shifted"))
    withI.join(shifted, Seq("asset", "__di"))
      .select(col("date"), col("asset"), col("__shifted").as(valueCol))
  }
}
