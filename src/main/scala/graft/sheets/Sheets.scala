package graft.sheets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ingest.FactorData
import graft.perf.{Cumulative, EventStudy, Information, Returns, Turnover}
import graft.stats.Tables

/** Tear-sheet composites (reference: alphalens/tears.py:61-732): each
  * reference entry point rendered figures; here each returns a struct of
  * the result TABLES (the numbers behind every figure), all lazy
  * DataFrames fanned out from one shared factor_data input — callers
  * should persist `fd.df` first (SURVEY §3 lifecycle).
  */
object Sheets {

  /** Horizons whose span is a whole-day multiple, as day counts — the
    * only ones turnover analysis runs on (reference: tears.py:429-435). */
  private def dayPeriods(fd: FactorData): Seq[Int] =
    fd.horizons.filter(h => h.span.toNanos % 86400000000000L == 0L)
      .map(_.span.toDays.toInt)

  // ---- summary --------------------------------------------------------

  final case class SummaryTearSheet(
      quantileStats: DataFrame,
      returnsTable: DataFrame,
      icSummary: DataFrame,
      quantileTurnoverMeans: DataFrame,
      autocorrelationMeans: DataFrame)

  /** reference: tears.py:61-175 */
  def createSummaryTearSheet(
      fd: FactorData,
      longShort: Boolean = true,
      groupNeutral: Boolean = false): SummaryTearSheet = {
    val periods = dayPeriods(fd)
    SummaryTearSheet(
      quantileStats = Tables.quantileStatsTable(fd),
      returnsTable = Tables.returnsTable(fd, longShort, groupNeutral),
      icSummary = Information.icSummary(fd),
      quantileTurnoverMeans = Tables.quantileTurnoverMeans(fd, periods),
      autocorrelationMeans = Tables.autocorrelationMeans(fd, periods))
  }

  // ---- returns --------------------------------------------------------

  final case class ReturnsTearSheet(
      factorReturns: DataFrame,
      meanQuantRateret: DataFrame,
      meanQuantRateretByDate: DataFrame,
      spread: DataFrame,
      alphaBeta: DataFrame,
      returnsTable: DataFrame,
      cumulativeReturns: Option[DataFrame],
      cumulativeReturnsByQuantile: Option[DataFrame],
      meanQuantRateretByGroup: Option[DataFrame])

  /** reference: tears.py:178-344. The cumulative-return curves exist only
    * when a one-day horizon is present (tears.py:280-294). */
  def createReturnsTearSheet(
      fd: FactorData,
      longShort: Boolean = true,
      groupNeutral: Boolean = false,
      byGroup: Boolean = false): ReturnsTearSheet = {
    val fr = Returns.factorReturns(fd, longShort, groupNeutral)
    val mqr = Tables.rateConvert(Returns.meanReturnByQuantile(fd,
      byDate = false, demeaned = longShort, groupAdjust = groupNeutral), fd)
    val mqrDate = Tables.rateConvert(Returns.meanReturnByQuantile(fd,
      byDate = true, demeaned = longShort, groupAdjust = groupNeutral), fd,
      withStdErr = true)
    val qext = mqrDate.agg(max("factor_quantile"), min("factor_quantile")).first()
    val spread = Returns.computeMeanReturnsSpread(mqrDate,
      qext.getInt(0), qext.getInt(1), fd.returnCols)
    val ab = Returns.factorAlphaBeta(fd, demeaned = longShort,
      groupAdjust = groupNeutral)

    val oneDay = fd.horizons.find(_.span == java.time.Duration.ofDays(1))
    val cum = oneDay.map { h =>
      Cumulative.cumulativeReturns(fr.select(col("date"), col(h.label)), h.label)
        .select("date", s"cum_${h.label}")
    }
    val cumByQ = oneDay.map { h =>
      val byDate = Returns.meanReturnByQuantile(fd, byDate = true,
        demeaned = longShort, groupAdjust = groupNeutral)
        .select(col("factor_quantile"), col("date"), col(h.label))
      Cumulative.cumulativeReturns(byDate, h.label, Seq("factor_quantile"))
        .select("factor_quantile", "date", s"cum_${h.label}")
    }
    val byGrp =
      if (byGroup)
        Some(Tables.rateConvert(Returns.meanReturnByQuantile(fd,
          byDate = false, byGroup = true, demeaned = longShort,
          groupAdjust = groupNeutral), fd))
      else None
    ReturnsTearSheet(fr, mqr, mqrDate, spread, ab,
      Tables.returnsTable(fd, longShort, groupNeutral), cum, cumByQ, byGrp)
  }

  // ---- information ----------------------------------------------------

  final case class InformationTearSheet(
      ic: DataFrame,
      icSummary: DataFrame,
      monthlyMeanIc: DataFrame,
      meanIcByGroup: Option[DataFrame])

  /** reference: tears.py:347-406 */
  def createInformationTearSheet(
      fd: FactorData,
      groupNeutral: Boolean = false,
      byGroup: Boolean = false): InformationTearSheet = {
    val ic = Information.factorInformationCoefficient(fd,
      groupAdjust = groupNeutral)
    val monthly = Information.meanInformationCoefficient(fd,
      groupAdjust = groupNeutral, byTime = Some("M"))
    val grp =
      if (byGroup)
        Some(Information.meanInformationCoefficient(fd,
          groupAdjust = groupNeutral, byGroup = true))
      else None
    InformationTearSheet(ic, Information.icSummary(fd, groupNeutral),
      monthly, grp)
  }

  // ---- turnover -------------------------------------------------------

  final case class TurnoverTearSheet(
      quantileTurnover: DataFrame,    // (period, factor_quantile, date, turnover)
      autocorrelation: DataFrame,     // (period, date, autocorr)
      quantileTurnoverMeans: DataFrame,
      autocorrelationMeans: DataFrame)

  /** reference: tears.py:409-485 */
  def createTurnoverTearSheet(
      fd: FactorData,
      turnoverPeriods: Option[Seq[Int]] = None): TurnoverTearSheet = {
    val periods = turnoverPeriods.getOrElse(dayPeriods(fd))
    val qt = periods.map { p =>
      Turnover.allQuantileTurnover(fd, p).withColumn("period", lit(s"${p}D"))
    }.reduce(_.unionByName(_))
      .select("period", "factor_quantile", "date", "turnover")
    val ac = Turnover.factorRankAutocorrelationMulti(fd, periods)
      .select(concat(col("period").cast("string"), lit("D")).as("period"),
        col("date"), col("autocorr"))
    TurnoverTearSheet(qt, ac,
      Tables.quantileTurnoverMeans(fd, periods),
      Tables.autocorrelationMeans(fd, periods))
  }

  // ---- full -----------------------------------------------------------

  final case class FullTearSheet(
      quantileStats: DataFrame,
      returns: ReturnsTearSheet,
      information: InformationTearSheet,
      turnover: TurnoverTearSheet)

  /** reference: tears.py:488-526 */
  def createFullTearSheet(
      fd: FactorData,
      longShort: Boolean = true,
      groupNeutral: Boolean = false,
      byGroup: Boolean = false): FullTearSheet =
    FullTearSheet(
      quantileStats = Tables.quantileStatsTable(fd),
      returns = createReturnsTearSheet(fd, longShort, groupNeutral, byGroup),
      information = createInformationTearSheet(fd, groupNeutral, byGroup),
      turnover = createTurnoverTearSheet(fd))

  // ---- event sheets ---------------------------------------------------

  final case class EventReturnsTearSheet(
      avgCumulativeReturns: DataFrame,
      avgCumulativeReturnsByGroup: Option[DataFrame])

  /** reference: tears.py:529-632.
    * @param returns (date, asset, ret) simple returns of the priced
    *                universe; converted to levels internally */
  def createEventReturnsTearSheet(
      fd: FactorData,
      returns: DataFrame,
      periodsBefore: Int = 5,
      periodsAfter: Int = 15,
      longShort: Boolean = true,
      groupNeutral: Boolean = false,
      byGroup: Boolean = false): EventReturnsTearSheet = {
    val levels = EventStudy.toCumulative(returns)
    val avg = EventStudy.averageCumulativeReturnByQuantile(fd, levels,
      periodsBefore, periodsAfter, demeaned = longShort,
      groupAdjust = groupNeutral)
    val grp =
      if (byGroup)
        Some(EventStudy.averageCumulativeReturnByQuantile(fd, levels,
          periodsBefore, periodsAfter, demeaned = longShort,
          groupAdjust = groupNeutral, byGroup = true))
      else None
    EventReturnsTearSheet(avg, grp)
  }

  final case class EventStudyTearSheet(
      eventsDistribution: DataFrame,
      avgCumulativeReturns: DataFrame,
      factorReturns: DataFrame,
      meanReturnByQuantile: DataFrame)

  /** reference: tears.py:635-732 — event studies are long-only
    * (long_short=False, tears.py:666), factor returns equal-weighted
    * (tears.py:689-691). */
  def createEventStudyTearSheet(
      fd: FactorData,
      returns: DataFrame,
      periodsBefore: Int = 5,
      periodsAfter: Int = 15,
      nBars: Int = 50): EventStudyTearSheet = {
    val levels = EventStudy.toCumulative(returns)
    EventStudyTearSheet(
      eventsDistribution =
        Tables.eventsDistribution(fd.df.select("date"), nBars),
      avgCumulativeReturns =
        EventStudy.averageCumulativeReturnByQuantile(fd, levels,
          periodsBefore, periodsAfter, demeaned = false),
      factorReturns = Returns.factorReturns(fd, demeaned = false,
        equalWeight = true),
      meanReturnByQuantile = Returns.meanReturnByQuantile(fd,
        byDate = false, demeaned = false))
  }
}
