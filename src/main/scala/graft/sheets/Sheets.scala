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

  /** A tear sheet OWNS the persisted intermediates its tables fan out
    * of. They are deliberately left cached while the caller reads the
    * tables; a long-lived session building many sheets should call
    * [[unpersist]] once the tables are materialized, or cached blocks
    * accumulate until session end. Unpersisting is safe at any point:
    * the tables stay valid and lazily recompute on the next action. */
  sealed trait TearSheet {
    /** The persisted shared frames this sheet's tables read from. */
    def cached: Seq[DataFrame]
    /** Release every persisted intermediate this sheet owns. */
    def unpersist(blocking: Boolean = false): Unit =
      cached.foreach(_.unpersist(blocking))
  }

  /** Horizons whose span is a whole-day multiple, as day counts — the
    * only ones turnover analysis runs on (reference: tears.py:429-435). */
  private def dayPeriods(fd: FactorData): Seq[Int] =
    fd.horizons.filter(h => h.span.toNanos % 86400000000000L == 0L)
      .map(_.span.toDays.toInt)

  /** Persist a shared intermediate that several sheet tables fan out
    * of. Every cached table here is bounded by dates × quantiles (×
    * horizons), not by panel size, so the cache cost is negligible
    * next to the panel re-scan it saves per downstream component. */
  private def shared(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  // ---- summary --------------------------------------------------------

  final case class SummaryTearSheet(
      quantileStats: DataFrame,
      returnsTable: DataFrame,
      icSummary: DataFrame,
      quantileTurnoverMeans: DataFrame,
      autocorrelationMeans: DataFrame,
      cached: Seq[DataFrame] = Nil) extends TearSheet

  /** reference: tears.py:61-175 */
  def createSummaryTearSheet(
      fd: FactorData,
      longShort: Boolean = true,
      groupNeutral: Boolean = false): SummaryTearSheet = {
    val periods = dayPeriods(fd)
    // ONE ranked panel (panel-sized cache, released by the unpersist
    // hook) backs both rank consumers: the IC series reads all three
    // rank columns, the autocorrelation table the factor rank — the
    // factor-rank window sort runs once instead of once per component
    val ranked = shared(Information.rankedPanel(fd, fd.df))
    val ic = shared(Information.icFromRanked(fd, ranked))
    val (retTable, retCached) = Tables.returnsTableCached(fd, longShort, groupNeutral)
    // turnover membership sets aggregated ONCE and shared by every
    // period's lag (was one panel aggregation per period)
    val (turnMeans, sets) = Tables.quantileTurnoverMeansShared(fd, periods)
    SummaryTearSheet(
      quantileStats = Tables.quantileStatsTable(fd),
      returnsTable = retTable,
      icSummary = Information.icSummaryFrom(fd, ic),
      quantileTurnoverMeans = turnMeans,
      autocorrelationMeans = Tables.autocorrelationMeansFrom(fd,
        ranked.select(col("date"), col("asset"), col("__rf").as("__rank")),
        periods),
      cached = Seq(ranked, ic, sets) ++ retCached)
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
      meanQuantRateretByGroup: Option[DataFrame],
      cached: Seq[DataFrame] = Nil) extends TearSheet

  /** reference: tears.py:178-344. The cumulative-return curves exist only
    * when a one-day horizon is present (tears.py:280-294). */
  def createReturnsTearSheet(
      fd: FactorData,
      longShort: Boolean = true,
      groupNeutral: Boolean = false,
      byGroup: Boolean = false): ReturnsTearSheet = {
    // shared building blocks, each computed ONCE: the weighted factor
    // returns (feeds the series, alpha/beta, and cumulative curve),
    // the stage-1 (quantile, date) return moments (feeds both
    // mean-quantile tables, the spread, the by-quantile cumulative
    // curves, and the returns table), and alpha/beta itself (feeds its
    // own section and the returns table)
    val fr = shared(Returns.factorReturns(fd, longShort, groupNeutral))
    val s1 = shared(Returns.meanReturnsStage1(fd, demeaned = longShort,
      groupAdjust = groupNeutral))
    val rawByDate = Returns.meanReturnFromStage1(fd, s1, byDate = true)
    val mqr = Tables.rateConvert(Returns.meanReturnFromStage1(fd, s1), fd)
    val mqrDate = Tables.rateConvert(rawByDate, fd, withStdErr = true)
    // quantile extremes off the persisted panel — same values as the
    // by-date table's (every quantile reaches stage 1), without
    // executing the whole by-date plan for two ints
    val (qTop, qBottom) = Returns.quantileExtremes(fd)
    val spread = Returns.computeMeanReturnsSpread(mqrDate,
      qTop, qBottom, fd.returnCols)
    val ab = shared(Returns.factorAlphaBeta(fd, returns = Some(fr),
      demeaned = longShort, groupAdjust = groupNeutral))

    val oneDay = fd.horizons.find(_.span == java.time.Duration.ofDays(1))
    val cum = oneDay.map { h =>
      Cumulative.cumulativeReturns(fr.select(col("date"), col(h.label)), h.label)
        .select("date", s"cum_${h.label}")
    }
    val cumByQ = oneDay.map { h =>
      val byDate = rawByDate
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
      Tables.returnsTableFrom(fd, ab, mqr, mqrDate), cum, cumByQ, byGrp,
      cached = Seq(fr, s1, ab))
  }

  // ---- information ----------------------------------------------------

  final case class InformationTearSheet(
      ic: DataFrame,
      icSummary: DataFrame,
      monthlyMeanIc: DataFrame,
      meanIcByGroup: Option[DataFrame],
      cached: Seq[DataFrame] = Nil) extends TearSheet

  /** reference: tears.py:347-406 */
  def createInformationTearSheet(
      fd: FactorData,
      groupNeutral: Boolean = false,
      byGroup: Boolean = false): InformationTearSheet = {
    // the per-date rank-window IC series is the expensive part — one
    // computation serves the series, the summary rows, and the
    // monthly means (the by-group variant partitions its windows
    // differently and stays separate)
    val ic = shared(Information.factorInformationCoefficient(fd,
      groupAdjust = groupNeutral))
    val monthly = Information.meanIcFrom(fd, ic, byTime = Some("M"))
    val grp =
      if (byGroup)
        Some(Information.meanInformationCoefficient(fd,
          groupAdjust = groupNeutral, byGroup = true))
      else None
    InformationTearSheet(ic, Information.icSummaryFrom(fd, ic),
      monthly, grp, cached = Seq(ic))
  }

  // ---- turnover -------------------------------------------------------

  final case class TurnoverTearSheet(
      quantileTurnover: DataFrame,    // (period, factor_quantile, date, turnover)
      autocorrelation: DataFrame,     // (period, date, autocorr)
      quantileTurnoverMeans: DataFrame,
      autocorrelationMeans: DataFrame,
      cached: Seq[DataFrame] = Nil) extends TearSheet

  /** reference: tears.py:409-485 */
  def createTurnoverTearSheet(
      fd: FactorData,
      turnoverPeriods: Option[Seq[Int]] = None): TurnoverTearSheet = {
    val periods = turnoverPeriods.getOrElse(dayPeriods(fd))
    // both series are computed once; their means are cheap re-groups
    // of the persisted series rather than second set-lag / lag-join
    // passes over the panel
    val qt = shared(periods.map { p =>
      Turnover.allQuantileTurnover(fd, p).withColumn("period", lit(s"${p}D"))
    }.reduce(_.unionByName(_))
      .select("period", "factor_quantile", "date", "turnover"))
    val ac = shared(Turnover.factorRankAutocorrelationMulti(fd, periods)
      .select(concat(col("period").cast("string"), lit("D")).as("period"),
        col("date"), col("autocorr")))
    TurnoverTearSheet(qt, ac,
      Tables.quantileTurnoverMeansFrom(qt),
      Tables.autocorrelationMeansFrom(ac),
      cached = Seq(qt, ac))
  }

  // ---- full -----------------------------------------------------------

  final case class FullTearSheet(
      quantileStats: DataFrame,
      returns: ReturnsTearSheet,
      information: InformationTearSheet,
      turnover: TurnoverTearSheet) extends TearSheet {
    /** Cascades over the component sheets' persisted intermediates. */
    override def cached: Seq[DataFrame] =
      returns.cached ++ information.cached ++ turnover.cached
  }

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
