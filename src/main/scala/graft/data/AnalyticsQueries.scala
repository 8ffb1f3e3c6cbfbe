package graft.data

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ingest.Quantize
import graft.perf.{EventStudy, Information, Returns}
import graft.stats.Tables

/** Driver-contract queries for the analytics operators that round 1 left
  * untested (VERDICT §"What's missing" #6): tear-sheet tables, by-group
  * variants, zero-aware quantize, event study, spreads. Each Spark query
  * has a DuckDB oracle twin built over [[Pipelines.oraclePrelude]]. */
object AnalyticsQueries {

  private val P = Seq(1, 5)

  private def round9(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), 9)))

  private def round6(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), 6)))

  /** Per-asset simple returns of the synthetic price panel. */
  private def priceReturns(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("asset").orderBy("date")
    Pipelines.prices(Pipelines.panel(s, dir))
      .withColumn("ret", col("price") / lag(col("price"), 1).over(w) - 1.0)
      .select("date", "asset", "ret")
  }

  /** Cumulative level series for the event-study queries. Deliberately
    * NOT memoized+persisted: the levels are cheap to recompute (~1.5s at
    * sf0.1, a scan plus two per-asset windows) but big to cache — the
    * persisted variant measured ~2.5s SLOWER per query from the cache
    * write + deserialization scan alone.  */
  private def cumLevels(s: SparkSession, dir: String): DataFrame =
    EventStudy.toCumulative(priceReturns(s, dir))

  /** Event-study level series with NO transcendental chain: the synthetic
    * per-asset returns are price ratios, so cumprod(1+r) telescopes to
    * price/first(price) — one exact IEEE division per row, bitwise
    * identical in Spark and DuckDB. The exp/sum(ln) runningProduct form
    * drifts ~1e-13 cross-engine, which made the old q_event_study oracle
    * straddle the 1e-9 rounding grid (CORRECTNESS_r03 hash fail). */
  // deliberately NOT persisted: measured twice (r3, r4) — caching the
  // level table makes the event-study queries ~2x SLOWER (columnar
  // cache write + scan cost more than the rebuild, and the InMemory
  // scan defeats the codegen'd window+join pipeline)
  private def exactLevels(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("asset").orderBy("date")
    Pipelines.prices(Pipelines.panel(s, dir))
      .withColumn("ret", col("price") / first(col("price")).over(w))
      .select("date", "asset", "ret")
  }

  /** 1e9 fixed-point of an O(1) level column: an exact integer summand,
    * so downstream sums are order-independent (Spark's float agg merges
    * partial sums in task order — rounding the OUTPUT cannot fix that;
    * same trick as the IC family's doubled integer midranks). */
  private def lvl9(c: Column): Column =
    round(c * lit(1e9), 0).cast(DecimalType(38, 0))

  /** Half-away-from-zero rounding of the exact rational num/den done
    * entirely in integer arithmetic: sign(num)*((2*|num|+den) div
    * (2*den)). Float `round` cannot be mirrored across engines here —
    * num/den with a small denominator lands EXACTLY on the .5 grid for
    * a large fraction of rows (24/10615 in CORRECTNESS_r03), where
    * Spark's HALF_UP-on-shortest-decimal and DuckDB's round-after-
    * inexact-÷1e9 disagree. Integer div (truncation; operands are
    * non-negative, so identical to DuckDB's floor `//`) is exact. */
  private def divHalfAway: Column =
    when(col("__num") < 0, lit(-1L)).otherwise(lit(1L)) *
      expr("(2 * abs(__num) + __den) div (2 * __den)")

  /** Per-(quantile, event_date, offset) exact integer band sums `s1`
    * and the demean-universe sums `dm` DERIVED from them (S = Σ_q sl,
    * n = Σ_q k — integer sums are order-independent, so this is
    * bitwise identical to re-aggregating the banded rows while
    * evaluating the band join ONCE instead of twice per query). */
  // stage-1 is shared VERBATIM by q_avg_cum_ret and q_event_study (the
  // band join + fixed-point aggregation is the expensive ~90% of both);
  // it collapses to |quantiles| x |dates| x |offsets| rows (~75k at
  // sf0.1 — tiny), so unlike the level table it caches profitably.
  // Memoized per (dir, band): the (2,3) band serves the two original
  // event queries, the (5,15) band the event tear-sheet composites.
  private val bandedMemo =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def exactBanded(s: SparkSession, dir: String,
      before: Int = 2, after: Int = 3): (DataFrame, DataFrame) = {
    val s1 = bandedMemo.getOrElseUpdate(s"$dir:$before:$after", {
      val fd = Pipelines.factorData(s, dir, P)
      val banded = EventStudy.commonStartReturns(
          fd.df.select("date", "asset", "factor_quantile"), exactLevels(s, dir),
          before = before, after = after, extraCols = Seq("factor_quantile"))
        .withColumn("L", lvl9(col("value")))
      val df = banded.groupBy("factor_quantile", "event_date", "offset")
        .agg(sum("L").as("sl"), count(lit(1)).as("k"))
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    })
    val dm = s1.groupBy("event_date", "offset")
      .agg(sum("sl").as("S"), sum("k").as("n"))
    (s1, dm)
  }

  /** Exact fixed-point mirror of averageCumulativeReturnByQuantile over
    * a (before, after) band: stage-1 per-event-date means as 1e15-scaled
    * integers (demeaned against the whole-universe band mean when
    * `demeaned`, the raw band mean otherwise), stage-2 mean/std from
    * exact sum/sum-of-squares — order-independent, so the hash is
    * stable across task schedules and engines. The float operator
    * itself is golden-tested in EventStudySpec. */
  private def exactAvgCumRet(s: SparkSession, dir: String,
      before: Int, after: Int, demeaned: Boolean): DataFrame = {
    val (s1, dm) = exactBanded(s, dir, before, after)
    val d = col("d")
    val joined = s1.join(dm, Seq("event_date", "offset"))
    // stage-1 mean at 1e15 fixed point: num/(1e9*den)*1e15 = num*1e6/den;
    // decimal operands keep 2e6*|num| exact (it can exceed Long), and
    // `div` on decimals yields the exact long
    val base =
      if (demeaned) joined
        .withColumn("__num",
          (col("n") * col("sl") - col("k") * col("S")) * lit(1000000L))
        .withColumn("__den", (col("n") * col("k")).cast(DecimalType(38, 0)))
      else joined
        .withColumn("__num", col("sl") * lit(1000000L))
        .withColumn("__den", col("k").cast(DecimalType(38, 0)))
    base
      .select(col("factor_quantile"), col("offset"),
        divHalfAway.cast(DecimalType(38, 0)).as("M"))
      .groupBy("factor_quantile", "offset")
      .agg(sum("M").as("sm"), sum(col("M") * col("M")).as("sm2"),
        count(lit(1)).as("d"))
      .select(col("factor_quantile"), col("offset"),
        round(col("sm").cast("double") / (lit(1e15) * d.cast("double")), 9)
          .as("mean"),
        when(d > 1,
          round(sqrt((d * col("sm2") - col("sm") * col("sm")).cast("double") /
            (d.cast("double") * (d.cast("double") - lit(1.0)))) / lit(1e15), 9))
          .as("std"))
      .orderBy("factor_quantile", "offset")
  }

  /** One-pass melt of `df` into (section, k, metric, value) long rows: a
    * single inline(array(struct…)) generator projection, so the component
    * pipeline executes ONCE regardless of metric count. The per-metric
    * select+union form re-ran each component's aggregation once per
    * metric column (VERDICT r6 "what's wrong" #1: 19.3s composite vs
    * 12.2s component sum — exchange reuse saved the shuffles but not the
    * post-shuffle aggregation replay). */
  private def melt(df: DataFrame, section: String, keyCol: Column,
      metrics: Seq[String]): DataFrame =
    df.select(lit(section).as("section"), keyCol.cast("string").as("k"),
      inline(array(metrics.map(m =>
        struct(lit(m).as("metric"), col(m).cast("double").as("value"))): _*)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quantile_stats" -> ((s, dir) =>
      round6(Tables.quantileStatsTable(Pipelines.factorData(s, dir, P)),
        Seq("min", "max", "mean", "std", "count_pct"))),
    "q_ic_summary" -> ((s, dir) =>
      round9(Information.icSummary(Pipelines.factorData(s, dir, P))
        .drop("p_value"), // no t-CDF in the oracle engine
        Seq("ic_mean", "ic_std", "risk_adjusted_ic", "t_stat", "ic_skew",
          "ic_kurtosis"))),
    "q_returns_table" -> ((s, dir) =>
      round9(Tables.returnsTable(Pipelines.factorData(s, dir, P)),
        Seq("ret_1", "ret_5"))),
    "q_turnover_means" -> ((s, dir) =>
      round9(Tables.quantileTurnoverMeans(Pipelines.factorData(s, dir, P), P),
        Seq("mean_turnover"))),
    "q_autocorr_means" -> ((s, dir) =>
      round9(Tables.autocorrelationMeans(Pipelines.factorData(s, dir, P), P),
        Seq("mean_autocorr"))),
    "q_summary_sheet" -> ((s, dir) => {
      // the COMPOSITE, not its components: createSummaryTearSheet wires
      // default flags + day-period selection across five tables; melt
      // them long into one comparable (section, k, metric, value) table
      val sheet = graft.sheets.Sheets.createSummaryTearSheet(
        Pipelines.factorData(s, dir, P))
      melt(round6(sheet.quantileStats,
          Seq("min", "max", "mean", "std", "count_pct")),
        "quantile_stats", col("factor_quantile"),
        Seq("min", "max", "mean", "std", "count", "count_pct"))
        .unionByName(melt(round9(sheet.returnsTable, Seq("ret_1", "ret_5")),
          "returns_table", col("stat"), Seq("ret_1", "ret_5")))
        .unionByName(melt(round9(sheet.icSummary.drop("p_value"),
            Seq("ic_mean", "ic_std", "risk_adjusted_ic", "t_stat", "ic_skew",
              "ic_kurtosis")),
          "ic_summary", col("period"),
          Seq("ic_mean", "ic_std", "risk_adjusted_ic", "t_stat", "ic_skew",
            "ic_kurtosis", "n")))
        .unionByName(melt(round9(sheet.quantileTurnoverMeans,
            Seq("mean_turnover")),
          "turnover_means",
          concat(col("factor_quantile").cast("string"), lit("|"), col("period")),
          Seq("mean_turnover")))
        .unionByName(melt(round9(sheet.autocorrelationMeans,
            Seq("mean_autocorr")),
          "autocorr_means", col("period"), Seq("mean_autocorr")))
        .orderBy("section", "k", "metric")
    }),
    "q_factor_data_group" -> ((s, dir) =>
      Pipelines.factorData(s, dir, P, withGroup = true).df
        .select("date", "asset", "ret_1", "ret_5", "factor", "group",
          "factor_quantile")),
    "q_factor_data_group_tv" -> ((s, dir) =>
      // TIME-VARYING group membership (utils.py:517-522 MultiIndex
      // semantics): mid-panel reclassifications + pairs dropping out of
      // the mapping, quantized AFTER the (date, asset) group join so the
      // per-date edges see the post-drop universe (reference order)
      Pipelines.factorDataTv(s, dir, P).df
        .select("date", "asset", "ret_1", "ret_5", "factor", "group",
          "factor_quantile")),
    "q_ic_bygroup" -> ((s, dir) =>
      round9(Information.factorInformationCoefficient(
        Pipelines.factorData(s, dir, P, withGroup = true), byGroup = true),
        Seq("ret_1", "ret_5"))),
    "q_ic_bygroup_tv" -> ((s, dir) =>
      // by-group IC over TIME-VARYING membership: the group column is
      // per-row, so a mid-panel reclassification moves an asset between
      // cross-sections at the pivot with no extra plumbing
      round9(Information.factorInformationCoefficient(
        Pipelines.factorDataTv(s, dir, P), byGroup = true),
        Seq("ret_1", "ret_5"))),
    "q_avg_cum_ret" -> ((s, dir) =>
      // averageCumulativeReturnByQuantile, demeaned default, (2,3) band
      exactAvgCumRet(s, dir, before = 2, after = 3, demeaned = true)),
    "q_event_returns_sheet" -> ((s, dir) =>
      // createEventReturnsTearSheet's single table at the SHEET's
      // default band (tears.py:532: avgretplot=(5, 15), i.e.
      // periods_before=5, periods_after=15, long_short demean) — the composite's
      // parameter wiring, exact fixed-point mirror
      exactAvgCumRet(s, dir, before = 5, after = 15, demeaned = true)),
    "q_event_study_sheet" -> ((s, dir) => {
      // createEventStudyTearSheet COMPOSITE (tears.py:635-732): event
      // studies are long-only (demeaned=false, tears.py:666) and factor
      // returns equal-weighted (tears.py:689-691); four tables melted
      // long into one comparable (section, k, metric, value) table
      val fd = Pipelines.factorData(s, dir, P)
      val dkey = date_format(col("date"), "yyyy-MM-dd")
      melt(Tables.eventsDistribution(fd.df.select("date"), numBars = 50),
          "events_dist", col("bucket"), Seq("n_events"))
        .unionByName(melt(
          exactAvgCumRet(s, dir, before = 5, after = 15, demeaned = false),
          "avg_cum_ret",
          concat(col("factor_quantile").cast("string"), lit("|"),
            col("offset").cast("string")),
          Seq("mean", "std")))
        .unionByName(melt(round9(Returns.factorReturns(fd,
            demeaned = false, equalWeight = true), Seq("ret_1", "ret_5")),
          "factor_returns_ew", dkey, Seq("ret_1", "ret_5")))
        .unionByName(melt(round9(Returns.meanReturnByQuantile(fd,
            demeaned = false),
            Seq("ret_1", "ret_1_std_err", "ret_5", "ret_5_std_err")),
          "mean_ret_by_q", col("factor_quantile"),
          Seq("ret_1", "ret_1_std_err", "ret_5", "ret_5_std_err")))
        .orderBy("section", "k", "metric")
    }),
    "q_quantize_zero" -> ((s, dir) =>
      Quantize.quantizeFactor(Pipelines.merged(s, dir, P),
        Quantize.QuantilesInt(4), noRaise = true, zeroAware = true)
        .na.drop(Seq("factor_quantile"))
        .select("date", "asset", "factor", "factor_quantile")),
    "q_rolling_ic" -> ((s, dir) => {
      val ic = Information.factorInformationCoefficient(
        Pipelines.factorData(s, dir, P))
      round9(Tables.rollingMeanIc(ic, Seq("ret_1", "ret_5"))
        .select("date", "ret_1_rolling", "ret_5_rolling").orderBy("date"),
        Seq("ret_1_rolling", "ret_5_rolling"))
    }),
    "q_ic_hist" -> ((s, dir) => {
      // pre-round the ICs: exact-rational small-n corrs land ON bin
      // boundaries, where a last-ulp cross-engine difference flips bins
      val ic = round9(Information.factorInformationCoefficient(
        Pipelines.factorData(s, dir, P)), Seq("ret_1", "ret_5"))
      Tables.icHistTable(ic, Seq("ret_1", "ret_5"), bins = 20)
    }),
    "q_events_dist" -> ((s, dir) =>
      Tables.eventsDistribution(
        Pipelines.factorData(s, dir, P).df.select("date"), numBars = 50)),
    "q_ic_qq" -> ((s, dir) => {
      val ic = Information.factorInformationCoefficient(
        Pipelines.factorData(s, dir, P))
      round6(round9(Tables.icQQTable(ic, Seq("ret_1", "ret_5")), Seq("p")),
        Seq("theoretical", "observed"))
    }),
    "q_spread_bydate" -> ((s, dir) => {
      val fd = Pipelines.factorData(s, dir, P)
      val mrqDate = Returns.meanReturnByQuantile(fd, byDate = true)
      round9(Returns.computeMeanReturnsSpread(mrqDate, 5, 1, fd.returnCols),
        Seq("ret_1", "ret_1_std_err", "ret_5", "ret_5_std_err"))
    }),
    "q_alpha_beta" -> ((s, dir) =>
      round9(Returns.factorAlphaBeta(Pipelines.factorData(s, dir, P)),
        Seq("ret_1", "ret_5"))),
    "q_backshift" -> ((s, dir) =>
      EventStudy.backshift(
        Pipelines.factorData(s, dir, P).df.select("date", "asset", "ret_1"),
        "ret_1", n = 2)),
    "q_event_study" -> ((s, dir) => {
      // exact fixed-point mirror of commonStartReturns(meanByDate=true,
      // demeanBy=panel) for quantile-5 events: per (event_date, offset)
      // value = mean over q5 assets of (level - panel mean) =
      // (n*sum_q5(L) - k*sum_all(L)) / (1e9*n*k), all-integer numerator.
      val (s1, dm) = exactBanded(s, dir)
      // the nano-unit value is rounded with exact integer arithmetic
      // (divHalfAway): num/den with den = n*k (often 2..8) lands
      // EXACTLY on the .5 nano-grid for ~0.2% of rows, where any
      // float-side `round` mirror breaks down cross-engine
      s1.filter(col("factor_quantile") === 5)
        .join(dm, Seq("event_date", "offset"))
        .withColumn("__num", (col("n") * col("sl") - col("k") * col("S")))
        .withColumn("__den", (col("n") * col("k")).cast(DecimalType(38, 0)))
        .select(col("event_date"), col("offset"),
          (divHalfAway.cast("double") / lit(1e9)).as("value"))
        .orderBy("event_date", "offset")
    }),
    "q_factor_weights" -> ((s, dir) =>
      round9(Returns.factorWeights(Pipelines.factorData(s, dir, P))
        .select("date", "asset", "weight"), Seq("weight"))),
    "q_mean_ic_weekly" -> ((s, dir) =>
      round9(Information.meanInformationCoefficient(
        Pipelines.factorData(s, dir, P), byTime = Some("W")),
        Seq("ret_1", "ret_5"))),
    "q_ic_groupadj" -> ((s, dir) =>
      round9(Information.factorInformationCoefficient(
        Pipelines.factorData(s, dir, P, withGroup = true), groupAdjust = true),
        Seq("ret_1", "ret_5"))),
    "q_mean_ic_bygroup" -> ((s, dir) =>
      round9(Information.meanInformationCoefficient(
        Pipelines.factorData(s, dir, P, withGroup = true), byGroup = true),
        Seq("ret_1", "ret_5"))),
    "q_factor_returns_gn" -> ((s, dir) =>
      // group-neutral path: demean + gross-normalize within (date, group),
      // then renormalize across the date (performance.py:127-148, 203)
      round9(Returns.factorReturns(
        Pipelines.factorData(s, dir, P, withGroup = true), groupAdjust = true),
        Seq("ret_1", "ret_5"))),
    "q_quantize_bygroup" -> ((s, dir) =>
      Quantize.quantizeFactor(Pipelines.merged(s, dir, P, withGroup = true),
        Quantize.QuantilesInt(4), byGroup = true, noRaise = true)
        .na.drop(Seq("factor_quantile"))
        .select("date", "asset", "factor", "group", "factor_quantile")),
    "q_returns_sheet" -> ((s, dir) => {
      // the full returns tear-sheet COMPOSITE (tears.py:178-344, default
      // flags): all eight result tables melted long into one comparable
      // (section, k, metric, value) table — covers the sheet's wiring
      // (demeaned weights, rate conversion, extreme-quantile spread,
      // 1D cumulative curves), not just the components in isolation
      val sheet = graft.sheets.Sheets.createReturnsTearSheet(
        Pipelines.factorData(s, dir, P))
      val dkey = date_format(col("date"), "yyyy-MM-dd")
      val qdkey = concat(col("factor_quantile").cast("string"), lit("|"), dkey)
      val errCols = Seq("ret_1", "ret_1_std_err", "ret_5", "ret_5_std_err")
      melt(round9(sheet.factorReturns, Seq("ret_1", "ret_5")),
          "factor_returns", dkey, Seq("ret_1", "ret_5"))
        .unionByName(melt(round9(sheet.meanQuantRateret, Seq("ret_1", "ret_5")),
          "mean_quant_rateret", col("factor_quantile"), Seq("ret_1", "ret_5")))
        .unionByName(melt(round9(sheet.meanQuantRateretByDate, errCols),
          "mean_quant_rateret_bydate", qdkey, errCols))
        .unionByName(melt(round9(sheet.spread, errCols),
          "spread", dkey, errCols))
        .unionByName(melt(round9(sheet.alphaBeta, Seq("ret_1", "ret_5")),
          "alpha_beta", col("stat"), Seq("ret_1", "ret_5")))
        .unionByName(melt(round9(sheet.returnsTable, Seq("ret_1", "ret_5")),
          "returns_table", col("stat"), Seq("ret_1", "ret_5")))
        .unionByName(melt(round9(sheet.cumulativeReturns.get, Seq("cum_ret_1")),
          "cumulative", dkey, Seq("cum_ret_1")))
        .unionByName(melt(
          round9(sheet.cumulativeReturnsByQuantile.get, Seq("cum_ret_1")),
          "cumulative_byq", qdkey, Seq("cum_ret_1")))
        .orderBy("section", "k", "metric")
    }),
    "q_info_sheet" -> ((s, dir) => {
      // information tear-sheet COMPOSITE (tears.py:347-406, with the
      // by-group branch on): IC series, summary, monthly and group means
      val sheet = graft.sheets.Sheets.createInformationTearSheet(
        Pipelines.factorData(s, dir, P, withGroup = true), byGroup = true)
      val dkey = date_format(col("date"), "yyyy-MM-dd")
      val sumCols = Seq("ic_mean", "ic_std", "risk_adjusted_ic", "t_stat",
        "ic_skew", "ic_kurtosis")
      melt(round9(sheet.ic, Seq("ret_1", "ret_5")), "ic", dkey,
          Seq("ret_1", "ret_5"))
        .unionByName(melt(round9(sheet.icSummary.drop("p_value"), sumCols),
          "ic_summary", col("period"), sumCols :+ "n"))
        .unionByName(melt(round9(sheet.monthlyMeanIc, Seq("ret_1", "ret_5")),
          "monthly_ic", dkey, Seq("ret_1", "ret_5")))
        .unionByName(melt(round9(sheet.meanIcByGroup.get, Seq("ret_1", "ret_5")),
          "ic_bygroup", col("group"), Seq("ret_1", "ret_5")))
        .orderBy("section", "k", "metric")
    }),
    "q_turnover_sheet" -> ((s, dir) => {
      // turnover tear-sheet COMPOSITE (tears.py:409-485, inferred 1D/5D
      // periods): per-date turnover + autocorr series and their means
      val sheet = graft.sheets.Sheets.createTurnoverTearSheet(
        Pipelines.factorData(s, dir, P))
      val dkey = date_format(col("date"), "yyyy-MM-dd")
      melt(sheet.quantileTurnover, "quantile_turnover",
          concat(col("period"), lit("|"),
            col("factor_quantile").cast("string"), lit("|"), dkey),
          Seq("turnover"))
        .unionByName(melt(round9(sheet.autocorrelation, Seq("autocorr")),
          "autocorrelation", concat(col("period"), lit("|"), dkey),
          Seq("autocorr")))
        .unionByName(melt(round9(sheet.quantileTurnoverMeans,
            Seq("mean_turnover")),
          "turnover_means",
          concat(col("factor_quantile").cast("string"), lit("|"), col("period")),
          Seq("mean_turnover")))
        .unionByName(melt(round9(sheet.autocorrelationMeans,
            Seq("mean_autocorr")),
          "autocorr_means", col("period"), Seq("mean_autocorr")))
        .orderBy("section", "k", "metric")
    })
  )

  // ---- oracle SQL -----------------------------------------------------

  private def pre: String = Pipelines.oraclePrelude(P, 5)
  private def preG: String = Pipelines.oraclePrelude(P, 5, withGroup = true)

  /** TIME-VARYING factor_data CTE chain (appended to `pre`; ends in
    * `fd2`): mirrors Pipelines.tvGroupMap + factorDataTv — nation remap
    * after the pivot for asset % 3 == 0, mapping dropout for
    * asset % 97 == 0, quantile edges cut AFTER the tv join (the
    * reference's build order). Shared by the tv factor_data and tv
    * by-group analytics oracles. */
  private def tvFactorDataCtes: String = {
    val fracs = (0 to 5).map(i =>
      BigDecimal(i.toDouble / 5).toString).mkString(", ")
    val ladder = (1 to 5).map(i =>
      s"WHEN factor <= edges[${i + 1}] THEN $i").mkString(" ")
    s""", tvstat AS (
       |  SELECT s_suppkey AS asset, n.n_name AS g0, n2.n_name AS g2
       |  FROM supplier
       |  JOIN nation n ON s_nationkey = n.n_nationkey
       |  JOIN nation n2 ON ((s_nationkey + 1) % 25) = n2.n_nationkey),
       |tvmap AS (
       |  SELECT p.date, p.asset,
       |    CASE WHEN p.asset % 3 = 0 AND p.date >= TIMESTAMP '1998-06-01'
       |         THEN t.g2 ELSE t.g0 END AS grp
       |  FROM (SELECT date, asset FROM panel) p
       |  JOIN tvstat t USING (asset)
       |  WHERE NOT (p.asset % 97 = 0 AND p.date >= TIMESTAMP '1998-06-01')),
       |mtv AS (
       |  SELECT m.*, tv.grp AS "group"
       |  FROM merged m JOIN tvmap tv USING (date, asset)),
       |edged2 AS (
       |  SELECT *, quantile_cont(factor, [$fracs])
       |            OVER (PARTITION BY date) AS edges
       |  FROM mtv),
       |fd2 AS (
       |  SELECT * EXCLUDE (edges, bucket), bucket AS factor_quantile
       |  FROM (
       |    SELECT *, CASE WHEN len(list_distinct(edges)) < len(edges) THEN NULL
       |                   ELSE (CASE $ladder END) END AS bucket
       |    FROM edged2)
       |  WHERE bucket IS NOT NULL)""".stripMargin
  }

  /** IC per date CTE chain (exact integer-rank corr), shared. */
  private def icCte = Pipelines.icExactCtes(P)

  /** Shared event-study oracle CTEs: exact telescoped levels
    * (price/first_value — no exp/ln drift), global date index, 1e9
    * fixed-point band rows, demean-universe integer sums. Mirrors
    * [[exactBanded]] token-for-token. */
  private def bandCtes(before: Int, after: Int): String =
    s""", lvl AS (SELECT date, asset,
       |  price / first_value(price) OVER (PARTITION BY asset ORDER BY date) AS v
       |  FROM priced),
       |didx AS (SELECT date, row_number() OVER (ORDER BY date) - 1 AS di
       |  FROM (SELECT DISTINCT date FROM lvl)),
       |lv AS (SELECT l.asset, d.di, l.v FROM lvl l JOIN didx d USING (date)),
       |ev AS (SELECT f.date AS event_date, f.asset, d.di AS ei, f.factor_quantile
       |  FROM factor_data f JOIN didx d USING (date)),
       |banded AS (SELECT ev.event_date, ev.asset, lv.di - ev.ei AS off,
       |  CAST(round(lv.v * 1e9, 0) AS BIGINT) AS L, ev.factor_quantile
       |  FROM ev JOIN lv ON lv.asset = ev.asset
       |    AND lv.di BETWEEN ev.ei - $before AND ev.ei + $after),
       |s1 AS (SELECT factor_quantile, event_date, off, sum(L) AS sl,
       |    count(*) AS k
       |  FROM banded GROUP BY 1, 2, 3),
       |dm AS (SELECT event_date, off, sum(sl) AS S, sum(k) AS n
       |  FROM s1 GROUP BY 1, 2)""".stripMargin

  /** The avg-cumulative-return two-stage estimator over a (before,
    * after) band, mirroring [[exactAvgCumRet]] token-for-token:
    * stage-1 fixed-point means (demeaned or raw), stage-2 mean/std from
    * exact integer sums. */
  private def avgCumRetSql(before: Int, after: Int, demeaned: Boolean): String = {
    val (num, den) =
      if (demeaned) ("(dm.n * s1.sl - s1.k * dm.S) * 1000000", "dm.n * s1.k")
      else ("s1.sl * 1000000", "s1.k")
    s"""$pre${bandCtes(before, after)},
       |s1m AS (SELECT factor_quantile, off,
       |  (CASE WHEN num < 0 THEN -1 ELSE 1 END) *
       |    ((2 * abs(num) + den) // (2 * den)) AS M
       |  FROM (SELECT s1.factor_quantile, s1.off,
       |    $num AS num,
       |    $den AS den
       |    FROM s1 JOIN dm USING (event_date, off))),
       |s2 AS (SELECT factor_quantile, off, sum(M) AS sm, sum(M * M) AS sm2,
       |    count(*) AS d
       |  FROM s1m GROUP BY 1, 2)
       |SELECT factor_quantile, off AS "offset",
       |  round(CAST(sm AS DOUBLE) / (1e15 * CAST(d AS DOUBLE)), 9) AS mean,
       |  CASE WHEN d > 1 THEN
       |    round(sqrt(CAST(d * sm2 - sm * sm AS DOUBLE) /
       |      (CAST(d AS DOUBLE) * (CAST(d AS DOUBLE) - 1.0))) / 1e15, 9)
       |  END AS std
       |FROM s2 ORDER BY 1, 2""".stripMargin
  }

  /** Acklam inverse-normal-CDF SQL, mirroring StatFunctions.normInv
    * with the identical Horner nesting (constants emitted as exact
    * string->double literals). The central branch is pure arithmetic
    * (bitwise cross-engine); the tail branches go through libm ln,
    * which can differ by 1 ulp — outputs are rounded to 6 anyway. */
  private def acklamSql(p: String): String = {
    val a = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Seq(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    def l(x: Double) = s"('$x'::DOUBLE)"
    def horner(cs: Seq[Double], q: String): String =
      cs.tail.foldLeft(l(cs.head))((acc, ci) => s"($acc * $q + ${l(ci)})")
    def tail(q: String): String =
      s"(${horner(c, q)} / (${horner(d, q)} * $q + 1.0))"
    val qLow = s"sqrt(-2.0 * ln($p))"
    val qHigh = s"sqrt(-2.0 * ln(1.0 - $p))"
    val qc = s"($p - 0.5)"
    val rc = s"($qc * $qc)"
    s"""CASE WHEN $p < 0.02425 THEN ${tail(qLow)}
       |     WHEN $p <= 0.97575 THEN
       |       (${horner(a, rc)} * $qc / (${horner(b, rc)} * $rc + 1.0))
       |     ELSE -${tail(qHigh)} END""".stripMargin
  }

  /** Per-period IC summary row (central moments two-pass). */
  private def icSummaryRow(label: String, c: String): String =
    s"""SELECT '$label' AS period,
       |  round(avg($c), 9) AS ic_mean,
       |  round(stddev_samp($c), 9) AS ic_std,
       |  round(avg($c) / stddev_samp($c), 9) AS risk_adjusted_ic,
       |  round(avg($c) / (stddev_samp($c) / sqrt(count($c))), 9) AS t_stat,
       |  round(avg(pow($c - mu_$c, 3)) / pow(avg(pow($c - mu_$c, 2)), 1.5), 9) AS ic_skew,
       |  round(avg(pow($c - mu_$c, 4)) / pow(avg(pow($c - mu_$c, 2)), 2) - 3.0, 9) AS ic_kurtosis,
       |  count($c) AS n
       |FROM ic, (SELECT avg(i1) AS mu_i1, avg(i5) AS mu_i5 FROM ic)""".stripMargin

  private lazy val baseOracle: Map[String, String] = Map(
    "q_quantile_stats" ->
      s"""$pre, qs AS (
         |  SELECT factor_quantile, min(factor) AS mn, max(factor) AS mx,
         |         avg(factor) AS me, stddev_samp(factor) AS sd,
         |         count(factor) AS n
         |  FROM factor_data GROUP BY 1)
         |SELECT factor_quantile, round(mn, 6) AS min, round(mx, 6) AS max,
         |  round(me, 6) AS mean, round(sd, 6) AS std, n AS count,
         |  round(n * 100.0 / sum(n) OVER (), 6) AS count_pct
         |FROM qs ORDER BY factor_quantile""".stripMargin,

    "q_ic_summary" ->
      s"""$pre$icCte
         |${icSummaryRow("ret_1", "i1")}
         |UNION ALL
         |${icSummaryRow("ret_5", "i5")}""".stripMargin,

    "q_returns_table" ->
      s"""$pre, dm AS (
         |  SELECT date, asset, ret_1, ret_5,
         |    factor - avg(factor) OVER (PARTITION BY date) AS c
         |  FROM factor_data),
         |wts AS (SELECT date, asset, ret_1, ret_5,
         |  c / sum(abs(c)) OVER (PARTITION BY date) AS weight FROM dm),
         |fr AS (SELECT date, CASE WHEN count(ret_1 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_1 * weight ORDER BY asset) FILTER (WHERE ret_1 * weight IS NOT NULL)), (a, b) -> a + b) END AS r1,
         |  CASE WHEN count(ret_5 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_5 * weight ORDER BY asset) FILTER (WHERE ret_5 * weight IS NOT NULL)), (a, b) -> a + b) END AS r5
         |  FROM wts GROUP BY date),
         |uni AS (SELECT date, avg(ret_1) AS u1, avg(ret_5) AS u5
         |  FROM factor_data GROUP BY date),
         |j AS (SELECT fr.date, r1, r5, u1, u5 FROM fr JOIN uni USING (date)),
         |ab AS (SELECT
         |  covar_samp(u1, r1) / var_samp(u1) AS b1,
         |  covar_samp(u5, r5) / var_samp(u5) AS b5,
         |  avg(r1) - covar_samp(u1, r1) / var_samp(u1) * avg(u1) AS a1,
         |  avg(r5) - covar_samp(u5, r5) / var_samp(u5) * avg(u5) AS a5
         |  FROM j),
         |dmq AS (SELECT factor_quantile, date,
         |  ret_1 - avg(ret_1) OVER (PARTITION BY date) AS d1,
         |  ret_5 - avg(ret_5) OVER (PARTITION BY date) AS d5
         |  FROM factor_data),
         |s1 AS (SELECT factor_quantile, date, avg(d1) AS m1, avg(d5) AS m5,
         |  stddev_samp(d1) / sqrt(count(d1)) AS e1,
         |  stddev_samp(d5) / sqrt(count(d5)) AS e5
         |  FROM dmq GROUP BY 1, 2),
         |s2 AS (SELECT factor_quantile, avg(m1) AS m1, avg(m5) AS m5
         |  FROM s1 GROUP BY 1),
         |rr AS (SELECT factor_quantile, (1.0 + m1) - 1.0 AS c1,
         |  pow(1.0 + m5, 0.2) - 1.0 AS c5 FROM s2),
         |rr1 AS (SELECT factor_quantile, date, (1.0 + m1) - 1.0 AS c1,
         |  pow(1.0 + m5, 0.2) - 1.0 AS c5, e1,
         |  e5 / sqrt(5.0) AS e5 FROM s1),
         |spr AS (SELECT a.date, a.c1 - b.c1 AS s1v, a.c5 - b.c5 AS s5v
         |  FROM rr1 a JOIN rr1 b ON a.date = b.date
         |  WHERE a.factor_quantile = 5 AND b.factor_quantile = 1)
         |SELECT 'Ann. alpha' AS stat, round(pow(1.0 + a1, 252.0) - 1.0, 9) AS ret_1,
         |       round(pow(1.0 + a5, 50.4) - 1.0, 9) AS ret_5 FROM ab
         |UNION ALL
         |SELECT 'beta', round(b1, 9), round(b5, 9) FROM ab
         |UNION ALL
         |SELECT 'Mean Period Wise Return Top Quantile (bps)',
         |       round(c1 * 10000, 9), round(c5 * 10000, 9)
         |FROM rr WHERE factor_quantile = 5
         |UNION ALL
         |SELECT 'Mean Period Wise Return Bottom Quantile (bps)',
         |       round(c1 * 10000, 9), round(c5 * 10000, 9)
         |FROM rr WHERE factor_quantile = 1
         |UNION ALL
         |SELECT 'Mean Period Wise Spread (bps)',
         |       round(avg(s1v) * 10000, 9), round(avg(s5v) * 10000, 9) FROM spr""".stripMargin,

    "q_turnover_means" ->
      s"""$pre, sets AS (
         |  SELECT date, factor_quantile, list(DISTINCT asset) AS names
         |  FROM factor_data GROUP BY 1, 2),
         |idx AS (SELECT *, row_number()
         |  OVER (PARTITION BY factor_quantile ORDER BY date) AS rn FROM sets),
         |tv AS (
         |  SELECT 1 AS period_n, a.factor_quantile,
         |    len(list_filter(a.names, x -> NOT list_contains(b.names, x)))::DOUBLE
         |      / len(a.names) AS turnover
         |  FROM idx a JOIN idx b ON b.factor_quantile = a.factor_quantile
         |    AND b.rn = a.rn - 1
         |  UNION ALL
         |  SELECT 5, a.factor_quantile,
         |    len(list_filter(a.names, x -> NOT list_contains(b.names, x)))::DOUBLE
         |      / len(a.names)
         |  FROM idx a JOIN idx b ON b.factor_quantile = a.factor_quantile
         |    AND b.rn = a.rn - 5)
         |SELECT factor_quantile, period_n::VARCHAR || 'D' AS period,
         |  round(avg(turnover), 9) AS mean_turnover
         |FROM tv GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_autocorr_means" ->
      s"""$pre, ranks AS (
         |  SELECT date, asset, ${Pipelines.rank2Sql("factor", "date")} AS r
         |  FROM factor_data),
         |didx AS (SELECT date, row_number() OVER (ORDER BY date) AS di
         |         FROM (SELECT DISTINCT date FROM factor_data)),
         |cur AS (SELECT r, asset, di, date FROM ranks JOIN didx USING (date)),
         |pairs AS (
         |  -- periods unrolled so each branch is a pure equi-join on
         |  -- (asset, di ± const): the parametric form forced the
         |  -- engine through an asset-only join with a residual filter
         |  -- (quadratic in dates-per-asset); values are identical
         |  -- (ranks are integers, sums exact in any order)
         |  SELECT 1 AS period_n, cur.date, cur.r AS xr, prev.r AS yr
         |  FROM cur JOIN cur prev
         |    ON cur.asset = prev.asset AND cur.di = prev.di + 1
         |  UNION ALL
         |  SELECT 5, cur.date, cur.r, prev.r
         |  FROM cur JOIN cur prev
         |    ON cur.asset = prev.asset AND cur.di = prev.di + 5),
         |s AS (
         |  SELECT period_n, date, count(*)::DOUBLE AS n,
         |    sum(xr)::DOUBLE AS sx, sum(xr*xr)::DOUBLE AS sxx,
         |    sum(yr)::DOUBLE AS sy, sum(yr*yr)::DOUBLE AS syy,
         |    sum(xr*yr)::DOUBLE AS sxy
         |  FROM pairs GROUP BY 1, 2),
         |ac AS (
         |  SELECT period_n, date,
         |    ${Pipelines.exactCorrSql("n", "sx", "sxx", "sy", "syy", "sxy")}
         |      AS autocorr
         |  FROM s)
         |SELECT period_n::VARCHAR || 'D' AS period,
         |  round(avg(autocorr), 9) AS mean_autocorr
         |FROM ac GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_factor_data_group" ->
      s"""$preG SELECT date, asset, ret_1, ret_5, factor, "group", factor_quantile
         |FROM factor_data ORDER BY date, asset""".stripMargin,

    "q_factor_data_group_tv" ->
      s"""$pre$tvFactorDataCtes
         |SELECT date, asset, ret_1, ret_5, factor, "group", factor_quantile
         |FROM fd2 ORDER BY date, asset""".stripMargin,

    "q_ic_bygroup_tv" ->
      // by-group Spearman IC over the TIME-VARYING membership: the
      // group column is per-row, so a mid-panel reclassification moves
      // an asset between cross-sections at the pivot — the analytics
      // thread through the tv mapping with no extra plumbing
      s"""$pre$tvFactorDataCtes${Pipelines.icExactCtes(P, byGroup = true, src = "fd2")}
         |SELECT date, "group", round(i1, 9) AS ret_1, round(i5, 9) AS ret_5
         |FROM ic ORDER BY date, "group"""".stripMargin,

    "q_ic_bygroup" ->
      s"""$preG${Pipelines.icExactCtes(P, byGroup = true)}
         |SELECT date, "group", round(i1, 9) AS ret_1, round(i5, 9) AS ret_5
         |FROM ic ORDER BY date, "group"""".stripMargin,

    "q_avg_cum_ret" -> avgCumRetSql(2, 3, demeaned = true),

    "q_quantize_zero" -> {
      // zero-aware qcut, quantiles=4: each sign half gets 2 buckets;
      // positive buckets shift by quantiles/2 (utils.py:143-156)
      s"""$pre, ep AS (
         |  SELECT date, quantile_cont(factor, [0.0, 0.5, 1.0]) AS e
         |  FROM merged WHERE factor >= 0 GROUP BY date),
         |en AS (
         |  SELECT date, quantile_cont(factor, [0.0, 0.5, 1.0]) AS e
         |  FROM merged WHERE factor < 0 GROUP BY date),
         |b AS (
         |  SELECT m.date, m.asset, m.factor,
         |    CASE WHEN m.factor >= 0 THEN
         |      CASE WHEN len(list_distinct(ep.e)) < len(ep.e) THEN NULL
         |           ELSE (CASE WHEN m.factor <= ep.e[2] THEN 1
         |                      WHEN m.factor <= ep.e[3] THEN 2 END) + 2 END
         |    ELSE
         |      CASE WHEN len(list_distinct(en.e)) < len(en.e) THEN NULL
         |           ELSE CASE WHEN m.factor <= en.e[2] THEN 1
         |                     WHEN m.factor <= en.e[3] THEN 2 END END
         |    END AS factor_quantile
         |  FROM merged m
         |  LEFT JOIN ep ON ep.date = m.date
         |  LEFT JOIN en ON en.date = m.date)
         |SELECT date, asset, factor, factor_quantile FROM b
         |WHERE factor_quantile IS NOT NULL ORDER BY date, asset""".stripMargin
    },

    "q_rolling_ic" ->
      s"""$pre$icCte
         |SELECT date,
         |  round(avg(i1) OVER (ORDER BY date ROWS BETWEEN 21 PRECEDING AND CURRENT ROW), 9)
         |    AS ret_1_rolling,
         |  round(avg(i5) OVER (ORDER BY date ROWS BETWEEN 21 PRECEDING AND CURRENT ROW), 9)
         |    AS ret_5_rolling
         |FROM ic ORDER BY date""".stripMargin,

    "q_ic_hist" -> {
      // every fractional literal cast ::DOUBLE — DuckDB parses them as
      // DECIMAL, whose arithmetic rounds differently from IEEE double
      def block(label: String, c: String) =
        s"""SELECT '$label' AS period,
           |  least(greatest(floor((coalesce($c, 0.0) + 1.0) / 0.1::DOUBLE), 0.0), 19.0)::INT AS bin
           |FROM ich""".stripMargin
      s"""$pre$icCte,
         |ich AS (SELECT date, round(i1, 9) AS i1, round(i5, 9) AS i5 FROM ic),
         |b1 AS (SELECT period, bin, count(*) AS cnt FROM (${block("ret_1", "i1")})
         |  GROUP BY 1, 2),
         |b5 AS (SELECT period, bin, count(*) AS cnt FROM (${block("ret_5", "i5")})
         |  GROUP BY 1, 2),
         |allb AS (
         |  SELECT period, bin, cnt,
         |    cnt / sum(cnt) OVER (PARTITION BY period) / 0.1::DOUBLE AS density
         |  FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b5))
         |SELECT period, bin, bin * 0.1::DOUBLE - 1.0 AS lo,
         |  (bin + 1) * 0.1::DOUBLE - 1.0 AS hi,
         |  cnt AS count, density
         |FROM allb ORDER BY period, bin""".stripMargin
    },

    "q_ic_qq" ->
      s"""$pre$icCte,
         |qq_src AS (
         |  SELECT 'ret_1' AS period, coalesce(i1, 0.0) AS v FROM ic
         |  UNION ALL
         |  SELECT 'ret_5' AS period, coalesce(i5, 0.0) AS v FROM ic),
         |qq AS (
         |  SELECT period, v,
         |    row_number() OVER (PARTITION BY period ORDER BY v) AS rn,
         |    count(*) OVER (PARTITION BY period) AS cnt,
         |    avg(v) OVER (PARTITION BY period) AS mu,
         |    stddev_samp(v) OVER (PARTITION BY period) AS sd
         |  FROM qq_src),
         |pp AS (SELECT period, rn / (cnt + 1.0) AS p, (v - mu) / sd AS obs
         |       FROM qq)
         |SELECT period, round(p, 9) AS p,
         |  round(${acklamSql("p")}, 6) AS theoretical,
         |  round(obs, 6) AS observed
         |FROM pp ORDER BY period, p""".stripMargin,

    "q_events_dist" ->
      s"""$pre, ds AS (SELECT epoch(date)::DOUBLE AS t FROM factor_data),
         |bounds AS (SELECT min(t) AS lo, max(t) AS hi FROM ds),
         |bk AS (SELECT
         |  CASE WHEN hi > lo
         |       THEN least(floor((t - lo) / (hi - lo) * 50), 49.0)::INT
         |       ELSE 0 END AS bucket,
         |  lo, hi FROM ds, bounds)
         |SELECT bucket,
         |  to_timestamp(floor(lo + bucket * (hi - lo) / 50)::BIGINT)::TIMESTAMP
         |    AS bucket_start,
         |  count(*) AS n_events
         |FROM bk GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q_alpha_beta" ->
      s"""$pre, dm AS (
         |  SELECT date, asset, ret_1, ret_5,
         |    factor - avg(factor) OVER (PARTITION BY date) AS c
         |  FROM factor_data),
         |wts AS (SELECT date, asset, ret_1, ret_5,
         |  c / sum(abs(c)) OVER (PARTITION BY date) AS weight FROM dm),
         |fr AS (SELECT date, CASE WHEN count(ret_1 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_1 * weight ORDER BY asset) FILTER (WHERE ret_1 * weight IS NOT NULL)), (a, b) -> a + b) END AS r1,
         |  CASE WHEN count(ret_5 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_5 * weight ORDER BY asset) FILTER (WHERE ret_5 * weight IS NOT NULL)), (a, b) -> a + b) END AS r5
         |  FROM wts GROUP BY date),
         |uni AS (SELECT date, avg(ret_1) AS u1, avg(ret_5) AS u5
         |  FROM factor_data GROUP BY date),
         |j AS (SELECT fr.date, r1, r5, u1, u5 FROM fr JOIN uni USING (date)),
         |ab AS (SELECT
         |  covar_samp(u1, r1) / var_samp(u1) AS b1,
         |  covar_samp(u5, r5) / var_samp(u5) AS b5,
         |  avg(r1) - covar_samp(u1, r1) / var_samp(u1) * avg(u1) AS a1,
         |  avg(r5) - covar_samp(u5, r5) / var_samp(u5) * avg(u5) AS a5
         |  FROM j)
         |SELECT 'Ann. alpha' AS stat, round(pow(a1 + 1.0, 252.0) - 1.0, 9) AS ret_1,
         |       round(pow(a5 + 1.0, 50.4) - 1.0, 9) AS ret_5 FROM ab
         |UNION ALL
         |SELECT 'beta', round(b1, 9), round(b5, 9) FROM ab""".stripMargin,

    "q_backshift" ->
      s"""$pre, didx AS (SELECT date, row_number() OVER (ORDER BY date) - 1 AS di
         |  FROM (SELECT DISTINCT date FROM factor_data)),
         |sh AS (SELECT f.asset, d.di - 2 AS di, f.ret_1
         |  FROM factor_data f JOIN didx d USING (date) WHERE d.di >= 2)
         |SELECT d2.date, sh.asset, sh.ret_1
         |FROM sh JOIN didx d2 ON d2.di = sh.di
         |ORDER BY date, asset""".stripMargin,

    "q_event_study" ->
      s"""$pre${bandCtes(2, 3)},
         |q5 AS (SELECT event_date, off, sl, k FROM s1
         |  WHERE factor_quantile = 5),
         |j AS (SELECT q5.event_date, q5.off,
         |  dm.n * q5.sl - q5.k * dm.S AS num, dm.n * q5.k AS den
         |  FROM q5 JOIN dm USING (event_date, off))
         |SELECT event_date, off AS "offset",
         |  CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
         |    ((2 * abs(num) + den) // (2 * den)) AS DOUBLE) / 1e9 AS value
         |FROM j ORDER BY event_date, "offset"""".stripMargin,

    "q_factor_weights" ->
      s"""$pre, dm AS (
         |  SELECT date, asset, factor - avg(factor) OVER (PARTITION BY date) AS c
         |  FROM factor_data)
         |SELECT date, asset,
         |  round(c / sum(abs(c)) OVER (PARTITION BY date), 9) AS weight
         |FROM dm ORDER BY date, asset""".stripMargin,

    "q_mean_ic_weekly" ->
      s"""$pre$icCte
         |SELECT (date + ((7 - dayofweek(date)) % 7) * INTERVAL 1 DAY)::TIMESTAMP
         |    AS date,
         |  round(avg(i1), 9) AS ret_1, round(avg(i5), 9) AS ret_5
         |FROM ic GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_ic_groupadj" ->
      s"""$preG, dmret AS (
         |  SELECT date, factor,
         |    ret_1 - avg(ret_1) OVER (PARTITION BY date, "group") AS ret_1,
         |    ret_5 - avg(ret_5) OVER (PARTITION BY date, "group") AS ret_5
         |  FROM factor_data)${Pipelines.icExactCtes(P, src = "dmret")}
         |SELECT date, round(i1, 9) AS ret_1, round(i5, 9) AS ret_5
         |FROM ic ORDER BY date""".stripMargin,

    "q_mean_ic_bygroup" ->
      s"""$preG${Pipelines.icExactCtes(P, byGroup = true)}
         |SELECT "group", round(avg(i1), 9) AS ret_1, round(avg(i5), 9) AS ret_5
         |FROM ic GROUP BY "group" ORDER BY "group"""".stripMargin,

    "q_factor_returns_gn" ->
      s"""$preG, dm AS (
         |  SELECT date, asset, ret_1, ret_5, "group",
         |    factor - avg(factor) OVER (PARTITION BY date, "group") AS c
         |  FROM factor_data),
         |w1 AS (SELECT date, asset, ret_1, ret_5,
         |  CASE WHEN sum(abs(c)) OVER (PARTITION BY date, "group") = 0.0 THEN NULL
         |       ELSE c / sum(abs(c)) OVER (PARTITION BY date, "group") END AS w
         |  FROM dm),
         |w2 AS (SELECT date, asset, ret_1, ret_5,
         |  CASE WHEN sum(abs(w)) OVER (PARTITION BY date) = 0.0 THEN NULL
         |       ELSE w / sum(abs(w)) OVER (PARTITION BY date) END AS weight
         |  FROM w1)
         |SELECT date,
         |  round(CASE WHEN count(ret_1 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_1 * weight ORDER BY asset) FILTER (WHERE ret_1 * weight IS NOT NULL)), (a, b) -> a + b) END, 9) AS ret_1,
         |  round(CASE WHEN count(ret_5 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_5 * weight ORDER BY asset) FILTER (WHERE ret_5 * weight IS NOT NULL)), (a, b) -> a + b) END, 9) AS ret_5
         |FROM w2 GROUP BY date ORDER BY date""".stripMargin,

    "q_quantize_bygroup" -> {
      val ladder = (1 to 4).map(i =>
        s"WHEN factor <= e[${i + 1}] THEN $i").mkString(" ")
      s"""$preG, edgedg AS (
         |  SELECT date, asset, factor, "group",
         |    quantile_cont(factor, [0.0, 0.25, 0.5, 0.75, 1.0])
         |      OVER (PARTITION BY date, "group") AS e
         |  FROM merged),
         |b AS (
         |  SELECT date, asset, factor, "group",
         |    CASE WHEN len(list_distinct(e)) < len(e) THEN NULL
         |         ELSE (CASE $ladder END) END AS factor_quantile
         |  FROM edgedg)
         |SELECT date, asset, factor, "group", factor_quantile FROM b
         |WHERE factor_quantile IS NOT NULL ORDER BY date, asset""".stripMargin
    },

    "q_spread_bydate" ->
      s"""$pre, dmq AS (SELECT factor_quantile, date,
         |  ret_1 - avg(ret_1) OVER (PARTITION BY date) AS d1,
         |  ret_5 - avg(ret_5) OVER (PARTITION BY date) AS d5
         |  FROM factor_data),
         |s1 AS (SELECT factor_quantile, date, avg(d1) AS m1, avg(d5) AS m5,
         |  stddev_samp(d1) / sqrt(count(d1)) AS e1,
         |  stddev_samp(d5) / sqrt(count(d5)) AS e5
         |  FROM dmq GROUP BY 1, 2)
         |SELECT a.date,
         |  round(a.m1 - b.m1, 9) AS ret_1,
         |  round(sqrt(a.e1 * a.e1 + b.e1 * b.e1), 9) AS ret_1_std_err,
         |  round(a.m5 - b.m5, 9) AS ret_5,
         |  round(sqrt(a.e5 * a.e5 + b.e5 * b.e5), 9) AS ret_5_std_err
         |FROM s1 a JOIN s1 b ON a.date = b.date
         |WHERE a.factor_quantile = 5 AND b.factor_quantile = 1
         |ORDER BY a.date""".stripMargin
  )

  /** Melt one component twin into (section, k, metric, value) rows —
    * DuckDB allows a full WITH...SELECT as a parenthesized subquery, so
    * each existing component oracle nests verbatim. */
  private def meltSql(inner: String, section: String, keyExpr: String,
      metrics: Seq[String]): String =
    metrics.map(m =>
      s"SELECT '$section' AS section, $keyExpr AS k, '$m' AS metric, " +
        s"$m::DOUBLE AS value FROM ($inner)")
      .mkString("\nUNION ALL\n")

  /** Staged-replay decomposition of the summary/returns sheet oracles:
    * (section, key expr, metric columns, inner component SQL). The
    * sheet twins BUILD from this single source of truth, and
    * [[graft.Verify]] dumps it as `sheet_components.json` so
    * `tools/staged_sheet_oracle.py` can materialize each component
    * ONCE to parquet and melt from there: the fully-nested form
    * re-evaluates every component subquery per melted metric and
    * spilled past the disk budget at the 10x panel probe scale
    * (SURVEY §5 #12) — a DuckDB replay-cost boundary this staging
    * removes. */
  def sheetComponents: Map[String, Seq[(String, String, Seq[String], String)]] =
    Map(
      "q_summary_sheet" -> Seq(
        ("quantile_stats", "factor_quantile::VARCHAR",
          Seq("min", "max", "mean", "std", "count", "count_pct"),
          baseOracle("q_quantile_stats")),
        ("returns_table", "stat", Seq("ret_1", "ret_5"),
          baseOracle("q_returns_table")),
        ("ic_summary", "period",
          Seq("ic_mean", "ic_std", "risk_adjusted_ic", "t_stat", "ic_skew",
            "ic_kurtosis", "n"),
          baseOracle("q_ic_summary")),
        ("turnover_means", "factor_quantile::VARCHAR || '|' || period",
          Seq("mean_turnover"), baseOracle("q_turnover_means")),
        ("autocorr_means", "period", Seq("mean_autocorr"),
          baseOracle("q_autocorr_means"))),
      "q_returns_sheet" -> Seq(
        ("factor_returns", "strftime(date, '%Y-%m-%d')",
          Seq("ret_1", "ret_5"),
          graft.SparkEntry.factorOracleSql("q_factor_returns")),
        ("mean_quant_rateret", "factor_quantile::VARCHAR",
          Seq("ret_1", "ret_5"), mqrRateSql),
        ("mean_quant_rateret_bydate",
          "factor_quantile::VARCHAR || '|' || strftime(date, '%Y-%m-%d')",
          Seq("ret_1", "ret_1_std_err", "ret_5", "ret_5_std_err"),
          mqrDateRateSql),
        ("spread", "strftime(date, '%Y-%m-%d')",
          Seq("ret_1", "ret_1_std_err", "ret_5", "ret_5_std_err"),
          spreadRateSql),
        ("alpha_beta", "stat", Seq("ret_1", "ret_5"),
          baseOracle("q_alpha_beta")),
        ("returns_table", "stat", Seq("ret_1", "ret_5"),
          baseOracle("q_returns_table")),
        ("cumulative", "strftime(date, '%Y-%m-%d')", Seq("cum_ret_1"),
          graft.SparkEntry.factorOracleSql("q_cumulative_returns")),
        ("cumulative_byq",
          "factor_quantile::VARCHAR || '|' || strftime(date, '%Y-%m-%d')",
          Seq("cum_ret_1"), cumByQSql)))

  private def sheetSqlFrom(name: String): String =
    sheetComponents(name).map { case (sec, key, ms, inner) =>
      meltSql(inner, sec, key, ms)
    }.mkString("\nUNION ALL\n") + "\nORDER BY section, k, metric"

  /** q_summary_sheet oracle: the five component twins melted long and
    * unioned — the DuckDB replay of [[graft.sheets.Sheets
    * .createSummaryTearSheet]]'s full output as ONE comparable table,
    * covering the composite's parameter wiring (default flags,
    * day-period selection), not just the components in isolation. */
  private def summarySheetSql: String = sheetSqlFrom("q_summary_sheet")

  // ---- returns / information / turnover sheet oracles -----------------

  /** Stage-1 of the two-stage demeaned mean-return estimator (by
    * quantile × date, with std errors) — the input every returns-sheet
    * component rate-converts. Token-identical to the q_spread_bydate
    * CTEs so the float-op shapes match meanReturnByQuantile's. */
  private def byDateCtes: String =
    s"""$pre, dmq AS (SELECT factor_quantile, date,
       |  ret_1 - avg(ret_1) OVER (PARTITION BY date) AS d1,
       |  ret_5 - avg(ret_5) OVER (PARTITION BY date) AS d5
       |  FROM factor_data),
       |s1 AS (SELECT factor_quantile, date, avg(d1) AS m1, avg(d5) AS m5,
       |  stddev_samp(d1) / sqrt(count(d1)) AS e1,
       |  stddev_samp(d5) / sqrt(count(d5)) AS e5
       |  FROM dmq GROUP BY 1, 2)""".stripMargin

  /** Rate-converted overall mean return by quantile: stage-2 mean of the
    * daily means, then (1+m)^(1/days)-1. pow(x, 1.0) == x in both
    * engines, so the 1-day conversion is written (1.0+m)-1.0 to mirror
    * Spark's pow(m+1, 1.0)-1.0 bitwise (q_returns_table precedent). */
  private def mqrRateSql: String =
    s"""$byDateCtes, s2 AS (SELECT factor_quantile, avg(m1) AS m1, avg(m5) AS m5
       |  FROM s1 GROUP BY 1)
       |SELECT factor_quantile, round((1.0 + m1) - 1.0, 9) AS ret_1,
       |  round(pow(1.0 + m5, 0.2) - 1.0, 9) AS ret_5 FROM s2""".stripMargin

  /** Rate-converted by-date means + converted std errors (std err of the
    * k-day horizon divides by sqrt(k) — utils.std_conversion). */
  private def mqrDateRateSql: String =
    s"""$byDateCtes
       |SELECT factor_quantile, date,
       |  round((1.0 + m1) - 1.0, 9) AS ret_1, round(e1, 9) AS ret_1_std_err,
       |  round(pow(1.0 + m5, 0.2) - 1.0, 9) AS ret_5,
       |  round(e5 / sqrt(5.0), 9) AS ret_5_std_err
       |FROM s1""".stripMargin

  /** Top-minus-bottom spread of the RATE-CONVERTED by-date means with
    * joint std error — unlike q_spread_bydate (raw means), this is the
    * sheet's wiring (tears.py:248-258 converts before spreading). */
  private def spreadRateSql: String =
    s"""$byDateCtes, rc1 AS (SELECT factor_quantile, date,
       |  (1.0 + m1) - 1.0 AS r1, e1 AS se1,
       |  pow(1.0 + m5, 0.2) - 1.0 AS r5, e5 / sqrt(5.0) AS se5 FROM s1)
       |SELECT a.date, round(a.r1 - b.r1, 9) AS ret_1,
       |  round(sqrt(a.se1 * a.se1 + b.se1 * b.se1), 9) AS ret_1_std_err,
       |  round(a.r5 - b.r5, 9) AS ret_5,
       |  round(sqrt(a.se5 * a.se5 + b.se5 * b.se5), 9) AS ret_5_std_err
       |FROM rc1 a JOIN rc1 b ON a.date = b.date
       |WHERE a.factor_quantile = 5 AND b.factor_quantile = 1""".stripMargin

  /** Per-quantile cumulative curves over the demeaned by-date 1-day
    * means (tears.py:287-294): the shared running-product fragment
    * partitioned by factor_quantile. */
  private def cumByQSql: String =
    s"""$byDateCtes, frq AS (SELECT factor_quantile, date, m1 AS r FROM s1)
       |SELECT factor_quantile, date,
       |  round(${Pipelines.cumProdSql("factor_quantile")}, 9) AS cum_ret_1
       |FROM frq""".stripMargin

  /** q_returns_sheet oracle: DuckDB replay of
    * [[graft.sheets.Sheets.createReturnsTearSheet]] (default flags). */
  private def returnsSheetSql: String = sheetSqlFrom("q_returns_sheet")

  /** q_info_sheet oracle: DuckDB replay of
    * [[graft.sheets.Sheets.createInformationTearSheet]] (byGroup on). */
  private def infoSheetSql: String = Seq(
    meltSql(graft.SparkEntry.factorOracleSql("q_ic"), "ic",
      "strftime(date, '%Y-%m-%d')", Seq("ret_1", "ret_5")),
    meltSql(baseOracle("q_ic_summary"), "ic_summary", "period",
      Seq("ic_mean", "ic_std", "risk_adjusted_ic", "t_stat", "ic_skew",
        "ic_kurtosis", "n")),
    meltSql(graft.SparkEntry.factorOracleSql("q_mean_ic_monthly"),
      "monthly_ic", "strftime(date, '%Y-%m-%d')", Seq("ret_1", "ret_5")),
    meltSql(baseOracle("q_mean_ic_bygroup"), "ic_bygroup", "\"group\"",
      Seq("ret_1", "ret_5"))).mkString("\nUNION ALL\n") +
    "\nORDER BY section, k, metric"

  /** All-quantile turnover per period with the date kept (the
    * q_turnover_means `tv` CTE before its mean). */
  private def qtAllSql: String =
    s"""$pre, sets AS (
       |  SELECT date, factor_quantile, list(DISTINCT asset) AS names
       |  FROM factor_data GROUP BY 1, 2),
       |idx AS (SELECT *, row_number()
       |  OVER (PARTITION BY factor_quantile ORDER BY date) AS rn FROM sets)
       |SELECT '1D' AS period, a.factor_quantile, a.date,
       |  len(list_filter(a.names, x -> NOT list_contains(b.names, x)))::DOUBLE
       |    / len(a.names) AS turnover
       |FROM idx a JOIN idx b ON b.factor_quantile = a.factor_quantile
       |  AND b.rn = a.rn - 1
       |UNION ALL
       |SELECT '5D', a.factor_quantile, a.date,
       |  len(list_filter(a.names, x -> NOT list_contains(b.names, x)))::DOUBLE
       |    / len(a.names)
       |FROM idx a JOIN idx b ON b.factor_quantile = a.factor_quantile
       |  AND b.rn = a.rn - 5""".stripMargin

  /** Multi-lag rank autocorrelation per date (the q_autocorr_means `ac`
    * CTE before its mean). */
  private def acMultiSql: String =
    s"""$pre, ranks AS (
       |  SELECT date, asset, ${Pipelines.rank2Sql("factor", "date")} AS r
       |  FROM factor_data),
       |didx AS (SELECT date, row_number() OVER (ORDER BY date) AS di
       |         FROM (SELECT DISTINCT date FROM factor_data)),
       |cur AS (SELECT r, asset, di, date FROM ranks JOIN didx USING (date)),
       |pairs AS (
       |  SELECT 1 AS period_n, cur.date, cur.r AS xr, prev.r AS yr
       |  FROM cur JOIN cur prev
       |    ON cur.asset = prev.asset AND cur.di = prev.di + 1
       |  UNION ALL
       |  SELECT 5, cur.date, cur.r, prev.r
       |  FROM cur JOIN cur prev
       |    ON cur.asset = prev.asset AND cur.di = prev.di + 5),
       |s AS (
       |  SELECT period_n, date, count(*)::DOUBLE AS n,
       |    sum(xr)::DOUBLE AS sx, sum(xr*xr)::DOUBLE AS sxx,
       |    sum(yr)::DOUBLE AS sy, sum(yr*yr)::DOUBLE AS syy,
       |    sum(xr*yr)::DOUBLE AS sxy
       |  FROM pairs GROUP BY 1, 2)
       |SELECT period_n::VARCHAR || 'D' AS period, date,
       |  round(${Pipelines.exactCorrSql("n", "sx", "sxx", "sy", "syy", "sxy")}, 9)
       |    AS autocorr
       |FROM s""".stripMargin

  /** q_turnover_sheet oracle: DuckDB replay of
    * [[graft.sheets.Sheets.createTurnoverTearSheet]] (inferred 1D/5D). */
  private def turnoverSheetSql: String = Seq(
    meltSql(qtAllSql, "quantile_turnover",
      "period || '|' || factor_quantile::VARCHAR || '|' || strftime(date, '%Y-%m-%d')",
      Seq("turnover")),
    meltSql(acMultiSql, "autocorrelation",
      "period || '|' || strftime(date, '%Y-%m-%d')", Seq("autocorr")),
    meltSql(baseOracle("q_turnover_means"), "turnover_means",
      "factor_quantile::VARCHAR || '|' || period", Seq("mean_turnover")),
    meltSql(baseOracle("q_autocorr_means"), "autocorr_means", "period",
      Seq("mean_autocorr"))).mkString("\nUNION ALL\n") +
    "\nORDER BY section, k, metric"

  /** Equal-weight NON-demeaned factor returns (the event-study sheet's
    * variant, tears.py:689-691): weight = sign(factor) normalized by
    * the date's gross. */
  private def frEwRawSql: String =
    s"""$pre, sgn AS (SELECT date, asset, ret_1, ret_5,
       |  CASE WHEN factor < 0 THEN -1.0 WHEN factor > 0 THEN 1.0
       |       ELSE 0.0 END AS sg
       |  FROM factor_data),
       |wts AS (SELECT date, asset, ret_1, ret_5,
       |  CASE WHEN sum(abs(sg)) OVER (PARTITION BY date) = 0 THEN NULL
       |       ELSE sg / sum(abs(sg)) OVER (PARTITION BY date) END AS weight
       |  FROM sgn)
       |SELECT date,
       |  round(CASE WHEN count(ret_1 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_1 * weight ORDER BY asset) FILTER (WHERE ret_1 * weight IS NOT NULL)), (a, b) -> a + b) END, 9) AS ret_1,
       |  round(CASE WHEN count(ret_5 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_5 * weight ORDER BY asset) FILTER (WHERE ret_5 * weight IS NOT NULL)), (a, b) -> a + b) END, 9) AS ret_5
       |FROM wts GROUP BY date""".stripMargin

  /** NON-demeaned two-stage mean return by quantile (the event-study
    * sheet's variant, tears.py:666: long-only, no demean). */
  private def mrqRawSql: String =
    s"""$pre, s1n AS (SELECT factor_quantile, date,
       |  avg(ret_1) AS m1, avg(ret_5) AS m5
       |  FROM factor_data GROUP BY 1, 2)
       |SELECT factor_quantile,
       |  round(avg(m1), 9) AS ret_1,
       |  round(stddev_samp(m1) / sqrt(count(m1)), 9) AS ret_1_std_err,
       |  round(avg(m5), 9) AS ret_5,
       |  round(stddev_samp(m5) / sqrt(count(m5)), 9) AS ret_5_std_err
       |FROM s1n GROUP BY 1""".stripMargin

  /** q_event_study_sheet oracle: DuckDB replay of
    * [[graft.sheets.Sheets.createEventStudyTearSheet]] (long-only,
    * equal-weight, (5,15) band). */
  private def eventStudySheetSql: String = Seq(
    meltSql(baseOracle("q_events_dist"), "events_dist", "bucket::VARCHAR",
      Seq("n_events")),
    meltSql(avgCumRetSql(5, 15, demeaned = false), "avg_cum_ret",
      "factor_quantile::VARCHAR || '|' || \"offset\"::VARCHAR",
      Seq("mean", "std")),
    meltSql(frEwRawSql, "factor_returns_ew", "strftime(date, '%Y-%m-%d')",
      Seq("ret_1", "ret_5")),
    meltSql(mrqRawSql, "mean_ret_by_q", "factor_quantile::VARCHAR",
      Seq("ret_1", "ret_1_std_err", "ret_5", "ret_5_std_err")))
    .mkString("\nUNION ALL\n") + "\nORDER BY section, k, metric"

  def oracleSql: Map[String, String] =
    baseOracle ++ Map(
      "q_summary_sheet" -> summarySheetSql,
      "q_returns_sheet" -> returnsSheetSql,
      "q_info_sheet" -> infoSheetSql,
      "q_turnover_sheet" -> turnoverSheetSql,
      "q_event_returns_sheet" -> avgCumRetSql(5, 15, demeaned = true),
      "q_event_study_sheet" -> eventStudySheetSql)
}
