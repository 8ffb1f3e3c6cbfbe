package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.{AnalyticsQueries, DocQueries, Pipelines}
import graft.perf.{Cumulative, Information, Positions, Returns, Turnover}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry derives alphalens-shaped inputs from the driver's
  * TPC-H-ish parquet (FIXTURES.md §B1: assets = suppliers, dates = ship
  * days) and runs one library operator; `oracleSql` holds the equivalent
  * DuckDB SQL over the same parquet, sharing the prelude from
  * [[Pipelines.oraclePrelude]] so expressions match 1:1.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * monthly mean Spearman IC of the derived factor. */
  def entry(spark: SparkSession): DataFrame = {
    val fd = Pipelines.factorData(spark, "/root/testdata/sf0.001")
    Information.meanInformationCoefficient(fd, byTime = Some("M"))
  }

  private val P = Seq(1, 5)

  /** Cross-engine hash stability: Spark's and DuckDB's co-moment /
    * summation orders differ at ~1e-16, so every O(1)-magnitude float
    * column is rounded to a 1e-9 grid IDENTICALLY in the Spark query and
    * its oracleSql twin (verified: DuckDB round == Java BigDecimal
    * HALF_UP on 50k random doubles). */
  private def round9(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), 9)))

  /** round9 + signed-zero collapse (`+ 0.0`: the identity on every
    * double except -0.0 -> +0.0). Long-short positions cancel EXACTLY,
    * and the sign of the resulting zero is engine-dependent (the 10x
    * panel probe caught DuckDB emitting -0.0 against Spark's +0.0 on
    * 2 of 17.3M position rows — SURVEY §5 #12). Both twins of the
    * position family normalize, and only they: one-sided
    * normalization would BREAK cases where both engines agree on
    * -0.0. */
  private def round9z(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, round(col(c), 9) + lit(0.0)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = factorQueries ++
    DocQueries.queries ++ AnalyticsQueries.queries

  private def factorQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // no orderBy on the panel-sized outputs: the driver compare sorts
    // rows itself, so the global range-sort is pure overhead
    "q_panel" -> ((s, dir) => Pipelines.panel(s, dir)),
    "q_prices" -> ((s, dir) => Pipelines.prices(Pipelines.panel(s, dir))),
    "q_factor_data" -> ((s, dir) => Pipelines.factorData(s, dir, P).df),
    "q_ic" -> ((s, dir) =>
      round9(Information.factorInformationCoefficient(Pipelines.factorData(s, dir, P)),
        Seq("ret_1", "ret_5"))),
    "q_mean_ic_monthly" -> ((s, dir) =>
      round9(Information.meanInformationCoefficient(
        Pipelines.factorData(s, dir, P), byTime = Some("M")), Seq("ret_1", "ret_5"))),
    "q_mean_ret_by_quantile" -> ((s, dir) =>
      round9(Returns.meanReturnByQuantile(Pipelines.factorData(s, dir, P)),
        Seq("ret_1", "ret_1_std_err", "ret_5", "ret_5_std_err"))),
    "q_factor_returns" -> ((s, dir) =>
      round9(Returns.factorReturns(Pipelines.factorData(s, dir, P)),
        Seq("ret_1", "ret_5"))),
    "q_quantile_turnover" -> ((s, dir) =>
      Turnover.quantileTurnover(Pipelines.factorData(s, dir, P), quantile = 5)),
    "q_rank_autocorr" -> ((s, dir) =>
      round9(Turnover.factorRankAutocorrelation(Pipelines.factorData(s, dir, P)),
        Seq("autocorr"))),
    "q_cumulative_returns" -> ((s, dir) => {
      val fr = Returns.factorReturns(Pipelines.factorData(s, dir, P))
      round9(Cumulative.cumulativeReturns(fr.select(col("date"), col("ret_1")), "ret_1")
        .select("date", "cum_ret_1").orderBy("date"), Seq("cum_ret_1"))
    }),
    "q_positions" -> ((s, dir) =>
      // no orderBy: the driver compare sorts rows itself; a global sort
      // of the instants × assets table would be the plan's biggest stage
      round9z(Positions.factorPositions(Pipelines.factorData(s, dir, P), "ret_5"),
        Seq("position"))),
    "q_pyfolio_returns" -> ((s, dir) => {
      val cum = Positions.factorCumulativeReturns(
        Pipelines.factorData(s, dir, P), "ret_1")
      round9(Positions.pctChange(
        Positions.dailyLastFfill(cum, "cum_ret_1"), "cum_ret_1", "ret")
        .orderBy("date"), Seq("ret"))
    }),
    "q_factor_returns_ew" -> ((s, dir) =>
      // equal-weight long-short path of factor_weights (median split)
      round9(Returns.factorReturns(Pipelines.factorData(s, dir, P),
        demeaned = true, equalWeight = true), Seq("ret_1", "ret_5"))),
    "q_mean_ret_group" -> ((s, dir) =>
      round9(Returns.meanReturnByQuantile(
        Pipelines.factorData(s, dir, P, withGroup = true), byGroup = true),
        Seq("ret_1", "ret_1_std_err", "ret_5", "ret_5_std_err"))),
    "q_pyfolio_positions" -> ((s, dir) =>
      round9z(Positions.createPyfolioInput(
        Pipelines.factorData(s, dir, P), "ret_1").positions,
        Seq("position"))),
    "q_cum_ret_topq" -> ((s, dir) =>
      // quantile-filtered top-vs-bottom long-short portfolio
      // (performance.py:919-928); long-short keeps the level O(1) so the
      // 1e-9 rounding grid is meaningful over 2485 compounding steps
      round9(Positions.factorCumulativeReturns(Pipelines.factorData(s, dir, P),
        "ret_1", longShort = true, quantiles = Some(Seq(1, 5)))
        .orderBy("date"), Seq("cum_ret_1")))
  )

  private def pre: String = Pipelines.oraclePrelude(P, 5)
  private def preG: String = Pipelines.oraclePrelude(P, 5, withGroup = true)

  private def icCtes: String = Pipelines.icExactCtes(P)

  def oracleSql: Map[String, String] = factorOracleSql ++ DocQueries.oracleSql ++
    AnalyticsQueries.oracleSql

  /** package-visible: the tear-sheet composite oracles in
    * [[graft.data.AnalyticsQueries]] nest these component twins. */
  private[graft] def factorOracleSql: Map[String, String] = Map(
    "q_panel" ->
      """SELECT date_trunc('day', l_shipdate) AS date, l_suppkey AS asset,
        | sum(round(l_extendedprice * 100)::BIGINT *
        |     (100 - round(l_discount * 100)::BIGINT))::BIGINT::DOUBLE
        |   / 10000.0 AS revenue,
        | sum(l_quantity) AS qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_prices" -> s"""$pre SELECT date, asset, price FROM priced ORDER BY date, asset""",
    "q_factor_data" ->
      s"""$pre SELECT date, asset, ret_1, ret_5, factor, factor_quantile
         |FROM factor_data ORDER BY date, asset""".stripMargin,
    "q_ic" ->
      s"""$pre$icCtes
         |SELECT date, round(i1, 9) AS ret_1, round(i5, 9) AS ret_5
         |FROM ic ORDER BY date""".stripMargin,
    "q_mean_ic_monthly" ->
      s"""$pre$icCtes
         |SELECT last_day(date)::timestamp AS date,
         |       round(avg(i1), 9) AS ret_1, round(avg(i5), 9) AS ret_5
         |FROM ic GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mean_ret_by_quantile" ->
      s"""$pre, dm AS (
         |  SELECT factor_quantile, date,
         |    ret_1 - avg(ret_1) OVER (PARTITION BY date) AS d1,
         |    ret_5 - avg(ret_5) OVER (PARTITION BY date) AS d5
         |  FROM factor_data),
         |s1 AS (SELECT factor_quantile, date, avg(d1) AS m1, avg(d5) AS m5
         |       FROM dm GROUP BY 1, 2)
         |SELECT factor_quantile,
         |       round(avg(m1), 9) AS ret_1,
         |       round(stddev_samp(m1) / sqrt(count(m1)), 9) AS ret_1_std_err,
         |       round(avg(m5), 9) AS ret_5,
         |       round(stddev_samp(m5) / sqrt(count(m5)), 9) AS ret_5_std_err
         |FROM s1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_factor_returns" ->
      s"""$pre, dm AS (
         |  SELECT date, asset, ret_1, ret_5,
         |    factor - avg(factor) OVER (PARTITION BY date) AS c
         |  FROM factor_data),
         |wts AS (
         |  SELECT date, asset, ret_1, ret_5,
         |    c / sum(abs(c)) OVER (PARTITION BY date) AS weight
         |  FROM dm)
         |SELECT date,
         |  round(CASE WHEN count(ret_1 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_1 * weight ORDER BY asset) FILTER (WHERE ret_1 * weight IS NOT NULL)), (a, b) -> a + b) END, 9) AS ret_1,
         |  round(CASE WHEN count(ret_5 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_5 * weight ORDER BY asset) FILTER (WHERE ret_5 * weight IS NOT NULL)), (a, b) -> a + b) END, 9) AS ret_5
         |FROM wts GROUP BY date ORDER BY date""".stripMargin,
    "q_quantile_turnover" ->
      s"""$pre, sets AS (
         |  SELECT date, list(DISTINCT asset) AS names
         |  FROM factor_data WHERE factor_quantile = 5 GROUP BY date),
         |lagged AS (
         |  SELECT date, names, lag(names, 1) OVER (ORDER BY date) AS prev
         |  FROM sets)
         |SELECT date,
         |  len(list_filter(names, x -> NOT list_contains(prev, x)))::double
         |    / len(names) AS turnover
         |FROM lagged WHERE prev IS NOT NULL ORDER BY date""".stripMargin,
    "q_rank_autocorr" ->
      s"""$pre, ranks AS (
         |  SELECT date, asset, ${Pipelines.rank2Sql("factor", "date")} AS r
         |  FROM factor_data),
         |didx AS (SELECT date, row_number() OVER (ORDER BY date) AS di
         |         FROM (SELECT DISTINCT date FROM factor_data)),
         |cur AS (SELECT r, asset, di, date FROM ranks JOIN didx USING (date)),
         |s AS (
         |  SELECT cur.date, count(*)::DOUBLE AS n,
         |    sum(cur.r)::DOUBLE AS sx, sum(cur.r*cur.r)::DOUBLE AS sxx,
         |    sum(prev.r)::DOUBLE AS sy, sum(prev.r*prev.r)::DOUBLE AS syy,
         |    sum(cur.r*prev.r)::DOUBLE AS sxy
         |  FROM cur JOIN cur prev ON cur.asset = prev.asset AND cur.di = prev.di + 1
         |  GROUP BY cur.date)
         |SELECT date,
         |  round(${Pipelines.exactCorrSql("n", "sx", "sxx", "sy", "syy", "sxy")}, 9)
         |    AS autocorr
         |FROM s ORDER BY date""".stripMargin,
    "q_cumulative_returns" ->
      s"""$pre, dm AS (
         |  SELECT date, asset, ret_1,
         |    factor - avg(factor) OVER (PARTITION BY date) AS c
         |  FROM factor_data),
         |wts AS (
         |  SELECT date, asset, ret_1,
         |    c / sum(abs(c)) OVER (PARTITION BY date) AS weight
         |  FROM dm),
         |fr AS (SELECT date, CASE WHEN count(ret_1 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_1 * weight ORDER BY asset) FILTER (WHERE ret_1 * weight IS NOT NULL)), (a, b) -> a + b) END AS r FROM wts GROUP BY date)
         |SELECT date, round($cumProdR, 9) AS cum_ret_1
         |FROM fr ORDER BY date""".stripMargin,
    "q_positions" ->
      s"""$pre, dm AS (
         |  SELECT date, asset, factor - avg(factor) OVER (PARTITION BY date) AS c
         |  FROM factor_data),
         |wts AS (
         |  SELECT date, asset, c / sum(abs(c)) OVER (PARTITION BY date) AS weight
         |  FROM dm),
         |inst AS (SELECT DISTINCT t FROM (
         |  SELECT date AS t FROM wts UNION ALL
         |  SELECT date + INTERVAL 5 DAY AS t FROM wts)),
         |act AS (
         |  SELECT i.t, w.asset, sum(w.weight) AS tw
         |  FROM wts w JOIN inst i ON i.t >= w.date AND i.t < w.date + INTERVAL 5 DAY
         |  GROUP BY 1, 2)
         |SELECT t AS date, asset,
         |  round(tw / sum(abs(tw)) OVER (PARTITION BY t), 9) + 0.0 AS position
         |FROM act ORDER BY date, asset""".stripMargin,
    "q_factor_returns_ew" ->
      s"""$pre, med AS (
         |  SELECT date, quantile_cont(factor, 0.5) AS m
         |  FROM factor_data GROUP BY date),
         |ctr AS (
         |  SELECT f.date, f.asset, f.ret_1, f.ret_5, f.factor - med.m AS c
         |  FROM factor_data f JOIN med USING (date)),
         |sgn AS (
         |  SELECT date, asset, ret_1, ret_5,
         |    CASE WHEN c < 0 THEN -1.0 WHEN c > 0 THEN 1.0 ELSE 0.0 END AS s,
         |    sum(CASE WHEN c < 0 THEN 1 ELSE 0 END) OVER (PARTITION BY date) AS nn,
         |    sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) OVER (PARTITION BY date) AS np
         |  FROM ctr),
         |pre2 AS (
         |  SELECT date, asset, ret_1, ret_5,
         |    CASE WHEN s < 0 THEN s / nn WHEN s > 0 THEN s / np ELSE s END AS p
         |  FROM sgn),
         |wts AS (
         |  SELECT date, asset, ret_1, ret_5,
         |    CASE WHEN sum(abs(p)) OVER (PARTITION BY date) = 0 THEN NULL
         |         ELSE p / sum(abs(p)) OVER (PARTITION BY date) END AS weight
         |  FROM pre2)
         |SELECT date,
         |  round(CASE WHEN count(ret_1 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_1 * weight ORDER BY asset) FILTER (WHERE ret_1 * weight IS NOT NULL)), (a, b) -> a + b) END, 9) AS ret_1,
         |  round(CASE WHEN count(ret_5 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_5 * weight ORDER BY asset) FILTER (WHERE ret_5 * weight IS NOT NULL)), (a, b) -> a + b) END, 9) AS ret_5
         |FROM wts GROUP BY date ORDER BY date""".stripMargin,
    "q_mean_ret_group" ->
      s"""$preG, dm AS (
         |  SELECT factor_quantile, "group", date,
         |    ret_1 - avg(ret_1) OVER (PARTITION BY date) AS d1,
         |    ret_5 - avg(ret_5) OVER (PARTITION BY date) AS d5
         |  FROM factor_data),
         |s1 AS (SELECT factor_quantile, "group", date, avg(d1) AS m1, avg(d5) AS m5
         |       FROM dm GROUP BY 1, 2, 3)
         |SELECT factor_quantile, "group",
         |       round(avg(m1), 9) AS ret_1,
         |       round(stddev_samp(m1) / sqrt(count(m1)), 9) AS ret_1_std_err,
         |       round(avg(m5), 9) AS ret_5,
         |       round(stddev_samp(m5) / sqrt(count(m5)), 9) AS ret_5_std_err
         |FROM s1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_pyfolio_positions" ->
      s"""$pre, dm AS (
         |  SELECT date, asset, factor - avg(factor) OVER (PARTITION BY date) AS c
         |  FROM factor_data),
         |wts AS (
         |  SELECT date, asset, c / sum(abs(c)) OVER (PARTITION BY date) AS weight
         |  FROM dm),
         |inst AS (SELECT DISTINCT t FROM (
         |  SELECT date AS t FROM wts UNION ALL
         |  SELECT date + INTERVAL 1 DAY AS t FROM wts)),
         |act AS (
         |  SELECT i.t, w.asset, sum(w.weight) AS tw
         |  FROM wts w JOIN inst i ON i.t >= w.date AND i.t < w.date + INTERVAL 1 DAY
         |  GROUP BY 1, 2),
         |pos AS (SELECT t, asset, tw / sum(abs(tw)) OVER (PARTITION BY t) AS p
         |  FROM act),
         |pday AS (SELECT date_trunc('day', t) AS date, asset, sum(p) AS p
         |  FROM pos GROUP BY 1, 2),
         |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::TIMESTAMP AS date
         |  FROM (SELECT min(date) AS mn, max(date) AS mx FROM pday)),
         |hasdata AS (SELECT DISTINCT date FROM pday),
         |grid AS (
         |  SELECT s.date, a.asset,
         |    CASE WHEN h.date IS NOT NULL THEN coalesce(p.p, 0.0) ELSE NULL END AS p
         |  FROM spine s
         |  CROSS JOIN (SELECT DISTINCT asset FROM wts) a
         |  LEFT JOIN hasdata h ON h.date = s.date
         |  LEFT JOIN pday p ON p.date = s.date AND p.asset = a.asset),
         |filled AS (
         |  SELECT date, asset,
         |    last_value(p IGNORE NULLS) OVER (PARTITION BY asset ORDER BY date
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
         |  FROM grid),
         |norm AS (
         |  SELECT date, asset,
         |    coalesce(p / sum(abs(p)) OVER (PARTITION BY date), 0.0) AS position
         |  FROM filled),
         |-- same algebraic shape as the Spark side (1 - (SUM p)/(SUM |p|)
         |-- over the pre-normalization values), NOT 1 - SUM(p/S): the two
         |-- rearrangements differ by ~1e-13 float noise, a larger class
         |-- than plain summation-order jitter against the 1e-9 grid
         |cash AS (SELECT date, 'cash' AS asset,
         |  CASE WHEN sum(abs(p)) IS NULL OR sum(abs(p)) = 0 THEN 1.0
         |       ELSE 1.0 - sum(p) / sum(abs(p)) END AS position
         |  FROM filled GROUP BY date)
         |SELECT date, asset::VARCHAR AS asset,
         |  round(position, 9) + 0.0 AS position
         |FROM norm
         |UNION ALL
         |SELECT date, asset, round(position, 9) + 0.0 FROM cash
         |ORDER BY date, asset""".stripMargin,
    "q_cum_ret_topq" ->
      s"""$pre, sub AS (
         |  SELECT date, asset, ret_1, factor FROM factor_data
         |  WHERE factor_quantile IN (1, 5)),
         |dm AS (
         |  SELECT date, asset, ret_1,
         |    factor - avg(factor) OVER (PARTITION BY date) AS c
         |  FROM sub),
         |wts AS (
         |  SELECT date, asset, ret_1,
         |    c / sum(abs(c)) OVER (PARTITION BY date) AS weight
         |  FROM dm),
         |fr AS (SELECT date, CASE WHEN count(ret_1 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_1 * weight ORDER BY asset) FILTER (WHERE ret_1 * weight IS NOT NULL)), (a, b) -> a + b) END AS r FROM wts GROUP BY date)
         |SELECT date, round($cumProdR, 9) AS cum_ret_1
         |FROM fr ORDER BY date""".stripMargin,
    "q_pyfolio_returns" ->
      s"""$pre, dm AS (
         |  SELECT date, asset, ret_1,
         |    factor - avg(factor) OVER (PARTITION BY date) AS c
         |  FROM factor_data),
         |wts AS (
         |  SELECT date, asset, ret_1,
         |    c / sum(abs(c)) OVER (PARTITION BY date) AS weight
         |  FROM dm),
         |fr AS (SELECT date, CASE WHEN count(ret_1 * weight) = 0 THEN NULL ELSE list_reduce(list_prepend(0.0, list(ret_1 * weight ORDER BY asset) FILTER (WHERE ret_1 * weight IS NOT NULL)), (a, b) -> a + b) END AS r FROM wts GROUP BY date),
         |lvl AS (SELECT date, $cumProdR AS v FROM fr),
         |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::TIMESTAMP AS date
         |  FROM (SELECT min(date) AS mn, max(date) AS mx FROM lvl)),
         |ff AS (SELECT s.date, last_value(l.v IGNORE NULLS) OVER (ORDER BY s.date) AS v
         |  FROM spine s LEFT JOIN lvl l USING (date))
         |SELECT date, round(coalesce(v / lag(v) OVER (ORDER BY date) - 1.0, 0.0), 9) AS ret
         |FROM ff ORDER BY date""".stripMargin
  )

  /** Shared running-product SQL over column `r` ordered by date —
    * mirrors Cumulative.runningProduct exactly (zero flag + log-space
    * magnitude + sign parity). */
  private def cumProdR: String = Pipelines.cumProdSql()
}
