package graft.perf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.FactorData

/** Quantile membership turnover and factor rank autocorrelation
  * (reference: alphalens/performance.py:568-639). */
object Turnover {

  /** Fraction of names in `quantile` that were not in it `period` dates
    * ago (reference: alphalens/performance.py:568-598).
    *
    * Scale note: the heavy work (filter + per-date set collection) is a
    * distributed hash aggregate; the lag runs on the aggregated one-row-
    * per-date table, which is tiny (#sessions), so the single-partition
    * window is deliberate, not a bottleneck.
    * Output: (date, turnover), first `period` dates omitted. */
  def quantileTurnover(fd: FactorData, quantile: Int, period: Int = 1): DataFrame = {
    val sets = fd.df.filter(col("factor_quantile") === quantile)
      .groupBy("date").agg(collect_set(col("asset")).as("__names"))
    val w = Window.orderBy("date")
    sets
      .withColumn("__prev", lag(col("__names"), period).over(w))
      .withColumn("turnover",
        size(array_except(col("__names"), col("__prev"))).cast("double") /
          size(col("__names")))
      .filter(col("__prev").isNotNull)
      .select("date", "turnover").orderBy("date")
  }

  /** Convenience: turnover for every quantile at once, one column per
    * quantile is avoided — long output (date, factor_quantile, turnover)
    * keeps the plan a single aggregation (used by the turnover sheet,
    * reference: alphalens/tears.py:443-452). */
  def allQuantileTurnover(fd: FactorData, period: Int = 1): DataFrame = {
    val sets = fd.df.groupBy("date", "factor_quantile")
      .agg(collect_set(col("asset")).as("__names"))
    val w = Window.partitionBy("factor_quantile").orderBy("date")
    sets
      .withColumn("__prev", lag(col("__names"), period).over(w))
      .withColumn("turnover",
        size(array_except(col("__names"), col("__prev"))).cast("double") /
          size(col("__names")))
      .filter(col("__prev").isNotNull)
      .select("date", "factor_quantile", "turnover")
      .orderBy("factor_quantile", "date")
  }

  /** Cross-asset Pearson correlation between per-date factor ranks at t
    * and t-period (reference: alphalens/performance.py:601-639).
    *
    * pandas shifts POSITIONALLY over the pivoted date index, so the lag
    * is a positional self-join: dates get a dense index di (broadcast:
    * #sessions rows), rows join on (asset, di - period), then corr per
    * date. Output: (date, autocorr). */
  def factorRankAutocorrelation(fd: FactorData, period: Int = 1): DataFrame =
    factorRankAutocorrelationMulti(fd, Seq(period)).drop("period")

  /** Rank autocorrelation for several lags in ONE plan: the rank window
    * and the date index are computed once; each lag is an extra shuffled
    * equi-join on the shared ranks table (vs. rebuilding the whole rank
    * DAG per period). Output: (period, date, autocorr). */
  def factorRankAutocorrelationMulti(fd: FactorData, periods: Seq[Int]): DataFrame =
    factorRankAutocorrelationMultiFrom(fd,
      fd.df.select(col("date"), col("asset"),
        Information.rank2(col("factor"), Seq(col("date"))).as("__rank")),
      periods)

  /** [[factorRankAutocorrelationMulti]] over precomputed per-date
    * factor ranks (date, asset, __rank) — the summary tear sheet feeds
    * the shared ranked panel here so the factor-rank window runs once
    * across the IC series and this table. */
  private[graft] def factorRankAutocorrelationMultiFrom(
      fd: FactorData,
      ranks: DataFrame,
      periods: Seq[Int]): DataFrame = {
    // doubled integer ranks -> the per-date corr is computed from exact
    // long sums (bit-stable across runs/engines; see exactRankCorr)
    val dateIdx = fd.df.select("date").distinct()
      .withColumn("__di", row_number().over(Window.orderBy("date")))
    val cur = ranks.join(broadcast(dateIdx), Seq("date"))
    // one shuffled join for ALL lags: the prev side explodes each rank
    // row into one (period, di + period) key per lag, so the rank window
    // and the join each run once (Spark does not share common subplans
    // across union branches)
    val shifted = explode(array(periods.map(p =>
      struct(lit(p).as("p"), (col("__di") + p).as("di"))): _*))
    val prev = cur.select(col("asset"), col("__rank").as("__prev_rank"),
        shifted.as("__s"))
      .select(col("asset"), col("__s.p").as("period"),
        col("__s.di").as("__di"), col("__prev_rank"))
    val joined = cur.join(prev, Seq("asset", "__di"), "inner")
    Information.exactRankCorr(joined, Seq("period", "date"), "__rank",
        Seq("__prev_rank" -> "autocorr"))
      .orderBy("period", "date")
  }
}
