package graft.ingest

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{Horizon, TradingCalendar}

/** Result of forward-return computation: the long-format returns panel
  * keyed by the factor's (date, asset) pairs, one double column per
  * horizon, plus the typed horizons and the inferred calendar. */
final case class ForwardReturnsResult(
    df: DataFrame,
    horizons: Seq[Horizon],
    calendar: TradingCalendar)

/** Forward returns over a long (date, asset, price) panel
  * (reference: alphalens/utils.py:216-343).
  *
  * pandas `pct_change(p).shift(-p)` is POSITIONAL over the price rows, so
  * the Spark translation is `lead(price, p)` over
  * `Window.partitionBy(asset).orderBy(date)` on the price rows — never a
  * time-range window (holiday/intraday fixtures diverge otherwise).
  *
  * Scale notes: the only driver-side collects are the two distinct date
  * indexes (bounded by the number of trading sessions, ~1e4-1e5 even at
  * 100 TB — the panel itself is dates × assets and never collected). The
  * per-asset lead windows shuffle once on asset; the final alignment to
  * factor rows is an equi-join on (date, asset) that Catalyst plans as a
  * sort-merge (or broadcast when the factor side is small).
  */
object ForwardReturns {

  /** @param factor long (date, asset, factor); factor may contain nulls
    * @param prices long (date, asset, price); must cover factor dates plus
    *               max(periods) future price rows per asset
    * @param cumulativeReturns if true, price[t+p]/price[t] - 1; else the
    *               single-step return p steps ahead (utils.py:286-293)
    * @param filterZscore null-out returns > k sigma from the per-asset mean
    *               (lookahead by design, as in the reference utils.py:295-299)
    */
  def computeForwardReturns(
      spark: SparkSession,
      factor: DataFrame,
      prices: DataFrame,
      periods: Seq[Int] = Seq(1, 5, 10),
      filterZscore: Option[Double] = None,
      cumulativeReturns: Boolean = true): ForwardReturnsResult = {

    // --- driver-side date indexes (tiny: distinct sessions only) ---
    val factorDates: Array[Instant] = collectDates(factor)
    val priceDates: Array[Instant] = collectDates(prices)
    val calendar = TradingCalendar.infer(factorDates ++ priceDates)

    val priceDateSet = priceDates.toSet
    val commonDates = factorDates.filter(priceDateSet)
    if (commonDates.isEmpty)
      throw new IllegalArgumentException(
        "Factor and prices indices don't match: make sure they have the " +
        "same convention in terms of datetimes and symbol-names")

    // prices chopped to the factor's asset universe (utils.py:281)
    val assets = factor.select("asset").distinct()
    val sparse = prices.join(assets, Seq("asset"), "left_semi")

    // Reindex every asset against the GLOBAL price-date index before the
    // lead windows: the reference's wide frame carries an explicit
    // (possibly-NaN) cell for every (date, asset), so a positional shift
    // over a sparse long panel (asset missing dates — delistings,
    // late listings) would silently span the gap and compute a
    // multi-session return mislabeled with the global horizon. The dense
    // grid makes those returns null, matching pandas NaN propagation.
    // Dates are a bounded literal array (#sessions); explode is
    // codegen'd and avoids a nested-loop cross join.
    import spark.implicits._
    val allPriceDates = priceDates.map(java.sql.Timestamp.from).toSeq
    val p = assets
      .withColumn("date", explode(typedLit(allPriceDates)))
      .join(sparse, Seq("asset", "date"), "left")

    val w = Window.partitionBy("asset").orderBy("date")
    val sorted = periods.sorted
    val horizons = sorted.map(per =>
      inferHorizon(per, commonDates, priceDates, calendar))

    var ret = p
    horizons.foreach { h =>
      val raw =
        if (cumulativeReturns)
          lead(col("price"), h.period).over(w) / col("price") - 1.0
        else
          lead(col("price"), h.period).over(w) /
            lead(col("price"), h.period - 1).over(w) - 1.0
      ret = ret.withColumn(h.label, raw)
    }

    // reindex to factor dates (utils.py:292-293) — broadcast the tiny
    // common-date list and semi-join; then optional per-asset z-filter
    import spark.implicits._
    val dateDf = broadcast(
      commonDates.map(java.sql.Timestamp.from).toSeq.toDF("date"))
    var out = ret.join(dateDf, Seq("date"), "left_semi").drop("price")

    filterZscore.foreach { z =>
      val wa = Window.partitionBy("asset")
      horizons.foreach { h =>
        val c = col(h.label)
        // NaN-mask parity: a null stddev (single obs) makes the predicate
        // null, which falls through to "keep" — same as pandas' NaN > x.
        val outlier = abs(c - avg(c).over(wa)) > stddev_samp(c).over(wa) * z
        out = out.withColumn(h.label, when(outlier, lit(null)).otherwise(c))
      }
    }

    // align to the factor's (date, asset) rows (reindex(factor.index))
    val aligned = factor.select("date", "asset")
      .join(out, Seq("date", "asset"), "left")

    ForwardReturnsResult(aligned, horizons, calendar)
  }

  /** Horizon label inference (reference: alphalens/utils.py:301-325): mode
    * of calendar-aware day-diffs over the first <=30 factor dates, with a
    * drift correction applied to the last sampled diff. Driver-side over
    * the already-collected date indexes. */
  private[graft] def inferHorizon(
      period: Int,
      factorDates: Array[Instant],
      priceDates: Array[Instant],
      calendar: TradingCalendar): Horizon = {
    val pos = priceDates.zipWithIndex.toMap
    var last: java.time.Duration = null
    val dayDiffs = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < 30 && i < factorDates.length) {
      pos.get(factorDates(i)) match {
        case Some(pi) if pi + period < priceDates.length =>
          val d = calendar.diff(priceDates(pi), priceDates(pi + period))
          last = d
          dayDiffs += d.toDays
        case _ => ()
      }
      i += 1
    }
    if (last == null)
      // no in-bounds sample (all factor rows too close to the panel end);
      // fall back to `period` calendar days, mirroring an all-NaN column
      return Horizon(period, s"${period}D", java.time.Duration.ofDays(period))
    // scipy mode: most frequent value, smallest on ties
    val mode = dayDiffs.groupBy(identity).toSeq
      .maxBy { case (v, occ) => (occ.size, -v) }._1
    val deltaDays = last.toDays - mode
    val span = last.minus(java.time.Duration.ofDays(deltaDays))
    Horizon(period, Horizon.durationToLabel(span), span)
  }

  // bounded: the driver-side calendar index fails fast past
  // spark.graft.calendar.maxInstants (see model.CalendarIndex)
  private def collectDates(df: DataFrame): Array[Instant] =
    graft.model.CalendarIndex.collectInstants(df, "price/factor panel")
}
