package graft.data

import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.{FactorData, Quantize}
import graft.model.{Horizon, TradingCalendar}

/** Deterministic factor/prices derivations from the driver's TPC-H-ish
  * parquet tables (FIXTURES.md §B1-B2) — the shared input recipe for
  * `SparkEntry.queries` and the DuckDB oracle. Everything here is plain
  * SQL-expressible arithmetic so both engines compute bit-comparable
  * values (modulo float rounding, which the driver's hash rounds away).
  *
  * Assets = suppliers, dates = ship days. factor = previous day's revenue
  * (lag => no lookahead); price = exp(cumsum(log1p(bounded return))).
  */
object Pipelines {

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")

  /** One row per (ship day, supplier): revenue and quantity.
    *
    * Revenue is summed in EXACT fixed-point: extendedprice and discount
    * are 2-decimal TPC-H values, so `cents * (100 - discount_pct)` is an
    * exact integer per row and the long sum is order-independent — the
    * float formulation `sum(price * (1 - disc))` diverged between
    * engines by ~1e-16 relative on large groups (measured at sf0.1: 261
    * of 533k groups off by one ulp), which a value-hash compare cannot
    * tolerate at any scale. One division by 10^4 at the end returns to
    * dollars. qty is integer-valued, so its double sum is already exact. */
  def panel(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(
        date_trunc("day", col("l_shipdate")).as("date"),
        col("l_suppkey").as("asset"))
      .agg(
        (sum(round(col("l_extendedprice") * 100, 0).cast("long") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
          .cast("double") / 10000.0).as("revenue"),
        sum(col("l_quantity")).as("qty"))

  /** Synthetic strictly-positive price series per supplier.
    *
    * Every step is EXACT IEEE-754 arithmetic (integer multiply/mod on
    * integer-valued qty, then divide by a power of two), so Spark and the
    * DuckDB oracle produce bitwise-identical prices AND forward returns —
    * no transcendental (exp/ln) drift, no order-dependent summation. */
  def prices(panelDf: DataFrame): DataFrame =
    panelDf.select(col("date"), col("asset"),
      (lit(100.0) +
        ((col("qty").cast("long") * 7919L + col("asset").cast("long") * 131L) % 9973L)
          .cast("double") / 128.0).as("price"))

  /** factor = lagged revenue (null on each asset's first day). */
  def factor(panelDf: DataFrame): DataFrame = {
    val w = Window.partitionBy("asset").orderBy("date")
    panelDf.select(col("date"), col("asset"),
      lag(col("revenue"), 1).over(w).as("factor"))
  }

  /** Broadcastable asset -> group map: supplier's nation (FIXTURES §B2). */
  def groupMap(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.read.parquet(s"$dir/supplier.parquet")
    val n = spark.read.parquet(s"$dir/nation.parquet")
    s.join(n, s("s_nationkey") === n("n_nationkey"))
      .select(col("s_suppkey").as("asset"), col("n_name").as("group"))
  }

  /** TIME-VARYING (date, asset) -> group mapping (FIXTURES §B2's tv
    * variant; reference: the MultiIndexed groupby Series of
    * utils.py:517-522): supplier's nation, except that from the pivot
    * date on (a) every `asset % 3 == 0` supplier is RECLASSIFIED to the
    * next nation ((nationkey + 1) % 25 — TPC-H nation is fixed at keys
    * 0..24 at every SF), and (b) every `asset % 97 == 0` supplier drops
    * OUT of the mapping entirely, exercising the NaN-alignment path
    * (absent pairs -> null group -> dropped before quantization).
    * Panel-scale by construction — joined on (date, asset) without a
    * broadcast hint. */
  def tvGroupMap(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.read.parquet(s"$dir/supplier.parquet")
    val n = spark.read.parquet(s"$dir/nation.parquet")
    val n2 = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").as("nk2"), col("n_name").as("g2"))
    val statics = s
      .join(n, s("s_nationkey") === n("n_nationkey"))
      .join(n2, pmod(s("s_nationkey") + 1, lit(25)) === col("nk2"))
      .select(col("s_suppkey").as("asset"), col("n_name").as("g0"), col("g2"))
    panel(spark, dir).select("date", "asset")
      .join(broadcast(statics), Seq("asset"))
      .filter(!(col("asset") % 97 === 0 && col("date") >= lit(TvPivot)))
      .select(col("date"), col("asset"),
        when(col("asset") % 3 === 0 && col("date") >= lit(TvPivot),
          col("g2")).otherwise(col("g0")).as("group"))
  }

  /** Mid-panel reclassification instant for [[tvGroupMap]] (ship days
    * span 1995-01..2001-11 at every SF). */
  val TvPivot = java.sql.Timestamp.valueOf("1998-06-01 00:00:00")

  /** factor_data with TIME-VARYING groups, in the reference's build
    * order (utils.py:597-643): merged panel -> (date, asset) group
    * join -> drop pairs the mapping misses -> quantize per date ->
    * drop unbinned. The order matters: rows dropped by the mapping
    * change the per-date cross-sections the quantile edges are cut
    * from, so the static shortcut (join groups AFTER quantizing) would
    * bucket against the wrong universe. */
  private val fdTvCache =
    scala.collection.concurrent.TrieMap.empty[(String, Seq[Int], Int), FactorData]

  def factorDataTv(
      spark: SparkSession,
      dir: String,
      periods: Seq[Int] = Seq(1, 5),
      quantiles: Int = 5): FactorData =
    fdTvCache.getOrElseUpdate((dir, periods, quantiles), {
      val m = merged(spark, dir, periods, withGroup = false)
        .join(tvGroupMap(spark, dir), Seq("date", "asset"), "left")
        .filter(col("group").isNotNull)
      val quantized = Quantize.quantizeFactor(
        m, Quantize.QuantilesInt(quantiles), noRaise = true)
        .na.drop(Seq("factor_quantile"))
      quantized.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      FactorData(quantized, horizons(periods),
        TradingCalendar(Set(1, 2, 3, 4, 5, 6, 7), Set.empty))
    })

  /** Horizons used by the oracle pipelines: plain positional steps with
    * SQL-safe column names (ret_1, ret_5, ...). */
  def horizons(periods: Seq[Int]): Seq[Horizon] =
    periods.sorted.map(p => Horizon(p, s"ret_$p", Duration.ofDays(p)))

  /** Forward returns on the price rows: lead(price, p)/price - 1,
    * keyed to the factor rows (same panel here). */
  def forwardReturns(pricesDf: DataFrame, hs: Seq[Horizon]): DataFrame = {
    val w = Window.partitionBy("asset").orderBy("date")
    hs.foldLeft(pricesDf) { (df, h) =>
      df.withColumn(h.label,
        lead(col("price"), h.period).over(w) / col("price") - 1.0)
    }.drop("price")
  }

  /** The canonical merged factor_data table for the oracle pipelines:
    * fwd returns |><| finite factor, complete rows only, quantized per
    * date (qcut semantics, noRaise => unbinnable cross-sections dropped).
    * One shuffle per window key + one (date, asset) join; the group map
    * is broadcast.
    */
  /** Per-process memo of factorData by parameters: the tear-sheet
    * lifecycle (SURVEY §3) builds factor_data once and fans out many
    * aggregations, so Verify/Bench reuse one persisted table instead of
    * re-running the ingest DAG (join + quantize windows) per query. */
  private val fdCache =
    scala.collection.concurrent.TrieMap.empty[(String, Seq[Int], Int, Boolean), FactorData]

  def factorData(
      spark: SparkSession,
      dir: String,
      periods: Seq[Int] = Seq(1, 5),
      quantiles: Int = 5,
      withGroup: Boolean = false): FactorData =
    fdCache.getOrElseUpdate((dir, periods, quantiles, withGroup), {
      val fd = buildFactorData(spark, dir, periods, quantiles, withGroup)
      fd.df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fd
    })

  /** The pre-quantize merged panel (fwd returns |><| finite factor
    * [|><| group], complete rows) — shared by factorData and the
    * quantize-variant oracle queries, memoized+persisted like
    * factorData (the quantize variants would otherwise re-derive the
    * whole scan+window+join DAG per query). The group variant is the
    * plain panel + a broadcast group join. */
  private val mergedCache =
    scala.collection.concurrent.TrieMap.empty[(String, Seq[Int], Boolean), DataFrame]

  def merged(
      spark: SparkSession,
      dir: String,
      periods: Seq[Int] = Seq(1, 5),
      withGroup: Boolean = false): DataFrame =
    mergedCache.getOrElseUpdate((dir, periods, withGroup), {
      val m =
        if (withGroup)
          merged(spark, dir, periods, withGroup = false)
            .join(broadcast(groupMap(spark, dir)), Seq("asset"), "left")
            .filter(col("group").isNotNull)
        else {
          // fwd returns and the lagged factor in ONE window pass over
          // the panel (round 16): the old form built two frames off the
          // same aggregate (prices->lead windows, factor->lag window)
          // and inner-joined them back on (date, asset) — but (date,
          // asset) is the panel's grouping key, so the join was an
          // identity alignment costing a second panel evaluation plus a
          // join exchange. All three window columns share one
          // partitionBy(asset).orderBy(date) spec (date is unique per
          // asset, so the sort — and every lead/lag — is deterministic),
          // i.e. one shuffle + one sort, values bitwise identical.
          val hs = horizons(periods)
          val pan = panel(spark, dir)
          val w = Window.partitionBy("asset").orderBy("date")
          // the [[prices]] expression inline (exact IEEE arithmetic)
          val price = lit(100.0) +
            ((col("qty").cast("long") * 7919L + col("asset").cast("long") * 131L) % 9973L)
              .cast("double") / 128.0
          val withRets = hs.foldLeft(pan.withColumn("__price", price)) {
            (df, h) => df.withColumn(h.label,
              lead(col("__price"), h.period).over(w) / col("__price") - 1.0)
          }
          withRets
            .withColumn("factor", lag(col("revenue"), 1).over(w))
            .filter(col("factor").isNotNull && !isnan(col("factor")))
            .select((Seq(col("date"), col("asset")) ++
              hs.map(h => col(h.label)) :+ col("factor")): _*)
            .na.drop()
        }
      m.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  private def buildFactorData(
      spark: SparkSession,
      dir: String,
      periods: Seq[Int],
      quantiles: Int,
      withGroup: Boolean): FactorData = {
    if (withGroup) {
      // the group variant IS the plain build + a broadcast group join:
      // quantization partitions by date only, and the supplier->nation
      // map covers every asset, so deriving from the (cached) plain
      // table skips a second run of the whole ingest DAG
      val base = factorData(spark, dir, periods, quantiles, withGroup = false)
      val df = base.df.join(broadcast(groupMap(spark, dir)), Seq("asset"), "left")
        .filter(col("group").isNotNull)
      FactorData(df, base.horizons, base.calendar)
    } else {
      val quantized = Quantize.quantizeFactor(
        merged(spark, dir, periods, withGroup), Quantize.QuantilesInt(quantiles),
        noRaise = true)
        .na.drop(Seq("factor_quantile"))
      FactorData(quantized, horizons(periods),
        TradingCalendar(Set(1, 2, 3, 4, 5, 6, 7), Set.empty))
    }
  }

  /** Doubled average (midrank) rank as exact integer SQL — the DuckDB
    * twin of Information.rank2. */
  def rank2Sql(c: String, part: String): String =
    s"(2 * rank() OVER (PARTITION BY $part ORDER BY $c) + " +
      s"count(*) OVER (PARTITION BY $part, $c) - 1)"

  /** Running-product SQL over a column `r` ordered by date, optionally
    * per `partition` — mirrors [[graft.perf.Cumulative.runningProduct]]
    * exactly (zero flag + log-space magnitude + sign parity), so the
    * cumulative-return oracles share one fragment. */
  def cumProdSql(partition: String = ""): String = {
    val over = "OVER (" +
      (if (partition.nonEmpty) s"PARTITION BY $partition " else "") +
      "ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    s"""CASE WHEN max(CASE WHEN 1.0 + coalesce(r, 0.0) = 0.0 THEN 1 ELSE 0 END)
       |       $over = 1
       |     THEN 0.0
       |     ELSE exp(sum(CASE WHEN 1.0 + coalesce(r, 0.0) = 0.0 THEN 0.0
       |                       ELSE ln(abs(1.0 + coalesce(r, 0.0))) END)
       |              $over)
       |          * CASE WHEN mod(sum(CASE WHEN 1.0 + coalesce(r, 0.0) < 0.0 THEN 1 ELSE 0 END)
       |              $over, 2) = 1
       |                 THEN -1.0 ELSE 1.0 END
       |END""".stripMargin
  }

  /** Pearson corr from pre-aggregated exact sums, with the SAME float-op
    * shape as Information.exactRankCorr: (n*sxy - sx*sy) /
    * (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), null on zero
    * denominator. Bitwise-identical to Spark given identical sums. */
  def exactCorrSql(n: String, sx: String, sxx: String,
                   sy: String, syy: String, sxy: String): String =
    s"CASE WHEN sqrt($n*$sxx - $sx*$sx) * sqrt($n*$syy - $sy*$sy) = 0.0 " +
      s"THEN NULL ELSE ($n*$sxy - $sx*$sy) / " +
      s"(sqrt($n*$sxx - $sx*$sx) * sqrt($n*$syy - $sy*$sy)) END"

  /** The exact sum columns for one rank pair, to place in a GROUP BY
    * select list: sums are HUGEINT-exact then cast, mirroring Spark's
    * long sums cast to double. */
  private def corrSumsSql(x: String, y: String, tag: String): String =
    s"sum($y)::DOUBLE AS sy$tag, sum($y*$y)::DOUBLE AS syy$tag, " +
      s"sum($x*$y)::DOUBLE AS sxy$tag"

  /** Spearman-IC CTE chain over `factor_data` via exact integer ranks —
    * appends `ranked`, `icsums`, and `ic(date[, "group"], i1, i5, ...)`
    * to the prelude. The DuckDB twin of factorInformationCoefficient. */
  def icExactCtes(periods: Seq[Int] = Seq(1, 5),
                  byGroup: Boolean = false,
                  src: String = "factor_data"): String = {
    val part = if (byGroup) "date, \"group\"" else "date"
    val ps = periods.sorted
    val rankCols = ps.map(p => s"${rank2Sql(s"ret_$p", part)} AS r$p")
      .mkString(",\n    ")
    val sums = ps.map(p => corrSumsSql("rf", s"r$p", s"$p")).mkString(",\n    ")
    val corrs = ps.map(p =>
      s"${exactCorrSql("n", "sx", "sxx", s"sy$p", s"syy$p", s"sxy$p")} AS i$p")
      .mkString(",\n    ")
    s""", ranked AS (
       |  SELECT $part, ${rank2Sql("factor", part)} AS rf,
       |    $rankCols
       |  FROM $src),
       |icsums AS (
       |  SELECT $part, count(*)::DOUBLE AS n,
       |    sum(rf)::DOUBLE AS sx, sum(rf*rf)::DOUBLE AS sxx,
       |    $sums
       |  FROM ranked GROUP BY $part),
       |ic AS (
       |  SELECT $part,
       |    $corrs
       |  FROM icsums)""".stripMargin
  }

  /** Shared DuckDB SQL prelude mirroring the derivations above 1:1.
    * `queries` results must hash-match these CTEs run by the driver. */
  def oraclePrelude(periods: Seq[Int] = Seq(1, 5), quantiles: Int = 5,
                    withGroup: Boolean = false): String = {
    val retCols = periods.sorted.map(p =>
      s"lead(price, $p) OVER (PARTITION BY asset ORDER BY date) / price - 1.0 AS ret_$p")
      .mkString(", ")
    val retNotNull = periods.sorted.map(p => s"ret_$p IS NOT NULL").mkString(" AND ")
    val fracs = (0 to quantiles).map(i =>
      BigDecimal(i.toDouble / quantiles).toString).mkString(", ")
    val ladder = (1 to quantiles).map(i =>
      s"WHEN factor <= edges[${i + 1}] THEN $i").mkString(" ")
    val groupJoin =
      if (withGroup)
        """ LEFT JOIN (SELECT s_suppkey AS asset, n_name AS grp FROM supplier
          | JOIN nation ON s_nationkey = n_nationkey) gm USING (asset)""".stripMargin.replace("\n", "")
      else ""
    val groupCol = if (withGroup) ", grp AS \"group\"" else ""
    s"""WITH panel AS (
       |  SELECT date_trunc('day', l_shipdate) AS date, l_suppkey AS asset,
       |         sum(round(l_extendedprice * 100)::BIGINT *
       |             (100 - round(l_discount * 100)::BIGINT))::BIGINT::DOUBLE
       |           / 10000.0 AS revenue,
       |         sum(l_quantity) AS qty
       |  FROM lineitem GROUP BY 1, 2
       |), priced AS (
       |  SELECT date, asset,
       |         100.0 + CAST((CAST(qty AS BIGINT) * 7919 + CAST(asset AS BIGINT) * 131)
       |                      % 9973 AS DOUBLE) / 128.0 AS price
       |  FROM panel
       |), fwd AS (
       |  SELECT date, asset, $retCols FROM priced
       |), fac AS (
       |  SELECT date, asset,
       |         lag(revenue) OVER (PARTITION BY asset ORDER BY date) AS factor
       |  FROM panel
       |), merged AS (
       |  SELECT fwd.*, fac.factor$groupCol
       |  FROM fwd JOIN fac USING (date, asset)$groupJoin
       |  WHERE fac.factor IS NOT NULL AND $retNotNull
       |), edged AS (
       |  SELECT *, quantile_cont(factor, [$fracs])
       |            OVER (PARTITION BY date) AS edges
       |  FROM merged
       |), factor_data AS (
       |  SELECT * EXCLUDE (edges, bucket), bucket AS factor_quantile
       |  FROM (
       |    SELECT *, CASE WHEN len(list_distinct(edges)) < len(edges) THEN NULL
       |                   ELSE (CASE $ladder END) END AS bucket
       |    FROM edged)
       |  WHERE bucket IS NOT NULL
       |)""".stripMargin
  }
}
