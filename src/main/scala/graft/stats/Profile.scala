package graft.stats

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — the ANALYZE-style first pass over a 100 TB lake:
  * per column the row/null counts, a bit-reproducible HLL distinct
  * estimate, and min/max, in bounded passes with engine-replayable
  * numbers (planners, layout choices — [[graft.operators.Zorder]]
  * dimension picks, [[graft.operators.SaltedJoin]] skew decisions,
  * partition sizing — all start from exactly this table).
  *
  * Scale shape: pass 1 is ONE plain aggregate over one scan — every
  * column's count/null/min/max computed in the same Aggregate, so the
  * driver receives a single row however wide the table. Pass 2 melts
  * the requested columns to (column, canonical key) with one
  * `posexplode` projection and builds the per-column HLL registers in
  * one map-side-combinable aggregate (at most m = 2^p rows per column
  * leave each partition — the [[Hll]] contract). Nothing anywhere
  * scales with row count.
  *
  * Engine parity: distinct counting runs over a CANONICAL KEY per
  * type — numerics on the 1e-6 grid as scaled-long strings (doubles
  * stringify differently across engines; scaled longs do not),
  * timestamps as epoch-micros strings, strings raw — and min/max
  * report through type-stable channels: `min_num`/`max_num` as doubles
  * (bitwise-comparable), `min_str`/`max_str` as strings (timestamps
  * formatted `yyyy-MM-dd HH:mm:ss`), with `''` sentinels on the
  * channel a column does not use (non-float columns stay non-nullable
  * for the value-hash compare, the q_corpus_pipeline pattern).
  */
object Profile {

  private def kindOf(dt: DataType): String = dt match {
    case _: NumericType => "num"
    case TimestampType | TimestampNTZType | DateType => "time"
    case _ => "str"
  }

  /** The canonical distinct-counting key for one column (null for SQL
    * NULL — excluded from the sketch like count(DISTINCT) excludes
    * it). */
  private def profileKey(c: Column, kind: String): Column = kind match {
    // scaled-long strings: exact for |x| <= ~9.2e12 on the 1e-6 grid
    // (the fixed-point domain the engine's exact aggregates use)
    case "num" => round(c.cast("double") * 1e6, 0).cast("long").cast("string")
    case "time" => unix_micros(c.cast("timestamp")).cast("string")
    case _ => c.cast("string")
  }

  /** Profile `cols` of `df`: one output row per column —
    * (column, n_rows, n_null, hll_distinct, min_num, max_num,
    * min_str, max_str). */
  def profileTable(df: DataFrame, cols: Seq[String], p: Int = 10): DataFrame = {
    require(cols.nonEmpty, "profileTable needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val kinds = cols.map(c => c -> kindOf(df.schema(c).dataType)).toMap

    // pass 1: every per-column metric in ONE aggregate (single row out)
    val aggs: Seq[Column] = cols.flatMap { c =>
      val base = count(col(c)).as(s"__n_$c")
      kinds(c) match {
        case "num" => Seq(base,
          min(col(c)).cast("double").as(s"__lo_$c"),
          max(col(c)).cast("double").as(s"__hi_$c"))
        case "time" => Seq(base,
          date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"__lo_$c"),
          date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"__hi_$c"))
        case _ => Seq(base,
          min(col(c)).cast("string").as(s"__lo_$c"),
          max(col(c)).cast("string").as(s"__hi_$c"))
      }
    }
    val statsRow: Row =
      df.agg(count(lit(1)).as("__rows"), aggs: _*).collect()(0) // 1 row

    // pass 2: melt to (column, canonical key), one HLL register build
    val keyed = df
      .select(posexplode(
        array(cols.map(c => profileKey(col(c), kinds(c))): _*))
        .as(Seq("__i", "__k")))
      .filter(col("__k").isNotNull)
      .select(element_at(typedlit(cols), col("__i") + 1).as("column"),
        col("__k"))
    val hll = Hll.distinctEstimate(keyed, col("__k"), Seq("column"), p)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap // <= |cols| rows

    val nRows = statsRow.getAs[Long]("__rows")
    val out = cols.map { c =>
      val n = statsRow.getAs[Long](s"__n_$c")
      val (loN, hiN, loS, hiS) = kinds(c) match {
        case "num" =>
          (Option(statsRow.getAs[java.lang.Double](s"__lo_$c"))
             .fold(Double.NaN)(_.doubleValue),
           Option(statsRow.getAs[java.lang.Double](s"__hi_$c"))
             .fold(Double.NaN)(_.doubleValue), "", "")
        case _ =>
          (Double.NaN, Double.NaN,
           Option(statsRow.getAs[String](s"__lo_$c")).getOrElse(""),
           Option(statsRow.getAs[String](s"__hi_$c")).getOrElse(""))
      }
      (c, nRows, nRows - n, hll.getOrElse(c, 0.0), loN, hiN, loS, hiS)
    }
    out.toDF("column", "n_rows", "n_null", "hll_distinct",
      "min_num", "max_num", "min_str", "max_str")
  }

  /** The INCREMENTAL profiling artifact: per-column HLL register
    * tables over the canonical keys — (column, __bucket, __r), at most
    * |cols| * 2^p rows. Sketch each batch/day/partition ONCE, persist
    * the tiny table, and answer "distinct per column over any union of
    * snapshots" via [[Hll.mergeRegisters]] + [[estimateRegisters]]
    * without re-reading raw data (registers are a semilattice; the
    * merged estimate is EXACTLY the union's estimate, not an
    * approximation of it — ProfileSpec pins the bitwise equality). */
  def profileRegisters(df: DataFrame, cols: Seq[String],
      p: Int = 10): DataFrame = {
    require(cols.nonEmpty, "profileRegisters needs at least one column")
    val kinds = cols.map(c => c -> kindOf(df.schema(c).dataType)).toMap
    val keyed = df
      .select(posexplode(
        array(cols.map(c => profileKey(col(c), kinds(c))): _*))
        .as(Seq("__i", "__k")))
      .filter(col("__k").isNotNull)
      .select(element_at(typedlit(cols), col("__i") + 1).as("column"),
        col("__k"))
    Hll.registerTable(keyed, col("__k"), Seq("column"), p)
  }

  /** Per-column estimates off a (merged) [[profileRegisters]] table. */
  def estimateRegisters(regs: DataFrame, p: Int = 10): DataFrame =
    Hll.estimateFromRegisters(regs, Seq("column"), p)

  /** Per-DIMENSION profile of an array column — the vector-table face
    * of [[profileTable]] (embedding sanity checks: dead dimensions,
    * scale drift, constant channels, per-dim cardinality): one
    * `posexplode` melt feeds both the stats aggregate (64-ish groups —
    * bounded by width, not rows) and the HLL register build over the
    * 1e-6-grid canonical key. Null rows/elements are excluded like SQL
    * aggregates exclude them.
    * @return (dim, n, n_distinct_est, min_num, max_num) per dimension */
  def profileArray(df: DataFrame, arrayCol: String,
      p: Int = 10): DataFrame = {
    val melted = df
      .select(posexplode(col(arrayCol)).as(Seq("dim", "__x")))
      .filter(col("__x").isNotNull)
      .select(col("dim"), col("__x").cast("double").as("__x"))
    val stats = melted.groupBy("dim").agg(
      count(lit(1)).as("n"),
      min("__x").as("min_num"),
      max("__x").as("max_num"))
    val hll = Hll.distinctEstimate(
      melted.select(col("dim"),
        round(col("__x") * 1e6, 0).cast("long").cast("string").as("__k")),
      col("__k"), Seq("dim"), p, out = "n_distinct_est")
    stats.join(hll, Seq("dim"))
      .select("dim", "n", "n_distinct_est", "min_num", "max_num")
  }
}
