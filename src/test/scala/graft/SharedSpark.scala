package graft

import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.{BeforeAndAfterAll, Suite}

/** One shared local SparkSession across all suites (Spark restart per
  * suite would dominate test time). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); read as long nanoseconds
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SharedSpark.spark

  def ts(date: String): Timestamp =
    Timestamp.valueOf(LocalDate.parse(date).atStartOfDay())

  /** Long panel from a wide matrix: one row per (date, asset), null for
    * NaN holes — mirrors the reference's wide-frame fixtures. */
  def longPanel(dates: Seq[String], assets: Seq[String],
                values: Seq[Seq[Double]], valueCol: String): DataFrame = {
    val rows = for {
      (d, di) <- dates.zipWithIndex
      (a, ai) <- assets.zipWithIndex
    } yield Row(ts(d), a,
      if (values(di)(ai).isNaN) null else java.lang.Double.valueOf(values(di)(ai)))
    val schema = StructType(Seq(
      StructField("date", TimestampType), StructField("asset", StringType),
      StructField(valueCol, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
  }

  /** Collect (date, asset) -> value for a column, skipping nulls. */
  def collectMap(df: DataFrame, c: String): Map[(Timestamp, String), Double] =
    df.select("date", "asset", c).collect()
      .filter(r => !r.isNullAt(2))
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.get(2) match {
        case d: java.lang.Double => d.doubleValue
        case i: java.lang.Integer => i.doubleValue
      })).toMap

  def assertClose(actual: Double, expected: Double, tol: Double = 1e-9): Unit =
    assert(math.abs(actual - expected) <= tol ||
      (actual.isNaN && expected.isNaN),
      s"expected $expected, got $actual")
}
