package graft

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for the summary-sheet composite — run with
  * `sbt "Test/runMain graft.ProfSheet <sfdir>"`. Not part of the library. */
object ProfSheet {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val fd = graft.data.Pipelines.factorData(spark, dir, Seq(1, 5))
    time("warm factor_data")(fd.df.count())

    // components, in composite order
    val sheet = graft.sheets.Sheets.createSummaryTearSheet(fd)
    time("quantileStats")(noop(sheet.quantileStats))
    time("returnsTable")(noop(sheet.returnsTable))
    time("icSummary")(noop(sheet.icSummary))
    time("turnoverMeans")(noop(sheet.quantileTurnoverMeans))
    time("autocorrMeans")(noop(sheet.autocorrelationMeans))
    sheet.unpersist()

    // the full composite as the bench runs it
    time("q_summary_sheet full")(
      noop(graft.data.AnalyticsQueries.queries("q_summary_sheet")(spark, dir)))
    time("q_summary_sheet again")(
      noop(graft.data.AnalyticsQueries.queries("q_summary_sheet")(spark, dir)))
    spark.stop()
  }
}
