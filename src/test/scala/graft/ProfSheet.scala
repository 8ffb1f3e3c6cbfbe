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

    // returnsTable sub-branches
    val fr = graft.perf.Returns.factorReturns(fd)
    time("factorReturns (canonical fold)")(noop(fr))
    time("factorAlphaBeta")(noop(graft.perf.Returns.factorAlphaBeta(fd)))
    val s1 = graft.perf.Returns.meanReturnsStage1(fd)
    time("stage1")(noop(s1))
    time("quantileExtremes (eager)")(graft.perf.Returns.quantileExtremes(fd))
    time("ic series")(noop(
      graft.perf.Information.factorInformationCoefficient(fd)))

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
    // stage accounting on the warm re-run
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(60), ms,
          si.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    time("q_summary_sheet again")(
      noop(graft.data.AnalyticsQueries.queries("q_summary_sheet")(spark, dir)))
    Thread.sleep(1000) // let the listener bus drain
    import scala.jdk.CollectionConverters._
    val ss = stages.asScala.toSeq.sortBy(-_._3)
    println(s"[prof] stages: ${ss.size}, total stage-ms: ${ss.map(_._3).sum}")
    ss.take(20).foreach { case (id, name, ms, nt) =>
      println(f"[prof]   stage $id%4d $ms%6d ms $nt%4d tasks  $name") }
    spark.stop()
  }
}
