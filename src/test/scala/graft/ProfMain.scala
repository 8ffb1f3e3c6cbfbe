package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the heavyweight bench queries — run with
  * `sbt "Test/runMain graft.ProfMain <sfdir>"`. Not part of the library. */
object ProfMain {
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

    {
      val pan = graft.data.Pipelines.panel(spark, dir)
      time("panel")(noop(pan))
      val fwd = graft.data.Pipelines.forwardReturns(
        graft.data.Pipelines.prices(pan), graft.data.Pipelines.horizons(Seq(1, 5)))
      time("fwd returns")(noop(fwd))
      val m = graft.data.Pipelines.merged(spark, dir, Seq(1, 5))
      time("merged")(noop(m))
      val q = graft.ingest.Quantize.quantizeFactor(m,
        graft.ingest.Quantize.QuantilesInt(5), noRaise = true)
      time("quantized")(noop(q))
    }
    val fd = graft.data.Pipelines.factorData(spark, dir, Seq(1, 5))
    time("warm factor_data")(fd.df.count())

    val wts = graft.perf.Returns.factorWeights(fd).select("date", "asset", "weight")
    time("weights")(noop(wts))
    val pos = graft.perf.Positions.factorPositions(fd, "ret_1")
    time("positions (instants)")(noop(pos))
    time("positions again")(noop(pos))
    val posDay = pos.groupBy(date_trunc("DAY", col("date")).as("date"), col("asset"))
      .agg(sum("position").as("__p"))
    time("posDay")(noop(posDay))
    val full = graft.perf.Positions.createPyfolioInput(fd, "ret_1").positions
    time("pyfolio positions full")(noop(full))
    time("pyfolio positions full again")(noop(full))

    {
      import graft.perf.EventStudy
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("asset").orderBy("date")
      val pret = graft.data.Pipelines.prices(graft.data.Pipelines.panel(spark, dir))
        .withColumn("ret", col("price") / lag(col("price"), 1).over(w) - 1.0)
        .select("date", "asset", "ret")
      val levels = EventStudy.toCumulative(pret)
      time("levels only")(noop(levels))
      val acr = graft.data.AnalyticsQueries.queries("q_avg_cum_ret")(spark, dir)
      time("q_avg_cum_ret")(noop(acr))
      time("q_avg_cum_ret again")(noop(acr))
    }
    val dq = graft.data.DocQueries.queries
    time("q_neardup_cosine")(noop(dq("q_neardup_cosine")(spark, dir)))
    time("q_neardup_cosine again")(noop(dq("q_neardup_cosine")(spark, dir)))
    time("q_minhash_neardup")(noop(dq("q_minhash_neardup")(spark, dir)))
    time("q_jaccard_pairs")(noop(dq("q_jaccard_pairs")(spark, dir)))
    time("q_dedup_clusters")(noop(dq("q_dedup_clusters")(spark, dir)))
    spark.stop()
  }
}
