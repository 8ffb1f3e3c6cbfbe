package graft
import org.apache.spark.sql.SparkSession

/** Dev probe: times each component of the Bench warmup separately so
  * optimization work on the warmup path is evidence-driven. Not part
  * of the driver contract. Usage: runMain graft.WarmProbe <sfDir> */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[warmprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    t("jit-noop") {
      spark.range(2000000L).selectExpr("sum(id * 2) as s")
        .write.format("noop").mode("overwrite").save()
    }
    t("factorData(base)") {
      graft.data.Pipelines.factorData(spark, sfDir).df.count()
    }
    t("factorData(group)") {
      graft.data.Pipelines.factorData(spark, sfDir, Seq(1, 5), 5,
        withGroup = true).df.count()
    }
    t("warm:shingles") {
      graft.data.DocQueries.docShingleSets(spark, sfDir, n = 3).count()
    }
    t("warm:jaccardPairs") {
      graft.data.DocQueries.docJaccardPairs(spark, sfDir, n = 3,
        minJaccard = 0.3, maxDf = 100).count()
    }
    t("warm:bm25Index") {
      val idx = graft.data.DocQueries.bm25Index(spark, sfDir)
      idx.postings.count(); idx.df.count(); idx.stats.count()
    }
    t("warm:coarseCentroids") {
      graft.data.DocQueries.coarseCentroids(spark, sfDir)
    }
    t("warm:pqBooks") {
      graft.data.DocQueries.pqBooks(spark, sfDir)
    }
    t("warm:fullSa") {
      graft.data.DocQueries.fullSa(spark, sfDir).count()
    }
    spark.stop()
  }
}
