package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper for the sheet-family fan-out. */
object ProfPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fd = graft.data.Pipelines.factorData(spark, dir, Seq(1, 5))
    fd.df.count()
    println("=== fd.df queryExecution.executedPlan outputPartitioning ===")
    println(fd.df.queryExecution.executedPlan.outputPartitioning)
    val ic = graft.perf.Information.factorInformationCoefficient(fd)
    println("=== IC plan ===")
    println(ic.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Window") ||
        l.contains("InMemory") || l.contains("Sort")).mkString("\n"))
    val tm = graft.stats.Tables.quantileTurnoverMeans(fd, Seq(1, 5))
    println("=== turnoverMeans plan ===")
    println(tm.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Aggregate") ||
        l.contains("InMemory") || l.contains("Window")).mkString("\n"))
    spark.stop()
  }
}
