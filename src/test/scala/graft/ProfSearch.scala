package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.{Dedup, Search, TextOps}

/** Dev-only profiler for the BM25 / containment bench queries — run with
  * `sbt "Test/runMain graft.ProfSearch <sfdir>"`. Not part of the library. */
object ProfSearch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[prof] docs: ${docs.count()}")

    // ---- bm25 stage costs ----
    val postings = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("__t"))
      .groupBy("doc_id", "__t").agg(count(lit(1)).as("__tf"))
    time("postings agg")(noop(postings))
    time("postings + dl window")(noop(
      postings.withColumn("__dl", sum(col("__tf")).over(Window.partitionBy("doc_id")))))
    val df0 = docs
      .select(explode(array_distinct(TextOps.tokens(col("text")))).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__df"))
    time("df scan (separate)")(noop(df0))
    val df1 = postings.groupBy("__t").agg(count(lit(1)).as("__df"))
    time("df from postings")(noop(df1))
    time("stats scan")(noop(
      docs.select(size(TextOps.tokens(col("text"))).as("__len"))
        .filter(col("__len") > 0)
        .agg(count(lit(1)).as("__n"), sum(col("__len")).as("__s"))))

    val qs = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 8)).as("qtext"))
    time("bm25TopK full")(noop(Search.bm25TopK(docs, qs, k = 10)))
    time("bm25TopK again")(noop(Search.bm25TopK(docs, qs, k = 10)))

    // ---- containment stage costs (persisted sets, like the bench) ----
    val sets = Dedup.shingleSets(docs, n = 3)
    sets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sets persist")(sets.count())
    val posts = sets.select(col("__id"), explode(col("__set")).as("__sh"))
    val keptW = posts
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("__sh")))
      .filter(col("__df") <= 100)
    time("kept (window df-cap)")(noop(keptW))
    val dfTab = posts.groupBy("__sh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= 100)
    val keptJ = posts.join(dfTab.select("__sh"), Seq("__sh"))
    time("kept (agg+join df-cap)")(noop(keptJ))
    time("containment full")(noop(
      Dedup.containmentPairsFromSets(sets, minContainment = 0.5, maxDf = 100)))
    time("containment again")(noop(
      Dedup.containmentPairsFromSets(sets, minContainment = 0.5, maxDf = 100)))
    spark.stop()
  }
}
