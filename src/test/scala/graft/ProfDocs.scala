package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for the document/vector bench tail — run with
  * `sbt "Test/runMain graft.ProfDocs <sfdir>"`. Not part of the library. */
object ProfDocs {
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

    val qs = SparkEntry.queries
    time("q_contamination cold")(noop(qs("q_contamination")(spark, dir)))
    time("q_contamination warm")(noop(qs("q_contamination")(spark, dir)))
    time("q_centroids cold")(noop(qs("q_centroids")(spark, dir)))
    time("q_centroids warm")(noop(qs("q_centroids")(spark, dir)))
    time("q_ann_ivf cold")(noop(qs("q_ann_ivf")(spark, dir)))
    time("q_ann_ivf warm")(noop(qs("q_ann_ivf")(spark, dir)))
    time("q_dedup_clusters")(noop(qs("q_dedup_clusters")(spark, dir)))
    time("q_top_ngrams")(noop(qs("q_top_ngrams")(spark, dir)))
    time("q_knn_label")(noop(qs("q_knn_label")(spark, dir)))
    time("q_sample_mix")(noop(qs("q_sample_mix")(spark, dir)))
    println("[prof] cached RDDs: " +
      spark.sparkContext.getPersistentRDDs.size)
    spark.stop()
  }
}
