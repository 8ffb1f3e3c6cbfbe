package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line. Each query is materialized through a noop write
  * (NOT count() — Catalyst prunes unreferenced window/projection work
  * under a count, which would time only a fragment of the real plan).
  * The JSON line is printed to stdout AND written to bench_result.json so
  * the driver can parse it even if the build tool prefixes stdout. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); read as long nanoseconds
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up, timed and reported as its own entry: a JIT/codegen
    // exercise plus the shared factor_data build+persist (the tear-sheet
    // lifecycle input — SURVEY §3: cache once, fan out). Without this the
    // alphabetically-first queries absorb JVM warm-up and the first
    // factor query absorbs the whole ingest DAG, making per-query
    // numbers meaningless.
    val w0 = System.nanoTime()
    spark.range(2000000L).selectExpr("sum(id * 2) as s")
      .write.format("noop").mode("overwrite").save()
    graft.data.Pipelines.factorData(spark, sfDir).df.count()
    graft.data.Pipelines.factorData(spark, sfDir, Seq(1, 5), 5,
      withGroup = true).df.count()
    graft.data.DocQueries.warm(spark, sfDir)
    val warmup = "warmup" -> (System.nanoTime() - w0) / 1e9
    // --runs N (or SPARK_GRAFT_RUNS): run the query sweep N times and
    // report per-query MEDIANS — the microVM host noise makes single-run
    // per-query numbers ungradeable (identical plans have measured 5x
    // apart across rounds on untouched files; VERDICT r5 "what's wrong"
    // #2). Default is 3 so the per-round artifact is always a median.
    // Warmup runs once; median of an even N averages the middle two.
    val runs = args.sliding(2).collectFirst { case Array("--runs", n) => n.toInt }
      .orElse(sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt)).getOrElse(3).max(1)
    // each sweep records (elapsed, succeeded) — a failed run's fast-fail
    // elapsed must NOT deflate the median, and a query that fails in any
    // sweep is reported in "failures" rather than only on stderr
    // --only a,b,c restricts the sweep (local iteration on a bench
    // pair); the driver passes no args and sweeps everything
    val only = args.sliding(2)
      .collectFirst { case Array("--only", csv) => csv.split(",").toSet }
    def sweep(): Seq[(String, (Double, Boolean))] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_(name)) }
        .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        name -> ((System.nanoTime() - t0) / 1e9, ok)
      }
    val sweeps = (1 to runs).map(_ => sweep())
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val names = sweeps.head.map(_._1)
    val medians = names.map { name =>
      val timings = sweeps.map(_.toMap.apply(name))
      val good = timings.filter(_._2).map(_._1)
      name -> (if (good.nonEmpty) Some(median(good)) else None)
    }
    val failures = names.map { name =>
      name -> sweeps.map(_.toMap.apply(name)).count(!_._2)
    }.filter(_._2 > 0)
    val results = ("warmup" -> Some(warmup._2)) +: medians
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + v.map(_.toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val fs = failures.map { case (k, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"failures":$fs}"""
    println(line)
    Files.writeString(Paths.get("bench_result.json"), line + "\n")
    spark.stop()
  }
}
