package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerKey

/** The custom partial top-k-per-key physical operator: equivalence
  * with the window row_number spelling, the partial→exchange→final
  * plan shape, skew/degenerate cases, and partitioning independence. */
class TopKPerKeySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def randomDf(n: Int, nKeys: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i.toLong, s"k${rnd.nextInt(nKeys)}", rnd.nextInt(1000).toLong)
    }.toDF("id", "key", "v")
  }

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy("key").orderBy(col("v").desc, col("id"))))
      .filter(col("__rn") <= k).drop("__rn")

  /** Evaluate `f` with the RewriteTopKWindow rule disabled — the
    * window spelling must stay on the builtin path to serve as an
    * independent baseline. Forces evaluation inside the guard. */
  private def noRewrite[A](f: => A): A = {
    spark.conf.set("spark.graft.topkRewrite.enabled", "false")
    try f
    finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
  }

  test("matches the window row_number spelling on random data") {
    for ((n, nKeys, k) <- Seq((2000, 7, 3), (500, 100, 5), (300, 1, 10))) {
      val df = randomDf(n, nKeys, seed = n + k)
      val got = TopKPerKey.topKPerKey(df, Seq("key"),
        Seq(("v", false), ("id", true)), k)
        .select("id", "key", "v").collect().toSet
      val want = noRewrite(windowTopK(df, k).select("id", "key", "v").collect().toSet)
      assert(got == want, s"mismatch at n=$n keys=$nKeys k=$k")
    }
  }

  test("plans as partial heaps, a key exchange, then final heaps — no sort") {
    val df = randomDf(1000, 5, seed = 42)
    val plan = TopKPerKey.topKPerKey(df, Seq("key"), Seq(("v", true), ("id", true)), 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), s"missing partial node:\n$plan")
    assert(plan.contains("TopKPerKeyFinal"), s"missing final node:\n$plan")
    val partialIdx = plan.indexOf("TopKPerKeyPartial")
    val exchangeIdx = plan.indexOf("Exchange")
    val finalIdx = plan.indexOf("TopKPerKeyFinal")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"expected final above exchange above partial:\n$plan")
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(!plan.contains("Sort "), s"a sort was planned:\n$plan")
    // the honest baseline: Spark's own rank-limit pushdown
    // (WindowGroupLimit) prunes the shuffle the same way but requires
    // sorted children on BOTH sides and still runs the Window — the
    // sorts and the rank projection are what this operator deletes
    val builtin = noRewrite(windowTopK(df, 4).queryExecution.executedPlan.toString)
    assert(builtin.contains("WindowGroupLimit"),
      s"baseline changed — revisit the comparison:\n$builtin")
    assert(builtin.split("Sort ", -1).length - 1 >= 2,
      s"baseline no longer double-sorts — revisit the comparison:\n$builtin")
  }

  test("k larger than every group degenerates to the identity set") {
    val df = randomDf(200, 20, seed = 7)
    val got = TopKPerKey.topKPerKey(df, Seq("key"), Seq(("v", true), ("id", true)), 1000)
      .collect().length
    assert(got == 200)
  }

  test("heavy skew: one key holds almost everything") {
    val rows = (1L to 5000L).map(i => (i, if (i % 100 == 0) s"k${i % 7}" else "hot",
      i % 997)) :+ (6000L, "only", 1L)
    val df = rows.toDF("id", "key", "v").repartition(13)
    val got = TopKPerKey.topKPerKey(df, Seq("key"), Seq(("v", false), ("id", true)), 2)
      .select("id", "key", "v").collect().toSet
    val want = noRewrite(windowTopK(df, 2).select("id", "key", "v").collect().toSet)
    assert(got == want)
    assert(got.exists(_.getString(1) == "only"), "singleton group must survive")
  }

  test("results are partitioning-independent") {
    val df = randomDf(3000, 11, seed = 3)
    val a = TopKPerKey.topKPerKey(df.repartition(1), Seq("key"),
      Seq(("v", false), ("id", true)), 3).collect().toSet
    val b = TopKPerKey.topKPerKey(df.repartition(17, col("id")), Seq("key"),
      Seq(("v", false), ("id", true)), 3).collect().toSet
    assert(a == b)
  }

  test("multi-column keys and mixed sort directions") {
    val df = randomDf(1500, 4, seed = 9)
      .withColumn("key2", (col("v") % 3).cast("string"))
    val got = TopKPerKey.topKPerKey(df, Seq("key", "key2"),
      Seq(("v", true), ("id", false)), 2)
      .select("id", "key", "key2", "v").collect().toSet
    val want = noRewrite(df.withColumn("__rn", row_number().over(
        Window.partitionBy("key", "key2").orderBy(col("v"), col("id").desc)))
      .filter(col("__rn") <= 2).drop("__rn")
      .select("id", "key", "key2", "v").collect().toSet)
    assert(got == want)
  }

  test("null keys form their own group; null order values follow Spark's null order") {
    val df = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, null, 10L), (2L, null, 20L), (3L, null, null),
      (4L, "a", 5L), (5L, "a", null), (6L, "a", 1L))
      .toDF("id", "key", "v")
    val got = TopKPerKey.topKPerKey(df, Seq("key"), Seq(("v", true), ("id", true)), 2)
      .select("id").as[Long].collect().toSet
    val want = noRewrite(df.withColumn("__rn", row_number().over(
        Window.partitionBy("key").orderBy(col("v").asc, col("id"))))
      .filter(col("__rn") <= 2).select("id").as[Long].collect().toSet)
    assert(got == want)
  }

  test("k=1 arg-max fast path matches the window rn=1 spelling") {
    for ((n, nKeys) <- Seq((1500, 9), (400, 400), (600, 1))) {
      val df = randomDf(n, nKeys, seed = n + nKeys)
      val got = TopKPerKey.argMaxPerKey(df, Seq("key"),
        Seq(("v", false), ("id", true)))
        .select("id", "key", "v").collect().toSet
      val want = noRewrite(windowTopK(df, 1).select("id", "key", "v")
        .collect().toSet)
      assert(got == want, s"argmax mismatch at n=$n keys=$nKeys")
      assert(got.size == df.select("key").distinct().count(),
        "exactly one row per key")
    }
  }

  test("bottomKPerKey is topKPerKey under the reversed order") {
    val df = randomDf(900, 11, seed = 77)
    val got = TopKPerKey.bottomKPerKey(df, Seq("key"),
      Seq(("v", false), ("id", true)), 3)
      .select("id", "key", "v").collect().toSet
    val want = noRewrite(df.withColumn("__rn", row_number().over(
        Window.partitionBy("key").orderBy(col("v").asc, col("id").desc)))
      .filter(col("__rn") <= 3).drop("__rn")
      .select("id", "key", "v").collect().toSet)
    assert(got == want)
  }

  test("the window spelling with the rank dropped is rewritten onto the operator") {
    val df = randomDf(800, 6, seed = 31)
    val spelled = windowTopK(df, 3)
    val plan = spelled.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    val got = spelled.select("id", "key", "v").collect().toSet
    val want = noRewrite(windowTopK(df, 3).select("id", "key", "v").collect().toSet)
    assert(got == want)
    // the strict < form rewrites with k-1
    val lt = df.withColumn("__rn", row_number().over(
        Window.partitionBy("key").orderBy(col("v").desc, col("id"))))
      .filter(col("__rn") < 4).drop("__rn")
    assert(lt.queryExecution.executedPlan.toString.contains("TopKPerKeyFinal"))
    assert(lt.select("id", "key", "v").collect().toSet == want)
  }

  test("the rewrite stays off when the rank survives or the partition is global") {
    val df = randomDf(400, 5, seed = 13)
    // rank kept: the builtin must produce it
    val kept = df.withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy(col("v"), col("id"))))
      .filter(col("rn") <= 2)
    assert(kept.queryExecution.executedPlan.toString.contains("Window"),
      "rewrite fired although the rank column survives")
    // global top-k (no partition): stays builtin
    val global = df.withColumn("__rn", row_number().over(
        Window.orderBy(col("v"), col("id"))))
      .filter(col("__rn") <= 5).drop("__rn")
    assert(!global.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "rewrite fired on an empty partitionSpec")
    // conf off: stays builtin
    val off = noRewrite {
      windowTopK(df, 2).queryExecution.executedPlan.toString
    }
    assert(!off.contains("TopKPerKey"))
  }

  test("buffer bound: flush epochs (partial) + spillable sort fallback (final) stay exact") {
    // With the bound far below the key cardinality, every partition
    // overflows: the map side flushes candidate batches mid-stream and
    // the reduce side reroutes through the external sort. The row set
    // must be bit-identical to the unbounded run and the builtin path.
    spark.conf.set(TopKPerKey.MaxBufferedRowsKey, "16")
    try {
      for ((n, nKeys, k) <- Seq((3000, 500, 3), (2000, 300, 1))) {
        val df = randomDf(n, nKeys, seed = n + k).repartition(7)
        val got = TopKPerKey.topKPerKey(df, Seq("key"),
          Seq(("v", false), ("id", true)), k)
          .select("id", "key", "v").collect().toSet
        val want = noRewrite(windowTopK(df, k).select("id", "key", "v").collect().toSet)
        assert(got == want, s"overflow mismatch at n=$n keys=$nKeys k=$k")
      }
    } finally spark.conf.unset(TopKPerKey.MaxBufferedRowsKey)
  }

  test("AQE on: rewrite + EnsureRequirements exchange still compose") {
    // Skewed 32-partition input under adaptive execution: the rule
    // fires at logical optimization, AQE re-plans stages at runtime —
    // the partial→exchange→final shape must survive re-optimization.
    val aqeBefore = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val rows = (1L to 6000L).map(i =>
        (i, if (i % 50 == 0) s"k${i % 11}" else "hot", i % 991))
      val df = rows.toDF("id", "key", "v").repartition(32, col("id"))
      val spelled = windowTopK(df, 3)
      val got = spelled.select("id", "key", "v").collect().toSet
      // AQE finalizes the plan only after execution — inspect post-run
      val plan = spelled.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan"), s"AQE inactive:\n$plan")
      assert(plan.contains("TopKPerKeyPartial"), s"missing partial under AQE:\n$plan")
      assert(plan.contains("TopKPerKeyFinal"), s"missing final under AQE:\n$plan")
      assert(plan.contains("Exchange"), s"missing exchange under AQE:\n$plan")
      assert(!plan.contains("Window"), s"window survived under AQE:\n$plan")
      val want = noRewrite {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try windowTopK(df, 3).select("id", "key", "v").collect().toSet
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      assert(got == want)
    } finally aqeBefore match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("rejects nonsense arguments") {
    val df = randomDf(10, 2, seed = 1)
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(df, Seq("key"), Seq(("v", true)), 0)
    }
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(df, Seq("nope"), Seq(("v", true)), 1)
    }
  }

  test("a non-positive buffer bound fails loudly instead of spinning") {
    // maxBufferedRows <= 0 used to make the partial-mode epoch loop
    // emit empty epochs without consuming input — an executor hang.
    spark.conf.set(TopKPerKey.MaxBufferedRowsKey, "0")
    try {
      val df = randomDf(100, 5, seed = 7).repartition(3)
      val e = intercept[Throwable] {
        TopKPerKey.topKPerKey(df, Seq("key"), Seq(("v", false)), 2).collect()
      }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains(TopKPerKey.MaxBufferedRowsKey),
        s"expected the conf-key validation message, got:\n$msgs")
    } finally spark.conf.unset(TopKPerKey.MaxBufferedRowsKey)
  }
}
