package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Kmv

/** KMV/theta sketches: determinism under repartitioning (the retained
  * set is a function of the value set), exactness below k, estimator
  * accuracy, and set algebra over the retained arrays alone. */
class KmvSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val K = 128

  private def sketchOf(values: Seq[String], parts: Int = 7): Seq[Long] =
    Kmv.sketch(values.map(("g", _)).toDF("k", "v").repartition(parts),
        Seq("k"), col("v"), K)
      .select("kmv").head.getSeq[Long](0)

  test("the retained set is a pure function of the value set") {
    val vals = (1 to 5000).map(i => s"v${i % 1200}") // duplicates galore
    val a = sketchOf(vals, parts = 1)
    val b = sketchOf(scala.util.Random.shuffle(vals), parts = 32)
    assert(a == b, "partitioning/order changed the sketch")
    assert(a == a.sorted && a.size == K, "ascending, saturated at k")
    assert(a.toSet.size == K, "retained values are distinct")
  }

  test("below k the sketch IS the hashed set and the estimate is exact") {
    val vals = (1 to 60).map(i => s"u$i")
    val df = vals.map(("g", _)).toDF("k", "v")
    val sk = Kmv.sketch(df, Seq("k"), col("v"), K)
    val est = sk.select(Kmv.distinctEstimate(col("kmv"), K)).head.getDouble(0)
    assert(est == 60.0)
    assert(sk.select(Kmv.thetaRaw(col("kmv"), K)).head.getLong(0) == (1L << 56))
  }

  test("distinct estimate lands within the theta-sketch error bound") {
    for (n <- Seq(1000, 20000)) {
      val vals = (1 to n).map(i => s"d$i")
      val df = vals.map(("g", _)).toDF("k", "v").repartition(16)
      val est = Kmv.sketch(df, Seq("k"), col("v"), K)
        .select(Kmv.distinctEstimate(col("kmv"), K)).head.getDouble(0)
      // RSE ~ 1/sqrt(k-2) ≈ 8.9%; allow 4 sigma
      assert(math.abs(est - n) < 4.0 * n / math.sqrt(K - 2.0),
        s"n=$n est=$est")
    }
  }

  test("union and intersection estimates from the arrays alone") {
    // A = 1..3000, B = 2001..5000 → |A∪B| = 5000, |A∩B| = 1000
    val a = (1 to 3000).map(i => ("a", s"x$i"))
    val b = (2001 to 5000).map(i => ("b", s"x$i"))
    val sk = Kmv.sketch((a ++ b).toDF("k", "v").repartition(8),
      Seq("k"), col("v"), K)
    val row = sk.filter(col("k") === "a").select(col("kmv").as("ka"))
      .crossJoin(sk.filter(col("k") === "b").select(col("kmv").as("kb")))
      .select(
        Kmv.distinctEstimate(Kmv.unionSketch(col("ka"), col("kb"), K), K)
          .as("u"),
        Kmv.intersectEstimate(col("ka"), col("kb"), K).as("i"),
        Kmv.jaccardEstimate(col("ka"), col("kb"), K).as("j"))
      .head
    val (u, i) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(u - 5000) < 4.0 * 5000 / math.sqrt(K - 2.0), s"union=$u")
    // intersection RSE scales with |A∪B|/|A∩B| — loose factor-2 band
    assert(i > 400 && i < 2100, s"intersect=$i")
    // jaccard is the ratio of the two (true value 0.2)
    assert(math.abs(row.getDouble(2) - i / u) < 1e-12)
    assert(row.getDouble(2) > 0.08 && row.getDouble(2) < 0.42)
    // a sketch unioned with itself is itself; self-intersection is the
    // distinct estimate
    val self = sk.filter(col("k") === "a")
      .select(Kmv.unionSketch(col("kmv"), col("kmv"), K).as("us"),
        round(Kmv.intersectEstimate(col("kmv"), col("kmv"), K), 6).as("si"),
        round(Kmv.distinctEstimate(col("kmv"), K), 6).as("de"))
      .head
    assert(self.getSeq[Long](0) == sk.filter(col("k") === "a")
      .select("kmv").head.getSeq[Long](0))
    assert(self.getDouble(1) == self.getDouble(2))
  }

  test("pooled HIP union estimate: lower variance than the merged-sketch estimate") {
    // 100 deterministic disjoint pairs (|A| = |B| = 500, union 1000),
    // k = 64: the pooled estimator sees up to 2k-1 observations below
    // theta_min where the merged sketch truncates to k — expect the
    // mean squared error to drop by roughly half. Deterministic: the
    // "randomness" is the value hashes themselves.
    val k = 64
    val rows = for {
      t <- 0 until 100
      (side, i) <- (0 until 500).map(("a", _)) ++ (0 until 500).map(("b", _))
    } yield (t, side, s"t$t:$side$i")
    val df = rows.toDF("trial", "side", "v")
    val sk = Kmv.sketch(df, Seq("trial", "side"), col("v"), k)
    val wide = sk.groupBy("trial").pivot("side", Seq("a", "b"))
      .agg(first("kmv"))
    val ests = wide.select(
        Kmv.hipUnionEstimate(col("a"), col("b"), k).as("hip"),
        Kmv.distinctEstimate(Kmv.unionSketch(col("a"), col("b"), k), k)
          .as("merged"),
        Kmv.hipDifferenceEstimate(col("a"), col("b"), k).as("diff"))
      .collect()
    val mseHip = ests.map(r => math.pow(r.getDouble(0) - 1000.0, 2)).sum / ests.length
    val mseMerged = ests.map(r => math.pow(r.getDouble(1) - 1000.0, 2)).sum / ests.length
    assert(mseHip < 0.8 * mseMerged,
      s"pooled estimator not better: hip=$mseHip merged=$mseMerged")
    // both essentially unbiased; the difference estimator centers on 500
    val meanDiff = ests.map(_.getDouble(2)).sum / ests.length
    assert(math.abs(meanDiff - 500.0) < 50.0, s"diff mean $meanDiff")
  }

  test("pooled HIP estimates are exact when neither sketch saturated") {
    val a = (1 to 40).map(i => s"x$i"); val b = (25 to 70).map(i => s"x$i")
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("side", "v")
    val sk = Kmv.sketch(df, Seq("side"), col("v"), K)
    val wide = sk.withColumn("g", lit(1))
      .groupBy("g").pivot("side", Seq("a", "b")).agg(first("kmv"))
    val r = wide.select(
      Kmv.hipUnionEstimate(col("a"), col("b"), K),
      Kmv.hipDifferenceEstimate(col("a"), col("b"), K)).head
    assert(r.getDouble(0) == 70.0) // |A ∪ B| = x1..x70
    assert(r.getDouble(1) == 24.0) // |A \ B| = x1..x24
  }

  test("merging sketch tables equals sketching the concatenation") {
    // the mergeable-artifact property: sketch two batches separately,
    // union their arrays, compare against the one-shot sketch
    val b1 = (1 to 4000).map(i => ("g", s"m$i"))
    val b2 = (3000 to 7000).map(i => ("g", s"m$i"))
    val s1 = sketchOf(b1.map(_._2))
    val s2 = sketchOf(b2.map(_._2))
    val merged = Kmv.sketch((b1 ++ b2).toDF("k", "v"), Seq("k"), col("v"), K)
      .select("kmv").head.getSeq[Long](0)
    val viaArrays = Seq((s1, s2)).toDF("a", "b")
      .select(Kmv.unionSketch(col("a"), col("b"), K)).head.getSeq[Long](0)
    assert(viaArrays == merged)
  }
}
