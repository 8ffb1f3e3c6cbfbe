package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Classifier

/** Semantics pins for the trained quality classifier. */
class ClassifierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Linearly separable corpus: positive docs repeat one vocabulary,
    * negative docs another. */
  private def separable(n: Int) = (0 until n).map { i =>
    val pos = i % 2 == 0
    val words =
      if (pos) Seq("excellent", "prose", "clear", "cogent")
      else Seq("spam", "junk", "noise", "garbage")
    val text = (0 until 6).map(j => words((i + j) % words.length)).mkString(" ")
    (i.toLong, text, if (pos) 1L else 0L)
  }.toDF("doc_id", "text", "y")

  test("fit + classify separates a separable corpus perfectly") {
    val docs = separable(40)
    val w = Classifier.fit(docs, "y", dim = 64, iters = 3, lr = 0.5)
    val out = Classifier.classify(docs, w, dim = 64).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("score"), r.getAs[Int]("predicted")))).toMap
    val labels = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("y")).toMap
    assert(out.size === 40)
    labels.foreach { case (id, y) =>
      assert(out(id)._2.toLong === y, s"doc $id misclassified: ${out(id)}")
    }
    // scores actually separate (not all hovering at 0.5)
    val posMin = labels.collect { case (id, 1L) => out(id)._1 }.min
    val negMax = labels.collect { case (id, 0L) => out(id)._1 }.max
    assert(posMin > 0.6 && negMax < 0.4,
      s"weak separation: posMin=$posMin negMax=$negMax")
  }

  test("training reduces logistic loss monotonically on the fixture") {
    val docs = separable(40)
    def loss(iters: Int): Double = {
      val w = Classifier.fit(docs, "y", dim = 64, iters = iters, lr = 0.5)
      val scored = Classifier.classify(docs, w, dim = 64)
        .join(docs.select("doc_id", "y"), "doc_id").collect()
      scored.map { r =>
        val p = math.min(1 - 1e-9, math.max(1e-9, r.getAs[Double]("score")))
        val y = r.getAs[Long]("y")
        -(y * math.log(p) + (1 - y) * math.log(1 - p))
      }.sum / scored.length
    }
    val (l1, l2, l3) = (loss(1), loss(2), loss(3))
    assert(l2 < l1 && l3 < l2, s"loss not decreasing: $l1, $l2, $l3")
  }

  test("loss keeps falling at depth (iters=10) and l2=0 matches unpenalized") {
    val docs = separable(40)
    def lossAt(iters: Int, l2: Double): Double = {
      val w = Classifier.fit(docs, "y", dim = 64, iters = iters, lr = 0.5,
        l2 = l2)
      val scored = Classifier.classify(docs, w, dim = 64)
        .join(docs.select("doc_id", "y"), "doc_id").collect()
      scored.map { r =>
        val p = math.min(1 - 1e-9, math.max(1e-9, r.getAs[Double]("score")))
        val y = r.getAs[Long]("y")
        -(y * math.log(p) + (1 - y) * math.log(1 - p))
      }.sum / scored.length
    }
    val (l3, l6, l10) = (lossAt(3, 0.0), lossAt(6, 0.0), lossAt(10, 0.0))
    assert(l6 < l3 && l10 < l6,
      s"loss not decreasing with depth: $l3, $l6, $l10")
    // l2 = 0.0 must reproduce the unpenalized trajectory bitwise
    assert(Classifier.fit(docs, "y", dim = 64, iters = 5, lr = 0.5).toSeq ===
      Classifier.fit(docs, "y", dim = 64, iters = 5, lr = 0.5, l2 = 0.0).toSeq)
  }

  test("L2 decay shrinks the weight norm and never grows the loss much") {
    val docs = separable(40)
    def norm2(w: Array[Long]): Double =
      w.map(x => (x / 1e6) * (x / 1e6)).sum
    val plain = Classifier.fit(docs, "y", dim = 64, iters = 10, lr = 0.5)
    val decayed = Classifier.fit(docs, "y", dim = 64, iters = 10, lr = 0.5,
      l2 = 0.01)
    assert(norm2(decayed) < norm2(plain),
      s"decay did not shrink: ${norm2(decayed)} >= ${norm2(plain)}")
    // the decayed model still separates the separable corpus
    val out = Classifier.classify(docs, decayed, dim = 64)
      .join(docs.select("doc_id", "y"), "doc_id").collect()
    out.foreach { r =>
      assert(r.getAs[Int]("predicted").toLong === r.getAs[Long]("y"),
        s"doc ${r.getAs[Long]("doc_id")} misclassified under decay")
    }
    intercept[IllegalArgumentException] {
      Classifier.fit(docs, "y", dim = 64, iters = 3, l2 = -0.1)
    }
  }

  test("fit is deterministic and token-less docs get the bias-only score") {
    val docs = Seq(
      (1L, "excellent clear prose", 1L),
      (2L, "spam junk noise", 0L),
      (3L, "", 0L)).toDF("doc_id", "text", "y")
    val w1 = Classifier.fit(docs, "y", dim = 64, iters = 3, lr = 0.5)
    val w2 = Classifier.fit(docs, "y", dim = 64, iters = 3, lr = 0.5)
    assert(w1.toSeq === w2.toSeq)
    val out = Classifier.classify(docs, w1, dim = 64).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(out.size === 3)
    // the empty doc's margin is exactly the bias weight
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-w1(64) / 1e6)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(3L) === expected)
  }

  test("fitNorm separates and is length-invariant where fit is not") {
    // the separable corpus, but positive docs are 20x longer: raw-count
    // features scale with length, mean-pooled features do not
    val docs = (0 until 40).map { i =>
      val pos = i % 2 == 0
      val words =
        if (pos) Seq("excellent", "prose", "clear", "cogent")
        else Seq("spam", "junk", "noise", "garbage")
      val reps = if (pos) 120 else 6
      val text = (0 until reps).map(j => words((i + j) % words.length))
        .mkString(" ")
      (i.toLong, text, if (pos) 1L else 0L)
    }.toDF("doc_id", "text", "y")
    val w = Classifier.fitNorm(docs, "y", dim = 64, iters = 6, lr = 6.0)
    val out = Classifier.classifyNorm(docs, w, dim = 64)
      .join(docs.select("doc_id", "y"), "doc_id").collect()
    out.foreach { r =>
      assert(r.getAs[Int]("predicted").toLong === r.getAs[Long]("y"),
        s"doc ${r.getAs[Long]("doc_id")} misclassified: ${r.getAs[Double]("score")}")
    }
    // exact-duplication invariance of the normalized margin: doubling a
    // doc's text doubles both the hashed counts and the token count, so
    // the pre-snap margin ratio — and hence the snapped score — is
    // unchanged (raw-count classify scores the two differently)
    val single = Seq((100L, "excellent prose clear")).toDF("doc_id", "text")
    val doubled = Seq(
      (100L, "excellent prose clear excellent prose clear"))
      .toDF("doc_id", "text")
    val s1 = Classifier.classifyNorm(single, w, dim = 64)
      .collect().head.getAs[Double]("score")
    val s2 = Classifier.classifyNorm(doubled, w, dim = 64)
      .collect().head.getAs[Double]("score")
    assert(s1 === s2, s"normalized score not duplication-invariant: $s1 vs $s2")
  }

  test("fitNorm is deterministic; token-less docs score the pure bias") {
    val docs = Seq(
      (1L, "excellent clear prose", 1L),
      (2L, "spam junk noise", 0L),
      (3L, "", 0L)).toDF("doc_id", "text", "y")
    val w1 = Classifier.fitNorm(docs, "y", dim = 64, iters = 4, lr = 2.0)
    val w2 = Classifier.fitNorm(docs, "y", dim = 64, iters = 4, lr = 2.0)
    assert(w1.toSeq === w2.toSeq)
    val out = Classifier.classifyNorm(docs, w1, dim = 64).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-w1(64) / 1e6)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(3L) === expected)
  }

  test("weights stay on the 1e-6 grid and reject bad shapes") {
    val docs = separable(10)
    val w = Classifier.fit(docs, "y", dim = 16, iters = 2, lr = 0.5)
    assert(w.length === 17)
    intercept[IllegalArgumentException] {
      Classifier.classify(docs, w, dim = 64)
    }
    intercept[IllegalArgumentException] {
      Classifier.fit(docs, "y", dim = 16, iters = 0)
    }
  }
}
