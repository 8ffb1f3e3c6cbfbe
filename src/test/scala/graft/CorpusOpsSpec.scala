package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{CorpusOps, Decontaminate}

class CorpusOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("contamination flags full overlap and leaves disjoint docs clean") {
    val train = docs(
      1L -> "a b c d e",        // identical to bench doc 100 -> frac 1
      2L -> "a b c x y z",      // shares shingle "a b c" only -> frac 1/4
      3L -> "p q r s t")        // disjoint -> frac 0
    val bench = docs(100L -> "a b c d e")
    val out = Decontaminate.contamination(train, bench, n = 3, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_matched"),
          r.getAs[Long]("n_bench_docs"), r.getAs[Double]("contam_frac"),
          r.getAs[Long]("contaminated")))).toMap
    assert(out(1L) === ((3L, 3L, 1L, 1.0, 1L)))
    assert(out(2L) === ((4L, 1L, 1L, 0.25, 0L)))
    assert(out(3L) === ((3L, 0L, 0L, 0.0, 0L)))
  }

  test("contamination counts distinct benchmark docs per train doc") {
    val train = docs(1L -> "a b c d")
    val bench = docs(100L -> "a b c", 101L -> "b c d", 102L -> "x y z")
    val r = Decontaminate.contamination(train, bench, n = 3, threshold = 0.9)
      .collect().head
    assert(r.getAs[Long]("n_grams") === 2L)
    assert(r.getAs[Long]("n_matched") === 2L)
    assert(r.getAs[Long]("n_bench_docs") === 2L)
    assert(r.getAs[Long]("contaminated") === 1L)
  }

  test("hashSplit is deterministic, in-range, and respects thresholds") {
    val d = (0L until 500L).map(i => i -> s"doc $i").toDF("doc_id", "text")
    val a = CorpusOps.hashSplit(d).select("doc_id", "bucket", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val b = CorpusOps.hashSplit(d).select("doc_id", "bucket", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
    assert(a.forall { case (_, bk, _) => bk >= 0 && bk < 1000 })
    assert(a.forall { case (_, bk, s) =>
      s === (if (bk < 900) "train" else if (bk < 950) "valid" else "test") })
    // ~90/5/5 split: loose bounds, deterministic given the fixed hash
    val frac = a.count(_._3 == "train").toDouble / a.length
    assert(frac > 0.85 && frac < 0.95, s"train fraction $frac")
  }

  test("hashSplit assignment is stable under corpus growth") {
    val small = (0L until 100L).map(i => i -> "x").toDF("doc_id", "text")
    val large = (0L until 300L).map(i => i -> "x").toDF("doc_id", "text")
    val s = CorpusOps.hashSplit(small).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val l = CorpusOps.hashSplit(large).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s.forall { case (id, sp) => l(id) === sp })
  }

  test("mixtureWeights: shares and weights sum to 1, alpha<1 upsamples small domains") {
    val d = Seq(
      (1L, "a b c d e f g h", "big"), (2L, "a b c d e f g h", "big"),
      (3L, "a b c d e f g h", "big"), (4L, "a b", "small"))
      .toDF("doc_id", "text", "source")
    val rows = CorpusOps.mixtureWeights(d, alpha = 0.5).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("token_share"), r.getAs[Double]("weight")))).toMap
    val (_, bt, bs, bw) = rows("big")
    val (_, st, ss, sw) = rows("small")
    assert(bt === 24L && st === 2L)
    assertClose(bs + ss, 1.0)
    assertClose(bw + sw, 1.0, 1e-8)
    // sqrt compression: small domain's weight exceeds its raw share
    assert(sw > ss && bw < bs)
    assertClose(sw, math.sqrt(ss) / (math.sqrt(ss) + math.sqrt(bs)), 1e-6)
  }

  test("mixtureWeights alpha=1 reproduces raw shares") {
    val d = Seq((1L, "a b c", "x"), (2L, "a", "y")).toDF("doc_id", "text", "source")
    val rows = CorpusOps.mixtureWeights(d, alpha = 1.0).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("token_share"), r.getAs[Double]("weight"))).toMap
    rows.values.foreach { case (share, w) => assertClose(w, share, 1e-8) }
  }
}
