package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Rewrite

/** Semantics pins for the corpus-wide text REWRITE operators. */
class RewriteSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def byId(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("text"), r.getAs[Long]("n_kept"),
        r.getAs[Int]("n_chunks")))).toMap

  test("chunkDedup keeps a duplicated chunk only at its first corpus occurrence") {
    val docs = Seq(
      (1L, "a b c x y z"),      // chunks: "a b c", "x y z"
      (2L, "a b c q r s"),      // "a b c" duplicates doc 1 chunk 0
      (3L, "q r s a b c")       // both chunks are later occurrences
    ).toDF("doc_id", "text")
    val out = byId(Rewrite.chunkDedup(docs, k = 3))
    assert(out(1L) === (("a b c x y z", 2L, 2)))
    assert(out(2L) === (("q r s", 1L, 2)))
    assert(out(3L) === (("", 0L, 2))) // fully deduped, restored empty
  }

  test("chunkDedup removes within-document repeats past the first") {
    val docs = Seq((5L, "w w w w w w w w w")).toDF("doc_id", "text")
    val out = byId(Rewrite.chunkDedup(docs, k = 3))
    assert(out(5L) === (("w w w", 1L, 3)))
  }

  test("chunkDedup: the partial final chunk is its own span; order survives") {
    val docs = Seq(
      (1L, "p q"),              // single partial chunk "p q"
      (2L, "a b c p q")         // "a b c" + partial "p q" (duplicate)
    ).toDF("doc_id", "text")
    val out = byId(Rewrite.chunkDedup(docs, k = 3))
    assert(out(1L) === (("p q", 1L, 1)))
    assert(out(2L) === (("a b c", 1L, 2)))
    // tokenless docs are restored with empty text and zero chunks
    val empty = byId(Rewrite.chunkDedup(
      Seq((9L, ""), (10L, "a b c")).toDF("doc_id", "text"), k = 3))
    assert(empty(9L) === (("", 0L, 0)))
  }

  test("stripBoilerplate drops only chunks above the df threshold, everywhere") {
    // "x y z" in 3 docs (boilerplate at maxDf=2), "a b c" in 2 (kept)
    val docs = Seq(
      (1L, "x y z a b c"),
      (2L, "x y z a b c"),
      (3L, "x y z u v w")).toDF("doc_id", "text")
    val out = byId(Rewrite.stripBoilerplate(docs, k = 3, maxDf = 2))
    assert(out(1L) === (("a b c", 1L, 2)))
    assert(out(2L) === (("a b c", 1L, 2)))
    assert(out(3L) === (("u v w", 1L, 2)))
    // at maxDf=3 nothing is boilerplate
    val keep = byId(Rewrite.stripBoilerplate(docs, k = 3, maxDf = 3))
    assert(keep(1L) === (("x y z a b c", 2L, 2)))
  }

  private def spanById(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("text"), r.getAs[Long]("n_kept"),
        r.getAs[Int]("n_tokens")))).toMap

  test("spanDedup catches a duplicate offset from the chunk grid; " +
      "chunkDedup documents the miss") {
    // doc 2 repeats doc 1's "b c d" but shifted one token off doc 2's
    // OWN 3-chunk grid: doc2 chunks are "x b c" / "d e f" — neither
    // equals a doc-1 chunk, so chunkDedup keeps everything...
    val docs = Seq(
      (1L, "b c d q r s"),
      (2L, "x b c d e f")).toDF("doc_id", "text")
    val chunk = byId(Rewrite.chunkDedup(docs, k = 3))
    assert(chunk(2L) === (("x b c d e f", 2L, 2)),
      "pin: the non-overlapping grid cannot see the straddling duplicate")
    // ...while the stride-1 span pass removes exactly the duplicated
    // 3-token span from its later occurrence
    val span = spanById(Rewrite.spanDedup(docs, k = 3))
    assert(span(1L) === (("b c d q r s", 6L, 6)))
    assert(span(2L) === (("x e f", 3L, 6)))
  }

  test("spanDedup removes a shifted cross-document duplicate span entirely") {
    val docs = Seq(
      (1L, "p q r s t u"),
      (2L, "z p q r s t u w")).toDF("doc_id", "text")
    // doc 2 contains doc 1's full text shifted by one: all 6 tokens of
    // the embedded copy go; the flanks survive
    val out = spanById(Rewrite.spanDedup(docs, k = 5))
    assert(out(1L) === (("p q r s t u", 6L, 6)))
    assert(out(2L) === (("z w", 2L, 8)))
  }

  test("spanDedup keeps first occurrences and sub-k docs untouched") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),       // exact duplicate, later doc -> emptied
      (3L, "a b c d"),         // 4 < k tokens: no span can repeat
      (4L, "")).toDF("doc_id", "text")
    val out = spanById(Rewrite.spanDedup(docs, k = 5))
    assert(out(1L) === (("a b c d e", 5L, 5)))
    assert(out(2L) === (("", 0L, 5)))
    assert(out(3L) === (("a b c d", 4L, 4)))
    assert(out(4L) === (("", 0L, 0)))
  }

  test("spanDedup removes within-document repeats past the first") {
    // "m n m n m n m n": shingle "m n m n" (k=4) at starts 0,2,4 —
    // starts 2,4 are non-first, removing positions 2..7
    val docs = Seq((7L, "m n m n m n m n")).toDF("doc_id", "text")
    val out = spanById(Rewrite.spanDedup(docs, k = 4))
    assert(out(7L) === (("m n", 2L, 8)))
  }

  test("spanDedupSA is bit-identical to spanDedup on every pinned case") {
    // the SA-composed cut must reproduce the shingle-grouped cut
    // exactly: same blocks (equal-k-window classes), same keep-first,
    // same covered-position cuts — across shifted/cross-doc/within-doc
    // repeats, sub-k docs, empty docs
    val cases = Seq(
      (3, Seq((1L, "b c d q r s"), (2L, "x b c d e f"))),
      (5, Seq((1L, "p q r s t u"), (2L, "z p q r s t u w"))),
      (5, Seq((1L, "a b c d e"), (2L, "a b c d e"),
        (3L, "a b c d"), (4L, ""))),
      (4, Seq((7L, "m n m n m n m n"))))
    cases.foreach { case (k, rows) =>
      val docs = rows.toDF("doc_id", "text")
      val want = spanById(Rewrite.spanDedup(docs, k = k))
      val got = spanById(Rewrite.spanDedupSA(docs, minLen = k))
      assert(got === want, s"SA cut diverged at k=$k on $rows")
    }
  }

  test("spanDedupSA matches spanDedup on a randomized repeat-heavy corpus") {
    val rnd = new scala.util.Random(41)
    // a tiny vocabulary forces many genuine >= k repeats; planted
    // mirrors add full-document duplicates on top
    val base = (0L until 24L).map { i =>
      i -> (0 until 6 + rnd.nextInt(30))
        .map(_ => s"w${rnd.nextInt(6)}").mkString(" ")
    }
    val rows = base ++ base.take(4).map { case (i, t) => (i + 100L) -> t }
    val docs = rows.toDF("doc_id", "text")
    val want = spanById(Rewrite.spanDedup(docs, k = 5))
    val got = spanById(Rewrite.spanDedupSA(docs, minLen = 5))
    assert(got === want)
    // the corpus genuinely exercised cuts
    assert(want.exists { case (_, (_, kept, total)) => kept < total })
  }

  test("spanDedup keeper selection is an aggregate, not a window") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Rewrite.spanDedup(docs, k = 5)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"),
      "hot-shingle skew safety requires groupBy+join keeper selection")
  }

  test("keeper selection is an aggregate, not a window over occurrences") {
    // the scale contract: no Window operator in the chunkDedup plan
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Rewrite.chunkDedup(docs, k = 3)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"),
      "hot-chunk skew safety requires groupBy+join keeper selection")
  }
}
