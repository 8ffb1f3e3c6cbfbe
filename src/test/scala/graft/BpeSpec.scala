package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** Golden tests for BPE training/encoding on the classic hand-traced
  * corpus (no SQL oracle applies — the merge loop is iterative list
  * rewriting; determinism and the hand-derived merge table are the
  * pins, the streaming-operator precedent). */
class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** hug x10, pug x5, pun x12, bun x4, hugs x5 — the standard BPE
    * teaching corpus. Hand trace: pair counts u-g 20, p-u 17, u-n 16,
    * h-u 15, b-u 4, g-s 5 -> merge (u,g); then u-n 16, h-ug 15 ->
    * merge (u,n); then h-ug 15 -> merge (h,ug). */
  private def corpus = Seq(
    (1L, Array.fill(10)("hug").mkString(" ")),
    (2L, Array.fill(5)("pug").mkString(" ")),
    (3L, Array.fill(12)("pun").mkString(" ")),
    (4L, Array.fill(4)("bun").mkString(" ")),
    (5L, Array.fill(5)("hugs").mkString(" "))).toDF("doc_id", "text")

  test("train learns the hand-traced merge sequence") {
    assert(Bpe.train(corpus, numMerges = 3) ===
      Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("train is deterministic and stops when pairs are exhausted") {
    val m1 = Bpe.train(corpus, numMerges = 3)
    val m2 = Bpe.train(corpus, numMerges = 3)
    assert(m1 === m2)
    // a single repeated 2-char word admits exactly one merge
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    assert(Bpe.train(tiny, numMerges = 10) === Seq(("a", "b")))
  }

  test("driver-local and distributed venues learn identical merge tables") {
    // vocabCap <= 0 forces the distributed per-merge loop; the default
    // cap routes this 6-word vocabulary to the driver venue — the
    // learned tables must match entry for entry (exact integer counts,
    // UTF-8-byte tie-breaks in both venues)
    val local = Bpe.train(corpus, numMerges = 6)
    val dist = Bpe.train(corpus, numMerges = 6, vocabCap = 0)
    assert(local === dist)
    // tie-break parity on a crafted all-ties vocabulary: "xy" and "xz"
    // both occur twice -> pair counts (x,y)=2, (x,z)=2; the winner must
    // be the lexicographically smaller (x,y) in both venues
    val ties = Seq((1L, "xy xy xz xz")).toDF("doc_id", "text")
    assert(Bpe.train(ties, numMerges = 1) === Seq(("x", "y")))
    assert(Bpe.train(ties, numMerges = 1, vocabCap = 0) === Seq(("x", "y")))
  }

  test("a vocabulary above the cap falls back to the distributed venue") {
    // cap 2 < 5 distinct words: the probe collects at most cap+1 rows
    // and training still converges to the same table
    assert(Bpe.train(corpus, numMerges = 3, vocabCap = 2) ===
      Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("batched distributed venue: non-interacting merges share one " +
      "pass, venue-equivalent, job-economical") {
    val alphabet =
      "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    // 24 disjoint two-char words with strictly decreasing counts: the
    // 24 merges are mutually non-interacting and count-separated, so
    // the batched distributed venue must accept all of them from ONE
    // candidate pass — and still walk the exact classic trajectory
    val words = (0 until 24).map(i => alphabet.slice(2 * i, 2 * i + 2))
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(100 - i)(w) }.mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val expect = words.map(w => (w(0).toString, w(1).toString))
    assert(Bpe.train(df, numMerges = 24) === expect) // driver venue
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val dist =
      try {
        val r = Bpe.train(df, numMerges = 24, vocabCap = 0)
        Thread.sleep(500) // let the listener bus drain
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(dist === expect)
    // classic one-merge-per-job was >= 48 jobs for 24 merges; the
    // batched pass is one candidate query (AQE materializes its
    // shuffle stages as a few jobs) + one checkpoint
    assert(counter.get <= 24 / 4, s"batched venue used ${counter.get} jobs")
  }

  test("batched venue defers interacting merges and settles count ties " +
      "exactly like the classic loop") {
    // chained words: 'ab' wants (a,b); 'abc' then wants (ab,c) — which
    // interacts with (a,b), so the batch must stop and a second pass
    // must learn it, reproducing the sequential trajectory
    val chain = Seq((1L, (Seq.fill(10)("abc") ++ Seq.fill(12)("ab"))
      .mkString(" "))).toDF("doc_id", "text")
    val local = Bpe.train(chain, numMerges = 3)
    val dist = Bpe.train(chain, numMerges = 3, vocabCap = 0)
    assert(local === dist)
    // count tie between a kept candidate and an excluded interacting
    // rival: strict-threshold filter must degenerate to single-merge
    // (xy: 6 = yz: 6 share y; then ties resolve sequentially)
    val ties = Seq((1L, (Seq.fill(6)("xy") ++ Seq.fill(6)("yz") ++
      Seq.fill(4)("pq")).mkString(" "))).toDF("doc_id", "text")
    assert(Bpe.train(ties, numMerges = 3, vocabCap = 0) ===
      Bpe.train(ties, numMerges = 3))
  }

  test("encode segments with learned merges; unseen words fall to chars") {
    val merges = Bpe.train(corpus, numMerges = 3)
    val probe = Seq((9L, "hugs bun hug zap")).toDF("doc_id", "text")
    val out = Bpe.encode(probe, merges).collect()
      .map(r => r.getAs[String]("token") ->
        r.getAs[scala.collection.Seq[String]]("subwords").toSeq).toMap
    assert(out("hugs") === Seq("hug", "s"))
    assert(out("bun") === Seq("b", "un"))
    assert(out("hug") === Seq("hug"))
    assert(out("zap") === Seq("z", "a", "p")) // no applicable merges
    val counts = Bpe.encode(probe, merges).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Int]("n_subwords")).toMap
    assert(counts === Map("hugs" -> 2, "bun" -> 2, "hug" -> 1, "zap" -> 3))
  }

  test("merge application is left-to-right non-overlapping") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "a"))
    assert(Bpe.segment("aaaa", Seq(("a", "a"), ("aa", "aa"))).toSeq ===
      Seq("aaaa"))
  }
}
