package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SuffixRank

class SuffixRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ranksOf(docs: Seq[(Long, String)]): Map[(Long, Int), Long] =
    SuffixRank.suffixRanks(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("suffix ranks match the hand-sorted suffix order, ties share ranks") {
    // doc 1 "a b a b": suffixes (pos) — "a b a b"(0) "b a b"(1)
    // "a b"(2) "b"(3); doc 2 "a b": "a b"(0) "b"(1).
    // Sorted multiset: "a b"x2 < "a b a b" < "b"x2 < "b a b"
    // rows-before ranks: 0,0,2,3,3,5 — equal suffixes share.
    val out = ranksOf(Seq((1L, "a b a b"), (2L, "a b")))
    assert(out === Map(
      (1L, 2) -> 0L, (2L, 0) -> 0L,
      (1L, 0) -> 2L,
      (1L, 3) -> 3L, (2L, 1) -> 3L,
      (1L, 1) -> 5L))
  }

  test("matches a brute-force suffix sort on longer mixed docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick fox"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox naps"),
      (4L, "a a a a a b a a b"))
    val got = ranksOf(docs)
    // brute force: materialize every suffix (space-joined), rank =
    // count of strictly smaller suffixes (occurrence-counted)
    val sufs = docs.flatMap { case (id, text) =>
      val toks = text.split(" ").toSeq
      toks.indices.map(p => ((id, p), toks.drop(p).mkString(" ")))
    }
    val expected = sufs.map { case (k, s) =>
      k -> sufs.count(_._2 < s).toLong
    }.toMap
    assert(got === expected)
  }

  test("single-token and empty docs") {
    val out = ranksOf(Seq((1L, "zebra"), (2L, ""), (3L, "apple")))
    assert(out === Map((1L, 0) -> 1L, (3L, 0) -> 0L))
  }

  test("repeatMarks == brute-force sliding-window repeat surface") {
    // doc 3 fully duplicates doc 4; docs 1/2 share an 8-token run;
    // everything else is unique — the SA-side neighbor-LCP derivation
    // must equal the direct window-multiset computation (the spanDedup
    // surface) at every position and at both thresholds
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon"),
      (2L, s"zeta eta $shared theta iota kappa"),
      (3L, "the quick brown fox jumps over the lazy dog again today"),
      (4L, "the quick brown fox jumps over the lazy dog again today"),
      (5L, "entirely unshared words compose this document body here now"))
    for (l <- Seq(4, 8)) {
      val got = SuffixRank.repeatMarks(docs.toDF("doc_id", "text"), minLen = l)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(2))
        .toMap
      val wins = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").toSeq
        toks.indices.map(p => ((id, p),
          if (toks.size - p >= l) Some(toks.slice(p, p + l)) else None))
      }
      val counts = wins.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
      wins.foreach { case (k, w) =>
        val want = w.exists(counts(_) > 1)
        assert(got(k) === want, s"L=$l $k")
      }
    }
  }

  test("suffix array + LCP matches a brute-force computation, identical suffixes capped") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick fox"),
      (2L, "pack my box with five dozen liquor jugs the quick brown fox"),
      (3L, "a a a a a b a a b"),
      (4L, "a a a a a b a a b")) // full duplicate doc: every suffix tied
    val got = SuffixRank.suffixArrayWithLcp(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // brute force: sort suffixes by (joined text, doc, pos); lcp with
    // the previous entry in that order, token-wise
    val sufs = docs.flatMap { case (id, text) =>
      val toks = text.split(" ").toSeq
      toks.indices.map(p => ((id, p), toks.drop(p)))
    }.sortBy { case ((id, p), toks) => (toks.mkString(" "), id, p) }
    def lcp(a: Seq[String], b: Seq[String]): Long =
      a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
    sufs.zipWithIndex.foreach { case (((id, p), toks), i) =>
      val expLcp = if (i == 0) 0L else lcp(toks, sufs(i - 1)._2)
      assert(got((id, p)) === ((i.toLong, expLcp)),
        s"($id,$p): got ${got((id, p))}, want ($i, $expLcp)")
    }
  }

  test("ranksFromSa equals the standalone prefix-doubling suffixRanks") {
    import spark.implicits._
    // duplicate docs + shared tails force tie runs of every flavor
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box the quick brown fox"),
      (3L, "a a b a a b a"),
      (4L, "a a b a a b a"), // full duplicate
      (5L, "dog")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val direct = canon(SuffixRank.suffixRanks(docs))
    val derived = canon(SuffixRank.ranksFromSa(
      SuffixRank.suffixArrayWithLcp(docs), docs))
    assert(derived === direct && direct.nonEmpty)
  }

  test("retention contract: levels track the TRUE repeat structure, guard fires") {
    import spark.implicits._
    // adversarial worst case: FULL-document duplicates — every suffix
    // of doc 2 ties its twin in doc 1 to its end, so the chain cannot
    // exit before spans cover the whole doc: levels =
    // ceil(log2(len)) + 1 retained frames (the documented O(n log r))
    val tok = (i: Int) => s"t${i % 97}"
    val body = (0 until 300).map(tok).mkString(" ")
    val dup = Seq((1L, body), (2L, body)).toDF("doc_id", "text")
    val (dupSa, dupLevels) =
      SuffixRank.suffixArrayWithLcpAndLevels(dup)
    // spans 1,2,...,512 >= 300 -> 10 or 11 frames, never more
    assert(dupLevels >= 9 && dupLevels <= 11, s"dupLevels $dupLevels")
    // top lcp really reaches the full duplicate length
    assert(dupSa.agg(org.apache.spark.sql.functions.max("lcp_prev"))
      .collect()(0).getLong(0) === 300L)
    // repeat-free corpus (all tokens distinct): the early exit holds
    // retention at the floor even though docs are equally long
    val flat = Seq((1L, (0 until 300).map(i => s"u$i").mkString(" ")),
      (2L, (300 until 600).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val (_, flatLevels) = SuffixRank.suffixArrayWithLcpAndLevels(flat)
    assert(flatLevels <= 5, s"flatLevels $flatLevels") // exit probes from h=8
    // the fail-fast guard names the conf and fires BEFORE the chain
    // would retain past the bound
    spark.conf.set(SuffixRank.MaxRetainedLevelsKey, "4")
    try {
      val e = intercept[IllegalStateException] {
        SuffixRank.suffixArrayWithLcp(dup).collect()
      }
      assert(e.getMessage.contains(SuffixRank.MaxRetainedLevelsKey))
    } finally spark.conf.unset(SuffixRank.MaxRetainedLevelsKey)
  }

  test("disk level store: bitwise parity, O(n) block-manager peak, " +
      "scratch cleanup, guard bypassed") {
    import spark.implicits._
    // the adversarial full-duplicate corpus again — the shape whose
    // sparse table is deepest relative to its size
    val tok = (i: Int) => s"t${i % 97}"
    val body = (0 until 300).map(tok).mkString(" ")
    val dup = Seq((1L, body), (2L, body)).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val mem = canon(SuffixRank.suffixArrayWithLcp(dup))
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-sa-spec").toFile
    spark.conf.set(SuffixRank.LevelStorageKey, "disk")
    spark.conf.set(SuffixRank.ScratchDirKey, scratch.toString)
    // disk mode ignores the memory guard: a bound the memory chain
    // would trip is fine when the sparse table lives on scratch disk
    spark.conf.set(SuffixRank.MaxRetainedLevelsKey, "4")
    try {
      val disk = canon(SuffixRank.suffixArrayWithLcp(dup))
      assert(disk === mem, "disk and memory level stores must agree bitwise")
      // O(n) peak: after the build only the frames backing the result
      // remain resident (positions, seq, the final pairs) — the chain
      // and level frames were freed round by round. Counted over the
      // ids THIS build checkpointed (lastBuildCheckpointIds ∩ the
      // persistent registry), never the context-global registry size:
      // suites share the SparkContext and run concurrently, so sibling
      // localCheckpoints between two global reads made the old
      // before/after count nondeterministic (round-12 flaky gate).
      val created = SuffixRank.lastBuildCheckpointIds.get.toSet
      assert(created.size >= 10,
        s"probe expects the full doubling chain tracked, got $created")
      val live = created
        .intersect(spark.sparkContext.getPersistentRDDs.keySet)
      assert(live.size <= 3,
        s"disk mode retained ${live.size} of ${created.size} " +
          s"build-created persistent RDDs (ids $live)")
      // the per-build scratch subdirectory is gone
      assert(scratch.listFiles() == null || scratch.listFiles().isEmpty,
        s"scratch not cleaned: ${scratch.listFiles().mkString(",")}")
    } finally {
      spark.conf.unset(SuffixRank.LevelStorageKey)
      spark.conf.unset(SuffixRank.ScratchDirKey)
      spark.conf.unset(SuffixRank.MaxRetainedLevelsKey)
      scratch.delete()
    }
  }

  test("level storage conf rejects unknown modes") {
    import spark.implicits._
    spark.conf.set(SuffixRank.LevelStorageKey, "tape")
    try {
      val e = intercept[IllegalArgumentException] {
        SuffixRank.suffixArrayWithLcp(Seq((1L, "a b")).toDF("doc_id", "text"))
      }
      assert(e.getMessage.contains(SuffixRank.LevelStorageKey))
    } finally spark.conf.unset(SuffixRank.LevelStorageKey)
  }
}
