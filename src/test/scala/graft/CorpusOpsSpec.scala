package graft

import org.apache.spark.sql.functions.col
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

  test("packSequences: contiguous offsets, correct seq spans, blocks agree") {
    val d = docs(
      0L -> "a b c",             // 3 tokens, offset 0
      1L -> "d e f g h",         // 5 tokens, offset 3
      2L -> "",                  // 0 tokens -> dropped
      3L -> "i j",               // 2 tokens, offset 8
      7L -> ("w " * 9).trim,     // 9 tokens, offset 10
      9L -> "z")                 // 1 token, offset 19
    val out = CorpusOps.packSequences(d, seqLen = 8, blockSize = 4)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(0L, 1L, 3L, 7L, 9L))
    assert(out.map(_.getAs[Long]("token_offset")).toSeq ===
      Seq(0L, 3L, 8L, 10L, 19L))
    // doc 1 (tokens 3..7) fits seq 0; doc 3 (8..9) opens seq 1;
    // doc 7 (10..18) straddles seqs 1-2; doc 9 (19) sits in seq 2
    assert(out.map(r => (r.getAs[Long]("start_seq"), r.getAs[Long]("end_seq"),
      r.getAs[Long]("n_seqs"))).toSeq ===
      Seq((0L, 0L, 1L), (0L, 0L, 1L), (1L, 1L, 1L), (1L, 2L, 2L), (2L, 2L, 1L)))
    assert(out.map(_.getAs[Long]("start_offset")).toSeq ===
      Seq(0L, 3L, 0L, 2L, 3L))
    // block size 1 forces every doc through the block-prefix path;
    // offsets must be identical
    val blocky = CorpusOps.packSequences(d, seqLen = 8, blockSize = 1)
      .orderBy("doc_id").collect().map(_.getAs[Long]("token_offset")).toSeq
    assert(blocky === Seq(0L, 3L, 8L, 10L, 19L))
  }

  test("gopherRules flags short, repetitive, and stopword-free docs") {
    // 70 words, stopwords present, mean word length in [3,10]
    val good = (("the of and to in " * 4) +
      (0 until 50).map(i => s"word${i}xyz").mkString(" ")).trim
    val d = docs(
      1L -> good,
      2L -> "tiny doc",                        // fails wordcount + stop
      3L -> (("the of " + "x y " * 30).trim))  // top-2gram "x y" dominant
    val out = graft.text.TextStats.gopherRules(d)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("quality_pass") === 1L)
    assert(out(2L).getAs[Long]("r_wordcount") === 0L)
    assert(out(2L).getAs[Long]("quality_pass") === 0L)
    assert(out(3L).getAs[Long]("r_rep") === 0L)
    assert(out(3L).getAs[Long]("quality_pass") === 0L)
  }

  test("sampleKPerGroup keeps exactly k per group, deterministically") {
    val d = (0 until 60).map(i => (i.toLong, s"doc $i", s"g${i % 3}"))
      .toDF("doc_id", "text", "source")
    val a = CorpusOps.sampleKPerGroup(d, k = 5)
      .select("doc_id", "source", "pick_rank").collect()
    assert(a.length === 15)
    assert(a.groupBy(_.getString(1)).forall(_._2.length == 5))
    val b = CorpusOps.sampleKPerGroup(d, k = 5)
      .select("doc_id", "source", "pick_rank").collect()
    assert(a.map(_.toSeq).sortBy(_.toString) === b.map(_.toSeq).sortBy(_.toString))
    // a member's rank never depends on higher-ranked removals: top-3 of
    // k=5 equals k=3 selection (prefix property of the hash order)
    val c = CorpusOps.sampleKPerGroup(d, k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val topOf5 = a.filter(_.getInt(2) <= 3).map(_.getLong(0)).toSet
    assert(c === topOf5)
  }

  test("redactPii counts and masks emails, SSNs, and phone numbers") {
    val d = docs(
      1L -> "write bob.smith+x@mail.example.org or call 555-867-5309 now",
      2L -> "ssn 123-45-6789 twice 987-65-4321 end",
      3L -> "clean text with no personal data at all")
    val out = graft.text.TextStats.redactPii(d)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") === 1L)
    assert(out(1L).getAs[Long]("n_phones") === 1L)
    assert(out(1L).getAs[String]("redacted") ===
      "write <EMAIL> or call <PHONE> now")
    assert(out(2L).getAs[Long]("n_ssns") === 2L)
    assert(out(2L).getAs[String]("redacted") === "ssn <SSN> twice <SSN> end")
    assert(out(3L).getAs[Long]("n_emails") === 0L)
    assert(out(3L).getAs[String]("redacted") ===
      "clean text with no personal data at all")
  }

  test("hashVectorize matches the reference hash formula exactly") {
    def h56(s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        dig.map(b => f"$b%02x").mkString.substring(0, 14), 16)
    }
    def expected(text: String): Map[Long, Long] =
      text.split(" ").filter(_.nonEmpty).toSeq
        .map(h56).groupBy(_ % 64)
        .view.mapValues(_.map(h => if ((h >> 32) % 2 == 0) 1L else -1L).sum)
        .toMap.filter(_._2 != 0L)
    val t1 = "alpha alpha alpha beta"; val t2 = "alpha beta gamma delta"
    val d = docs(1L -> t1, 2L -> t2)
    val v = graft.text.TextStats.hashVectorize(d, dim = 64).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r =>
        r.getAs[Long]("dim") -> r.getAs[Long]("value")).toMap).toMap
    assert(v(1L) === expected(t1))
    assert(v(2L) === expected(t2))
  }

  test("curateVerdicts composes quality, exact-dup, near-dup, contamination") {
    val good = (("the of and to in " * 4) +
      (0 until 50).map(i => s"word${i}xyz").mkString(" ")).trim
    val nearDup = good.replace("word7xyz", "word7abc")
    val good2 = (("the of and to in " * 4) +
      (0 until 50).map(i => s"other${i}qq").mkString(" ")).trim
    val d = docs(
      1L -> good,      // unique, passes everything
      2L -> good,      // exact copy of 1 -> exact AND near dup
      3L -> nearDup,   // near-dup of 1
      4L -> "tiny",    // fails quality
      5L -> good2)     // overlaps the benchmark
    val bench = docs(100L -> good2)
    val out = graft.text.Curate.curateVerdicts(d, bench, maxDf = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("pass_quality"), r.getAs[Long]("is_exact_dup"),
          r.getAs[Long]("is_near_dup"), r.getAs[Long]("is_contaminated"),
          r.getAs[Long]("kept")))).toMap
    assert(out(1L) === ((1L, 0L, 0L, 0L, 1L)))
    assert(out(2L) === ((1L, 1L, 1L, 0L, 0L)))
    assert(out(3L)._3 === 1L && out(3L)._5 === 0L)
    assert(out(4L)._1 === 0L && out(4L)._5 === 0L)
    assert(out(5L) === ((1L, 0L, 0L, 1L, 0L)))
  }

  test("curateVerdicts optional stages: quote-dedup and BM25 relevance") {
    val good = (("the of and to in " * 4) +
      (0 until 50).map(i => s"word${i}xyz").mkString(" ")).trim
    // a strict prefix of `good` (55 of its 70 tokens): every trigram is
    // contained in good's set -> containment 1.0, while staying above
    // the 50-word gopher floor
    val quote = good.split(" ").take(55).mkString(" ")
    val good2 = (("the of and to in " * 4) +
      (0 until 50).map(i => s"other${i}qq").mkString(" ")).trim
    val d = docs(1L -> good, 5L -> good2, 6L -> quote)
    val bench = docs(100L -> "decoy benchmark text nothing shared")
    val queries = Seq((1L, "word0xyz word1xyz")).toDF("query_id", "qtext")
    val out = graft.text.Curate.curateVerdicts(d, bench, maxDf = 10,
      containmentThreshold = Some(0.9), relevanceQueries = Some(queries))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("pass_quality"), r.getAs[Long]("is_quote_dup"),
          r.getAs[Long]("pass_relevance"), r.getAs[Long]("kept")))).toMap
    // doc 1: passes everything incl. relevance; cluster representative
    assert(out(1L) === ((1L, 0L, 1L, 1L)))
    // doc 6: quote of doc 1 -> quote-dup (relevant, good quality)
    assert(out(6L) === ((1L, 1L, 1L, 0L)))
    // doc 5: clean but shares no query term -> fails relevance only
    assert(out(5L) === ((1L, 0L, 0L, 0L)))
    // keep-the-superset: when the QUOTE has the lower id, the full
    // document must still be the cluster keep (min-id would drop it)
    val d2 = docs(1L -> quote, 2L -> good, 5L -> good2)
    val out2 = graft.text.Curate.curateVerdicts(d2, bench, maxDf = 10,
      containmentThreshold = Some(0.9))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("is_quote_dup")).toMap
    assert(out2(2L) === 0L, "superset must be kept despite higher id")
    assert(out2(1L) === 1L, "fragment must be flagged despite lower id")
    // stages default OFF: schema is exactly the four-flag contract
    assert(graft.text.Curate.curateVerdicts(d, bench, maxDf = 10)
      .columns.toSeq === Seq("doc_id", "pass_quality", "is_exact_dup",
      "is_near_dup", "is_contaminated", "kept"))
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

  test("leakageSafeSplit keeps every cluster member in one split") {
    import graft.text.Dedup
    // two clusters {1,2,3} and {10,11}; 20..29 are singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val clusters = Dedup.duplicateClusters(pairs)
    val docs = (Seq(1L, 2L, 3L, 10L, 11L) ++ (20L to 29L)).toDF("doc_id")
    val out = CorpusOps.leakageSafeSplit(docs, clusters).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("split_key"), r.getAs[String]("split")))).toMap
    assert(out.size === 15)
    // cluster members share the key (= min id) and therefore the split
    assert(Seq(1L, 2L, 3L).map(out(_)).distinct.size === 1)
    assert(out(1L)._1 === 1L)
    assert(Seq(10L, 11L).map(out(_)).distinct.size === 1)
    assert(out(10L)._1 === 10L)
    // singletons key on their own id and match plain hashSplit exactly
    val plain = CorpusOps.hashSplit((20L to 29L).toDF("doc_id")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    (20L to 29L).foreach(id => assert(out(id)._2 === plain(id)))
  }

  test("dsirWeights favors documents that look like the target subset") {
    // target docs speak "alpha beta gamma"; raw background speaks
    // "noise junk filler"; probe docs mix the two vocabularies
    val docs = ((0 until 10).map(i =>
        (i.toLong, "alpha beta gamma alpha beta gamma", 1L)) ++
      (10 until 30).map(i =>
        (i.toLong, "noise junk filler noise junk filler", 0L)) ++
      Seq((100L, "alpha beta gamma noise junk filler", 0L),
        (101L, "alpha alpha beta beta gamma gamma", 0L)))
      .toDF("doc_id", "text", "y")
    val w = CorpusOps.dsirWeights(docs, "y").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("lw_scaled"), r.getAs[Double]("log_weight")))).toMap
    // target-vocabulary docs outrank background docs
    assert(w(101L)._1 > w(100L)._1, "pure target vocab must outrank a mix")
    assert(w(100L)._1 > w(15L)._1, "a mix must outrank pure background")
    // log_weight is exactly the scaled integer / 1e6
    w.values.foreach { case (s, lw) => assert(lw === s.toDouble / 1e6) }
    // deterministic across runs
    val again = CorpusOps.dsirWeights(docs, "y").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lw_scaled")).toMap
    assert(again === w.view.mapValues(_._1).toMap)
    // dsirSample returns the k best by exact weight with id tie-break
    val top = CorpusOps.dsirSample(docs, "y", k = 11).collect()
      .map(_.getAs[Long]("doc_id"))
    assert(top.length === 11)
    assert(top.take(11).toSet === ((0L until 10L).toSet + 101L),
      s"expected the 10 target docs + the pure-target probe, got ${top.toSeq}")
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

  test("mixtureAllocation: targets from weights, repeat cap, honest deficit") {
    val d = Seq(
      (1L, "a b c d e f g h", "big"), (2L, "a b c d e f g h", "big"),
      (3L, "a b c d e f g h", "big"), (4L, "a b", "small"))
      .toDF("doc_id", "text", "source")
    // weights (alpha=0.5): big ~0.776, small ~0.224 (24 vs 2 tokens).
    // budget 100: big target 78 < cap 48? no — cap = 2*24 = 48 -> big
    // CAPPED (deficit 30); small target 22 > cap 4 -> capped too.
    val m = CorpusOps.mixtureAllocation(d, budgetTokens = 100L,
        alpha = 0.5, maxRepeat = 2.0).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("target_tokens"), r.getAs[Long]("achieved_tokens"),
          r.getAs[Long]("deficit_tokens"), r.getAs[Double]("epochs")))).toMap
    val (bt, ba, bd, be) = m("big")
    assert(ba === 48L && bd === bt - 48L && be === 2.0)
    val (st, sa, sd, se) = m("small")
    assert(sa === 4L && sd === st - 4L && se === 2.0)
    // a budget inside the caps: targets achieved, zero deficit,
    // fractional epochs = achieved / n_tokens
    val m2 = CorpusOps.mixtureAllocation(d, budgetTokens = 30L,
        alpha = 0.5, maxRepeat = 2.0).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("target_tokens"), r.getAs[Long]("deficit_tokens"),
          r.getAs[Double]("epochs")))).toMap
    val (bt2, bd2, be2) = m2("big")
    assert(bd2 === 0L)
    assertClose(be2, bt2.toDouble / 24.0, 1e-9)
  }

  test("mixtureDiversityCap: caps reflect the k picked docs, not the full mass") {
    // source "bulk": 4 identical 8-token docs; "lean": 2 docs of 8 and
    // 2 tokens. k=1 caps every source at ONE hash-picked document.
    val d = Seq(
      (1L, "a b c d e f g h", "bulk"), (2L, "a b c d e f g h", "bulk"),
      (3L, "a b c d e f g h", "bulk"), (4L, "a b c d e f g h", "bulk"),
      (5L, "a b c d e f g h", "lean"), (6L, "a b", "lean"))
      .toDF("doc_id", "text", "source")
    val m = CorpusOps.mixtureDiversityCap(d, budgetTokens = 1000L,
        kPerSource = 1, alpha = 0.5, maxRepeat = 2.0).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("cap_docs"),
          r.getAs[Long]("cap_tokens"), r.getAs[Long]("achieved_tokens"),
          r.getAs[Long]("deficit_tokens"), r.getAs[Double]("epochs")))).toMap
    // bulk's 32 full tokens no longer convert to budget: cap = 2x the
    // ONE picked 8-token doc = 16, not 64; the huge target mostly
    // lands in the deficit column
    val (bn, bcd, bc, ba, bdf, be) = m("bulk")
    assert(bn === 32L && bcd === 1L && bc === 16L && ba === 16L)
    assert(bdf > 0L && be === 2.0)
    // lean's cap depends on WHICH doc the hash picks (8 or 2 tokens) —
    // pin it against the same sampleKPerGroup pick
    val pick = CorpusOps.sampleKPerGroup(d, k = 1)
      .filter(col("source") === "lean").collect()
    assert(pick.length === 1)
    val pickTok = if (pick(0).getAs[Long]("doc_id") == 6L) 2L else 8L
    val (_, lcd, lc, la, _, _) = m("lean")
    assert(lcd === 1L && lc === 2L * pickTok && la === lc)
    // the matrix stays honest: every source appears exactly once
    assert(m.size === 2)
  }

  test("mixtureWaterfill: exact level search, redistribution sums to the budget") {
    val d = Seq(
      (1L, "a b c d e f g h", "big"), (2L, "a b c d e f g h", "big"),
      (3L, "a b c d e f g h", "big"), (4L, "a b", "small"))
      .toDF("doc_id", "text", "source")
    def run(b: Long) = CorpusOps.mixtureWaterfill(d, budgetTokens = b,
        alpha = 0.5, maxRepeat = 2.0).collect()
      .map(r => r.getAs[String]("source") ->
        ((Option(r.get(5)).map(_.asInstanceOf[Double]),
          r.getAs[Long]("alloc_tokens"), r.getAs[Boolean]("capped"),
          r.getAs[Double]("weight")))).toMap
    // B=40: small caps at 4; the level rises to (40-4)/(40*w_big) and
    // big absorbs the remaining budget EXACTLY
    val m40 = run(40L)
    assert(m40("small")._2 === 4L && m40("small")._3)
    val (bigT, bigAlloc, bigCapped, bigW) = m40("big")
    assert(!bigCapped && bigAlloc === 36L, s"big got $bigAlloc")
    assert(math.abs(bigT.get - 36.0 / (40.0 * bigW)) < 1e-6)
    assert(m40.values.map(_._2).sum === 40L)
    // B=100 > total caps 52: every source capped, level null
    val m100 = run(100L)
    assert(m100.values.forall(v => v._1.isEmpty && v._3))
    assert(m100.values.map(_._2).sum === 52L)
    // B=15: nothing caps, level is exactly 1, allocation proportional
    val m15 = run(15L)
    assert(m15.values.forall(v => v._1.contains(1.0) && !v._3))
    assert(m15("big")._2 === 12L && m15("small")._2 === 3L)
  }

  test("epochShard: positions are a permutation, shards balanced round-robin") {
    val d = (1L to 100L).map(i => i -> s"doc $i").toDF("doc_id", "text")
    val out = CorpusOps.epochShard(d, epoch = 1, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 100)
    // global positions shard*1 + pos*8 reconstruct 0..99 exactly
    val gps = out.map { case (_, s, p) => p * 8 + s }.sorted
    assert(gps.toSeq == (0L until 100L))
    // round-robin deal: shard sizes differ by at most 1 (100 = 12*8+4)
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keys.toSet == (0L until 8L).toSet)
    assert(sizes.values.forall(s => s == 12 || s == 13))
    // in-shard positions are contiguous from 0
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length))
    }
  }

  test("epochShard: epochs reshuffle, runs and partitionings do not") {
    val d = (1L to 200L).map(i => i -> s"doc $i").toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, epoch: Int) =
      CorpusOps.epochShard(df, epoch, nShards = 4).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val e1 = run(d, 1)
    assert(run(d, 1) == e1) // deterministic
    assert(run(d.repartition(7), 1) == e1) // partitioning-independent
    assert(run(d, 2) != e1) // a new epoch is a new order
    // and the hash-block two-level rank agrees with a brute global sort
    val brute = d.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.text.TextOps.hash56(org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("gs1:"),
          org.apache.spark.sql.functions.col("doc_id").cast("string")))
          .as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sorted.map(_._2).zipWithIndex
      .map { case (id, gp) => id -> (gp.toLong % 4, gp.toLong / 4) }.toMap
    assert(e1 == brute)
  }

  test("stratifiedSample: exact Hamilton allocation, rank-capped picks") {
    // strata of 50/30/20 rows; k=10 -> exact proportional 5/3/2
    val docs = ((0 until 50).map(i => (i.toLong, "a")) ++
      (50 until 80).map(i => (i.toLong, "b")) ++
      (80 until 100).map(i => (i.toLong, "c")))
      .toDF("doc_id", "source")
    val got = CorpusOps.stratifiedSample(docs, k = 10)
    val byG = got.collect().groupBy(_.getAs[String]("source"))
    assert(byG("a").length === 5 && byG("b").length === 3 &&
      byG("c").length === 2, byG.view.mapValues(_.length).toMap.toString)
    assert(got.count() === 10)
    // remainder case: 3/3/3 rows, k=2 -> floors 0 and two top-ups by
    // remainder (all tie at 2*3 mod 9 = 6) -> groups a and b win the
    // tie-break (group ascending)
    val even = ((0 until 3).map(i => (i.toLong, "a")) ++
      (3 until 6).map(i => (i.toLong, "b")) ++
      (6 until 9).map(i => (i.toLong, "c"))).toDF("doc_id", "source")
    val e = CorpusOps.stratifiedSample(even, k = 2).collect()
      .map(_.getAs[String]("source")).sorted.toSeq
    assert(e === Seq("a", "b"), e.toString)
    // allocation exceeding a stratum keeps all its rows (no error)
    val tiny = ((0 until 2).map(i => (i.toLong, "a")) ++
      (2 until 98).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    val t = CorpusOps.stratifiedSample(tiny, k = 50).collect()
      .groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(t("a") <= 2, t.toString)
    // deterministic across partitionings
    val x = CorpusOps.stratifiedSample(docs, 10).orderBy("source", "pick_rank")
      .collect().toSeq
    val y = CorpusOps.stratifiedSample(docs.repartition(13), 10)
      .orderBy("source", "pick_rank").collect().toSeq
    assert(x === y)
  }

  test("weightedSample: proportional inclusion, domain guard, determinism") {
    import org.apache.spark.sql.functions.col
    // one overwhelming weight among unit weights: A-ES inclusion
    // probability for the heavy item is ~1 across any salt
    val docs = ((0 until 60).map(i => (i.toLong, 1L)) :+ (999L, 1000000L))
      .toDF("doc_id", "w")
    for (salt <- Seq("a", "b", "c", "d", "e")) {
      val ids = CorpusOps.weightedSample(docs, "w", k = 10, salt = salt)
        .collect().map(_.getLong(0)).toSet
      assert(ids.contains(999L), s"heavy item missing under salt $salt")
      assert(ids.size === 10)
    }
    // w <= 0 excluded (the A-ES domain); k > n returns all eligible
    val mixed = Seq((1L, 5L), (2L, 0L), (3L, -4L), (4L, 2L))
      .toDF("doc_id", "w")
    val all = CorpusOps.weightedSample(mixed, "w", k = 100).collect()
    assert(all.map(_.getLong(0)).toSet === Set(1L, 4L))
    // deterministic and partitioning-independent; keys strictly
    // ordered by inclusion rank
    val big = (0 until 500).map(i => (i.toLong, (i % 17 + 1).toLong))
      .toDF("doc_id", "w")
    val a = CorpusOps.weightedSample(big, "w", k = 50)
      .orderBy(col("key").desc, col("doc_id")).collect().toSeq
    val b = CorpusOps.weightedSample(big.repartition(13), "w", k = 50)
      .orderBy(col("key").desc, col("doc_id")).collect().toSeq
    assert(a === b)
    assert(a.map(_.getDouble(2)).sliding(2).forall(p => p(0) >= p(1)))
    // larger weights win more slots in aggregate: compare the mean
    // weight of winners vs the corpus mean (proportional sampling
    // must pull the winner distribution toward heavy items)
    val meanW = a.map(_.getLong(1)).sum.toDouble / a.size
    val corpusMean = (1 to 17).sum.toDouble / 17
    assert(meanW > corpusMean, s"winners not weight-biased: $meanW")
  }

  test("mergeCorpus: verdicts, tombstones, ties, and losing updates") {
    val current = Seq((1L, 10L, "one"), (2L, 20L, "two"), (3L, 30L, "three"),
      (4L, 40L, "four")).toDF("doc_id", "ts", "text")
    val updates = Seq(
      (2L, 25L, "two-v2", false),  // newer -> updated
      (3L, 5L, "three-old", false), // older -> current kept
      (4L, 45L, "", true),          // tombstone -> dropped
      (5L, 50L, "five", false),     // new id -> inserted
      (1L, 10L, "one-tie", false))  // ts tie -> update side wins
      .toDF("doc_id", "ts", "text", "deleted")
    val out = CorpusOps.mergeCorpus(current, updates).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(out(1L) == ((10L, "one-tie", "updated")))
    assert(out(2L) == ((25L, "two-v2", "updated")))
    assert(out(3L) == ((30L, "three", "kept")))
    assert(!out.contains(4L)) // tombstone removed the id
    assert(out(5L) == ((50L, "five", "inserted")))
    // idempotent re-merge: applying the same updates again changes nothing
    val merged = CorpusOps.mergeCorpus(current, updates)
      .select("doc_id", "ts", "text")
    val again = CorpusOps.mergeCorpus(merged,
        updates.filter("not deleted")).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(again(2L) == "two-v2" && again(5L) == "five")
    // partition independence (the struct max is order-free)
    val seven = CorpusOps.mergeCorpus(current.repartition(7),
        updates.repartition(5)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(seven == out)
  }

  test("mixtureWeights alpha=1 reproduces raw shares") {
    val d = Seq((1L, "a b c", "x"), (2L, "a", "y")).toDF("doc_id", "text", "source")
    val rows = CorpusOps.mixtureWeights(d, alpha = 1.0).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("token_share"), r.getAs[Double]("weight"))).toMap
    rows.values.foreach { case (share, w) => assertClose(w, share, 1e-8) }
  }

  test("corpusAsOf: snapshots are reproducible points on the log timeline") {
    // id 1: v1@10, v2@20, deleted@30, v3@40 (resurrection)
    // id 2: v1@15 only; id 3: born@35
    val log = Seq(
      (1L, 10L, "one v1", false), (1L, 20L, "one v2", false),
      (1L, 30L, "", true), (1L, 40L, "one v3", false),
      (2L, 15L, "two v1", false), (3L, 35L, "three v1", false))
      .toDF("doc_id", "ts", "text", "deleted")
    def asOf(t: Long): Map[Long, String] =
      CorpusOps.corpusAsOf(log, t).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(asOf(5L) == Map.empty)
    assert(asOf(12L) == Map(1L -> "one v1"))
    assert(asOf(25L) == Map(1L -> "one v2", 2L -> "two v1"))
    assert(asOf(32L) == Map(2L -> "two v1")) // id 1 deleted as of 32
    assert(asOf(99L) == Map(1L -> "one v3", 2L -> "two v1", 3L -> "three v1"))
    // same cutoff, more log appended after it: identical snapshot
    val extended = log.unionByName(
      Seq((2L, 50L, "two v9", false)).toDF("doc_id", "ts", "text", "deleted"))
    assert(CorpusOps.corpusAsOf(extended, 25L).collect().toSet ==
      CorpusOps.corpusAsOf(log, 25L).collect().toSet)
  }

  test("negativeSample: exclusions, determinism, epoch variation") {
    val cands = (0L until 200L).map(Tuple1(_)).toDF("doc_id")
    val positives = (0L until 8L).map(a => (a, a + 50)).toDF("anchor_id", "positive_id")
    val out = CorpusOps.negativeSample(positives, cands, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // full allocation, ranks 1..4 per anchor
    assert(out.length == 32)
    out.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    }
    // never the anchor itself, never its positive
    out.foreach { case (a, _, neg) =>
      assert(neg != a && neg != a + 50, s"anchor $a drew $neg")
    }
    // deterministic under repartitioning
    val re = CorpusOps.negativeSample(positives.repartition(7),
      cands.repartition(13), n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.toSeq == out.toSeq)
    // a different epoch draws a different (but equally valid) sample
    val e1 = CorpusOps.negativeSample(positives, cands, n = 4, epoch = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e1.toSeq != out.toSeq)
    // tiny pool: anchor can receive fewer than n, never an excluded id
    val tiny = CorpusOps.negativeSample(
      Seq((0L, 1L)).toDF("anchor_id", "positive_id"),
      (0L until 3L).map(Tuple1(_)).toDF("doc_id"), n = 4)
      .collect().map(_.getLong(2))
    assert(tiny.toSet.subsetOf(Set(2L)) )
  }

  test("rrfFuse: rank arithmetic, absent arms, and tie-breaks") {
    import graft.text.Search
    val a = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L))
      .toDF("query_id", "rank", "doc_id")
      .select(col("query_id"), col("doc_id"), col("rank"))
    val b = Seq((1L, 1L, 20L), (1L, 2L, 40L))
      .toDF("query_id", "rank", "doc_id")
      .select(col("query_id"), col("doc_id"), col("rank"))
    val got = Search.rrfFuse(a, b, k = 10).collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getDouble(3))).toList
    // doc 20: in both arms (ranks 2 and 1) — must fuse additively and
    // beat doc 10 (single arm, rank 1)
    val s20 = 1.0 / 62 + 1.0 / 61
    val s10 = 1.0 / 61
    assert(got.head._1 == 20L && math.abs(got.head._3 - s20) < 1e-9)
    assert(got(1)._1 == 10L && math.abs(got(1)._3 - s10) < 1e-9)
    // docs 30 (rank 3, arm a) and 40 (rank 2, arm b): 1/63 vs 1/62
    assert(got.map(_._1) == List(20L, 10L, 40L, 30L))
    assert(got.map(_._2) == List(1L, 2L, 3L, 4L))
  }
}
