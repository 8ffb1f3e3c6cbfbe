package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.LmPerplexity

/** Semantics pins for the CCNet-style KN-bigram perplexity filter. */
class LmPerplexitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def snapLn(p: Double): Long =
    java.math.BigDecimal.valueOf(math.log(p) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact

  test("bigrams emit a BOS context and skip token-less docs") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val got = LmPerplexity.bigrams(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "<s>", "a"), (1L, "a", "b"), (3L, "<s>", "x")))
  }

  test("hand-computed KN probabilities on a 4-token reference") {
    // train "a b a b": bigrams (<s>,a) (a,b) (b,a) (a,b)
    //   c12: (<s>,a)=1 (a,b)=2 (b,a)=1
    //   ctx: <s>(c1=1,n1p=1)  a(c1=2,n1p=1)  b(c1=1,n1p=1)
    //   cont: a nc=2, b nc=1; NN=3, V=2
    //   Pc(a)=3/6  Pc(b)=2/6  Pc(OOV)=1/6
    val train = Seq((10L, "a b a b")).toDF("doc_id", "text")
    // doc "a b": P(<s>,a) = (0.25 + 0.75*1*0.5)/1 = 0.625
    //            P(a,b)   = (1.25 + 0.75*1*(2/6))/2 = 0.75
    val scored = LmPerplexity.score(train, Seq((1L, "a b")).toDF("doc_id", "text"))
      .collect().head
    val wantLp = snapLn(0.625) + snapLn(0.75)
    assert(scored.getAs[Long]("lp_micro") === wantLp)
    assert(scored.getAs[Long]("n_bigrams") === 2L)
    val wantPpl = BigDecimal(math.exp(wantLp.toDouble * -1.0 / 1e6 / 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored.getAs[Double]("ppl") === wantPpl)
  }

  test("unseen contexts and continuations stay finite (backoff paths)") {
    val train = Seq((10L, "a b a b")).toDF("doc_id", "text")
    // "z q": (<s>,z) seen context <s>, unseen continuation z:
    //   P = (0 + 0.75*1*(1/6))/1 = 0.125
    // (z,q): unseen context z -> pure continuation: P = Pc(q) = 1/6
    val r = LmPerplexity.score(train, Seq((1L, "z q")).toDF("doc_id", "text"))
      .collect().head
    assert(r.getAs[Long]("lp_micro") === snapLn(0.125) + snapLn(1.0 / 6))
    assert(!r.getAs[Double]("ppl").isNaN && !r.getAs[Double]("ppl").isInfinite)
  }

  test("in-distribution text scores lower perplexity than word soup") {
    val ref = (0 until 20).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "dog the over fox brown lazy jumps quick the")).toDF("doc_id", "text")
    val out = LmPerplexity.score(ref, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
    assert(out(100L) < out(101L),
      s"in-distribution doc not favored: ${out(100L)} vs ${out(101L)}")
  }

  test("buckets: exact terciles, worse bucket on cut ties, empty sentinel") {
    // 9 docs with strictly ordered perplexities: the reference doc
    // family repeated i times mixes known bigrams with OOV tails
    val train = Seq((50L, "a b c d e f g h")).toDF("doc_id", "text")
    val docs = ((0 until 9).map { i =>
      val good = Seq("a b c d e f g h", "a b", "c d").map(_.split(" ")).flatten
      val text = (good.take(2 + i) ++ Seq.fill(9 - i)(s"oov$i")).mkString(" ")
      (i.toLong, text)
    } :+ (99L, "")).toDF("doc_id", "text")
    val out = LmPerplexity.buckets(train, docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("bucket"), r.getAs[Double]("ppl")))).toMap
    assert(out(99L) === (("empty", -1.0)))
    val byBucket = out.view.filterKeys(_ != 99L).toSeq.groupBy(_._2._1)
    assert(byBucket("tail").size === 3 && byBucket("middle").size === 3 &&
      byBucket("head").size === 3, byBucket.toString)
    // every tail ppl >= every middle ppl >= every head ppl
    val tMin = byBucket("tail").map(_._2._2).min
    val mMax = byBucket("middle").map(_._2._2).max
    val mMin = byBucket("middle").map(_._2._2).min
    val hMax = byBucket("head").map(_._2._2).max
    assert(tMin >= mMax && mMin >= hMax,
      s"buckets not ordered: tail>=$tMin mid[$mMin,$mMax] head<=$hMax")
  }

  test("pruneVocab keeps the top-v tokens, maps the rest to <unk>") {
    val docs = Seq((1L, "a a a b b c"), (2L, "c a b c d")).toDF("doc_id", "text")
    val vocab = LmPerplexity.topVocab(docs, v = 2)
    assert(vocab.toSeq === Seq("a", "b")) // by count desc, token asc
    val pruned = LmPerplexity.pruneVocab(docs, vocab).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(pruned(1L) === "a a a b b <unk>")
    assert(pruned(2L) === "<unk> a b <unk> <unk>")
    // frequency ties break by token ascending
    val tied = Seq((1L, "z y z y x")).toDF("doc_id", "text")
    assert(LmPerplexity.topVocab(tied, 2).toSeq === Seq("y", "z"))
    // the broadcast-set venue produces the identical pruned corpus
    // (O(1)-per-token path vs the O(v) literal scan)
    val bc = LmPerplexity.broadcastVocab(spark, vocab)
    val viaBc = LmPerplexity.pruneVocabBcast(docs, bc).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(viaBc === pruned)
  }

  test("collectModel fails fast past spark.graft.lm.maxModelRows") {
    val train = Seq((1L, "a b c d e"), (2L, "b c d e f")).toDF("doc_id", "text")
    // 8 distinct bigrams in train; a bound of 3 must raise before any
    // unbounded collect, and the message must name the conf key
    spark.conf.set(LmPerplexity.MaxModelRowsKey, "3")
    try {
      val e = intercept[IllegalArgumentException] {
        LmPerplexity.collectModel(train)
      }
      assert(e.getMessage.contains(LmPerplexity.MaxModelRowsKey))
    } finally spark.conf.unset(LmPerplexity.MaxModelRowsKey)
    // default bound: same corpus collects fine and scores as before
    // (7 distinct bigrams: BOS-a, BOS-b, a-b, b-c, c-d, d-e, e-f)
    val m = LmPerplexity.collectModel(train)
    assert(m.nn === 7L)
  }

  test("trigrams emit the double-BOS pad and skip token-less docs") {
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val got = LmPerplexity.trigrams(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got === Set(
      (1L, "<s>", "<s>", "a"), (1L, "<s>", "a", "b"), (1L, "a", "b", "c"),
      (3L, "<s>", "<s>", "x")))
  }

  test("hand-computed KN trigram probabilities on the 4-token reference") {
    // train "a b a b": trigram events (<s>,<s>,a) (<s>,a,b) (a,b,a)
    // (b,a,b), each once; the bigram backoff tables are the bigram
    // model's own (c23: (<s>,a)=1 (a,b)=2 (b,a)=1; Pc(a)=1/2,
    // Pc(b)=1/3, Pc(oov)=1/6)
    val train = Seq((10L, "a b a b")).toDF("doc_id", "text")
    // doc "a b":
    //  (<s>,<s>,a): P2(a|<s>) = 0.625; P3 = (0.25 + 0.75·0.625)/1
    //  (<s>,a,b):   P2(b|a)   = 0.75;  P3 = (0.25 + 0.75·0.75)/1
    val scored = LmPerplexity.score3(train,
      Seq((1L, "a b")).toDF("doc_id", "text")).collect().head
    val wantLp = snapLn(0.71875) + snapLn(0.8125)
    assert(scored.getAs[Long]("lp_micro") === wantLp)
    assert(scored.getAs[Long]("n_trigrams") === 2L)
  }

  test("trigram: all four backoff paths on one document") {
    val train = Seq((10L, "a b a b")).toDF("doc_id", "text")
    // "a b z q b a" exercises: seen-trigram/seen-bigram (first two
    // events), seen-trigram-ctx with ZERO trigram count over an
    // unseen continuation ((a,b,z) -> pure interpolation mass),
    // unseen-trigram-ctx -> unseen-bigram-ctx (pure Pc), and
    // unseen-trigram-ctx -> seen-bigram-ctx
    val r = LmPerplexity.score3(train,
      Seq((1L, "a b z q b a")).toDF("doc_id", "text")).collect().head
    val want = snapLn(0.71875) + snapLn(0.8125) + snapLn(0.09375) +
      snapLn(1.0 / 6) + snapLn(1.0 / 3) + snapLn(0.625)
    assert(r.getAs[Long]("lp_micro") === want)
    assert(!r.getAs[Double]("ppl").isNaN && !r.getAs[Double]("ppl").isInfinite)
  }

  test("trigram fits in-distribution text better than the bigram") {
    // on the training text itself every trigram event's probability
    // dominates its bigram twin (the higher order memorizes more), so
    // the total log-prob must be strictly higher
    val train = Seq((10L, "a b a b")).toDF("doc_id", "text")
    val doc = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val lp2 = LmPerplexity.score(train, doc).collect().head
      .getAs[Long]("lp_micro")
    val lp3 = LmPerplexity.score3(train, doc).collect().head
      .getAs[Long]("lp_micro")
    assert(lp3 > lp2, s"trigram lp $lp3 not above bigram lp $lp2")
    // and on a larger natural-ish corpus the ordering holds in
    // aggregate (score the training corpus with both orders)
    val ref = (0 until 20).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog and runs"))
      .toDF("doc_id", "text")
    val s2 = LmPerplexity.score(ref, ref)
      .agg(sum("lp_micro")).collect().head.getLong(0)
    val s3 = LmPerplexity.score3(ref, ref)
      .agg(sum("lp_micro")).collect().head.getLong(0)
    assert(s3 > s2, s"aggregate trigram lp $s3 not above bigram $s2")
  }

  test("buckets3: tercile split, empty sentinel, partition independence") {
    val train = (0 until 30).map(i => (i.toLong,
      s"tok${i % 5} tok${(i + 1) % 5} tok${(i + 2) % 7}")).toDF("doc_id", "text")
    val docs = ((0 until 40).map(i => (i.toLong,
      s"tok${i % 7} tok${(i + 3) % 5} oov${i % 3}")) :+
      (99L, "")).toDF("doc_id", "text")
    val a = LmPerplexity.buckets3(train, docs).orderBy("doc_id").collect().toSeq
    val b = LmPerplexity.buckets3(train.repartition(7), docs.repartition(13))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    val byId = a.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("bucket")).toMap
    assert(byId(99L) === "empty")
    val n = a.count(_.getAs[String]("bucket") != "empty")
    assert(n === 40)
    assert(Set("head", "middle", "tail").subsetOf(
      a.map(_.getAs[String]("bucket")).toSet))
  }

  test("broadcast trigram scorer is bitwise equal to join-based score3") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val train = (0 until 25).map(i => (i.toLong,
      s"tok${i % 4} tok${(i + 1) % 4} tok${(i + 2) % 5}")).toDF("doc_id", "text")
    val docs = ((0 until 30).map(i => (i.toLong,
      s"tok${i % 5} tok${(i + 3) % 4} oov${i % 2}")) :+ (99L, ""))
      .toDF("doc_id", "text")
    val joined = LmPerplexity.score3(train, docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_trigrams"), r.getAs[Long]("lp_micro")))).toMap
    val bc = spark.sparkContext.broadcast(LmPerplexity.collectModel3(train))
    val toks = graft.text.TextOps.tokens(col("text"))
    val viaKernel = docs.select(col("doc_id"),
        size(toks).cast("long").as("n"),
        column(graft.functions.LmScore3Bcast(expression(toks), bc)).as("lp"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("lp")))).toMap
    // every tokened doc: identical event count AND identical exact sum
    joined.foreach { case (id, (n, lp)) =>
      assert(viaKernel(id) === ((n, lp)), s"doc $id diverges")
    }
    // token-less doc scores 0 through the kernel (no trigram events)
    assert(viaKernel(99L) === ((0L, 0L)))
    // and the streaming gate built on the kernel agrees per doc
    val gated = graft.streaming.Streaming.streamingLmGate3(
        docs, bc, maxPpl = 50.0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lp_micro")).toMap
    joined.foreach { case (id, (_, lp)) => assert(gated(id) === lp) }
  }

  test("collectModel3 fails fast past spark.graft.lm.maxModelRows") {
    val train = Seq((1L, "a b c d e"), (2L, "b c d e f")).toDF("doc_id", "text")
    // 8 distinct trigrams vs 7 distinct bigrams: a bound of 7 passes
    // the bigram table and must raise on the trigram one, naming the
    // conf
    spark.conf.set(LmPerplexity.MaxModelRowsKey, "7")
    try {
      val e = intercept[IllegalArgumentException] {
        LmPerplexity.collectModel3(train)
      }
      assert(e.getMessage.contains(LmPerplexity.MaxModelRowsKey))
      assert(e.getMessage.contains("trigram"))
    } finally spark.conf.unset(LmPerplexity.MaxModelRowsKey)
    val m = LmPerplexity.collectModel3(train)
    assert(m.bi.nn === 7L && m.tri.size === 8)
  }

  test("scoring is partitioning-independent (exact integer sums)") {
    val train = (0 until 30).map(i => (i.toLong,
      s"tok${i % 5} tok${(i + 1) % 5} tok${(i + 2) % 7}")).toDF("doc_id", "text")
    val docs = (0 until 40).map(i => (i.toLong,
      s"tok${i % 7} tok${(i + 3) % 5} oov${i % 3}")).toDF("doc_id", "text")
    val a = LmPerplexity.buckets(train, docs).orderBy("doc_id").collect().toSeq
    val b = LmPerplexity.buckets(train.repartition(7), docs.repartition(13))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("ngrams at n=5 emit the quadruple-BOS pad exactly") {
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val got = LmPerplexity.ngrams(docs, n = 5).collect()
      .map(r => (1 to 5).map(j => r.getString(j)).mkString("|")).toSet
    assert(got === Set(
      "<s>|<s>|<s>|<s>|a", "<s>|<s>|<s>|a|b", "<s>|<s>|a|b|c"))
  }

  test("scoreN telescopes: order 2 == score and order 3 == score3 bitwise") {
    val train = (0 until 25).map(i => (i.toLong,
      s"tok${i % 5} tok${(i + 1) % 4} tok${(i + 2) % 7} tok${i % 3}"))
      .toDF("doc_id", "text")
    val docs = ((0 until 30).map(i => (i.toLong,
      s"tok${i % 7} tok${(i + 3) % 5} oov${i % 3} tok${i % 2}")) :+
      ((99L, ""))).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
    assert(rows(LmPerplexity.scoreN(train, docs, n = 2)) ===
      rows(LmPerplexity.score(train, docs)))
    assert(rows(LmPerplexity.scoreN(train, docs, n = 3)) ===
      rows(LmPerplexity.score3(train, docs)))
  }

  test("scoreN at n=5: hand-computed values cover every backoff depth") {
    // train "a b c d e": every order-m gram/context type appears once;
    // bigram continuation table nc(a)=nc(b)=..=1, NN=5, V=5
    val train = Seq((10L, "a b c d e")).toDF("doc_id", "text")
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "z"), (4L, "x a"))
      .toDF("doc_id", "text")
    val got = LmPerplexity.scoreN(train, docs, n = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lp_micro")).toMap
    val pcA = 2.0 / 11; val pcB = 2.0 / 11; val pcZ = 1.0 / 11
    // doc "a": seen gram at EVERY order (count 1, ctx 1) — the full
    // chain of seen-seen interpolations
    val p2a = (0.25 + 0.75 * pcA) / 1.0
    val p5a = (0.25 + 0.75 * ((0.25 + 0.75 *
      ((0.25 + 0.75 * p2a) / 1.0)) / 1.0)) / 1.0
    assert(got(1L) === snapLn(p5a))
    // doc "b": every context seen, every gram count ZERO — pure
    // interpolation mass at each order down to the seen continuation
    val p5b = (0.75 * ((0.75 * ((0.75 * ((0.75 * pcB) / 1.0)) / 1.0))
      / 1.0)) / 1.0
    assert(got(2L) === snapLn(p5b))
    // doc "z": same chain bottoming in the UNSEEN-continuation floor
    val p5z = (0.75 * ((0.75 * ((0.75 * ((0.75 * pcZ) / 1.0)) / 1.0))
      / 1.0)) / 1.0
    assert(got(3L) === snapLn(p5z))
    // doc "x a", second event (ctx ...,x): UNSEEN context at orders
    // 5/4/3/2 — falls through every ELSE branch to the raw floor
    assert(got(4L) === snapLn(p5z) + snapLn(pcA))
    // deeper match -> strictly higher probability on this fixture
    assert(got(1L) > got(2L) && got(2L) > got(3L))
  }

  test("5-gram fits in-distribution text better than the trigram") {
    // the trigram-vs-bigram ordering argument one level up: on the
    // training corpus itself every seen-context interpolation adds
    // mass (p_m - p_{m-2} = positive multiples of (1 - p)), so the
    // 5-gram's total train log-prob strictly dominates the trigram's
    val ref = (0 until 20).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog and runs"))
      .toDF("doc_id", "text")
    val s3 = LmPerplexity.score3(ref, ref)
      .agg(sum("lp_micro")).collect().head.getLong(0)
    val s5 = LmPerplexity.scoreN(ref, ref, n = 5)
      .agg(sum("lp_micro")).collect().head.getLong(0)
    assert(s5 > s3, s"aggregate 5-gram lp $s5 not above trigram $s3")
  }

  test("broadcast order-n scorer: bitwise vs join-based scoreN, per-order fail-fast") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val train = (0 until 25).map(i => (i.toLong,
      s"tok${i % 4} tok${(i + 1) % 4} tok${(i + 2) % 5} tok${i % 3}"))
      .toDF("doc_id", "text")
    val docs = ((0 until 30).map(i => (i.toLong,
      s"tok${i % 5} tok${(i + 3) % 4} oov${i % 2} tok${i % 3}")) :+
      ((99L, ""))).toDF("doc_id", "text")
    val joined = LmPerplexity.scoreN(train, docs, n = 5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("lp_micro")))).toMap
    val bc = spark.sparkContext.broadcast(
      LmPerplexity.collectModelN(train, n = 5))
    val toks = graft.text.TextOps.tokens(col("text"))
    val viaKernel = docs.select(col("doc_id"),
        size(toks).cast("long").as("n"),
        column(graft.functions.LmScoreNBcast(expression(toks), bc)).as("lp"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("lp")))).toMap
    joined.foreach { case (id, (n, lp)) =>
      assert(viaKernel(id) === ((n, lp)), s"doc $id diverges")
    }
    assert(viaKernel(99L) === ((0L, 0L)))
    // the order-3 instance of the generic kernel equals the dedicated
    // trigram kernel bitwise (one more telescoping pin)
    val bc3g = spark.sparkContext.broadcast(
      LmPerplexity.collectModelN(train, n = 3))
    val bc3 = spark.sparkContext.broadcast(LmPerplexity.collectModel3(train))
    val both = docs.select(col("doc_id"),
        column(graft.functions.LmScoreNBcast(expression(toks), bc3g))
          .as("lpN"),
        column(graft.functions.LmScore3Bcast(expression(toks), bc3))
          .as("lp3"))
      .collect()
    both.foreach(r => assert(r.getAs[Long]("lpN") === r.getAs[Long]("lp3")))
    // the streaming gate built on the kernel agrees per doc
    val gated = graft.streaming.Streaming.streamingLmGateN(
        docs, bc, maxPpl = 50.0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lp_micro")).toMap
    joined.foreach { case (id, (_, lp)) => assert(gated(id) === lp) }
    // fail-fast names the conf AND the offending order: bound = the
    // bigram table size, which the floor passes and a higher order
    // (strictly more gram types on this fixture) trips
    val nBi = LmPerplexity.bigrams(train).select("w1", "w2")
      .distinct().count()
    val n5 = LmPerplexity.ngrams(train, 5)
      .select("w1", "w2", "w3", "w4", "w5").distinct().count()
    assert(n5 > nBi, s"fixture must fan out above the bigram table " +
      s"($n5 vs $nBi)")
    spark.conf.set(LmPerplexity.MaxModelRowsKey, nBi.toString)
    try {
      val e = intercept[IllegalArgumentException] {
        LmPerplexity.collectModelN(train, n = 5)
      }
      assert(e.getMessage.contains(LmPerplexity.MaxModelRowsKey))
      assert(e.getMessage.contains("order-"))
    } finally spark.conf.unset(LmPerplexity.MaxModelRowsKey)
  }

  test("bucketsN(5): empty sentinel and partition independence") {
    val train = (0 until 30).map(i => (i.toLong,
      s"tok${i % 5} tok${(i + 1) % 5} tok${(i + 2) % 7} tok${i % 4} tok${i % 6}"))
      .toDF("doc_id", "text")
    val docs = ((0 until 40).map(i => (i.toLong,
      s"tok${i % 7} tok${(i + 3) % 5} oov${i % 3} tok${i % 4}")) :+
      ((99L, ""))).toDF("doc_id", "text")
    val a = LmPerplexity.bucketsN(train, docs, n = 5)
      .orderBy("doc_id").collect().toSeq
    val b = LmPerplexity.bucketsN(train.repartition(7),
        docs.repartition(13), n = 5)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    val empty = a.find(_.getAs[Long]("doc_id") == 99L).get
    assert(empty.getAs[Long]("n_events") === 0L &&
      empty.getAs[String]("bucket") === "empty")
  }
}
