package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{RxNeedle, RxScanBcast}
import graft.text.Blocklist

/** The regex-needle scrub arm (round 13): anchor-prefiltered all-starts
  * regex matching must equal a brute per-position regex scan that
  * never looks at anchors — the prefilter is a performance device, not
  * a semantics one. */
class RxScanSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Brute truth: greedy lookingAt at EVERY codepoint start, no anchor
    * logic — (pid, startCp, lenCp) triples sorted like the kernel. */
  private def brute(text: String, needles: Seq[(String, String, Int)])
      : Seq[(Long, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val cps = text.codePointCount(0, text.length)
    for (startCp <- 0 until cps) {
      val u16 = text.offsetByCodePoints(0, startCp)
      needles.zipWithIndex.foreach { case ((re, _, _), pid) =>
        val m = java.util.regex.Pattern.compile(re).matcher(text)
        m.region(u16, text.length)
        if (m.lookingAt() && m.end() > m.start())
          out += ((pid.toLong, startCp.toLong,
            text.codePointCount(m.start(), m.end()).toLong))
      }
    }
    out.sortBy(t => (t._2, t._1)).toSeq
  }

  private def kernel(texts: Seq[(Long, String)],
      needles: Seq[(String, String, Int)]): Map[Long, Seq[(Long, Long, Long)]] =
    Blocklist.rxSpans(texts.toDF("doc_id", "text"), needles)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("pattern_id"), r.getAs[Long]("start"),
          r.getAs[Long]("len"))))
      .groupBy(_._1)
      .map { case (k, v) =>
        k -> v.map(_._2).sortBy(t => (t._2, t._1)).toSeq }

  private val needles = Seq(
    ("ta[a-z]+", "ta", 0),
    ("[a-z]+ble", "ble", 24),
    ("b[a-z]{2}ch", "ch", 3),
    ("[0-9]{3}-[0-9]{2}", "-", 3))

  test("spans equal the brute per-position regex scan") {
    val texts = Seq(
      1L -> "key table stable batch tables batches 123-45-6789",
      2L -> "tabletable stableble",
      3L -> "",
      4L -> "no anchors here at all xyz",
      5L -> "ta tb tble table able ble 12-34 999-99")
    val got = kernel(texts, needles)
    for ((id, t) <- texts) {
      val want = brute(t, needles)
      assert(got.getOrElse(id, Seq.empty) === want, s"doc $id '$t'")
    }
    // load-bearing pins: overlap + greedy backtracking
    // "stable": "[a-z]+ble" matches at 0 (stable) and 1 (table)? no —
    // at 1 "table"=ta+ble yes; at 2 "able"=a+ble yes; at 3 "ble" alone
    // cannot ([a-z]+ needs one char before "ble")
    val s2 = got(2L)
    assert(s2.nonEmpty)
  }

  test("multibyte and supplementary codepoint offsets are exact") {
    // é is 2 UTF-8 bytes / 1 UTF-16 unit; 𝄞 (U+1D11E) is 4 UTF-8
    // bytes / 2 UTF-16 units — starts and lens must stay codepoints
    val texts = Seq(
      1L -> "é table 𝄞 ta1 table",
      2L -> "𝄞𝄞table")
    val got = kernel(texts, needles)
    for ((id, t) <- texts)
      assert(got.getOrElse(id, Seq.empty) === brute(t, needles),
        s"doc $id '$t'")
  }

  test("anchored gap windows honor the contract on adversarial gaps") {
    // needle with a loose anchor mid-pattern: anchor 'X' at up to 5
    // codepoints after match start
    val n = Seq(("[a-z]{1,5}X[0-9]", "X", 5))
    val texts = Seq(
      1L -> "abcX1 aX2 abcdeX3 zX", // zX has no digit -> no match
      2L -> "XX9 aXX8")
    val got = kernel(texts, n)
    for ((id, t) <- texts)
      assert(got.getOrElse(id, Seq.empty) === brute(t, n), s"doc $id '$t'")
  }

  test("rxGate emits docs x patterns with zero rows and rxRedact masks the span union") {
    val texts = Seq(1L -> "table batch", 2L -> "clean words only")
    val gate = Blocklist.rxGate(texts.toDF("doc_id", "text"), needles)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("pattern_id")) ->
        (r.getAs[Long]("n_hits"), r.getAs[Boolean]("hit"))).toMap
    assert(gate.size === 2 * needles.length)
    assert(gate((1L, 0L))._1 === 1L) // "ta[a-z]+" in "table"
    assert(gate((1L, 3L)) === ((0L, false))) // digit shape absent
    assert(gate((2L, 0L)) === ((0L, false)))

    val red = Blocklist.rxRedact(texts.toDF("doc_id", "text"), needles)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[String]("redacted"), r.getAs[Long]("n_masked")))).toMap
    // "table" covered by ta[a-z]+ (0-4), [a-z]+ble (0-4 and 1-4);
    // "batch" covered by b[a-z]{2}ch (0-4)
    assert(red(1L) === (("***** *****", 10L)))
    assert(red(2L) === (("clean words only", 0L)))
  }

  test("redaction masks multibyte codepoints whole") {
    val n = Seq(("é[a-z]+", "é", 0))
    val red = Blocklist.rxRedact(Seq(1L -> "xx étable yé").toDF("doc_id", "text"), n)
      .collect().head
    assert(red.getAs[String]("redacted") === "xx ****** yé")
    assert(red.getAs[Long]("n_masked") === 6L)
  }

  test("interpreted and codegen paths agree") {
    val texts = (0L until 48L).map(i =>
      i -> s"tok$i table batch stable ${"ab" * (i % 5).toInt} 123-45 é𝄞")
    val d = texts.toDF("doc_id", "text").repartition(3)
    def run(mode: String): Map[Long, Seq[String]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try Blocklist.rxSpans(d, needles)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"),
          s"${r.getAs[Long]("pattern_id")}:${r.getAs[Long]("start")}:" +
            s"${r.getAs[Long]("len")}"))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted.toSeq }
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val cg = run("CODEGEN_ONLY")
    val in = run("NO_CODEGEN")
    assert(cg === in)
  }

  test("rxNeedlesFrom: governed-table ingestion, sorted, bounded, loud on bad rows") {
    val t = Seq(
      ("b[a-z]{2}ch", "ch", 3),
      ("ta[a-z]+", "ta", 0),
      ("ta[a-z]+", "ta", 0)) // duplicate row collapses
      .toDF("regex", "anchor", "max_gap")
    val got = Blocklist.rxNeedlesFrom(t)
    assert(got === Seq(("b[a-z]{2}ch", "ch", 3), ("ta[a-z]+", "ta", 0)))
    // the maxPatterns fail-fast names the conf
    spark.conf.set(Blocklist.MaxPatternsKey, "1")
    try {
      val e = intercept[IllegalStateException] {
        Blocklist.rxNeedlesFrom(t)
      }
      assert(e.getMessage.contains(Blocklist.MaxPatternsKey))
    } finally spark.conf.unset(Blocklist.MaxPatternsKey)
    // a silently dropped scanning rule is a compliance hole: bad rows
    // reject loudly instead of filtering away
    val bad = Seq(("a+", "", 0)).toDF("regex", "anchor", "max_gap")
    intercept[IllegalArgumentException] {
      Blocklist.rxNeedlesFrom(bad)
    }
  }

  test("rxProvenance aggregates per (source, pattern) with zero rows kept") {
    val d = Seq(
      (1L, "s1", "table batch"),
      (2L, "s1", "clean words"),
      (3L, "s2", "stable stable")).toDF("doc_id", "source", "text")
    val got = Blocklist.rxProvenance(d, needles).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("pattern_id")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_docs_hit"),
          r.getAs[Long]("n_hits")))).toMap
    assert(got.size === 2 * needles.length)
    // "ta[a-z]+": one hit doc in s1 ("table"), 2 matches per "stable"?
    // no — "ta" inside "stable" at offset 1 -> one match per "stable"
    assert(got(("s1", 0L)) === ((2L, 1L, 1L)))
    assert(got(("s2", 0L)) === ((1L, 1L, 2L)))
    // digit shape absent everywhere: the all-zero column survives
    assert(got(("s1", 3L)) === ((2L, 0L, 0L)))
    assert(got(("s2", 3L)) === ((1L, 0L, 0L)))
  }

  test("needle-scale probe: 100 anchored rules over 2k docs, one pass, brute-checked sample") {
    // the scale shape: rule count must not multiply the per-row cost
    // the way per-pattern regexp_count scans would. 100 rules share
    // one anchor automaton; verify wall time stays bounded and a doc
    // sample agrees with the anchor-blind brute scan.
    val rules = (0 until 100).map { i =>
      (s"w${i}x[a-z]{1,4}q", s"w${i}x", 0)
    }
    val docs = (0L until 2000L).map { d =>
      val words = (0 until 30).map { j =>
        val k = (d + j) % 120
        if (k < 100 && j % 3 == 0) s"w${k}xabq" else s"filler$j"
      }
      (d, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text").repartition(8)
    val t0 = System.nanoTime()
    val total = Blocklist.rxGate(df, rules)
      .agg(org.apache.spark.sql.functions.sum("n_hits")).collect()
      .head.getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(total > 0L, "probe corpus must actually hit")
    assert(secs < 60.0, s"100-rule scan took ${secs}s on 2k docs")
    // sampled parity vs the anchor-blind brute scan
    docs.take(5).foreach { case (id, text) =>
      val want = brute(text, rules)
      val got = kernel(Seq(id -> text), rules).getOrElse(id, Seq.empty)
      assert(got === want, s"doc $id diverges from brute at scale")
    }
  }

  test("rxCanonicalize equals the builtin regexp_replace fold, cascade included") {
    val rules = Seq(
      ("ta[a-z]+", "ta", "T1"),
      ("b[a-z]{2}ch", "ch", "B"),
      ("T[0-9]", "T", "NUM"), // anchor MINTED by rule 0's replacement
      ("[0-9]{3}-[0-9]{2}", "-", "<ID>"))
    val texts = Seq(
      1L -> "table batch talk",   // cascade: table -> T1 -> NUM
      2L -> "clean words only",   // untouched fast path
      3L -> "999-88 batch",       // later rules without earlier ones
      4L -> "",
      5L -> "T5 alone")           // rule-2 anchor present in ORIGINAL
    val d = texts.toDF("doc_id", "text")
    val got = Blocklist.rxCanonicalize(d, rules).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("canonical"), r.getAs[Long]("n_replaced")))).toMap
    // truth: the builtin fold (regexp_replace nested in rule order)
    val fold = rules.foldLeft(col("text")) { case (c, (re, _, rep)) =>
      regexp_replace(c, re, rep) }
    val want = d.select(col("doc_id"), fold.as("c")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("c")).toMap
    texts.foreach { case (id, _) =>
      assert(got(id)._1 === want(id), s"doc $id fold diverges")
    }
    assert(got(1L) === (("NUM B NUM", 5L))) // table->T1->NUM, talk->T1->NUM
    assert(got(2L) === (("clean words only", 0L)))
    assert(got(3L) === (("<ID> B", 2L)))
    assert(got(4L) === (("", 0L)))
    assert(got(5L) === (("NUM alone", 1L)))
    // replacement references are rejected at construction
    intercept[IllegalArgumentException] {
      new graft.functions.RxRule("a+", "a", "$1")
    }
    // codegen and interpreted paths agree
    val many = (0L until 40L).map(i =>
      i -> s"tok$i table batch ${"T" * (i % 3).toInt}7 999-88")
      .toDF("doc_id", "text").repartition(3)
    def run(mode: String): Map[Long, (String, Long)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try Blocklist.rxCanonicalize(many, rules).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("canonical"), r.getAs[Long]("n_replaced")))).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("needle validation fails fast") {
    intercept[IllegalArgumentException] {
      new RxNeedle("", "a", 0)
    }
    intercept[IllegalArgumentException] {
      new RxNeedle("a+", "", 0)
    }
    intercept[IllegalArgumentException] {
      new RxNeedle("a+", "a", -1)
    }
    intercept[java.util.regex.PatternSyntaxException] {
      RxScanBcast.build(Array(new RxNeedle("[unclosed", "u", 0)))
    }
  }
}
