package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AcScanBcast
import graft.text.Blocklist

class BlocklistSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Byte-level truth: start positions where pat matches as a raw
    * UTF-8 substring (overlaps included) — the semantics the kernel's
    * end-position count must equal. */
  private def naive(text: String, pat: String): Long = {
    val t = text.getBytes("UTF-8")
    val p = pat.getBytes("UTF-8")
    (0 to t.length - p.length)
      .count(s => p.indices.forall(i => t(s + i) == p(i))).toLong
  }

  private def gateMap(texts: Seq[(Long, String)], pats: Seq[String])
      : Map[(Long, Long), Long] =
    Blocklist.blocklistGate(texts.toDF("doc_id", "text"), pats)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pattern_id")) ->
        r.getAs[Long]("n_hits")).toMap

  test("counts match the brute-force substring walk, overlaps included") {
    val texts = Seq(
      1L -> "a a a table scan scan slow",
      2L -> "the table is on the table top",
      3L -> "aaaa",
      4L -> "",
      5L -> "zz")
    val pats = Seq("table", "ta", "a a", "aa", "the", "zz", "absent!")
    val got = gateMap(texts, pats)
    assert(got.size === texts.size * pats.length)
    for ((id, t) <- texts; (p, pid) <- pats.zipWithIndex)
      assert(got((id, pid.toLong)) === naive(t, p), s"doc $id pat '$p'")
    // the cases the fixture is built around, pinned explicitly:
    assert(got((1L, 2L)) === 2L) // "a a" overlaps itself in "a a a"
    assert(got((3L, 3L)) === 3L) // "aa" three times in "aaaa"
    assert(got((2L, 1L)) === 2L) // "ta" nested inside both "table"s
    assert(got((4L, 0L)) === 0L) // empty text
  }

  test("nested and shared-prefix patterns all fire at one position") {
    // "able", "ble", "le" all end where "table" ends — the dictFail
    // chain must surface every one of them at that position
    val pats = Seq("table", "able", "ble", "le", "t")
    val got = gateMap(Seq(1L -> "table"), pats)
    assert(pats.indices.forall(pid =>
      got((1L, pid.toLong)) === naive("table", pats(pid))))
    assert(got((1L, 0L)) === 1L && got((1L, 1L)) === 1L &&
      got((1L, 2L)) === 1L && got((1L, 3L)) === 1L && got((1L, 4L)) === 1L)
  }

  test("duplicate patterns each keep their own slot") {
    val got = gateMap(Seq(1L -> "x table y table z"), Seq("table", "table"))
    assert(got((1L, 0L)) === 2L && got((1L, 1L)) === 2L)
  }

  test("multibyte UTF-8 patterns match codepoint-exactly") {
    val texts = Seq(1L -> "héhé ohé café", 2L -> "naïve café au lait",
      3L -> "ééé")
    val pats = Seq("hé", "é", "café", "éé", "ï")
    val got = gateMap(texts, pats)
    for ((id, t) <- texts; (p, pid) <- pats.zipWithIndex)
      assert(got((id, pid.toLong)) === naive(t, p), s"doc $id pat '$p'")
    assert(got((3L, 3L)) === 2L) // "éé" overlaps in "ééé"
  }

  test("interpreted and codegen paths agree") {
    val texts = (0L until 64L).map(i =>
      i -> s"tok$i a a table ${"ab" * (i % 7).toInt} scan s")
    val pats = Seq("table", "a a", "ab", "ba", "scan s", "zzqx")
    val d = texts.toDF("doc_id", "text").repartition(3)
    def run(mode: String): Map[Long, Seq[Long]] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try d.select(col("doc_id"),
          Blocklist.blocklistHitsCol(col("text"), pats).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val cg = run("CODEGEN_ONLY")
    val in = run("NO_CODEGEN")
    assert(cg === in)
    texts.foreach { case (id, t) =>
      assert(cg(id) === pats.map(naive(t, _)), s"doc $id") }
  }

  test("null text yields a null counts column; the gate drops the row") {
    val d = Seq((1L, Option("table")), (2L, Option.empty[String]))
      .toDF("doc_id", "text").repartition(2)
    val hits = d.select(col("doc_id"),
        Blocklist.blocklistHitsCol(col("text"), Seq("ta")).as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(hits(1L).isDefined && hits(2L).isEmpty)
    val gate = Blocklist.blocklistGate(d, Seq("ta")).collect()
    assert(gate.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
  }

  test("blocklistVerdicts folds the per-doc card off the same counts") {
    val d = Seq(1L -> "table table agg", 2L -> "nothing here", 3L -> "agg")
      .toDF("doc_id", "text")
    val got = Blocklist.blocklistVerdicts(d, Seq("table", "agg", "zz"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("n_patterns"),
          r.getAs[Boolean]("clean")))).toMap
    assert(got(1L) === ((3L, 2L, false)))
    assert(got(2L) === ((0L, 0L, true)))
    assert(got(3L) === ((1L, 1L, false)))
  }

  /** Independent redaction truth: naive byte-level match cover,
    * rebuilt per codepoint. */
  private def naiveRedact(text: String, pats: Seq[String]): (String, Long) = {
    val t = text.getBytes("UTF-8")
    val covered = new Array[Boolean](t.length)
    for (pat <- pats) {
      val p = pat.getBytes("UTF-8")
      for (s <- 0 to t.length - p.length
           if p.indices.forall(i => t(s + i) == p(i));
           j <- s until s + p.length) covered(j) = true
    }
    val sb = new StringBuilder
    var masked = 0L
    var i = 0
    while (i < t.length) {
      val lead = (t(i) & 0xFF) < 0x80 || (t(i) & 0xFF) >= 0xC0
      var e = i + 1
      while (e < t.length &&
        !((t(e) & 0xFF) < 0x80 || (t(e) & 0xFF) >= 0xC0)) e += 1
      assert(lead)
      if (covered(i)) { sb.append('*'); masked += 1L }
      else sb.append(new String(t.slice(i, e), "UTF-8"))
      i = e
    }
    (sb.toString, masked)
  }

  private def redactMap(texts: Seq[(Long, String)], pats: Seq[String])
      : Map[Long, (String, Long)] =
    graft.text.Blocklist.redactDocs(texts.toDF("doc_id", "text"), pats)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("redacted"), r.getAs[Long]("n_masked")))).toMap

  test("redaction masks the union of match spans, counts exactly") {
    val texts = Seq(
      1L -> "a a a table scan scan slow",
      2L -> "the table is on the table top",
      3L -> "aaaa", 4L -> "", 5L -> "clean text here")
    val pats = Seq("table", "ta", "a a", "aa", " the ")
    val got = redactMap(texts, pats)
    texts.foreach { case (id, t) =>
      assert(got(id) === naiveRedact(t, pats), s"doc $id") }
    // self-overlap: "aaaa" fully covered by "aa" at 0,1,2
    assert(got(3L) === (("****", 4L)))
    // clean doc passes through untouched
    assert(got(5L) === (("clean text here", 0L)))
    // redaction preserves character length
    texts.foreach { case (id, t) =>
      assert(got(id)._1.length === t.length, s"doc $id length") }
  }

  test("redaction masks multibyte codepoints whole") {
    val texts = Seq(1L -> "héllo café ok", 2L -> "ééé x", 3L -> "naïve")
    val pats = Seq("hé", "café", "éé", "ï")
    val got = redactMap(texts, pats)
    texts.foreach { case (id, t) =>
      assert(got(id) === naiveRedact(t, pats), s"doc $id") }
    assert(got(1L)._1 === "**llo **** ok")
    assert(got(2L)._1 === "*** x") // union of overlapping "éé" spans
    assert(got(3L)._1 === "na*ve")
    // character length preserved even though byte length shrinks
    texts.foreach { case (id, t) =>
      assert(got(id)._1.codePointCount(0, got(id)._1.length) ===
        t.codePointCount(0, t.length), s"doc $id") }
  }

  test("redaction interpreted and codegen paths agree") {
    val texts = (0L until 48L).map(i =>
      i -> s"a a table ${"ab" * (i % 5).toInt} café #$i")
    val pats = Seq("table", "a a", "ab", "café")
    val d = texts.toDF("doc_id", "text").repartition(3)
    def run(mode: String): Map[Long, (String, Long)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try graft.text.Blocklist.redactDocs(d, pats).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val cg = run("CODEGEN_ONLY")
    val in = run("NO_CODEGEN")
    assert(cg === in)
    texts.foreach { case (id, t) =>
      assert(cg(id) === naiveRedact(t, pats), s"doc $id") }
  }

  test("redaction rejects non-printable mask chars") {
    intercept[IllegalArgumentException] {
      graft.text.Blocklist.redactCol(col("text"), Seq("x"), '\n')
    }
  }

  test("provenanceReport folds per-(source, pattern) attribution") {
    val d = Seq(
      (1L, "s1", "table table"), (2L, "s1", "nothing"),
      (3L, "s2", "table"), (4L, "s2", "agg"), (5L, "s2", "agg agg"))
      .toDF("doc_id", "source", "text")
    val got = graft.text.Blocklist.provenanceReport(d, Seq("table", "agg"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("pattern_id")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_docs_hit"),
          r.getAs[Long]("n_hits")))).toMap
    assert(got === Map(
      ("s1", 0L) -> ((2L, 1L, 2L)), ("s1", 1L) -> ((2L, 0L, 0L)),
      ("s2", 0L) -> ((3L, 1L, 1L)), ("s2", 1L) -> ((3L, 2L, 3L))))
  }

  test("patternsFrom: sorted-distinct, null/empty dropped, guard fires") {
    import graft.text.Blocklist
    val p = Seq(Some("beta"), Some("alpha"), Some("beta"), None, Some(""))
      .toDF("pattern")
    assert(Blocklist.patternsFrom(p) === Seq("alpha", "beta"))
    // gateFrom == gate with the equivalent literal list
    val d = Seq(1L -> "alpha beta alpha").toDF("doc_id", "text")
    val viaTable = Blocklist.blocklistGateFrom(d, p).collect()
      .map(r => r.getAs[Long]("pattern_id") -> r.getAs[Long]("n_hits")).toMap
    assert(viaTable === Map(0L -> 2L, 1L -> 1L))
    // the bounded collect fails fast naming the conf, never OOMs
    spark.conf.set(Blocklist.MaxPatternsKey, "1")
    try {
      val e = intercept[IllegalStateException] { Blocklist.patternsFrom(p) }
      assert(e.getMessage.contains(Blocklist.MaxPatternsKey))
    } finally spark.conf.unset(Blocklist.MaxPatternsKey)
  }

  test("empty pattern set and empty patterns are rejected eagerly") {
    val d = Seq(1L -> "x").toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Blocklist.blocklistGate(d, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Blocklist.blocklistGate(d, Seq("ok", ""))
    }
  }

  test("the scan is one kernel projection: no join, no aggregate") {
    val d = Seq(1L -> "x").toDF("doc_id", "text")
      .repartition(2) // defeat local-relation constant folding
    val plan = Blocklist.blocklistGate(d, Seq("a", "b"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Aggregate"),
      s"expected a join/aggregate-free plan, got:\n$plan")
    assert(plan.contains("graft_ac_scan_bcast"))
  }

  test("automaton handles a dense byte alphabet and long fail chains") {
    // worst-ish case: periodic text with patterns that force fail-link
    // walks every byte, plus a pattern set nesting 6 deep
    val t = ("abcab" * 40) + "abcabd"
    val pats = Seq("abcabd", "abcab", "bcab", "cab", "ab", "b")
    val got = gateMap(Seq(1L -> t), pats)
    pats.zipWithIndex.foreach { case (p, pid) =>
      assert(got((1L, pid.toLong)) === naive(t, p), s"pat '$p'") }
  }

  /** Independent canonicalization truth: naive leftmost-longest walk
    * in byte space (longest needle starting at the scan position,
    * length tie → first listed). */
  private def naiveCanon(text: String, maps: Seq[(String, String)])
      : (String, Long) = {
    val t = text.getBytes("UTF-8")
    val pb = maps.map(_._1.getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    var n = 0L
    var i = 0
    while (i < t.length) {
      var bestLen = 0
      var bestPid = -1
      pb.zipWithIndex.foreach { case (p, pid) =>
        if (p.length > bestLen && i + p.length <= t.length &&
          p.indices.forall(j => t(i + j) == p(j))) {
          bestLen = p.length; bestPid = pid
        }
      }
      if (bestLen > 0) {
        val r = maps(bestPid)._2.getBytes("UTF-8")
        out.write(r, 0, r.length); n += 1L; i += bestLen
      } else { out.write(t(i).toInt); i += 1 }
    }
    (new String(out.toByteArray, "UTF-8"), n)
  }

  private def canonMap(texts: Seq[(Long, String)],
      maps: Seq[(String, String)]): Map[Long, (String, Long)] =
    graft.text.Blocklist.canonicalizeDocs(texts.toDF("doc_id", "text"), maps)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("canonical"), r.getAs[Long]("n_replaced")))).toMap

  test("canonicalization is leftmost-longest, order-independent, " +
      "non-cascading") {
    val maps = Seq("table" -> "tbl", "tab" -> "T", "a a" -> "aa",
      "value" -> "", "ab" -> "ba")
    val texts = Seq(
      1L -> "a a a table tab value",
      2L -> "tabtable abab",
      3L -> "", 4L -> "no needles here!")
    val got = canonMap(texts, maps)
    texts.foreach { case (id, t) =>
      assert(got(id) === naiveCanon(t, maps), s"doc $id") }
    // leftmost-longest: "table" wins over "tab" where both start;
    // self-overlap consumption: "a a a" -> "aa a"
    assert(got(1L) === (("aa a tbl T ", 4L)))
    // "tabtable": "tab" at 0 consumes 0-2, "table" at 3 -> "Ttbl";
    // "abab" -> "ba"+"ba" (no cascade: the output "ba" is never
    // re-scanned even though it contains a fresh "ab" after the join)
    assert(got(2L) === (("Ttbl baba", 4L)))
    assert(got(3L) === (("", 0L)) && got(4L) === (("no needles here!", 0L)))
    // order independence: shuffling the dictionary changes nothing
    // (except which duplicate wins, and there are none here)
    assert(canonMap(texts, maps.reverse).view.mapValues(_._1).toMap ===
      got.view.mapValues(_._1).toMap)
  }

  private def spansSet(texts: Seq[(Long, String)], pats: Seq[String])
      : Set[(Long, Long, Long)] =
    graft.text.Blocklist.blocklistSpans(texts.toDF("doc_id", "text"), pats)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pattern_id"),
        r.getAs[Long]("start"))).toSet

  test("spans report every occurrence at its codepoint offset") {
    val texts = Seq(1L -> "a a a table", 2L -> "clean", 3L -> "")
    val got = spansSet(texts, Seq("table", "ta", "a a"))
    // naive truth in char space
    val want = (for {
      (id, t) <- texts
      (p, pid) <- Seq("table", "ta", "a a").zipWithIndex
      s <- 0 to t.length - p.length
      if t.substring(s, s + p.length) == p
    } yield (id, pid.toLong, s.toLong)).toSet
    assert(got === want)
    // overlap ("a a" at 0 and 2) and nesting ("ta" inside "table")
    assert(got((1L, 2L, 0L)) && got((1L, 2L, 2L)) && got((1L, 1L, 6L)))
    // clean and empty docs emit nothing
    assert(!got.exists(x => x._1 == 2L || x._1 == 3L))
  }

  test("spans are codepoint offsets, not byte offsets") {
    // "é" is 2 bytes / 1 codepoint: matches after it shift in byte
    // space but not in char space
    val got = spansSet(Seq(1L -> "éé table"), Seq("table", "é"))
    assert(got === Set((1L, 1L, 0L), (1L, 1L, 1L), (1L, 0L, 3L)))
    // Spark's own substring agrees with the reported offset
    import spark.implicits._
    val check = Seq(1L -> "éé table").toDF("doc_id", "text")
      .select(expr("substring(text, 4, 5)")).collect()(0).getString(0)
    assert(check === "table")
  }

  test("mappingsFrom: sorted, min-replacement collision rule, guard") {
    import graft.text.Blocklist
    val m = Seq(("beta", Some("B2")), ("alpha", Some("A")),
      ("beta", Some("B1")), ("", Some("x")), ("gamma", None))
      .toDF("pattern", "replacement")
    assert(Blocklist.mappingsFrom(m) ===
      Seq("alpha" -> "A", "beta" -> "B1"))
    val d = Seq(1L -> "alpha beta gamma").toDF("doc_id", "text")
    val got = Blocklist.canonicalizeDocsFrom(d, m).collect()(0)
    assert(got.getString(1) === "A B1 gamma" && got.getLong(2) === 2L)
    spark.conf.set(Blocklist.MaxPatternsKey, "1")
    try intercept[IllegalStateException] { Blocklist.mappingsFrom(m) }
    finally spark.conf.unset(Blocklist.MaxPatternsKey)
  }

  test("canonicalization duplicate needles: the first listed wins") {
    val got = canonMap(Seq(1L -> "x table y"),
      Seq("table" -> "FIRST", "table" -> "SECOND"))
    assert(got(1L) === (("x FIRST y", 1L)))
    // and reversed, the new first wins — the tie rule, not list luck
    val rev = canonMap(Seq(1L -> "x table y"),
      Seq("table" -> "SECOND", "table" -> "FIRST"))
    assert(rev(1L) === (("x SECOND y", 1L)))
  }

  test("canonicalization handles multibyte and replacement growth") {
    val maps = Seq("café" -> "coffee house", "é" -> "e", "x" -> "")
    val texts = Seq(1L -> "café éx café", 2L -> "ééé")
    val got = canonMap(texts, maps)
    texts.foreach { case (id, t) =>
      assert(got(id) === naiveCanon(t, maps), s"doc $id") }
    assert(got(1L) === (("coffee house e coffee house", 4L)))
    assert(got(2L) === (("eee", 3L)))
  }

  test("canonicalization interpreted and codegen paths agree") {
    val maps = Seq("table" -> "tbl", "a a" -> "aa", "ab" -> "ba")
    val texts = (0L until 48L).map(i =>
      i -> s"a a table ${"ab" * (i % 5).toInt} end$i")
    val d = texts.toDF("doc_id", "text").repartition(3)
    def run(mode: String): Map[Long, (String, Long)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try graft.text.Blocklist.canonicalizeDocs(d, maps).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val cg = run("CODEGEN_ONLY")
    assert(cg === run("NO_CODEGEN"))
    texts.foreach { case (id, t) =>
      assert(cg(id) === naiveCanon(t, maps), s"doc $id") }
  }

  test("randomized sweep: scan and redact match the naive walk on " +
      "adversarial small-alphabet corpora") {
    // small alphabets maximize overlap/nesting/fail-chain traffic;
    // the multibyte char lands mid-pattern and mid-text
    val rnd = new scala.util.Random(101)
    val alphabets = Seq("ab", "abc", "aé ")
    for ((alpha, round) <- alphabets.zipWithIndex) {
      def randStr(maxLen: Int): String =
        (0 until 1 + rnd.nextInt(maxLen))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val pats = (0 until 12).map(_ => randStr(4)).distinct
      val texts = (0L until 40L).map(i => i -> randStr(60))
      val gate = gateMap(texts, pats)
      val red = redactMap(texts, pats)
      for ((id, t) <- texts) {
        pats.zipWithIndex.foreach { case (p, pid) =>
          assert(gate((id, pid.toLong)) === naive(t, p),
            s"round $round doc $id pat '$p' text '$t'") }
        assert(red(id) === naiveRedact(t, pats),
          s"round $round doc $id text '$t'")
      }
    }
  }

  test("scrubStack carryCols: pass-through columns ride the projection " +
      "chain; scrubProvenance plans NO join below its aggregate") {
    val docs = Seq(
      (1L, "the table is on the table", "web"),
      (2L, "a a table agg zzqx", "web"),
      (3L, "clean words only here", "book"),
      (4L, "", "book"))
      .toDF("doc_id", "text", "source")
    val dict = Seq("table" -> "TBL", "ta" -> "tX")
    val lits = Seq("TBL", "a a", "zzqx")
    val needles = Seq(("tX[a-z]+", "tX", 0), ("[0-9]{3}", "-", 3))

    // carried columns append after the contract columns, values intact
    val carried = Blocklist.scrubStack(docs, dict, lits, needles,
      carryCols = Seq("source"))
    assert(carried.columns.last === "source")
    val srcOf = carried.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(srcOf === Map(1L -> "web", 2L -> "web", 3L -> "book",
      4L -> "book"))
    // and the contract columns are bitwise the no-carry stack's
    val base = Blocklist.scrubStack(docs, dict, lits, needles)
    assert(carried.drop("source").collect().map(_.toString).sorted.toSeq
      === base.collect().map(_.toString).sorted.toSeq)

    // the rollup: values match the join-based spelling, but the plan
    // has NO join anywhere (advice r14 — the corpus self-join that
    // carried `source` was a full extra shuffle at scale)
    val prov = Blocklist.scrubProvenance(docs, dict, lits, needles)
    val joined = Blocklist.scrubStack(docs, dict, lits, needles)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_canon")).as("n_canon"),
        sum(when(col("n_lit_hits") > 0L, 1L).otherwise(0L))
          .as("n_docs_lit_hit"),
        sum(col("n_lit_hits")).as("n_lit_hits"),
        sum(when(col("n_rx_hits") > 0L, 1L).otherwise(0L))
          .as("n_docs_rx_hit"),
        sum(col("n_rx_hits")).as("n_rx_hits"),
        sum(col("n_masked_lit") + col("n_masked_rx")).as("n_masked"),
        sum(when(col("clean"), 1L).otherwise(0L)).as("n_clean"))
    assert(prov.orderBy("source").collect().map(_.toString).toSeq ===
      joined.orderBy("source").collect().map(_.toString).toSeq)
    val physical = prov.queryExecution.executedPlan.toString
    assert(!physical.toLowerCase.contains("join"),
      s"scrubProvenance must be scan -> aggregate, no join:\n$physical")
  }

  test("build rejects empty input and the automaton stays serializable") {
    intercept[IllegalArgumentException] { AcScanBcast.build(Array.empty) }
    val auto = AcScanBcast.build(Array("ab", "b"))
    val bytes = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bytes)
    oos.writeObject(auto); oos.close()
    assert(bytes.size() > 0)
  }
}
