package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-level blocklist / needle-set scanning — the substring
  * sibling of [[Search.phraseSetGate]]'s token-phrase gate. A
  * curation pipeline screens every document against thousands of raw
  * substrings (slurs, license boilerplate, canary strings, secret
  * prefixes) where token n-grams don't apply: the needles cross token
  * boundaries, carry punctuation, or must match mid-word. The whole
  * set rides ONE broadcast Aho–Corasick automaton
  * ([[graft.functions.AcScanBcast]]): one O(bytes + matches) pass per
  * row regardless of set size, against the naive |patterns| `instr`
  * scans whose plan AND per-row work grow linearly with the set.
  *
  * No index, no join, no aggregation — the scan is a single
  * projection, so it runs unchanged on a stream
  * ([[graft.streaming.Streaming.streamingBlocklistGate]]). */
object Blocklist {

  private[graft] def hitsColOn(spark: org.apache.spark.sql.SparkSession,
      text: Column, patterns: Seq[String]): Column = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be a non-empty set of non-empty strings")
    val bc = spark.sparkContext.broadcast(patterns.toArray)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.AcScanBcast(expression(text), bc))
  }

  /** Column of per-pattern occurrence counts (`array<long>`, index =
    * pattern position in `patterns`): counts match END positions, so
    * overlapping and nested matches all count (`"a a"` twice in
    * `"a a a"`; `"ta"` inside every `"table"`). Duplicate patterns
    * each keep their own slot. NULL text yields a NULL counts array
    * (standard null propagation). This column-only convenience
    * broadcasts on the ACTIVE session; the DataFrame faces below
    * broadcast on their own frame's session. */
  def blocklistHitsCol(text: Column, patterns: Seq[String]): Column =
    hitsColOn(org.apache.spark.sql.SparkSession.active, text, patterns)

  /** Match SPANS — the forensic face: one row per (doc, pattern,
    * start) occurrence, `start` a 0-based CODEPOINT offset (what
    * `substring`-style tooling consumes in both engines). Docs with
    * no matches emit nothing (unlike the gate's zero-hit pairs —
    * spans answer "where exactly", not "which are clean"). Still one
    * kernel projection + a generator; stream-safe. */
  def blocklistSpans(
      docs: DataFrame,
      patterns: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be a non-empty set of non-empty strings")
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(patterns.toArray)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    docs.withColumn("__spans",
        column(graft.functions.AcSpansBcast(expression(col(textCol)), bc)))
      .select(col(idCol), explode(col("__spans")).as("__m"))
      .select(col(idCol), col("__m.pattern_id").as("pattern_id"),
        col("__m.start").as("start"))
  }

  /** Canonicalization column: leftmost-longest dictionary replacement
    * in one pass ([[graft.functions.AcReplaceBcast]]) — alias →
    * canonical form, typo → fix, banned term → substitute. Unlike a
    * fold of per-needle replace calls, the result is independent of
    * mapping order and never cascades (later replacements cannot see
    * earlier ones' output). Returns struct<canonical, n_replaced>;
    * still one kernel projection — stream-safe. Column-only
    * convenience on the ACTIVE session (see [[blocklistHitsCol]]). */
  def canonicalizeCol(text: Column, mappings: Seq[(String, String)])
      : Column =
    canonicalizeColOn(org.apache.spark.sql.SparkSession.active,
      text, mappings)

  private def canonicalizeColOn(
      spark: org.apache.spark.sql.SparkSession,
      text: Column, mappings: Seq[(String, String)]): Column = {
    require(mappings.nonEmpty && mappings.forall(_._1.nonEmpty),
      "mappings must be a non-empty set with non-empty patterns")
    val bc = spark.sparkContext.broadcast(
      Array(mappings.map(_._1).toArray, mappings.map(_._2).toArray))
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.AcReplaceBcast(expression(text), bc))
  }

  /** Per-document canonicalization: (id, canonical text, replacement
    * count). One projection, no shuffle. */
  def canonicalizeDocs(
      docs: DataFrame,
      mappings: Seq[(String, String)],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
        canonicalizeColOn(docs.sparkSession, col(textCol), mappings)
          .as("__c"))
      .select(col(idCol), col("__c.canonical").as("canonical"),
        col("__c.n_replaced").as("n_replaced"))

  /** Conf key bounding how many needles [[patternsFrom]] will collect
    * to the driver (the automaton is a driver-built broadcast, so an
    * unbounded pattern TABLE must fail fast, not OOM silently — the
    * CalendarIndex discipline). Default 1,000,000: a million short
    * needles is tens of MB of automaton, the practical broadcast
    * ceiling. */
  val MaxPatternsKey = "spark.graft.blocklist.maxPatterns"
  val MaxPatternsDefault = 1000000

  /** Collect a needle set from a pattern TABLE (the operational shape:
    * blocklists live in governed tables, not literals) in a
    * DETERMINISTIC order (sorted, distinct), bounded by
    * [[MaxPatternsKey]] — `limit(max + 1)` first, so the failure mode
    * is an exception naming the conf, never a driver OOM. */
  def patternsFrom(patterns: DataFrame, patCol: String = "pattern")
      : Seq[String] = {
    val max = patterns.sparkSession.conf
      .get(MaxPatternsKey, MaxPatternsDefault.toString).toInt
    require(max >= 1, s"$MaxPatternsKey must be >= 1")
    val rows = patterns.select(col(patCol).cast("string"))
      .filter(col(patCol).isNotNull && length(col(patCol)) > 0)
      .distinct().orderBy(patCol).limit(max + 1)
      .collect().map(_.getString(0)).toSeq
    if (rows.length > max)
      throw new IllegalStateException(
        s"pattern table exceeds $max distinct needles; raise " +
          s"$MaxPatternsKey if the driver and broadcast budget allow, " +
          "or pre-filter the blocklist")
    rows
  }

  /** Collect a canonicalization DICTIONARY from a mapping table
    * (pattern → replacement), deterministic and bounded like
    * [[patternsFrom]]: null/empty patterns and null replacements
    * drop, a pattern mapped to several replacements resolves to the
    * LEXICOGRAPHICALLY SMALLEST (a governed dictionary should never
    * collide — the rule just keeps the operator a pure function of
    * the table's content), sorted by pattern, `limit(max + 1)`
    * fail-fast on [[MaxPatternsKey]]. */
  def mappingsFrom(
      mappings: DataFrame,
      patCol: String = "pattern",
      repCol: String = "replacement"): Seq[(String, String)] = {
    val max = mappings.sparkSession.conf
      .get(MaxPatternsKey, MaxPatternsDefault.toString).toInt
    require(max >= 1, s"$MaxPatternsKey must be >= 1")
    val rows = mappings
      .select(col(patCol).cast("string").as("__p"),
        col(repCol).cast("string").as("__r"))
      .filter(col("__p").isNotNull && length(col("__p")) > 0 &&
        col("__r").isNotNull)
      .groupBy("__p").agg(min("__r").as("__r"))
      .orderBy("__p").limit(max + 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    if (rows.length > max)
      throw new IllegalStateException(
        s"mapping table exceeds $max distinct patterns; raise " +
          s"$MaxPatternsKey if the driver and broadcast budget allow, " +
          "or pre-filter the dictionary")
    rows
  }

  /** [[canonicalizeDocs]] with the dictionary read from a mapping
    * table ([[mappingsFrom]] semantics). */
  def canonicalizeDocsFrom(
      docs: DataFrame,
      mappings: DataFrame,
      patCol: String = "pattern",
      repCol: String = "replacement",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    canonicalizeDocs(docs, mappingsFrom(mappings, patCol, repCol),
      textCol, idCol)

  /** [[blocklistGate]] with the needle set read from a pattern table;
    * `pattern_id` is the needle's 0-based position in the sorted
    * distinct set (deterministic across runs and engines). */
  def blocklistGateFrom(
      docs: DataFrame,
      patterns: DataFrame,
      patCol: String = "pattern",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    blocklistGate(docs, patternsFrom(patterns, patCol), textCol, idCol)

  /** Per-document verdicts for the whole pattern set: posexplode
    * emits one (doc, pattern_id, n_hits, hit) row per pair — zero-hit
    * pairs included, so the output shape is docs x patterns and an
    * absent pattern is visible as an all-zero column. */
  def blocklistGate(
      docs: DataFrame,
      patterns: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.withColumn("__hits",
        hitsColOn(docs.sparkSession, col(textCol), patterns))
      .select(col(idCol),
        posexplode(col("__hits")).as(Seq("pattern_id", "n_hits")))
      .select(col(idCol), col("pattern_id").cast("long").as("pattern_id"),
        col("n_hits"), (col("n_hits") > 0).as("hit"))

  /** Redaction column: every codepoint covered by ANY needle match
    * becomes one `mask` character — the PII-scrub / canary-strip
    * spelling of the scan (union-of-spans masking, so overlapping and
    * nested needles scrub everything any needle touches and the
    * output is independent of pattern order; multibyte characters are
    * masked whole). Returns struct<redacted, n_masked> so the
    * masked-codepoint count comes out of the kernel itself. Same
    * one-pass automaton; still a pure projection — stream-safe. */
  def redactCol(text: Column, patterns: Seq[String],
      mask: Char = '*'): Column =
    redactColOn(org.apache.spark.sql.SparkSession.active,
      text, patterns, mask)

  private def redactColOn(spark: org.apache.spark.sql.SparkSession,
      text: Column, patterns: Seq[String], mask: Char): Column = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be a non-empty set of non-empty strings")
    require(mask >= 0x20 && mask < 0x7F,
      s"mask must be a printable ASCII char, got ${mask.toInt}")
    val bc = spark.sparkContext.broadcast(patterns.toArray)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.AcRedactBcast(expression(text), bc, mask.toByte))
  }

  /** Per-document redaction: the original id, the scrubbed text, and
    * `n_masked` (codepoints replaced — 0 means the document was
    * already clean). One projection, no shuffle. */
  def redactDocs(
      docs: DataFrame,
      patterns: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id",
      mask: Char = '*'): DataFrame =
    docs.select(col(idCol),
        redactColOn(docs.sparkSession, col(textCol), patterns, mask)
          .as("__r"))
      .select(col(idCol), col("__r.redacted").as("redacted"),
        col("__r.n_masked").as("n_masked"))

  /** Provenance report — the "which source carries the canary"
    * question: per (source, pattern) the document count, how many of
    * those documents hit, and total occurrences. One kernel
    * projection + one small groupBy (|sources| x |patterns| groups,
    * map-side combinable) — the scan itself never shuffles, only the
    * tiny aggregate does. `byCol` defaults to the corpus's `source`
    * column; point it at a crawl-segment or WARC-path column for
    * file-level attribution. */
  def provenanceReport(
      docs: DataFrame,
      patterns: Seq[String],
      textCol: String = "text",
      byCol: String = "source"): DataFrame =
    docs.withColumn("__hits",
        hitsColOn(docs.sparkSession, col(textCol), patterns))
      .select(col(byCol),
        posexplode(col("__hits")).as(Seq("pattern_id", "n_hits")))
      .groupBy(col(byCol), col("pattern_id").cast("long").as("pattern_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0L, 1L).otherwise(0L)).as("n_docs_hit"),
        sum(col("n_hits")).as("n_hits"))

  // ------------------------------------------------------------------
  // REGEX-class needles (round 13 — VERDICT r12 residue #1): the scrub
  // family for patterns literals can't express (API-key shapes, phone
  // formats, dashed-number PII). One Aho–Corasick pass over the
  // needles' LITERAL ANCHORS prefilters the corpus — clean documents
  // never touch the regex engine — and a bounded greedy verify runs
  // only on anchor neighborhoods ([[graft.functions.RxScanBcast]];
  // the contract and all-starts match semantics live there). Every
  // face is a pure projection — stream-safe like the literal family.
  // ------------------------------------------------------------------

  private def rxNeedles(needles: Seq[(String, String, Int)])
      : Array[graft.functions.RxNeedle] = {
    require(needles.nonEmpty, "needle set must be non-empty")
    needles.map { case (re, anchor, gap) =>
      new graft.functions.RxNeedle(re, anchor, gap) }.toArray
  }

  private def rxSpansColOn(spark: org.apache.spark.sql.SparkSession,
      text: Column, needles: Seq[(String, String, Int)]): Column = {
    val bc = spark.sparkContext.broadcast(rxNeedles(needles))
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.RxSpansBcast(expression(text), bc))
  }

  /** Regex match SPANS: one row per (doc, pattern, start) occurrence
    * with the greedy match length, start/len 0-based CODEPOINT
    * offsets (all-starts semantics — every position where the regex
    * matches reports, the occurrence rule of the literal family).
    * `needles` are (regex, literalAnchor, maxGap) triples — see
    * [[graft.functions.RxNeedle]] for the anchor contract. */
  def rxSpans(
      docs: DataFrame,
      needles: Seq[(String, String, Int)],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.withColumn("__m",
        rxSpansColOn(docs.sparkSession, col(textCol), needles))
      .select(col(idCol), explode(col("__m")).as("__s"))
      .select(col(idCol), col("__s.pattern_id").as("pattern_id"),
        col("__s.start").as("start"), col("__s.len").as("len"))

  /** Per-(doc, pattern) regex verdicts — docs x patterns rows,
    * zero-hit pairs included (the [[blocklistGate]] shape): `n_hits`
    * counts match START positions (all-starts semantics). */
  def rxGate(
      docs: DataFrame,
      needles: Seq[(String, String, Int)],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nPat = needles.length
    docs.withColumn("__m",
        rxSpansColOn(docs.sparkSession, col(textCol), needles))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(nPat - 1)),
          p => size(filter(col("__m"),
            m => m.getField("pattern_id") === p.cast("long"))).cast("long")))
          .as(Seq("pattern_id", "n_hits")))
      .select(col(idCol), col("pattern_id").cast("long").as("pattern_id"),
        col("n_hits"), (col("n_hits") > 0).as("hit"))
  }

  /** Regex provenance report — the "which source carries the key
    * leak" card ([[provenanceReport]]'s regex arm): per (source,
    * pattern) the document count, hit documents, and total match
    * positions. One kernel projection + one |sources| x |patterns|
    * map-side-combinable aggregate. */
  def rxProvenance(
      docs: DataFrame,
      needles: Seq[(String, String, Int)],
      textCol: String = "text",
      byCol: String = "source"): DataFrame = {
    val nPat = needles.length
    docs.withColumn("__m",
        rxSpansColOn(docs.sparkSession, col(textCol), needles))
      .select(col(byCol),
        posexplode(transform(sequence(lit(0), lit(nPat - 1)),
          p => size(filter(col("__m"),
            m => m.getField("pattern_id") === p.cast("long"))).cast("long")))
          .as(Seq("pattern_id", "n_hits")))
      .groupBy(col(byCol), col("pattern_id").cast("long").as("pattern_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0L, 1L).otherwise(0L)).as("n_docs_hit"),
        sum(col("n_hits")).as("n_hits"))
  }

  /** Collect a regex-needle set from a governed TABLE (columns:
    * regex, anchor, max_gap — the operational shape secret-scanning
    * rule sets live in), deterministic (sorted by regex, distinct)
    * and bounded by [[MaxPatternsKey]] with the `limit(max + 1)`
    * fail-fast — the [[patternsFrom]] discipline. Rows with a null /
    * empty regex or anchor, or a negative gap, are rejected loudly
    * (a silently dropped scanning rule is a compliance hole, not a
    * data-quality detail). */
  def rxNeedlesFrom(
      needles: DataFrame,
      regexCol: String = "regex",
      anchorCol: String = "anchor",
      gapCol: String = "max_gap"): Seq[(String, String, Int)] = {
    val max = needles.sparkSession.conf
      .get(MaxPatternsKey, MaxPatternsDefault.toString).toInt
    require(max >= 1, s"$MaxPatternsKey must be >= 1")
    val rows = needles
      .select(col(regexCol).cast("string").as("__re"),
        col(anchorCol).cast("string").as("__a"),
        col(gapCol).cast("int").as("__g"))
      .distinct().orderBy("__re").limit(max + 1)
      .collect()
    if (rows.length > max)
      throw new IllegalStateException(
        s"regex-needle table exceeds $max distinct rules; raise " +
          s"$MaxPatternsKey if the driver and broadcast budget allow, " +
          "or pre-filter the rule set")
    rows.map { r =>
      require(!r.isNullAt(0) && r.getString(0).nonEmpty &&
        !r.isNullAt(1) && r.getString(1).nonEmpty &&
        !r.isNullAt(2) && r.getInt(2) >= 0,
        s"invalid regex-needle rule row: $r (regex and anchor must be " +
          "non-empty, max_gap >= 0)")
      (r.getString(0), r.getString(1), r.getInt(2))
    }.toSeq
  }

  /** Regex CANONICALIZATION: sequential per-rule global rewrite
    * (rule i + 1 sees rule i's output — nested `regexp_replace`
    * semantics in both engines; the literal family's simultaneous
    * leftmost-longest walk has no cheap regex analogue), with the
    * anchor prefilter skipping the regex engine entirely for clean
    * documents. `rules` are (regex, literalAnchor, replacement)
    * triples; replacements must be LITERAL (no group references).
    * Returns (id, canonical, n_replaced). */
  def rxCanonicalize(
      docs: DataFrame,
      rules: Seq[(String, String, String)],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(rules.nonEmpty, "rule set must be non-empty")
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(rules.map { case (re, a, rep) =>
      new graft.functions.RxRule(re, a, rep) }.toArray)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    docs.select(col(idCol),
        column(graft.functions.RxReplaceBcast(
          expression(col(textCol)), bc)).as("__c"))
      .select(col(idCol), col("__c.canonical").as("canonical"),
        col("__c.n_replaced").as("n_replaced"))
  }

  /** Regex REDACTION: every codepoint covered by ANY regex match
    * becomes one `mask` char (union-of-spans — the [[redactDocs]]
    * semantic lifted to the regex arm). Returns (id, redacted,
    * n_masked); one projection, no shuffle, stream-safe. */
  def rxRedact(
      docs: DataFrame,
      needles: Seq[(String, String, Int)],
      textCol: String = "text",
      idCol: String = "doc_id",
      mask: Char = '*'): DataFrame = {
    require(mask >= 0x20 && mask < 0x7F,
      s"mask must be a printable ASCII char, got ${mask.toInt}")
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(rxNeedles(needles))
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    docs.select(col(idCol),
        column(graft.functions.RxRedactBcast(
          expression(col(textCol)), bc, mask.toByte)).as("__r"))
      .select(col(idCol), col("__r.redacted").as("redacted"),
        col("__r.n_masked").as("n_masked"))
  }

  /** THE SCRUB STACK as one operator (round 14 — the q_scrub_stack
    * composition promoted to a first-class face): canonicalize with
    * the leftmost-longest dictionary walk, gate BOTH needle families
    * on the CANONICAL text (replacements mint and destroy needles —
    * the seam under test), then redact literal spans and regex spans
    * IN THAT ORDER (masked runs can break regex shapes — stage order
    * is load-bearing). The whole card is a chain of pure projections
    * (the rx per-doc counts fold over the spans ARRAY instead of a
    * groupBy), so it runs UNCHANGED on a stream and shuffles nothing.
    * All broadcasts come from the OWNING session (docs.sparkSession —
    * the streamingBlocklistCounts discipline).
    *
    * `carryCols` thread PASS-THROUGH columns (e.g. `source`) through
    * the projection chain for free (round 15, advice r14: the
    * provenance rollup used to re-join the corpus to recover its
    * group column — a full extra shuffle at 100 TB for a column the
    * scan already had in hand).
    * @return (id, n_canon, n_lit_hits, n_lit_patterns, n_rx_hits,
    *         n_rx_patterns, n_masked_lit, n_masked_rx, clean,
    *         scrubbed, carryCols...) */
  def scrubStack(
      docs: DataFrame,
      mappings: Seq[(String, String)],
      patterns: Seq[String],
      needles: Seq[(String, String, Int)],
      textCol: String = "text",
      idCol: String = "doc_id",
      mask: Char = '*',
      carryCols: Seq[String] = Nil): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val rxBc = spark.sparkContext.broadcast(rxNeedles(needles))
    val carry = carryCols.map(col)
    docs
      .select(col(idCol) +:
        canonicalizeColOn(spark, col(textCol), mappings).as("__c") +:
        carry: _*)
      .select(col(idCol) +: col("__c.canonical").as("__ct") +:
        col("__c.n_replaced").as("n_canon") +: carry: _*)
      .select(col(idCol) +: col("n_canon") +:
        hitsColOn(spark, col("__ct"), patterns).as("__h") +:
        column(graft.functions.RxSpansBcast(
          expression(col("__ct")), rxBc)).as("__m") +:
        redactColOn(spark, col("__ct"), patterns, mask).as("__r1") +:
        carry: _*)
      .select(col(idCol) +: col("n_canon") +:
        aggregate(col("__h"), lit(0L), (a, x) => a + x).as("n_lit_hits") +:
        aggregate(col("__h"), lit(0L),
          (a, x) => a + when(x > 0L, 1L).otherwise(0L))
          .as("n_lit_patterns") +:
        size(col("__m")).cast("long").as("n_rx_hits") +:
        size(array_distinct(transform(col("__m"),
          m => m.getField("pattern_id")))).cast("long")
          .as("n_rx_patterns") +:
        col("__r1.n_masked").as("n_masked_lit") +:
        col("__r1.redacted").as("__rt") +: carry: _*)
      .select(col(idCol) +: col("n_canon") +: col("n_lit_hits") +:
        col("n_lit_patterns") +: col("n_rx_hits") +: col("n_rx_patterns") +:
        col("n_masked_lit") +:
        column(graft.functions.RxRedactBcast(
          expression(col("__rt")), rxBc, mask.toByte)).as("__r2") +:
        carry: _*)
      .select(col(idCol) +: col("n_canon") +: col("n_lit_hits") +:
        col("n_lit_patterns") +: col("n_rx_hits") +: col("n_rx_patterns") +:
        col("n_masked_lit") +:
        col("__r2.n_masked").as("n_masked_rx") +:
        (col("n_lit_hits") === 0L && col("n_rx_hits") === 0L)
          .as("clean") +:
        col("__r2.redacted").as("scrubbed") +: carry: _*)
  }

  /** Provenance rollup of [[scrubStack]] (round 14 — the "which
    * source needs scrubbing" card, the [[provenanceReport]] pattern
    * over the composed stack): per `byCol` group the document count,
    * documents hit by each needle family, canonicalization and
    * redaction volumes, and the clean count. ONE scrubStack
    * projection CARRYING the group column through (round 15, advice
    * r14: the corpus self-join this rollup used to pay just to
    * recover `byCol` is gone — scan → |groups|-row map-side-
    * combinable aggregate, nothing else shuffles). */
  def scrubProvenance(
      docs: DataFrame,
      mappings: Seq[(String, String)],
      patterns: Seq[String],
      needles: Seq[(String, String, Int)],
      byCol: String = "source",
      textCol: String = "text",
      idCol: String = "doc_id",
      mask: Char = '*'): DataFrame =
    scrubStack(docs, mappings, patterns, needles, textCol, idCol, mask,
        carryCols = Seq(byCol))
      .groupBy(byCol)
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

  /** One verdict row per document — the keep/drop spelling: total
    * hits across the set, number of distinct patterns present, and
    * `clean` (no pattern matched). The aggregate folds inside the
    * projection (one `aggregate` over the counts array), so this face
    * is also stream-safe. */
  def blocklistVerdicts(
      docs: DataFrame,
      patterns: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.withColumn("__hits",
        hitsColOn(docs.sparkSession, col(textCol), patterns))
      .select(col(idCol),
        aggregate(col("__hits"), lit(0L), (a, x) => a + x).as("n_hits"),
        aggregate(col("__hits"), lit(0L),
          (a, x) => a + when(x > 0L, 1L).otherwise(0L)).as("n_patterns"))
      .withColumn("clean", col("n_hits") === 0L)
}
