package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One REGEX needle of the scrub family (round 13 — the regex-class
  * arm the literal automaton family lacked: API-key shapes, phone
  * formats, dashed-number PII; VERDICT r12 residue #1). The classic
  * production shape: every practical secret/PII pattern contains a
  * LITERAL ANCHOR (`@` in an email, `-` in an SSN shape, a fixed key
  * prefix), so the corpus-wide scan is an Aho–Corasick pass over the
  * anchors — one O(bytes) walk for the whole set — and the expensive
  * regex engine only runs a BOUNDED verify on the neighborhood of
  * each anchor hit. Clean documents (no anchor anywhere) never touch
  * the regex engine, never even materialize a String.
  *
  * CONTRACT (caller-declared, spec-pinned against a brute full-text
  * regex scan): every match of `regex` must contain `anchor` as a
  * literal substring, starting at most `maxGap` CODEPOINTS after the
  * match start. A match farther from every anchor occurrence is
  * missed by construction — declare the loosest anchor the pattern
  * guarantees. `regex` must use the engine-portable subset (character
  * classes, bounded/greedy quantifiers, alternation — no lookaround,
  * no backreferences, no anchors `^`/`$`) so the DuckDB RE2 oracle
  * replays Java's semantics exactly, and must never match the empty
  * string.
  *
  * MATCH SEMANTICS — the all-starts rule, deliberately the same
  * occurrence semantics as the literal family ([[AcScanBcast]] counts
  * every match END; this reports every match START): a match is
  * reported at every codepoint position where the regex matches
  * (greedy, `lookingAt`-style), with its greedy length. Overlapping
  * and nested matches all count. That makes the result a pure
  * function of (text, pattern) replayable per-position by the oracle
  * (`regexp_extract(substr(text, s+1), '^(...)')`), independent of
  * the anchor prefilter — the prefilter is a performance device the
  * correctness gate would catch if it ever dropped a match. */
final class RxNeedle(
    val regex: String,
    val anchor: String,
    val maxGap: Int) extends Serializable {
  require(regex.nonEmpty, "regex must be non-empty")
  require(anchor.nonEmpty, "anchor must be non-empty")
  require(maxGap >= 0, s"maxGap must be >= 0, got $maxGap")
}

/** Frozen per-executor compiled form: the anchor automaton (one AC
  * needle per regex — duplicates each keep their slot, so shared
  * anchors fan out to every owning pattern) plus the compiled
  * java.util.regex patterns and per-needle gap windows. */
final class RxAutomaton(
    val ac: AcAutomaton,
    val anchorCharLen: Array[Int],
    val patterns: Array[java.util.regex.Pattern],
    val maxGap: Array[Int]) extends Serializable {
  def nPatterns: Int = patterns.length
}

/** Regex match SPANS through the broadcast needle set: every
  * (pattern_id, start, len) at codepoint offsets, sorted by
  * (start, pattern_id, len). One AC anchor pass + bounded regex
  * verifies; see [[RxNeedle]] for the semantics contract.
  * Returns array<struct<pattern_id: bigint, start: bigint,
  * len: bigint>>. */
case class RxSpansBcast(
    child: Expression,
    bc: Broadcast[Array[RxNeedle]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pattern_id", LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("start", LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("len", LongType,
        nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_rx_spans_bcast requires a string column, got ${t.sql}")
    }

  @transient private lazy val auto: RxAutomaton = RxScanBcast.cachedRx(bc)

  override def nullSafeEval(textV: Any): Any =
    RxScanBcast.spans(auto, textV.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val bcRef = ctx.addReferenceObj("rxNeedlesBc", bc,
        classOf[Broadcast[Array[RxNeedle]]].getName)
      val cls = RxScanBcast.getClass.getName.stripSuffix("$")
      val a = ctx.addMutableState("graft.functions.RxAutomaton", "rxAuto",
        v => s"$v = $cls.cachedRx($bcRef);")
      s"""
         |${ev.value} = $cls.spans($a, $text);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RxSpansBcast =
    copy(child = c)

  override def prettyName: String = "graft_rx_spans_bcast"
}

/** Regex REDACTION through the broadcast needle set: every codepoint
  * covered by ANY regex match (all-starts union — see [[RxNeedle]])
  * becomes one `maskChar`. Same anchor-prefiltered walk as
  * [[RxSpansBcast]]; returns struct<redacted: string,
  * n_masked: bigint> like the literal [[AcRedactBcast]]. */
case class RxRedactBcast(
    child: Expression,
    bc: Broadcast[Array[RxNeedle]],
    maskChar: Byte)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("redacted", StringType,
        nullable = false),
      org.apache.spark.sql.types.StructField("n_masked", LongType,
        nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_rx_redact_bcast requires a string column, got ${t.sql}")
    }

  @transient private lazy val auto: RxAutomaton = RxScanBcast.cachedRx(bc)

  override def nullSafeEval(textV: Any): Any =
    RxScanBcast.redact(auto, textV.asInstanceOf[UTF8String], maskChar)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val bcRef = ctx.addReferenceObj("rxNeedlesBc", bc,
        classOf[Broadcast[Array[RxNeedle]]].getName)
      val cls = RxScanBcast.getClass.getName.stripSuffix("$")
      val a = ctx.addMutableState("graft.functions.RxAutomaton", "rxAuto",
        v => s"$v = $cls.cachedRx($bcRef);")
      s"""
         |${ev.value} = $cls.redact($a, $text, (byte) $maskChar);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RxRedactBcast =
    copy(child = c)

  override def prettyName: String = "graft_rx_redact_bcast"
}

/** One rewrite rule of the regex CANONICALIZATION face: a regex, its
  * literal anchor (the [[RxNeedle]] contract — every match contains
  * it), and a LITERAL replacement (no `$n` / `\n` group references:
  * both engines must substitute the same bytes, so references are
  * rejected at construction). */
final class RxRule(
    val regex: String,
    val anchor: String,
    val replacement: String) extends Serializable {
  require(regex.nonEmpty, "regex must be non-empty")
  require(anchor.nonEmpty, "anchor must be non-empty")
  require(!replacement.contains("$") && !replacement.contains("\\"),
    "replacement must be literal text (no $n / \\n group references " +
      "- the cross-engine contract)")
}

/** Compiled rewrite rules: anchor automaton + patterns + literal
  * replacements. */
final class RxReplaceAutomaton(
    val ac: AcAutomaton,
    val patterns: Array[java.util.regex.Pattern],
    val reps: Array[String]) extends Serializable

/** Regex CANONICALIZATION through the broadcast rule set — the
  * rewrite-to-replacement face the literal family has in
  * [[AcReplaceBcast]] (normalize phone/date FORMATS rather than mask
  * them). Semantics are the honest cross-engine choice: the
  * SEQUENTIAL FOLD of per-rule global replaces, rule i + 1 seeing
  * rule i's output — exactly `regexp_replace(…, 'g')` nested in rule
  * order in both engines (a canonical simultaneous multi-regex
  * ordering does not exist cheaply; the fold is what production sed
  * chains actually run). The anchor prefilter only SKIPS work, never
  * changes it: a document none of whose rules' anchors occur passes
  * through untouched (no String materialization, no regex engine);
  * once any rule has matched, every LATER rule runs unconditionally —
  * an applied replacement may mint a later rule's anchor, and
  * correctness never rides on it not doing so. Returns
  * struct<canonical: string, n_replaced: bigint> (total matches
  * replaced across the fold). */
case class RxReplaceBcast(
    child: Expression,
    bc: Broadcast[Array[RxRule]])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("canonical", StringType,
        nullable = false),
      org.apache.spark.sql.types.StructField("n_replaced", LongType,
        nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_rx_replace_bcast requires a string column, got ${t.sql}")
    }

  @transient private lazy val auto: RxReplaceAutomaton =
    RxScanBcast.cachedRxReplace(bc)

  override def nullSafeEval(textV: Any): Any =
    RxScanBcast.replaceFold(auto, textV.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val bcRef = ctx.addReferenceObj("rxRulesBc", bc,
        classOf[Broadcast[Array[RxRule]]].getName)
      val cls = RxScanBcast.getClass.getName.stripSuffix("$")
      val a = ctx.addMutableState("graft.functions.RxReplaceAutomaton",
        "rxReplaceAuto",
        v => s"$v = $cls.cachedRxReplace($bcRef);")
      s"""
         |${ev.value} = $cls.replaceFold($a, $text);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RxReplaceBcast =
    copy(child = c)

  override def prettyName: String = "graft_rx_replace_bcast"
}

object RxScanBcast {

  /** Per-JVM compiled-needle cache keyed by broadcast id AND a content
    * fingerprint of the needle set (the [[AcScanBcast.cachedScan]]
    * discipline: one anchor-automaton + pattern-compile per executor
    * process; the fingerprint guards against broadcast-id reuse across
    * successive SparkContexts in one JVM — advice r13). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, RxAutomaton]()

  def cachedRx(bc: Broadcast[Array[RxNeedle]]): RxAutomaton = {
    if (cache.size > 32) cache.clear()
    val fp = AcScanBcast.fingerprint(bc.value.iterator.flatMap(n =>
      Iterator(n.regex, n.anchor, n.maxGap.toString)))
    cache.computeIfAbsent(s"${bc.id}:$fp", _ => build(bc.value))
  }

  private val replaceCache =
    new java.util.concurrent.ConcurrentHashMap[String, RxReplaceAutomaton]()

  def cachedRxReplace(bc: Broadcast[Array[RxRule]]): RxReplaceAutomaton = {
    if (replaceCache.size > 32) replaceCache.clear()
    val fp = AcScanBcast.fingerprint(bc.value.iterator.flatMap(r =>
      Iterator(r.regex, r.anchor, r.replacement)))
    replaceCache.computeIfAbsent(s"${bc.id}:$fp",
      _ => buildReplace(bc.value))
  }

  /** Compile the rewrite rules: anchor automaton (pid = rule index) +
    * java.util.regex patterns + literal replacements. */
  def buildReplace(rules: Array[RxRule]): RxReplaceAutomaton = {
    require(rules.nonEmpty, "rule set must be non-empty")
    new RxReplaceAutomaton(
      AcScanBcast.build(rules.map(_.anchor)),
      rules.map(r => java.util.regex.Pattern.compile(r.regex)),
      rules.map(_.replacement))
  }

  /** Interpreted/generated shared path of [[RxReplaceBcast]]: one AC
    * pass computes which rules' anchors occur in the ORIGINAL text;
    * no anchor anywhere → the text passes through untouched. Else the
    * sequential fold runs: each present rule global-replaces
    * (non-overlapping, left to right — `Matcher.find` +
    * `appendReplacement` with the LITERAL replacement, counting
    * matches); once any rule has replaced, every later rule runs
    * regardless of its original-text anchor verdict (a replacement
    * may mint a later anchor — correctness never rides on the
    * prefilter). */
  def replaceFold(ra: RxReplaceAutomaton, text: UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val auto = ra.ac
    val n = text.numBytes()
    val present = new Array[Boolean](ra.patterns.length)
    var any = false
    var state = 0
    var i = 0
    while (i < n) {
      val b = text.getByte(i) & 0xFF
      var s = state
      var nxt = auto.edge(s, b)
      while (nxt == -1 && s != 0) { s = auto.fail(s); nxt = auto.edge(s, b) }
      state = if (nxt == -1) 0 else nxt
      var t = if (auto.outHead(state) != -1) state else auto.dictFail(state)
      while (t != -1) {
        var e = auto.outHead(t)
        while (e != -1) {
          present(auto.outPid(e)) = true
          any = true
          e = auto.outNext(e)
        }
        t = auto.dictFail(t)
      }
      i += 1
    }
    if (!any)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](text, 0L))
    var s = text.toString
    var replaced = 0L
    var applied = false
    var pid = 0
    while (pid < ra.patterns.length) {
      if (present(pid) || applied) {
        val m = ra.patterns(pid).matcher(s)
        var cnt = 0L
        val sb = new java.lang.StringBuilder()
        var last = 0
        while (m.find()) {
          sb.append(s, last, m.start())
          sb.append(ra.reps(pid))
          last = m.end()
          cnt += 1L
        }
        if (cnt > 0L) {
          sb.append(s, last, s.length)
          s = sb.toString
          replaced += cnt
          applied = true
        }
      }
      pid += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(s), replaced))
  }

  /** Compile the needle set: anchor automaton (pid = needle index) +
    * java.util.regex patterns. */
  def build(needles: Array[RxNeedle]): RxAutomaton = {
    require(needles.nonEmpty, "needle set must be non-empty")
    // the walk packs (position << 20 | pid) — the same 1M ceiling the
    // literal family's pattern tables enforce via conf
    require(needles.length <= (1 << 20),
      s"regex needle set exceeds 2^20 rules (${needles.length})")
    new RxAutomaton(
      AcScanBcast.build(needles.map(_.anchor)),
      needles.map(n => n.anchor.codePointCount(0, n.anchor.length)),
      needles.map(n => java.util.regex.Pattern.compile(n.regex)),
      needles.map(_.maxGap))
  }

  /** The shared core: anchor AC walk (bytes, codepoint counter) →
    * candidate codepoint starts per needle (the [lo, hi] gap window
    * behind each anchor occurrence, deduped by a per-needle
    * high-water mark) → one rolling codepoint→UTF-16 cursor over the
    * start-sorted candidates → greedy `lookingAt` verify per
    * candidate. Returns packed matches sorted by (start, pid):
    * parallel arrays (starts, pids, lens) in codepoints. Clean rows
    * (no anchor hit) return null without materializing a String. */
  private def matches(rx: RxAutomaton, text: UTF8String)
      : (Array[Int], Array[Int], Array[Int]) = {
    val auto = rx.ac
    val n = text.numBytes()
    // 1. anchor occurrences as (needle, anchorStartCp), via the spans
    //    walk's codepoint counter
    var anchorHits: scala.collection.mutable.ArrayBuffer[Long] = null
    var state = 0
    var chars = 0L
    var i = 0
    while (i < n) {
      val b = text.getByte(i) & 0xFF
      if (b < 0x80 || b >= 0xC0) chars += 1L
      var s = state
      var nxt = auto.edge(s, b)
      while (nxt == -1 && s != 0) { s = auto.fail(s); nxt = auto.edge(s, b) }
      state = if (nxt == -1) 0 else nxt
      var t = if (auto.outHead(state) != -1) state else auto.dictFail(state)
      while (t != -1) {
        var e = auto.outHead(t)
        while (e != -1) {
          val pid = auto.outPid(e)
          if (anchorHits == null)
            anchorHits = new scala.collection.mutable.ArrayBuffer[Long]()
          // pack (anchorStartCp << 20 | pid): starts < 2^43 cp, pids
          // < 2^20 (the 1M-needle family ceiling)
          anchorHits +=
            ((chars - rx.anchorCharLen(pid)) << 20) | pid.toLong
          e = auto.outNext(e)
        }
        t = auto.dictFail(t)
      }
      i += 1
    }
    if (anchorHits == null) return null

    // 2. candidate starts per needle: window [aStart - maxGap, aStart],
    //    deduped with a per-needle high-water mark (anchors arrive in
    //    nondecreasing start order per needle up to AC emission order —
    //    sort first to make the mark airtight)
    val hits = anchorHits.toArray
    java.util.Arrays.sort(hits)
    val nPat = rx.nPatterns
    val mark = new Array[Long](nPat)
    java.util.Arrays.fill(mark, -1L)
    val cands = new scala.collection.mutable.ArrayBuffer[Long]()
    var h = 0
    while (h < hits.length) {
      val packed = hits(h)
      val pid = (packed & ((1L << 20) - 1)).toInt
      val aStart = packed >>> 20
      var lo = aStart - rx.maxGap(pid)
      if (lo < 0L) lo = 0L
      if (lo <= mark(pid)) lo = mark(pid) + 1L
      var c = lo
      while (c <= aStart) { cands += (c << 20) | pid.toLong; c += 1L }
      if (aStart > mark(pid)) mark(pid) = aStart
      h += 1
    }
    if (cands.isEmpty) return null
    val cArr = cands.toArray
    java.util.Arrays.sort(cArr)

    // 3. rolling cp -> UTF-16 cursor + greedy verify per candidate
    val str = text.toString
    val strLen = str.length
    val matchers = rx.patterns.map(_.matcher(str))
    var curCp = 0L
    var curU16 = 0
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val pids = new scala.collection.mutable.ArrayBuffer[Int]()
    val lens = new scala.collection.mutable.ArrayBuffer[Int]()
    var j = 0
    while (j < cArr.length) {
      val packed = cArr(j)
      val pid = (packed & ((1L << 20) - 1)).toInt
      val startCp = packed >>> 20
      curU16 = str.offsetByCodePoints(curU16, (startCp - curCp).toInt)
      curCp = startCp
      if (curU16 < strLen) {
        val m = matchers(pid)
        m.region(curU16, strLen)
        if (m.lookingAt() && m.end() > m.start()) {
          starts += startCp.toInt
          pids += pid
          lens += str.codePointCount(m.start(), m.end())
        }
      }
      j += 1
    }
    if (starts.isEmpty) null
    else (starts.toArray, pids.toArray, lens.toArray)
  }

  /** Interpreted/generated shared path of [[RxSpansBcast]]. */
  def spans(rx: RxAutomaton, text: UTF8String): GenericArrayData = {
    val m = matches(rx, text)
    if (m == null) return new GenericArrayData(Array.empty[Any])
    val (starts, pids, lens) = m
    // candidates were verified in (start, pid) order already
    new GenericArrayData(starts.indices.map { k =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](pids(k).toLong, starts(k).toLong, lens(k).toLong)): Any
    }.toArray)
  }

  /** Interpreted/generated shared path of [[RxRedactBcast]]: union of
    * all match spans in codepoint space, each covered codepoint
    * rebuilt as `maskChar`. */
  def redact(rx: RxAutomaton, text: UTF8String, maskChar: Byte)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val m = matches(rx, text)
    if (m == null)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](text, 0L))
    val (starts, _, lens) = m
    // matches sorted by start: a single forward sweep carries the
    // union's current coverage horizon
    val str = text.toString
    val out = new java.lang.StringBuilder(str.length)
    var masked = 0L
    var mi = 0
    var horizon = -1L // last covered codepoint
    var cp = 0L
    var u16 = 0
    while (u16 < str.length) {
      while (mi < starts.length && starts(mi) <= cp) {
        val end = starts(mi).toLong + lens(mi) - 1L
        if (end > horizon) horizon = end
        mi += 1
      }
      val code = str.codePointAt(u16)
      if (cp <= horizon) { out.append(maskChar.toChar); masked += 1L }
      else out.appendCodePoint(code)
      cp += 1L
      u16 += Character.charCount(code)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(out.toString), masked))
  }
}
