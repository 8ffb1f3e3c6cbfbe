package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Frozen Aho–Corasick automaton over UTF-8 BYTES — built once per
  * executor JVM from the broadcast pattern set (a process-level cache
  * keyed by broadcast id — see [[AcScanBcast.cachedScan]] — so every
  * generated-class instance and interpreted task shares ONE build;
  * advice r12: addMutableState init alone would rebuild per
  * task/partition, a multi-second, tens-of-MB rebuild at the 1M-needle
  * ceiling), shared by the interpreted and generated paths of
  * [[AcScanBcast]]. Matching on raw bytes is
  * codepoint-exact for valid UTF-8: a pattern's first byte is a lead
  * byte (0x00–0x7F, 0xC2–0xF4) and continuation bytes live in
  * 0x80–0xBF, so a byte-level match can never start (or end)
  * mid-codepoint.
  *
  * Layout: trie edges live in one open-addressing long→int table
  * (key = node << 8 | byte — no 256-wide per-node rows, so memory is
  * O(total pattern bytes), not O(nodes × alphabet)); `fail` is the
  * classic BFS failure link; `dictFail` short-circuits the failure
  * chain to the nearest output-bearing node, so per-position match
  * collection is O(#matches at that position), not O(depth); outputs
  * are a per-node linked list (`outHead`/`outPid`/`outNext`) so
  * duplicate patterns each keep their own slot. Plain public final
  * fields — the generated Java reads them directly. */
final class AcAutomaton(
    val fail: Array[Int],
    val dictFail: Array[Int],
    val outHead: Array[Int],
    val outPid: Array[Int],
    val outNext: Array[Int],
    val edgeKeys: Array[Long],
    val edgeVals: Array[Int],
    val mask: Int,
    val nPatterns: Int,
    val patLen: Array[Int]) extends Serializable {

  /** Child of `node` on byte `b` (0..255), or -1. */
  def edge(node: Int, b: Int): Int = {
    val key = (node.toLong << 8) | b
    var i = (AcAutomaton.mix(key) & mask).toInt
    while (true) {
      val k = edgeKeys(i)
      if (k == key) return edgeVals(i)
      if (k == -1L) return -1
      i = (i + 1) & mask
    }
    -1
  }
}

object AcAutomaton {
  private[functions] def mix(key: Long): Long = {
    val h = key * 0x9E3779B97F4A7C15L
    h ^ (h >>> 32)
  }
}

/** Occurrence counts of a BROADCAST string pattern set in one text
  * value — the CHARACTER-level sibling of [[PhraseSetHitsBcast]]'s
  * token-phrase gate, for blocklist / needle-set scans where patterns
  * are raw substrings (slurs, license boilerplate, secret prefixes,
  * canary strings) rather than token n-grams: returns `counts(pid)` =
  * number of positions where pattern `pid` ends a match (overlapping
  * and nested matches all counted), in ONE Aho–Corasick pass per row
  * regardless of pattern count.
  *
  * The naive spelling is |patterns| `instr`/`locate` scans per row —
  * linear plan growth AND linear re-scans; a blocklist runs to
  * thousands of entries. Here the set rides one broadcast handle, the
  * automaton is built once per executor, and each row is a single
  * O(bytes + matches) walk. Like the other *Bcast kernels the
  * expression carries only the broadcast HANDLE; constructed via the
  * sql-namespace column bridge ([[graft.text.Blocklist]]). */
case class AcScanBcast(
    child: Expression,
    bc: Broadcast[Array[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_ac_scan_bcast requires a string column, got ${t.sql}")
    }

  @transient private lazy val auto: AcAutomaton = AcScanBcast.cachedScan(bc)

  override def nullSafeEval(textV: Any): Any =
    AcScanBcast.hits(auto, textV.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val bcRef = ctx.addReferenceObj("acPatternsBc", bc,
        classOf[Broadcast[Array[String]]].getName)
      val cls = AcScanBcast.getClass.getName.stripSuffix("$")
      val a = ctx.addMutableState("graft.functions.AcAutomaton", "acAuto",
        v => s"$v = $cls.cachedScan($bcRef);")
      s"""
         |${ev.value} = $cls.hits($a, $text);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): AcScanBcast =
    copy(child = c)

  override def prettyName: String = "graft_ac_scan_bcast"
}

/** REDACTION through the same broadcast automaton — the PII-scrub /
  * canary-strip spelling of the blocklist scan: every codepoint
  * covered by ANY needle match is replaced with one `maskChar`
  * (matches are codepoint-aligned — see [[AcAutomaton]] — so a
  * multibyte character is always masked whole, never torn into
  * invalid UTF-8). Masking the UNION of all match spans is the safe
  * redaction semantic: overlapping and nested needles scrub
  * everything any needle touches, and the output is independent of
  * pattern order. One O(bytes + matches) pass per row; the span
  * union resolves in one backward sweep, so even pathologically
  * overlapping matches stay linear. Returns struct<redacted: string,
  * n_masked: bigint> — the masked-codepoint count rides along so
  * callers don't re-derive it from string arithmetic. */
case class AcRedactBcast(
    child: Expression,
    bc: Broadcast[Array[String]],
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
        s"graft_ac_redact_bcast requires a string column, got ${t.sql}")
    }

  @transient private lazy val auto: AcAutomaton = AcScanBcast.cachedScan(bc)

  override def nullSafeEval(textV: Any): Any =
    AcScanBcast.redact(auto, textV.asInstanceOf[UTF8String], maskChar)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val bcRef = ctx.addReferenceObj("acPatternsBc", bc,
        classOf[Broadcast[Array[String]]].getName)
      val cls = AcScanBcast.getClass.getName.stripSuffix("$")
      val a = ctx.addMutableState("graft.functions.AcAutomaton", "acAuto",
        v => s"$v = $cls.cachedScan($bcRef);")
      s"""
         |${ev.value} = $cls.redact($a, $text, (byte) $maskChar);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): AcRedactBcast =
    copy(child = c)

  override def prettyName: String = "graft_ac_redact_bcast"
}

/** Match SPANS through the broadcast automaton — the forensic face of
  * the blocklist scan: every (pattern_id, start) pair where a needle
  * matches, as CHARACTER offsets (0-based codepoints, so downstream
  * `substring`-style tooling lands exactly on the match in both
  * engines' char space). One O(bytes + matches) pass; the output
  * array is sorted by (start, pattern_id) so the value is a pure
  * function of the text + set, independent of walk internals.
  * Returns array<struct<pattern_id: bigint, start: bigint>>. */
case class AcSpansBcast(
    child: Expression,
    bc: Broadcast[Array[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pattern_id", LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("start", LongType,
        nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_ac_spans_bcast requires a string column, got ${t.sql}")
    }

  @transient private lazy val auto: AcSpansAutomaton =
    AcScanBcast.cachedSpans(bc)

  override def nullSafeEval(textV: Any): Any =
    AcScanBcast.spans(auto, textV.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val bcRef = ctx.addReferenceObj("acPatternsBc", bc,
        classOf[Broadcast[Array[String]]].getName)
      val cls = AcScanBcast.getClass.getName.stripSuffix("$")
      val a = ctx.addMutableState("graft.functions.AcSpansAutomaton",
        "acSpansAuto",
        v => s"$v = $cls.cachedSpans($bcRef);")
      s"""
         |${ev.value} = $cls.spans($a, $text);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): AcSpansBcast =
    copy(child = c)

  override def prettyName: String = "graft_ac_spans_bcast"
}

/** The spans automaton: the scan automaton plus each pattern's length
  * in CODEPOINTS (byte lengths live on the automaton itself). */
final class AcSpansAutomaton(
    val auto: AcAutomaton,
    val patCharLen: Array[Int]) extends Serializable

/** The replace automaton: the scan automaton plus the replacement
  * byte strings, frozen together per executor. */
final class AcReplaceAutomaton(
    val auto: AcAutomaton,
    val reps: Array[Array[Byte]]) extends Serializable

/** Leftmost-longest multi-pattern REPLACEMENT through the broadcast
  * automaton — the canonicalization spelling of the needle scan
  * (alias → canonical form, typo → fix, banned term → substitute):
  * scanning left to right, at each position the LONGEST needle
  * starting there is replaced (ties in length are the same substring,
  * i.e. duplicate needles — the first one listed wins) and the scan
  * resumes after it; everything else copies verbatim. This is the
  * classic sed/str.replace semantics lifted to a whole dictionary in
  * ONE O(bytes + matches) pass — a fold of per-needle replace calls
  * is both slower (|needles| passes) and WRONG (later replacements
  * see earlier ones' output, so the result depends on needle order
  * and can cascade: "ab"→"bc" then "bc"→"x" turns "ab" into "x").
  * Returns struct<canonical: string, n_replaced: bigint>. */
case class AcReplaceBcast(
    child: Expression,
    bc: Broadcast[Array[Array[String]]])
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
        s"graft_ac_replace_bcast requires a string column, got ${t.sql}")
    }

  @transient private lazy val auto: AcReplaceAutomaton =
    AcScanBcast.cachedReplace(bc)

  override def nullSafeEval(textV: Any): Any =
    AcScanBcast.replace(auto, textV.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val bcRef = ctx.addReferenceObj("acMappingsBc", bc,
        classOf[Broadcast[Array[Array[String]]]].getName)
      val cls = AcScanBcast.getClass.getName.stripSuffix("$")
      val a = ctx.addMutableState("graft.functions.AcReplaceAutomaton",
        "acReplaceAuto",
        v => s"$v = $cls.cachedReplace($bcRef);")
      s"""
         |${ev.value} = $cls.replace($a, $text);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): AcReplaceBcast =
    copy(child = c)

  override def prettyName: String = "graft_ac_replace_bcast"
}

object AcScanBcast {

  /** Per-JVM automaton cache keyed by (kind, broadcast id): one build
    * per executor process regardless of how many task threads /
    * generated-class instances / interpreted expressions reference the
    * same broadcast pattern set (advice r12 — the addMutableState init
    * alone rebuilt per generated-class instance). Frozen automata are
    * immutable after build, so sharing across task threads is safe.
    * Bounded: past [[MaxCachedAutomata]] distinct sets the cache
    * clears (a whole-cache reset, not LRU — distinct long-lived
    * pattern sets per executor are few in practice, and a rare rebuild
    * beats tracking access order on the hot path). */
  private val MaxCachedAutomata = 32
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def cached[T <: AnyRef](key: String, make: => T): T = {
    if (cache.size > MaxCachedAutomata) cache.clear()
    cache.computeIfAbsent(key, _ => make).asInstanceOf[T]
  }

  /** Content fingerprint of a pattern set (FNV-1a 64 with per-string
    * separators): part of every automaton cache key because broadcast
    * ids restart from 0 per SparkContext, so a JVM hosting successive
    * contexts (local mode, test harnesses, embedded drivers) could
    * otherwise serve a stale automaton built for a DIFFERENT pattern
    * set under a reused id — silent wrong matches (advice r13). Costs
    * O(total pattern bytes) once per expression-instance init, noise
    * next to the automaton build it guards. */
  private[functions] def fingerprint(parts: Iterator[String]): Long = {
    var h = 0xcbf29ce484222325L
    def mix(b: Int): Unit = { h ^= b.toLong; h *= 0x100000001b3L }
    parts.foreach { s =>
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        mix(c & 0xFF)
        mix((c >> 8) & 0xFF)
        i += 1
      }
      mix(0x1F) // string separator: ("ab","c") != ("a","bc")
    }
    h
  }

  /** The scan automaton for `bc`, built once per executor JVM. */
  def cachedScan(bc: Broadcast[Array[String]]): AcAutomaton =
    cached(s"scan:${bc.id}:${fingerprint(bc.value.iterator)}",
      build(bc.value))

  /** The spans automaton for `bc`, built once per executor JVM. */
  def cachedSpans(bc: Broadcast[Array[String]]): AcSpansAutomaton =
    cached(s"spans:${bc.id}:${fingerprint(bc.value.iterator)}",
      buildSpans(bc.value))

  /** The replace automaton for `bc`, built once per executor JVM.
    * Fingerprints the FLATTENED strings so the per-string 0x1F
    * separator applies between pattern and replacement too (advice
    * r14: joining each inner array erased that boundary for inputs
    * containing the join character, so distinct replace dictionaries
    * could share a fingerprint -- exactly the stale-automaton case
    * this guard exists to prevent). */
  def cachedReplace(bc: Broadcast[Array[Array[String]]]): AcReplaceAutomaton =
    cached(s"replace:${bc.id}:${fingerprint(
        bc.value.iterator.flatMap(_.iterator))}",
      buildReplace(bc.value))

  /** Build the spans automaton: the scan automaton plus codepoint
    * lengths per pattern. */
  def buildSpans(patterns: Array[String]): AcSpansAutomaton =
    new AcSpansAutomaton(build(patterns),
      patterns.map(p => p.codePointCount(0, p.length)))

  /** Shared by the interpreted and generated paths of
    * [[AcSpansBcast]]: the scan walk carries a codepoint counter
    * (incremented at every UTF-8 lead byte), each match END yields
    * start = chars − patCharLen, and the collected pairs sort by
    * (start, pattern_id) before packing. */
  def spans(sa: AcSpansAutomaton, text: UTF8String): GenericArrayData = {
    val auto = sa.auto
    val n = text.numBytes()
    val buf = new scala.collection.mutable.ArrayBuffer[Long]()
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
          // pack (start, pid) into one long for a cheap exact sort:
          // both fit 31 bits (starts < 2^31 chars, pids < 2^31)
          buf += ((chars - sa.patCharLen(pid)) << 31) | pid.toLong
          e = auto.outNext(e)
        }
        t = auto.dictFail(t)
      }
      i += 1
    }
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr.map { packed =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](packed & ((1L << 31) - 1), packed >>> 31)): Any
    })
  }

  /** Build the replace automaton: `raw(0)` = patterns, `raw(1)` =
    * their replacements (parallel arrays — the two-row layout keeps
    * the broadcast and the generated code free of tuple types). */
  def buildReplace(raw: Array[Array[String]]): AcReplaceAutomaton = {
    require(raw.length == 2 && raw(0).length == raw(1).length,
      "mappings must be two parallel arrays [patterns, replacements]")
    new AcReplaceAutomaton(build(raw(0)),
      raw(1).map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Growable open-addressing start → packed(len, pid) map for the
    * replace walk: match candidates are recorded SPARSELY (memory
    * O(#matches), not two dense Int arrays sized to the text — advice
    * r12: 8 scratch bytes per input byte made one huge document
    * inflate per-row memory far past the redact path's footprint).
    * Value packing orders exactly by the leftmost-longest rule:
    * `len << 31 | (Int.MaxValue - pid)` — a bigger packed value is a
    * longer needle, ties resolve to the LOWEST pattern id (the
    * first-listed duplicate). -1 is the empty sentinel (packed values
    * are always >= 0: len >= 1, pid <= Int.MaxValue). */
  private final class BestStarts(expected: Int) {
    private var cap = {
      var c = 16
      while (c < expected * 2) c <<= 1
      c
    }
    private var mask = cap - 1
    private var keys = {
      val k = new Array[Int](cap)
      java.util.Arrays.fill(k, -1)
      k
    }
    private var vals = new Array[Long](cap)
    private var n = 0

    def offer(start: Int, len: Int, pid: Int): Unit = {
      val packed = (len.toLong << 31) | (Int.MaxValue - pid).toLong
      var i = (AcAutomaton.mix(start.toLong) & mask).toInt
      while (true) {
        val k = keys(i)
        if (k == start) {
          if (packed > vals(i)) vals(i) = packed
          return
        }
        if (k == -1) {
          keys(i) = start
          vals(i) = packed
          n += 1
          if (n * 2 > cap) grow()
          return
        }
        i = (i + 1) & mask
      }
    }

    /** packed best at `start`, or -1. */
    def get(start: Int): Long = {
      var i = (AcAutomaton.mix(start.toLong) & mask).toInt
      while (true) {
        val k = keys(i)
        if (k == start) return vals(i)
        if (k == -1) return -1L
        i = (i + 1) & mask
      }
      -1L
    }

    private def grow(): Unit = {
      val ok = keys
      val ov = vals
      cap <<= 1
      mask = cap - 1
      keys = new Array[Int](cap)
      java.util.Arrays.fill(keys, -1)
      vals = new Array[Long](cap)
      var j = 0
      while (j < ok.length) {
        val k = ok(j)
        if (k != -1) {
          var i = (AcAutomaton.mix(k.toLong) & mask).toInt
          while (keys(i) != -1) i = (i + 1) & mask
          keys(i) = k
          vals(i) = ov(j)
        }
        j += 1
      }
    }
  }

  /** Shared by the interpreted and generated paths of
    * [[AcReplaceBcast]]: one AC walk records, per START position, the
    * longest needle beginning there (length tie → lowest pattern id,
    * i.e. the first-listed duplicate) in a sparse O(#matches) map
    * ([[BestStarts]]); the rebuild walks left to right consuming a
    * replacement where a best match starts and copying bytes verbatim
    * elsewhere. Matches are codepoint-aligned, so the resume position
    * never lands mid-codepoint. */
  def replace(ra: AcReplaceAutomaton, text: UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val auto = ra.auto
    val n = text.numBytes()
    val best = new BestStarts(16)
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
          val pid = auto.outPid(e)
          val l = auto.patLen(pid)
          best.offer(i - l + 1, l, pid)
          e = auto.outNext(e)
        }
        t = auto.dictFail(t)
      }
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream(n)
    var replaced = 0L
    i = 0
    while (i < n) {
      val packed = best.get(i)
      if (packed >= 0L) {
        val pid = Int.MaxValue - (packed & 0x7FFFFFFFL).toInt
        out.write(ra.reps(pid), 0, ra.reps(pid).length)
        replaced += 1L
        i += (packed >>> 31).toInt
      } else {
        out.write(text.getByte(i).toInt)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromBytes(out.toByteArray), replaced))
  }

  /** Build the frozen automaton: trie insert, BFS failure links,
    * dict-suffix short circuits, then freeze edges into one
    * open-addressing table. Build cost is O(total pattern bytes);
    * runs once per executor off the broadcast value. */
  def build(patterns: Array[String]): AcAutomaton = {
    require(patterns.nonEmpty, "pattern set must be non-empty")
    val pats = patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    require(pats.forall(_.length > 0), "patterns must be non-empty strings")

    // growable trie with a build-time edge map
    val edges = new java.util.HashMap[java.lang.Long, Integer]()
    var nNodes = 1
    val outHeadB = scala.collection.mutable.ArrayBuffer(-1)
    val outPidB = scala.collection.mutable.ArrayBuffer.empty[Int]
    val outNextB = scala.collection.mutable.ArrayBuffer.empty[Int]
    var pid = 0
    while (pid < pats.length) {
      val p = pats(pid)
      var node = 0
      var i = 0
      while (i < p.length) {
        val key = java.lang.Long.valueOf((node.toLong << 8) | (p(i) & 0xFF))
        val child = edges.get(key)
        if (child == null) {
          edges.put(key, nNodes)
          outHeadB += -1
          node = nNodes
          nNodes += 1
        } else node = child.intValue()
        i += 1
      }
      outPidB += pid
      outNextB += outHeadB(node)
      outHeadB(node) = outPidB.length - 1
      pid += 1
    }

    // freeze edges into open addressing (power-of-two, keys >= 0)
    var cap = 4
    while (cap < edges.size * 2) cap <<= 1
    val edgeKeys = Array.fill(cap)(-1L)
    val edgeVals = new Array[Int](cap)
    val mask = cap - 1
    val it = edges.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val key = e.getKey.longValue()
      var i = (AcAutomaton.mix(key) & mask).toInt
      while (edgeKeys(i) != -1L) i = (i + 1) & mask
      edgeKeys(i) = key
      edgeVals(i) = e.getValue.intValue()
    }

    val outHead = outHeadB.toArray
    val fail = new Array[Int](nNodes)
    val dictFail = Array.fill(nNodes)(-1)
    val auto = new AcAutomaton(fail, dictFail, outHead,
      outPidB.toArray, outNextB.toArray, edgeKeys, edgeVals, mask,
      patterns.length, pats.map(_.length))

    // BFS failure links off the frozen edge table
    val queue = new java.util.ArrayDeque[Integer]()
    var b = 0
    while (b < 256) {
      val c = auto.edge(0, b)
      if (c != -1) { fail(c) = 0; queue.add(c) }
      b += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      dictFail(u) =
        if (outHead(fail(u)) != -1) fail(u) else dictFail(fail(u))
      var bb = 0
      while (bb < 256) {
        val v = auto.edge(u, bb)
        if (v != -1) {
          var f = fail(u)
          var nxt = auto.edge(f, bb)
          while (nxt == -1 && f != 0) { f = fail(f); nxt = auto.edge(f, bb) }
          fail(v) = if (nxt == -1 || nxt == v) 0 else nxt
          queue.add(v)
        }
        bb += 1
      }
    }
    auto
  }

  /** Shared by the interpreted and generated paths: one byte walk,
    * counts(pid) = match END positions of pattern pid (overlaps and
    * nested patterns all counted). */
  def hits(auto: AcAutomaton, text: UTF8String): GenericArrayData = {
    val out = new Array[Long](auto.nPatterns)
    val n = text.numBytes()
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
        while (e != -1) { out(auto.outPid(e)) += 1L; e = auto.outNext(e) }
        t = auto.dictFail(t)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Shared by the interpreted and generated paths of
    * [[AcRedactBcast]]: mask every codepoint any match covers. The
    * walk records, per byte, the LONGEST needle whose match ends
    * there (the union of spans ending at one byte is the longest
    * one); a backward sweep then resolves the union of all spans in
    * exactly one pass — byte b is covered iff some match ends at
    * j >= b with j − b < reach(j), which the sweep carries as a
    * decrementing `need` counter, so even pathologically overlapping
    * matches stay O(n). The rebuild emits one maskChar per covered
    * CODEPOINT (matches are codepoint-aligned, so coverage never
    * tears a multibyte char). Returns (redacted, n_masked) as an
    * InternalRow. */
  def redact(auto: AcAutomaton, text: UTF8String, maskChar: Byte)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = text.numBytes()
    val reach = new Array[Int](n) // longest match ending at each byte
    var state = 0
    var i = 0
    while (i < n) {
      val b = text.getByte(i) & 0xFF
      var s = state
      var nxt = auto.edge(s, b)
      while (nxt == -1 && s != 0) { s = auto.fail(s); nxt = auto.edge(s, b) }
      state = if (nxt == -1) 0 else nxt
      var maxLen = 0
      var t = if (auto.outHead(state) != -1) state else auto.dictFail(state)
      while (t != -1) {
        var e = auto.outHead(t)
        while (e != -1) {
          val l = auto.patLen(auto.outPid(e))
          if (l > maxLen) maxLen = l
          e = auto.outNext(e)
        }
        t = auto.dictFail(t)
      }
      reach(i) = maxLen
      i += 1
    }
    val covered = new Array[Boolean](n)
    var need = 0
    i = n - 1
    while (i >= 0) {
      if (reach(i) > need) need = reach(i)
      if (need > 0) { covered(i) = true; need -= 1 }
      i -= 1
    }
    // rebuild per codepoint: lead bytes are < 0x80 or >= 0xC0
    val out = new Array[Byte](n)
    var w = 0
    var masked = 0L
    i = 0
    while (i < n) {
      val b = text.getByte(i)
      val isLead = (b & 0xFF) < 0x80 || (b & 0xFF) >= 0xC0
      if (isLead) {
        if (covered(i)) { out(w) = maskChar; w += 1; masked += 1L }
        else { out(w) = b; w += 1 }
      } else if (!covered(i)) { out(w) = b; w += 1 }
      // covered continuation bytes drop: their codepoint's single
      // maskChar was emitted at the lead byte
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromBytes(java.util.Arrays.copyOf(out, w)),
        masked))
  }
}
