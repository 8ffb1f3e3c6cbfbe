package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level text primitives for the document pipeline.
  *
  * Every helper is built from codegen'd Spark built-ins only (no UDFs)
  * and is deliberately expressible 1:1 in ANSI-ish SQL so the DuckDB
  * oracle can replicate each operator bit-for-bit:
  *
  *  - tokens: single-space split (the corpus is pre-normalized); empty
  *    tokens dropped on both sides.
  *  - hash56: the first 56 bits of md5 as a non-negative BIGINT — the
  *    one 64-bit-safe integer hash both engines can compute identically
  *    (Spark `conv(substring(md5, 1, 14), 16, 10)`, DuckDB
  *    `CAST('0x' || substr(md5, 1, 14) AS BIGINT)`).
  */
object TextOps {

  /** Non-empty tokens of a single-space-separated text column. When the
    * session registered [[graft.functions.GraftExtensions]], the native
    * one-pass [[graft.functions.Tokens]] kernel is used (no regex, no
    * intermediate empty tokens); results are identical either way. */
  def tokens(text: Column): Column =
    if (nativeTokens)
      call_function(graft.functions.GraftExtensions.TokensName, text)
    else hofTokens(text)

  /** Builtin-only tokenizer — regex split + non-empty filter. */
  def hofTokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  private def nativeTokens: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession.exists { s =>
      try s.catalog.functionExists(graft.functions.GraftExtensions.TokensName)
      catch { case scala.util.control.NonFatal(_) => false }
    }

  /** Visible text of an HTML column — the WET extraction step
    * ([[graft.functions.HtmlText]]: tag strip, script/style/head
    * content drop, comment drop, entity decode, block-break + collapse
    * normal form). Requires [[graft.functions.GraftExtensions]] on the
    * session; there is no builtin composition that can express the
    * state machine. */
  def htmlToText(html: Column): Column = {
    val name = graft.functions.GraftExtensions.HtmlTextName
    val registered =
      org.apache.spark.sql.SparkSession.getActiveSession.exists { s =>
        try s.catalog.functionExists(name)
        catch { case scala.util.control.NonFatal(_) => false }
      }
    require(registered,
      s"$name is not registered - attach graft.functions.GraftExtensions")
    call_function(name, html)
  }

  /** RFC 3986-normalized URL ([[graft.functions.UrlCanon]]: scheme/
    * host lowercase, fragment drop, default-port strip, dot-segment
    * resolution, percent-encoding normalization) — the key-normal form
    * URL-level crawl dedup and frontier joins key on. Requires
    * [[graft.functions.GraftExtensions]] on the session; dot-segment
    * resolution has no builtin composition. */
  def canonicalizeUrl(url: Column): Column = {
    val name = graft.functions.GraftExtensions.UrlCanonName
    val registered =
      org.apache.spark.sql.SparkSession.getActiveSession.exists { s =>
        try s.catalog.functionExists(name)
        catch { case scala.util.control.NonFatal(_) => false }
      }
    require(registered,
      s"$name is not registered - attach graft.functions.GraftExtensions")
    call_function(name, url)
  }

  /** Unicode normal form for cross-document comparison: NFC canonical
    * composition + root-locale lowercase ([[graft.functions.TextNorm]]
    * — no builtin can express NFC, so the kernel is required, the
    * [[canonicalizeUrl]] contract). Normalize BEFORE hashing/shingling:
    * precomposed vs combining-mark spellings of the same word
    * otherwise fragment every dedup/count key. */
  def normalizeText(text: Column): Column = {
    val name = graft.functions.GraftExtensions.TextNormName
    val registered =
      org.apache.spark.sql.SparkSession.getActiveSession.exists { s =>
        try s.catalog.functionExists(name)
        catch { case scala.util.control.NonFatal(_) => false }
      }
    require(registered,
      s"$name is not registered - attach graft.functions.GraftExtensions")
    call_function(name, text)
  }

  /** All n-token shingles (with duplicates, in positional order);
    * empty array when the document has fewer than n tokens. When the
    * session registered [[graft.functions.GraftExtensions]], the native
    * codegen'd [[graft.functions.ShingleSeq]] kernel is used; the HOF
    * composition is the extension-free fallback. Both produce identical
    * arrays (same join, same ordering, same empty-on-short semantics),
    * so the choice never affects oracle parity — only speed. */
  def shingleSeq(toks: Column, n: Int): Column =
    if (nativeShingles)
      call_function(graft.functions.GraftExtensions.ShingleSeqName, toks, lit(n))
    else hofShingleSeq(toks, n)

  /** `transform`/`slice`/`concat_ws` shingles — builtin-only fallback. */
  def hofShingleSeq(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  private def nativeShingles: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession.exists { s =>
      try s.catalog.functionExists(graft.functions.GraftExtensions.ShingleSeqName)
      catch { case scala.util.control.NonFatal(_) => false }
    }

  /** Distinct shingle set of a document. */
  def shingles(toks: Column, n: Int): Column = array_distinct(shingleSeq(toks, n))

  /** First 56 bits of md5(s) as a non-negative long. Stable across
    * engines and platforms (md5 is byte-defined), cheap enough for the
    * hot path (one md5 per shingle), and 56 bits keeps every derived
    * product `a * (h % p) + b` inside 63 bits. When the session
    * registered [[graft.functions.GraftExtensions]], the native
    * [[graft.functions.Hash56]] kernel is used (digest bytes -> long,
    * no hex round-trip); values are identical either way. */
  def hash56(s: Column): Column =
    if (nativeHash56)
      call_function(graft.functions.GraftExtensions.Hash56Name, s)
    else hofHash56(s)

  /** Builtin-only hash56 — md5 hex, slice, radix-16 parse. */
  def hofHash56(s: Column): Column =
    conv(substring(md5(s), 1, 14), 16, 10).cast("long")

  private def nativeHash56: Boolean =
    org.apache.spark.sql.SparkSession.getActiveSession.exists { s =>
      try s.catalog.functionExists(graft.functions.GraftExtensions.Hash56Name)
      catch { case scala.util.control.NonFatal(_) => false }
    }

  /** Modulus for the MinHash permutation family. */
  val HashP: Long = 1000000007L

  /** Banded LSH bucket keys over per-hash min columns: band b's key is
    * `"b:m_(b*r):...:m_(b*r+r-1)"` with r = mins.length / bands. Shared
    * by the batch ([[Dedup.minHashNearDupsFromSets]]) and streaming
    * ([[graft.streaming.Streaming.streamingNearDups]]) near-dup
    * operators so the bucket format cannot drift between them. */
  def bandKeyCols(mins: Seq[Column], bands: Int): Seq[Column] = {
    require(bands > 0 && mins.length % bands == 0,
      s"bands ($bands) must divide the signature width (${mins.length})")
    val rows = mins.length / bands
    (0 until bands).map { b =>
      val parts = lit(b.toString) +:
        (0 until rows).map(r => mins(b * rows + r).cast("string"))
      concat_ws(":", parts: _*)
    }
  }

  /** j-th universal-hash parameters (aj, bj); aj reduced mod P first so
    * aj * (h mod P) + bj stays < 2^63. */
  def hashParams(j: Int): (Long, Long) =
    (((j + 1).toLong * 2654435761L) % HashP, ((j + 1).toLong * 40503L) % HashP)
}
