package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native URL canonicalization — the key-normalization step of
  * URL-level crawl dedup ("have we fetched this page before?"), where
  * the same resource hides behind `HTTP://Example.COM:80/a/../b`,
  * `http://example.com/b`, and `http://example.com/%62#frag`. The
  * WARC source (SURVEY §2.1) lands `target_uri` raw; exact dedup,
  * Bloom gates, and frontier joins all key on THIS normal form.
  *
  * RFC 3986 normalizations, one deterministic pass, no java.net.URI
  * (whose parser rejects real-world crawl URLs):
  *  - scheme and host lowercase (§6.2.2.1);
  *  - fragment dropped (it never reaches the server);
  *  - default ports stripped (http:80, https:443, §6.2.3);
  *  - dot-segments resolved in the path (`/a/./b/../c` → `/a/c`,
  *    §5.2.4; `..` at the root is dropped, never escapes);
  *  - empty path with an authority → `/` (§6.2.3);
  *  - percent-encoding normalized in path and query (§6.2.2.1-2):
  *    `%xx` hex uppercased, unreserved octets (ALPHA / DIGIT / `-._~`)
  *    decoded; malformed `%` sequences pass through literally;
  *  - userinfo, query order, and duplicate slashes are preserved —
  *    they can be semantically significant.
  *
  * Strings without a `scheme://` prefix pass through unchanged (the
  * caller decides what a relative reference means). Registered as
  * `graft_url_canon` via [[GraftExtensions]]; there is no builtin
  * composition that can express dot-segment resolution.
  */
case class UrlCanon(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_url_canon requires a string argument, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    UrlCanon.canonicalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanon.canonicalize($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlCanon =
    copy(child = newChild)

  override def prettyName: String = "graft_url_canon"
}

object UrlCanon {

  def canonicalize(u: UTF8String): UTF8String =
    UTF8String.fromString(canonicalize(u.toString))

  def canonicalize(url: String): String = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) return url
    val scheme = url.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')
        || !scheme.head.isLetter) return url

    val rest = url.substring(schemeEnd + 3)
    // authority ends at the first /, ?, or #
    val authEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => rest.length
      case i => i
    }
    val auth = rest.substring(0, authEnd)
    val afterAuth = rest.substring(authEnd)

    // split userinfo@host:port; host lowercases, default ports drop
    val (userinfo, hostPort) = auth.lastIndexOf('@') match {
      case -1 => ("", auth)
      case i => (auth.substring(0, i + 1), auth.substring(i + 1))
    }
    // IPv6 literals keep their brackets; the port colon is the one
    // after the closing bracket (or the only one in a reg-name)
    val portIdx = {
      val close = hostPort.lastIndexOf(']')
      val c = hostPort.lastIndexOf(':')
      if (c > close) c else -1
    }
    val (host, port) =
      if (portIdx == -1) (hostPort, "")
      else (hostPort.substring(0, portIdx), hostPort.substring(portIdx))
    val normPort = (scheme, port) match {
      case ("http", ":80") | ("https", ":443") | (_, ":") => ""
      case _ => port
    }
    val normAuth =
      userinfo + host.toLowerCase(java.util.Locale.ROOT) + normPort

    // split path / query, drop fragment
    val hash = afterAuth.indexOf('#')
    val noFrag = if (hash == -1) afterAuth else afterAuth.substring(0, hash)
    val qIdx = noFrag.indexOf('?')
    val (rawPath, rawQuery) =
      if (qIdx == -1) (noFrag, "")
      else (noFrag.substring(0, qIdx), noFrag.substring(qIdx))

    val path = removeDotSegments(percentNormalize(rawPath))
    val normPath = if (path.isEmpty) "/" else path
    scheme + "://" + normAuth + normPath + percentNormalize(rawQuery)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over a (possibly empty)
    * path starting with '/' or empty. */
  private[functions] def removeDotSegments(path: String): String = {
    if (path.isEmpty) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    // split keeping empties: "/a//b" -> ["", "a", "", "b"]
    val segs = path.split("/", -1)
    val absolute = path.startsWith("/")
    var i = if (absolute) 1 else 0
    while (i < segs.length) {
      segs(i) match {
        case "." => // drop; a trailing "." leaves a trailing slash
          if (i == segs.length - 1) out += ""
        case ".." =>
          if (out.nonEmpty) out.remove(out.length - 1)
          if (i == segs.length - 1) out += ""
        case s => out += s
      }
      i += 1
    }
    (if (absolute) "/" else "") + out.mkString("/")
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Uppercase %xx hex; decode unreserved octets; leave malformed
    * sequences untouched. */
  private[functions] def percentNormalize(s: String): String = {
    if (s.indexOf('%') == -1) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (v < 128 && isUnreserved(v.toChar)) b.append(v.toChar)
        else b.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else {
        b.append(c)
        i += 1
      }
    }
    b.toString
  }
}
