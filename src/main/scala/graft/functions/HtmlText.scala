package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native HTML → visible-text extraction — the WET step of a web-crawl
  * ingest pipeline (Common Crawl's WET files are exactly this applied
  * to each WARC response payload).
  *
  * One pass over the characters, no regex, no DOM:
  *  - tags are dropped (`<...>`), with `script`/`style`/`head`
  *    element CONTENT dropped too (case-insensitive match on the tag
  *    name, honoring the matching close tag);
  *  - HTML comments (`<!-- -->`) are dropped, including markup inside;
  *  - the five XML entities plus decimal/hex numeric character
  *    references are decoded (`&amp; &lt; &gt; &quot; &apos; &#NN;
  *    &#xHH;`); unknown entities pass through literally;
  *  - block-level open/close tags break the line; runs of whitespace
  *    collapse to one space; lines are trimmed and blank lines
  *    dropped, newline-joined — a deterministic, order-preserving
  *    normal form.
  *
  * Registered as `graft_html_text` via [[GraftExtensions]]. A
  * deliberately small, exactly-specified extractor: the point is a
  * deterministic Spark-native WET transform, not a browser.
  */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_html_text requires a string argument, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlText.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)

  override def prettyName: String = "graft_html_text"
}

object HtmlText {

  private val BlockTags = Set(
    "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "section",
    "article", "header", "footer", "form", "hr", "title")

  private val DropContent = Set("script", "style", "head")

  def extract(in: UTF8String): UTF8String =
    UTF8String.fromString(extractString(in.toString))

  def extractString(html: String): String = {
    val n = html.length
    val out = new StringBuilder(n / 2)
    var i = 0
    var dropUntil: String = null // lowercase tag whose close ends the drop

    def tagNameAt(start: Int): (String, Boolean) = {
      // start points AT '<'; returns (lowercase name, isClose)
      var j = start + 1
      val close = j < n && html.charAt(j) == '/'
      if (close) j += 1
      val b = new StringBuilder
      while (j < n && (html.charAt(j).isLetterOrDigit)) {
        b.append(Character.toLowerCase(html.charAt(j))); j += 1
      }
      (b.toString, close)
    }

    def appendBreak(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')

    while (i < n) {
      val c = html.charAt(i)
      val tagLike = c == '<' && i + 1 < n && {
        val d = html.charAt(i + 1)
        d.isLetter || d == '/' || d == '!'
      }
      if (tagLike) {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val (name, isClose) = tagNameAt(i)
          val end = html.indexOf('>', i + 1)
          if (dropUntil != null) {
            if (isClose && name == dropUntil) dropUntil = null
            i = if (end < 0) n else end + 1
          } else {
            if (!isClose && DropContent(name)) dropUntil = name
            if (BlockTags(name)) appendBreak()
            i = if (end < 0) n else end + 1
          }
        }
      } else if (dropUntil != null) {
        i += 1
      } else if (c == '&') {
        val (decoded, next) = entity(html, i)
        out.append(decoded); i = next
      } else {
        out.append(c); i += 1
      }
    }

    // collapse whitespace runs per line to one space, strip edge
    // spaces (spaces only -- NOT Java trim's <=0x20 sweep -- so the
    // normal form is replicable exactly in ANSI SQL via
    // regexp_replace + trim(x, ' ')), drop blanks, newline-join
    out.toString.split('\n').iterator
      .map(_.replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ")
        .stripPrefix(" ").stripSuffix(" "))
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /** Decode one character reference starting at `i` (which points at
    * '&'); returns (replacement, next index). Unknown entities pass
    * through as the literal '&'. */
  private def entity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", i + 1)
    val body = s.substring(i + 1, semi)
    body match {
      case "amp" => ("&", semi + 1)
      case "lt" => ("<", semi + 1)
      case "gt" => (">", semi + 1)
      case "quot" => ("\"", semi + 1)
      case "apos" => ("'", semi + 1)
      case "nbsp" => (" ", semi + 1)
      case b if b.length > 1 && b.charAt(0) == '#' =>
        try {
          val cp = if (b.charAt(1) == 'x' || b.charAt(1) == 'X')
            Integer.parseInt(b.substring(2), 16)
          else Integer.parseInt(b.substring(1))
          if (Character.isValidCodePoint(cp) && cp > 0)
            (new String(Character.toChars(cp)), semi + 1)
          else ("&", i + 1)
        } catch { case _: NumberFormatException => ("&", i + 1) }
      case _ => ("&", i + 1)
    }
  }
}
