package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlText.extractString

class HtmlTextSpec extends AnyFunSuite with SparkSpec {

  test("tags strip, block tags break lines, inline tags do not") {
    assert(extractString("<p>one</p><p>two</p>") == "one\ntwo")
    assert(extractString("a <b>bold</b> word") == "a bold word")
    assert(extractString("<h1>T</h1><div>x</div><span>y</span>") == "T\nx\ny")
  }

  test("script, style and head content drop entirely") {
    assert(extractString(
      "<head><title>t</title></head><body>x</body>") == "x")
    assert(extractString(
      "<script>if (a < b) { run('<p>'); }</script>after") == "after")
    assert(extractString("<style>p { color: red; }</style>z") == "z")
    // close tag of a DIFFERENT element does not end the drop
    assert(extractString("<script>x</span>y</script>ok") == "ok")
  }

  test("comments drop, including markup inside") {
    assert(extractString("a<!-- <p>hidden</p> -->b") == "ab")
    assert(extractString("a<!-- unterminated") == "a")
  }

  test("entities decode; unknown entities pass through") {
    assert(extractString("1 &lt; 2 &amp;&amp; 3 &gt; 2") == "1 < 2 && 3 > 2")
    assert(extractString("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    assert(extractString("&#65;&#x42;&#x63;") == "ABc")
    assert(extractString("&copy; &bogus; &") == "&copy; &bogus; &")
    assert(extractString("a&nbsp;b") == "a b")
  }

  test("whitespace normal form: collapse runs, strip edges, drop blanks") {
    assert(extractString("  a   b\t\tc  ") == "a b c")
    assert(extractString("<p>  </p><p>x</p>") == "x")
    assert(extractString("l1\n\n\nl2") == "l1\nl2")
  }

  test("malformed input never throws: unclosed tags, bare <, empty") {
    assert(extractString("a < b and a<b") == "a < b and a")
    assert(extractString("<unclosed") == "")
    assert(extractString("") == "")
    // "<>" is not tag-like (no name): the '<' is literal text
    assert(extractString("<>x</>") == "<>x")
  }

  test("the native kernel is registered and codegen-evaluable") {
    import spark.implicits._
    val df = Seq("<p>a&amp;b</p>").toDF("h")
      .selectExpr("graft_html_text(h) AS t")
    assert(df.collect().head.getString(0) == "a&b")
    // null html -> null text, like every unary string builtin
    val n = Seq[Option[String]](None).toDF("h")
      .selectExpr("graft_html_text(h) AS t").collect().head
    assert(n.isNullAt(0))
  }
}
