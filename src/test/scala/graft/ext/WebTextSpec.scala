package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WebTextSpec extends SparkTestBase {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("h").select(WebText.htmlStrip(col("h")).as("t"))
      .as[String].head()

  test("htmlStrip removes tags, keeps text, spaces at tag boundaries") {
    assert(strip("<p>hello</p><p>world</p>") == "hello world")
    assert(strip("<b>bold</b> and <i>italic</i>") == "bold and italic")
  }

  test("htmlStrip drops script/style CONTENT, not just the tags") {
    assert(strip("<script>var x = 1;</script>keep") == "keep")
    assert(strip("<script type=\"text/javascript\">\nif (a < b) { f(); }\n</script>body") == "body")
    assert(strip("<style>p { color: red; }</style>text") == "text")
    // case-insensitive, multiline
    assert(strip("<SCRIPT>\nmulti\nline\n</SCRIPT>ok") == "ok")
  }

  test("htmlStrip removes comments including multiline") {
    assert(strip("a<!-- hidden -->b") == "a b")
    assert(strip("a<!--\nline1\nline2\n-->b") == "a b")
  }

  test("htmlStrip decodes the named entities, &amp; last") {
    assert(strip("Tom &amp; Jerry") == "Tom & Jerry")
    assert(strip("&lt;tag&gt;") == "<tag>")
    assert(strip("&quot;q&quot; &#39;a&#39; &apos;b&apos;") == "\"q\" 'a' 'b'")
    assert(strip("a&nbsp;b") == "a b")
    // double-encoded: &amp;lt; must decode to the literal text "&lt;"
    assert(strip("&amp;lt;") == "&lt;")
  }

  test("htmlStrip decodes numeric character references, decimal and " +
      "hex, case-insensitive x and digits (r14 verdict #3)") {
    assert(strip("caf&#233;") == "café")
    assert(strip("caf&#xE9;") == "café")
    assert(strip("caf&#Xe9;") == "café")
    assert(strip("&#19990;&#x754C;") == "世界")
    // astral plane rides surrogate pairs out
    assert(strip("&#x1F600;") == new String(Character.toChars(0x1F600)))
  }

  test("htmlStrip numeric refs: WHATWG end state — out-of-range and " +
      "surrogates to U+FFFD, C1 block through the cp1252 remap") {
    assert(strip("a&#1114112;b") == "a�b") // 0x110000 > max
    assert(strip("a&#x110000;b") == "a�b")
    assert(strip("a&#0;b") == "a�b")
    assert(strip("a&#xD800;b") == "a�b") // surrogate
    assert(strip("a&#999999999999999999999;b") == "a�b") // saturates
    assert(strip("n&#150;dash") == "n–dash") // C1 remap: en dash
    assert(strip("e&#133;") == "e…") // … via cp1252
    assert(strip("h&#129;x") == "h\u0081x") // cp1252 hole: pass through
    assert(strip("sp&#160;sp") == "sp sp") // NBSP lands as plain space
  }

  test("htmlStrip double-encoding order: &amp;#39; stays the literal " +
      "&#39;; malformed refs ship literally, never guessed") {
    assert(strip("&amp;#39;") == "&#39;")
    assert(strip("&amp;#x41;") == "&#x41;")
    assert(strip("&amp;copy;") == "&copy;")
    assert(strip("&#;x") == "&#;x") // no digits: literal
    assert(strip("&#x;x") == "&#x;x")
    assert(strip("&#12 34") == "&#12 34") // unterminated: literal
    assert(strip("&bogusname;") == "&bogusname;") // unknown name
    assert(strip("a & b") == "a & b") // bare ampersand
    assert(strip("tail&") == "tail&")
    assert(strip("tail&#") == "tail&#")
  }

  test("htmlStrip decodes the common named set beyond the six") {
    assert(strip("&copy;&reg;&trade;") == "©®™")
    assert(strip("a&hellip;b&mdash;c&ndash;d") == "a…b—c–d")
    assert(strip("&lsquo;q&rsquo; &ldquo;r&rdquo;") ==
      "‘q’ “r”")
    assert(strip("x&middot;y &deg;C") == "x·y °C")
  }

  test("htmlStrip collapses whitespace and is null/empty safe") {
    assert(strip("<div>\n  a  \n\t b \n</div>") == "a b")
    assert(strip("") == "")
    val r = Seq[(Int, String)]((1, null)).toDF("id", "h")
      .select(WebText.htmlStrip(col("h")).as("t")).as[(String)].head()
    assert(r == "")
  }

  test("htmlStrip end-to-end page") {
    val page = "<html><head><title>T</title><script>nav()</script></head>" +
      "<body><!-- menu --><p class=\"lead\">Alpha beta</p>" +
      "<div>Tom &amp; <b>Jerry</b> &lt;3</div></body></html>"
    assert(strip(page) == "T Alpha beta Tom & Jerry <3")
  }

  private def profile(s: String) =
    Seq((1L, s)).toDF("id", "t")
      .transform(WebText.scriptProfile(_, "id", "t"))
      .collect().head

  test("scriptProfile counts per script and picks the dominant") {
    val latin = profile("plain english text")
    assert(latin.getAs[String]("script") == "latin")
    assert(!latin.getAs[Boolean]("needs_chargram"))

    val han = profile("世界和平世界")
    assert(han.getAs[Long]("n_han") == 6L)
    assert(han.getAs[String]("script") == "han")
    assert(han.getAs[Boolean]("needs_chargram"))

    val ru = profile("привет мир")
    assert(ru.getAs[String]("script") == "cyrillic")
    assert(!ru.getAs[Boolean]("needs_chargram"))

    val jp = profile("こんにちはカタカナ")
    assert(jp.getAs[Long]("n_kana") == 9L)
    assert(jp.getAs[String]("script") == "kana")
  }

  test("scriptProfile: no letters -> unknown, not a crash") {
    val num = profile("123 456 !!")
    assert(num.getAs[String]("script") == "unknown")
    assert(num.getAs[Long]("n_letters") == 0L)
    assert(!num.getAs[Boolean]("needs_chargram"))
  }

  test("scriptProfile: mixed doc crosses the chargram threshold at >30% wsfree") {
    // 4 han letters vs 6 latin letters = 40% wsfree -> flagged
    val mixed = profile("abcdef 世界和平")
    assert(mixed.getAs[Boolean]("needs_chargram"))
    // 2 han vs 10 latin = 16.7% -> not flagged
    val mostly = profile("abcdefghij 世界")
    assert(!mostly.getAs[Boolean]("needs_chargram"))
  }

  private def respace(s: String): String =
    Seq(s).toDF("t").select(WebText.autoRespace(col("t")).as("r"))
      .as[String].head()

  test("autoRespace re-spaces CJK, passes latin through untouched") {
    assert(respace("世界和平") == "世 界 和 平")
    assert(respace("plain english text") == "plain english text")
    assert(respace("") == "")
  }

  test("autoRespace n=2 chunks pairs, tail kept") {
    val r = Seq("世界和平了").toDF("t")
      .select(WebText.autoRespace(col("t"), n = 2).as("r")).as[String].head()
    assert(r == "世界 和平 了")
  }
}
