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
