package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(TextNormalize(col("t")).as("n"))
      .as[String].head()

  test("NFC composes combining sequences before lowercasing") {
    assert(norm("CaFé") == "café")     // e + acute -> é
    assert(norm("Äpfel") == "äpfel")   // A + diaeresis -> ä
  }

  test("whitespace runs collapse, edges trim, vertical tab included") {
    assert(norm("  a\t\tb \n c  ") == "a b c")
    assert(norm(" xY ") == "x y")
    assert(norm("\r\n") == "")
    assert(norm("") == "")
  }

  test("idempotent and null-safe") {
    val once = norm("  MiXeD́  Case\t")
    assert(norm(once) == once)
    val n = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(TextNormalize(col("t")).as("n")).collect().head
    assert(n.isNullAt(0))
  }

  test("matches the pre-dedup normalization contract on mixed input") {
    assert(norm("The  Quick\nBrown\tFox") == "the quick brown fox")
  }

  test("compat (NFKC) folds fullwidth, ligatures and super/subscripts") {
    def nk(s: String): String = TextNormalize.normalize(s, compat = true)
    assert(nk("\uFF21\uFF22\uFF23") == "abc")     // fullwidth A B C
    assert(nk("\uFB01le") == "file")              // ﬁ ligature
    assert(nk("x\u00B2") == "x2")                 // superscript two
    assert(nk("\u2460 item") == "1 item")         // circled one
    // canonical behavior unchanged: NFC-only inputs agree across modes
    assert(nk("CaFé x") == TextNormalize.normalize("CaFé x"))
    // Column form
    val got = Seq((1L, "\uFF28\uFF25\uFF2C\uFF2C\uFF2F")).toDF("id", "t")
      .select(TextNormalize.compat(col("t")).as("n"))
      .collect().head.getString(0)
    assert(got == "hello")
  }
}
