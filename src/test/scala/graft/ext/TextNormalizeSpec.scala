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
}
