package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PiiSpec extends SparkTestBase {
  import spark.implicits._

  private def mask(texts: Seq[String]): Seq[String] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), Pii.maskCards(col("t")).as("m"))
      .collect().sortBy(_.getLong(0)).map(_.getString(1)).toSeq

  test("luhnValid: textbook vectors") {
    assert(Pii.luhnValid("4111111111111111"))   // Visa test PAN
    assert(Pii.luhnValid("79927398713"))        // classic example
    assert(!Pii.luhnValid("4111111111111112"))
    assert(!Pii.luhnValid("79927398714"))
  }

  test("masks only Luhn-valid 13-19 digit runs") {
    val got = mask(Seq(
      "pay 4111111111111111 now",        // valid 16 -> masked
      "ref 4111111111111112 held",       // bad checksum -> kept
      "code 79927398713 short",          // valid Luhn but 11 digits -> kept
      "big 41111111111111110000 run",    // 20 digits -> kept
      "two 4111111111111111 and 5500005555555559 cards"))
    assert(got(0) == "pay <CARD> now")
    assert(got(1) == "ref 4111111111111112 held")
    assert(got(2) == "code 79927398713 short")
    assert(got(3) == "big 41111111111111110000 run")
    assert(got(4) == "two <CARD> and <CARD> cards")
  }

  test("separator-broken runs are separate runs; nulls pass through") {
    val got = mask(Seq("4111 1111 1111 1111"))
    assert(got(0) == "4111 1111 1111 1111") // four 4-digit runs, untouched
    val n = Seq((1L, null: String)).toDF("id", "t")
      .select(Pii.maskCards(col("t"))).collect()(0)
    assert(n.isNullAt(0))
  }
}
