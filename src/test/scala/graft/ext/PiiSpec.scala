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

  test("formatted PANs: space/dash/mixed gaps mask as one span") {
    val got = mask(Seq(
      "pay 4111 1111 1111 1111 now",      // spaced 16 -> one mask
      "pay 4111-1111-1111-1111 now",      // dashed
      "pay 4111-1111 1111-1111 now",      // mixed gaps
      "amex 3782 822463 10005 ok",        // 4-6-5 grouping, valid 15
      "bad 4111 1111 1111 1112 now",      // checksum fails -> untouched
      "short 4111 1111 held"))            // 8 digits -> untouched
    assert(got(0) == "pay <CARD> now")
    assert(got(1) == "pay <CARD> now")
    assert(got(2) == "pay <CARD> now")
    assert(got(3) == "amex <CARD> ok")
    assert(got(4) == "bad 4111 1111 1111 1112 now")
    assert(got(5) == "short 4111 1111 held")
  }

  test("failed chains re-judge their contiguous runs; double gaps break chains") {
    val got = mask(Seq(
      // stray number folds into the chain (18 digits, fails), but the
      // contiguous PAN inside still masks on its own
      "total 25 4111111111111111 now",
      // the documented greedy-chain miss: formatted PAN + adjacent number
      "total 25 4111 1111 1111 1111 now",
      // two spaces are not a gap: the formatted PAN stands alone
      "total 25  4111 1111 1111 1111 now",
      // chain of 20+ digits fails even though a 16-digit prefix is valid
      "big 4111 1111 1111 1111 00000 run"))
    assert(got(0) == "total 25 <CARD> now")
    assert(got(1) == "total 25 4111 1111 1111 1111 now")
    assert(got(2) == "total 25  <CARD> now")
    assert(got(3) == "big 4111 1111 1111 1111 00000 run")
  }

  test("separators=false keeps the contiguous-only contract; nulls pass through") {
    val got = Seq((0L, "4111 1111 1111 1111 and 4111111111111111"))
      .toDF("id", "t")
      .select(Pii.maskCards(col("t"), separators = false)).collect()(0)
    assert(got.getString(0) == "4111 1111 1111 1111 and <CARD>")
    val n = Seq((1L, null: String)).toDF("id", "t")
      .select(Pii.maskCards(col("t"))).collect()(0)
    assert(n.isNullAt(0))
  }

  private def scrub1(t: String): String =
    Seq((0L, t)).toDF("id", "t")
      .select(Pii.scrub(col("t"))).collect()(0).getString(0)

  test("scrub: emails masked, malformed shapes survive") {
    assert(scrub1("write a.b+tag@sub.example.co.uk today") ==
      "write <EMAIL> today")
    assert(scrub1("not user@@host nor a@b nor @example.com") ==
      "not user@@host nor a@b nor @example.com")
  }

  test("scrub: IPv4 octet-validated and word-bounded") {
    assert(scrub1("srv 192.168.0.1 and 255.255.255.255 up") ==
      "srv <IP> and <IP> up")
    assert(scrub1("version 999.1.2.3 build 1.2.3.4567") ==
      "version 999.1.2.3 build 1.2.3.4567")
  }

  test("scrub: international phones masked, domestic out of contract") {
    assert(scrub1("call +41 79 123 45 67 or +390212345678 now") ==
      "call <PHONE> or <PHONE> now")
    assert(scrub1("call (555) 123-4567 or 044 123 45 67") ==
      "call (555) 123-4567 or 044 123 45 67")
  }

  test("scrub order: the + prefix claims a Luhn-valid phone before the card stage") {
    // 4111 1111 1111 1111 IS Luhn-valid: with the + prefix it is a
    // phone; bare it is a card
    assert(scrub1("tel +4111 1111 1111 1111 pan 4111 1111 1111 1111") ==
      "tel <PHONE> pan <CARD>")
    // and email digits never feed the number maskers
    assert(scrub1("mail 4111111111111111@x.example.com ok") ==
      "mail <EMAIL> ok")
    assert(scrub1(null) == null)
  }
}
