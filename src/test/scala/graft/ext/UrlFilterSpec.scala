package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("hostOf: schemes, userinfo, ports, case, unparseable") {
    val got = Seq(
      1L -> "https://Example.COM/path?q=1",
      2L -> "http://user:pw@a.b.org:8080/x",
      3L -> "ftp://files.example.net",
      4L -> "not a url",
      5L -> "//schemeless.example.com/x")
      .toDF("id", "url")
      .select(col("id"), UrlFilter.hostOf(col("url")).as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains("example.com"))
    assert(got(2L).contains("a.b.org"))
    assert(got(3L).contains("files.example.net"))
    assert(got(4L).isEmpty)
    assert(got(5L).isEmpty) // scheme-relative: no scheme, no parse
  }

  test("suffixChain walks every dot-suffix") {
    val got = Seq("a.b.example.com").toDF("h")
      .select(UrlFilter.suffixChain(col("h")).as("s"))
      .as[Seq[String]].collect()(0)
    assert(got == Seq("a.b.example.com", "b.example.com", "example.com", "com"))
  }

  test("blocklist blocks the domain and its subdomains, never lookalikes") {
    val docs = Seq(
      1L -> "https://example.com/a",
      2L -> "https://deep.sub.example.com/b",
      3L -> "https://notexample.com/c",     // no dot boundary: unblocked
      4L -> "https://safe.org/d",
      5L -> "garbage")                      // unparseable: unblocked
      .toDF("id", "url")
    val bl = Seq("example.com", "blocked.net").toDF("domain")
    val got = UrlFilter.annotateBlocked(docs, "id", "url", bl)
      .select("id", "blocked").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false,
      4L -> false, 5L -> false))
    val kept = UrlFilter.dropBlocked(docs, "id", "url", bl)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L))
  }
}
