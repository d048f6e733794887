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

  private def canon(urls: String*): Seq[Option[String]] =
    urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), UrlFilter.canonicalizeUrl(col("url")).as("c"))
      .orderBy(col("id"))
      .collect().map(r => Option(r.getString(1))).toSeq

  test("canonicalizeUrl: case, default ports, fragment, empty path") {
    val got = canon(
      "HTTPS://Example.COM",                  // case + empty path
      "http://example.com:80/a",              // default port strips
      "https://example.com:443/a",            // default port strips
      "https://example.com:8443/a",           // exotic port survives
      "http://example.com:443/a",             // 443 is NOT http's default
      "https://example.com/a#frag",           // fragment drops
      "https://user:pw@example.com/a",        // userinfo drops
      "nonsense")
    assert(got(0).contains("https://example.com/"))
    assert(got(1).contains("http://example.com/a"))
    assert(got(2).contains("https://example.com/a"))
    assert(got(3).contains("https://example.com:8443/a"))
    assert(got(4).contains("http://example.com:443/a"))
    assert(got(5).contains("https://example.com/a"))
    assert(got(6).contains("https://example.com/a"))
    assert(got(7).isEmpty)
  }

  test("canonicalizeUrl: tracking params drop, survivors sort, empties vanish") {
    val got = canon(
      "https://e.com/p?utm_source=x&b=2&a=1",
      "https://e.com/p?a=1&b=2&UTM_CAMPAIGN=y&gclid=z",
      "https://e.com/p?b=2&&a=1&",            // empty fragments drop
      "https://e.com/p?utm_only=1",           // all params tracked -> no ?
      "https://e.com/p?a=2#s?fake=1")         // ? after # is fragment text
    assert(got(0).contains("https://e.com/p?a=1&b=2"))
    assert(got(1).contains("https://e.com/p?a=1&b=2"))
    assert(got(2).contains("https://e.com/p?a=1&b=2"))
    assert(got(3).contains("https://e.com/p"))
    assert(got(4).contains("https://e.com/p?a=2"))
  }

  test("domainProfile + screen: mean rule, flag rule, null hosts never blocked") {
    val docs = Seq(
      // good.com: scores 800k/600k (mean 700k), nothing flagged
      (1L, "https://good.com/a", 800000L, false),
      (2L, "https://good.com/b", 600000L, false),
      // low.com: mean 300k -> blocked by the mean rule
      (3L, "https://low.com/a", 400000L, false),
      (4L, "https://low.com/b", 200000L, false),
      // spam.com: great mean but 2/3 flagged -> blocked by the flag rule
      (5L, "https://spam.com/a", 900000L, true),
      (6L, "https://spam.com/b", 900000L, true),
      (7L, "https://spam.com/c", 900000L, false),
      // unparseable: low score but never blocked
      (8L, "garbage", 0L, true))
      .toDF("id", "url", "score_micro", "flagged")
    val prof = UrlFilter.domainProfile(docs, "id", "url",
      "score_micro", "flagged")
      .collect().map(r => Option(r.getAs[String]("host")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("score_micro_sum"),
          r.getAs[Long]("n_flagged"))).toMap
    assert(prof(Some("good.com")) == ((2L, 1400000L, 0L)))
    assert(prof(Some("spam.com")) == ((3L, 2700000L, 2L)))
    assert(prof(None) == ((1L, 0L, 1L))) // reported, not dropped
    val got = UrlFilter.annotateDomainScreen(docs, "id", "url",
      "score_micro", "flagged",
      minMeanScoreMicro = 500000L, maxFlagMicro = 500000L)
      .select("id", "domain_blocked").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> true, 4L -> true,
      5L -> true, 6L -> true, 7L -> true, 8L -> false))
    val kept = UrlFilter.dropLowQualityDomains(docs, "id", "url",
      "score_micro", "flagged", 500000L, 500000L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 8L))
  }

  test("domain screen thresholds are exact at the boundary") {
    // mean exactly 500000 is NOT below; flag ratio exactly 1/2 is NOT above
    val docs = Seq(
      (1L, "https://edge.com/a", 400000L, true),
      (2L, "https://edge.com/b", 600000L, false))
      .toDF("id", "url", "score_micro", "flagged")
    val got = UrlFilter.annotateDomainScreen(docs, "id", "url",
      "score_micro", "flagged", 500000L, 500000L)
      .select("id", "domain_blocked").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> false))
  }

  test("annotateUrlDup keeps min id per canonical group, nulls always kept") {
    val docs = Seq(
      1L -> "https://e.com/x?utm_source=a",
      2L -> "HTTPS://E.COM/x",                // same canonical as 1
      3L -> "https://e.com:443/x#top",        // same canonical as 1
      4L -> "https://e.com/y",                // its own group
      5L -> "garbage",                        // unparseable: kept
      6L -> "junk")                           // unparseable: kept
      .toDF("id", "url")
    val got = UrlFilter.annotateUrlDup(docs, "id", "url")
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> true, 6L -> true))
    val kept = UrlFilter.dropUrlDuplicates(docs, "id", "url")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L, 6L))
  }
}
