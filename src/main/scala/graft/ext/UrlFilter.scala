package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain blocklist filtering — the RefinedWeb-style screen
  * (Penedo et al. 2023 run the UT1 blocklists; every web-corpus
  * pipeline runs some form of this before content-level quality):
  * extract the host, match it against a blocklist of domains where a
  * listed domain blocks itself AND every subdomain.
  *
  * The subdomain match is deliberately NOT a LIKE scan against the
  * blocklist (that is a cross join at 100 TB). Each host explodes into
  * its suffix chain — `a.b.example.com` → [a.b.example.com,
  * b.example.com, example.com, com] — and the block decision is one
  * EQUI-join of suffixes against the blocklist: linear in corpus rows ×
  * label depth (hosts have ~2–5 labels), key-partitioned, with the
  * join strategy AQE's choice (UT1-sized lists broadcast; a
  * million-domain list still hash-joins fine).
  *
  * Host extraction is one anchored regex (scheme, optional userinfo,
  * host up to port/path/query), lowercased; rows with no parseable host
  * pass through unblocked with a null host (document and count them —
  * silently dropping unparseable URLs would bias the corpus). */
object UrlFilter {

  /** Lowercased host of a URL, null when unparseable. */
  def hostOf(url: Column): Column = {
    val h = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1)
    when(h === "", lit(null)).otherwise(lower(h))
  }

  /** The host's suffix chain (every dot-suffix including itself). */
  def suffixChain(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /** Annotate `df` with `host` and `blocked` (any suffix of the host is
    * in `blocklist`'s `domainCol`). One explode + one equi-join + one
    * per-id rollup; unparseable hosts are never blocked. */
  def annotateBlocked(df: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame, domainCol: String = "domain"): DataFrame = {
    val id = col(idCol)
    val withHost = df.withColumn("host", hostOf(col(urlCol)))
    val hits = withHost
      .filter(col("host").isNotNull)
      .select(id, explode(suffixChain(col("host"))).as("__sfx"))
      .join(blocklist.select(lower(col(domainCol)).as("__sfx")), "__sfx")
      .select(id).distinct()
      .withColumn("blocked", lit(true))
    withHost.join(hits, Seq(idCol), "left")
      .withColumn("blocked", coalesce(col("blocked"), lit(false)))
  }

  /** [[annotateBlocked]] then keep the unblocked rows. */
  def dropBlocked(df: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame, domainCol: String = "domain"): DataFrame =
    annotateBlocked(df, idCol, urlCol, blocklist, domainCol)
      .filter(!col("blocked")).drop("blocked")

  /** Query-string keys stripped by [[canonicalizeUrl]]: the click/session
    * trackers that vary per impression without changing the page (the
    * reason one article shows up under thousands of distinct URLs in a
    * crawl). `utm_*` is matched as a prefix; the rest exactly. */
  val trackingParams: Seq[String] =
    Seq("gclid", "fbclid", "msclkid", "mc_eid", "igshid")

  /** Canonical form of a URL for crawl-level dedup — the screen that
    * runs BEFORE any text-level dedup (one page fetched under thousands
    * of tracker-stamped URLs re-enters the corpus that many times; a
    * canonical-URL pass removes the bulk for the price of string
    * algebra, no text ever read). Transformations, in order:
    *
    *   - scheme and host lowercase (RFC 3986 §6.2.2.1 case rules);
    *   - userinfo and fragment drop (never part of the resource);
    *   - default ports strip (`http…:80`, `https…:443`; literal-string
    *     compare, so an exotic `:080` spelling survives — documented);
    *   - empty path becomes `/` (RFC 3986 §6.2.3);
    *   - query parameters: empty fragments (`a=1&&b=2`) drop, tracking
    *     keys ([[trackingParams]] exact + the `utm_` prefix,
    *     case-insensitive key match) drop, the survivors SORT
    *     byte-lexicographically and rejoin — parameter order is the
    *     other degree of freedom crawlers see.
    *
    * Dot-segment path normalization (`/a/../b`) and percent-decoding are
    * deliberately out of contract: both change semantics on hostile
    * inputs and neither varies per-impression. NULL when the URL has no
    * parseable `scheme://host`. Every step is a codegen'd regex/array
    * builtin — linear in crawl bytes, zero shuffles. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = hostOf(url)
    val port = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/:?#]+:([0-9]+)", 1)
    val path = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val keyOf = (p: Column) => lower(substring_index(p, "=", 1))
    val kept = filter(split(query, "&"), p =>
      length(p) > 0 &&
        !keyOf(p).startsWith("utm_") &&
        !keyOf(p).isInCollection(trackingParams))
    val portPart = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val pathPart = when(path === "", lit("/")).otherwise(path)
    val queryPart = when(size(kept) > 0,
      concat(lit("?"), array_join(array_sort(kept), "&"))).otherwise(lit(""))
    when(host.isNull, lit(null))
      .otherwise(concat(scheme, lit("://"), host, portPart, pathPart,
        queryPart))
  }

  /** Annotate each row with `canon_url` ([[canonicalizeUrl]]) and
    * `kept`: within each canonical-URL group the lowest `idCol` row is
    * the keeper (the deterministic min-id policy shared with the dedup
    * family); rows with an unparseable URL keep `canon_url` NULL and are
    * always kept (dropping them would bias the corpus — same stance as
    * [[annotateBlocked]]). One hash-agg for the keeper table plus one
    * AQE-planned join back — 8-byte-groupable at crawl scale because
    * the group key could be hashed, but the canonical TEXT is the
    * output users join on, so it stays the key here (canon strings are
    * bounded short; contrast the tile family where hashing pays). */
  def annotateUrlDup(df: DataFrame, idCol: String, urlCol: String):
      DataFrame = {
    val withCanon = df.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
    val keepers = withCanon.filter(col("canon_url").isNotNull)
      .groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("__keep_id"))
    withCanon.join(keepers, Seq("canon_url"), "left")
      .withColumn("kept",
        col("canon_url").isNull || col(idCol) === col("__keep_id"))
      .drop("__keep_id")
  }

  /** [[annotateUrlDup]] then keep the keepers: the crawl-level URL
    * dedup pass (step zero of the curation funnel when the corpus
    * arrives as fetched pages). */
  def dropUrlDuplicates(df: DataFrame, idCol: String, urlCol: String):
      DataFrame =
    annotateUrlDup(df, idCol, urlCol).filter(col("kept"))
      .drop("kept", "canon_url")

  /** Per-domain curation profile — the aggregation behind FineWeb-style
    * DOMAIN screens (Penedo '24 §domain filters; a spam farm shows up as
    * a whole host of low-quality near-dup pages long before any single
    * page looks anomalous): group documents by host and report
    * `n_docs`, the exact LONG sum of a caller micro-quantized quality
    * score (an LM `logprob_micro`, a classifier `prob_micro` — the
    * metric is the caller's), the count of a caller boolean flag
    * (near-dup membership, blocklist hit), and the display-only
    * `mean_score_micro` / `flag_ratio` doubles (each one IEEE division
    * of exact operands). Unparseable hosts group under NULL — reported,
    * never silently dropped. One hash-agg. */
  def domainProfile(df: DataFrame, idCol: String, urlCol: String,
      scoreMicroCol: String, flagCol: String): DataFrame =
    df.withColumn("host", hostOf(col(urlCol)))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(scoreMicroCol).cast("long")).as("score_micro_sum"),
        sum(col(flagCol).cast("long")).as("n_flagged"))
      .withColumn("mean_score_micro",
        col("score_micro_sum").cast("double") / col("n_docs"))
      .withColumn("flag_ratio",
        col("n_flagged").cast("double") / col("n_docs"))

  /** The domain SCREEN itself: annotate each document with `host` and
    * `domain_blocked` — true when its domain's mean score falls below
    * `minMeanScoreMicro` OR its flagged fraction exceeds
    * `maxFlagMicro` (micro-units, 1e6 = 100%). Both decisions are
    * EXACT integer cross-multiplications (`score_sum < min·n` /
    * `n_flagged·1e6 > max·n`) — no float threshold can waver at group
    * boundaries. Documents with no parseable host are never blocked
    * (the [[annotateBlocked]] stance). One profile hash-agg + one
    * host-keyed join back, AQE-planned. */
  def annotateDomainScreen(df: DataFrame, idCol: String, urlCol: String,
      scoreMicroCol: String, flagCol: String,
      minMeanScoreMicro: Long, maxFlagMicro: Long): DataFrame = {
    val prof = domainProfile(df, idCol, urlCol, scoreMicroCol, flagCol)
      .filter(col("host").isNotNull)
      .select(col("host"),
        (col("score_micro_sum") < col("n_docs") * lit(minMeanScoreMicro) ||
          col("n_flagged") * lit(1000000L) >
            col("n_docs") * lit(maxFlagMicro)).as("domain_blocked"))
    df.withColumn("host", hostOf(col(urlCol)))
      .join(prof, Seq("host"), "left")
      .withColumn("domain_blocked",
        coalesce(col("domain_blocked"), lit(false)))
  }

  /** [[annotateDomainScreen]] then keep the surviving documents. */
  def dropLowQualityDomains(df: DataFrame, idCol: String, urlCol: String,
      scoreMicroCol: String, flagCol: String,
      minMeanScoreMicro: Long, maxFlagMicro: Long): DataFrame =
    annotateDomainScreen(df, idCol, urlCol, scoreMicroCol, flagCol,
      minMeanScoreMicro, maxFlagMicro)
      .filter(!col("domain_blocked")).drop("domain_blocked", "host")
}
