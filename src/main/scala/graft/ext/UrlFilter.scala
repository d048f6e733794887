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
}
