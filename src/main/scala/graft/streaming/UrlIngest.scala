package graft.streaming

import graft.ext.UrlFilter
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous crawl-ingest URL dedup — the streaming leg of
  * [[UrlFilter.annotateUrlDup]] (the canonical-URL screen that runs
  * BEFORE any text-level dedup): each arriving batch keeps only the
  * documents whose canonical URL has never been seen — unseen in the
  * persisted index (earlier batches / the seeded corpus) AND held by
  * the batch's min-id document for that canonical (first-sighting-keeps,
  * the streaming analog of the batch min-id policy — a URL's first
  * arrival publishes; batch mode over the union would pick the same
  * document when ids grow with arrival order). Keepers append to a
  * [[Warehouse]] fact with their `canon_url`; the batch's canonical
  * counts land as one `batch=<id>` index partition. Documents with no
  * parseable URL are ALWAYS kept with a NULL canon (the [[UrlFilter]]
  * stance — dropping them would bias the corpus).
  *
  * Index rows are `(url_hash = xxhash64(canon_url), n_refs)` — 8-byte
  * probe keys at crawl scale, the tile/line-index discipline, same
  * 2^-64 collision stance. Crash protocol identical to
  * [[TileScrub]]/[[LineScrub]] via the shared [[ScrubEngine]]:
  * idempotent per-batch index overwrite, current-batch partition
  * excluded on read (replays recompute identical verdicts),
  * intent/marker fact leg with anti-join replay.
  *
  * The streamed frame must carry (idCol, urlCol, `year`). */
object UrlIngest {

  /** (url_hash, n_refs) canonical-URL counts of a frame — the persisted
    * index unit (unparseable URLs contribute nothing). */
  def urlIndex(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(UrlFilter.canonicalizeUrl(col(urlCol)).as("__cu"))
      .filter(col("__cu").isNotNull)
      .groupBy(xxhash64(col("__cu")).as("url_hash"))
      .agg(count(lit(1)).as("n_refs"))

  /** The batch's novel rows against a prior index: min-id holder of
    * each index-unseen canonical, plus every unparseable-URL row. */
  def novelAgainst(batch: DataFrame, idCol: String, urlCol: String,
      index: DataFrame): DataFrame = {
    val withCanon = batch
      .withColumn("canon_url", UrlFilter.canonicalizeUrl(col(urlCol)))
      .withColumn("__uh", xxhash64(col("canon_url")))
    val keepers = withCanon.filter(col("canon_url").isNotNull)
      .groupBy(col("__uh")).agg(min(col(idCol)).as("__keep_id"))
      .join(index.select(col("url_hash").as("__uh"), col("n_refs")),
        Seq("__uh"), "left")
      .filter(col("n_refs").isNull)
      .select(col("__uh"), col("__keep_id"))
    withCanon.filter(col("canon_url").isNotNull)
      .join(keepers, Seq("__uh"))
      .filter(col(idCol) === col("__keep_id"))
      .select(col(idCol), col("canon_url"))
      .unionByName(withCanon.filter(col("canon_url").isNull)
        .select(col(idCol), col("canon_url")))
  }

  private val fam = ScrubFamily(
    subdir = "urls", keyCol = "url_hash", cntCol = "n_refs",
    statCols = Seq("canon_url"),
    indexOf = urlIndex(_, _, _),
    incremental = novelAgainst(_, _, _, _),
    // novelty is an equi-join on url_hash: bloom-prune the index read
    // with the batch's own hashes (the TileScrub pattern)
    bloomPrune = true)

  /** Seed the index with an already-ingested corpus (batch = -1). */
  def seedIndex(corpus: DataFrame, idCol: String, urlCol: String,
      indexDir: String): Unit =
    ScrubEngine.seedIndex(fam, corpus, idCol, urlCol, indexDir)

  /** One batch through the screen, callable directly (the driver-chained
    * form the x_stream_urls gate replays) or from [[run]]'s
    * foreachBatch. Appends (idCol, year, canon_url) for the novel rows
    * only. */
  def ingestBatch(batch: DataFrame, idCol: String, urlCol: String,
      wh: Warehouse, fact: String, indexDir: String, batchId: Long,
      dedupFact: Boolean = false): Unit =
    ScrubEngine.ingestBatch(fam, batch, idCol, urlCol, wh, fact,
      indexDir, batchId, dedupFact)

  def run(stream: DataFrame, idCol: String, urlCol: String,
      wh: Warehouse, fact: String, indexDir: String,
      checkpointDir: String): StreamingQuery =
    ScrubEngine.run(fam, stream, idCol, urlCol, wh, fact, indexDir,
      checkpointDir)

  /** Fold index partitions `batch <= upToBatchId` into `batch=-1`
    * (retention; horizon contract at [[TileScrub.compactIndex]]). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatchId: Long): Int =
    ScrubEngine.compactIndex(spark, fam, indexDir, upToBatchId)
}
