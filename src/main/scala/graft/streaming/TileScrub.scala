package graft.streaming

import graft.ext.Dedup
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous exact-substring scrubbing — the streaming leg of the tile
  * family: each arriving micro-batch is judged against the PERSISTED
  * tile index ∪ itself ([[Dedup.tileDuplicationIncremental]] — corpus
  * text is never re-read), its scrubbed rows (duplicated tiles
  * stripped from `clean_text`) append to a [[Warehouse]] fact, and its
  * own tile counts land in the index — so later batches see every
  * earlier batch's tiles.
  *
  * Index layout: `indexDir/tiles/batch=<id>/` parquet partitions of
  * `(tile_hash, n_refs)` — ONE partition per accepted batch
  * (`batch=-1` for a [[seedIndex]] corpus). The partitioned layout is
  * what makes the crash protocol exact where [[NovelIngest]]'s
  * append-only index could only be harmless-on-duplicate:
  *
  *  - the index APPEND is `overwrite` of the batch's own partition —
  *    idempotent under any number of replays;
  *  - the index READ excludes the current batch's partition (partition-
  *    pruned), so a replay after a half- or fully-written index leg
  *    recomputes IDENTICAL verdicts (the batch's own occurrences enter
  *    via the incremental operator's batch-side counts, exactly once);
  *  - the fact leg uses the [[QualityGate]] intent/marker pair under
  *    `checkpointDir/_graft_markers` (per-stream state, never a shared
  *    input dir): a dangling intent anti-joins already-present ids out
  *    of the append.
  *
  * Every crash window therefore yields a single-copy fact AND exact
  * tile counts — replay-inflated counts (the window where a replayed
  * batch would double-count its own tiles and strip every unique one)
  * cannot occur by construction.
  *
  * Ordering contract: batch-mode [[Dedup.tileDuplication]] judges every
  * doc against the WHOLE corpus; this stream judges each doc against
  * batches ≤ its own (a tile's first sighting is clean, later sightings
  * strip) — the continuous-ingestion semantics, shared with
  * [[NovelIngest]]. Read-side compaction: the index read re-aggregates
  * per-batch partials (`groupBy(tile_hash).sum`) — at many thousands of
  * batches, periodically rewrite the dir as one `batch=-1` partition
  * (the read is a map-side-combinable aggregate either way).
  *
  * The streamed frame must carry (idCol, textCol, `year`).
  *
  * The protocol machinery (partitioned index, intent/marker fact leg,
  * foreachBatch loop) lives once in [[ScrubEngine]], shared with the
  * line-unit sibling [[LineScrub]]. */
object TileScrub {

  private def family(tileWords: Int) = ScrubFamily(
    subdir = "tiles", keyCol = "tile_hash", cntCol = "n_refs",
    statCols = Seq("n_tiles", "dup_tiles", "dup_ratio", "clean_text"),
    indexOf = Dedup.tileIndex(_, _, _, tileWords),
    incremental = Dedup.tileDuplicationIncremental(_, _, _, _, tileWords),
    // the converted family for batch-keyed bloom pruning: the judge
    // only consumes index tiles the batch also contains, so a 16 KiB
    // filter over the batch's tile hashes discards the rest of the
    // index scan before the collapse shuffle — per-batch exchange
    // volume tracks the BATCH, not the corpus (same pattern applies to
    // LineScrub/UrlIngest verbatim)
    bloomPrune = true)

  /** Seed the index with an existing corpus's tiles (batch = -1). */
  def seedIndex(corpus: DataFrame, idCol: String, textCol: String,
      indexDir: String, tileWords: Int = 8): Unit =
    ScrubEngine.seedIndex(family(tileWords), corpus, idCol, textCol,
      indexDir)

  /** One batch through the scrub, callable directly (the driver-chained
    * form the x_stream_substr gate replays) or from [[run]]'s
    * foreachBatch. Appends (idCol, year, n_tiles, dup_tiles, dup_ratio,
    * clean_text) to the fact and overwrites the batch's index
    * partition. `dedupFact` anti-joins ids already present in the fact
    * (crash-replay path only — steady state never probes the fact). */
  def ingestBatch(batch: DataFrame, idCol: String, textCol: String,
      wh: Warehouse, fact: String, indexDir: String, batchId: Long,
      tileWords: Int = 8, dedupFact: Boolean = false): Unit =
    ScrubEngine.ingestBatch(family(tileWords), batch, idCol, textCol,
      wh, fact, indexDir, batchId, dedupFact)

  def run(stream: DataFrame, idCol: String, textCol: String,
      wh: Warehouse, fact: String, indexDir: String, checkpointDir: String,
      tileWords: Int = 8): StreamingQuery =
    ScrubEngine.run(family(tileWords), stream, idCol, textCol, wh, fact,
      indexDir, checkpointDir)

  /** Fold index partitions `batch <= upToBatchId` into `batch=-1` —
    * the small-file retention story (one directory per trigger grows
    * forever otherwise). Safe ONLY for batches the stream's checkpoint
    * can no longer replay (id < the committed horizon): replayable
    * batches keep excluding their own partition, and the folded rows
    * they probe are count-identical ([[ScrubEngine.compactIndex]];
    * crash-safe staged swap). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatchId: Long, tileWords: Int = 8): Int =
    ScrubEngine.compactIndex(spark, family(tileWords), indexDir,
      upToBatchId)
}
