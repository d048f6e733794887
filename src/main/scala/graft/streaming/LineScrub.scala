package graft.streaming

import graft.ext.Dedup
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous boilerplate-line stripping — the streaming leg of
  * [[Dedup.lineDedup]] (the RefinedWeb/C4 line screen), built on the
  * same [[ScrubEngine]] protocol as [[TileScrub]]: each micro-batch is
  * judged against the persisted distinct-document line index ∪ itself
  * ([[Dedup.lineDedupIncremental]] — corpus text never re-read), its
  * scrubbed rows append to a [[Warehouse]] fact, and its own line
  * index lands as the batch's partition.
  *
  * Ordering contract: a line's FIRST sighting publishes clean; once
  * its cumulative distinct-document count through a batch exceeds
  * `maxDocs`, later documents strip it — the continuous-ingestion
  * semantics (batch mode would also strip the early sightings).
  * The disjoint-batch contract of [[Dedup.mergeLineIndex]] applies:
  * each document arrives in exactly one batch.
  *
  * Crash protocol (exactly [[TileScrub]]'s, via [[ScrubEngine]]):
  * idempotent per-batch index overwrite, current-batch partition
  * excluded on read, intent/marker fact leg with anti-join replay.
  *
  * The streamed frame must carry (idCol, textCol, `year`). */
object LineScrub {

  private def family(maxDocs: Long) = ScrubFamily(
    subdir = "lines", keyCol = "line_hash", cntCol = "n_docs",
    statCols = Seq("n_lines", "dup_lines", "dup_ratio", "clean_text"),
    indexOf = Dedup.lineIndex(_, _, _),
    incremental = Dedup.lineDedupIncremental(_, _, _, _, maxDocs),
    // the judge equi-joins on line_hash: index rows for lines the batch
    // doesn't contain are irrelevant — bloom-prune them map-side with
    // the batch's own line hashes (the TileScrub pattern)
    bloomPrune = true)

  /** Seed the index with an existing corpus's lines (batch = -1). */
  def seedIndex(corpus: DataFrame, idCol: String, textCol: String,
      indexDir: String): Unit =
    ScrubEngine.seedIndex(family(1L), corpus, idCol, textCol, indexDir)

  /** One batch through the screen, callable directly (the
    * driver-chained form the x_stream_line gate replays) or from
    * [[run]]'s foreachBatch. Appends (idCol, year, n_lines, dup_lines,
    * dup_ratio, clean_text) to the fact. */
  def ingestBatch(batch: DataFrame, idCol: String, textCol: String,
      wh: Warehouse, fact: String, indexDir: String, batchId: Long,
      maxDocs: Long = 1L, dedupFact: Boolean = false): Unit =
    ScrubEngine.ingestBatch(family(maxDocs), batch, idCol, textCol,
      wh, fact, indexDir, batchId, dedupFact)

  def run(stream: DataFrame, idCol: String, textCol: String,
      wh: Warehouse, fact: String, indexDir: String, checkpointDir: String,
      maxDocs: Long = 1L): StreamingQuery =
    ScrubEngine.run(family(maxDocs), stream, idCol, textCol, wh, fact,
      indexDir, checkpointDir)

  /** Fold index partitions `batch <= upToBatchId` into `batch=-1`
    * (retention; horizon contract at [[TileScrub.compactIndex]]). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatchId: Long,
      maxDocs: Long = 1L): Int =
    ScrubEngine.compactIndex(spark, family(maxDocs), indexDir, upToBatchId)
}
