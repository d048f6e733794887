package graft.streaming

import graft.ext.Cdc
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous CHUNK-LEVEL duplication scoring of a binary stream —
  * [[graft.ext.Cdc]]'s content-defined chunking as a [[ScrubEngine]]
  * family, the binary twin of [[TileScrub]]: each arriving batch's
  * documents are scored for how much of their byte content already
  * exists (in earlier batches / the seeded corpus / the batch itself)
  * at CHUNK granularity, so a re-upload with a prepended header or an
  * appended footer still scores ~1 duplicated (boundaries re-align
  * past the edit — the CDC property fixed tiles lack). The fact
  * records (id, year, n_chunks, dup_chunks, dup_ratio_micro); the
  * DROP policy is the caller's (threshold on dup_ratio_micro), the
  * engine only ever adds judgeable facts.
  *
  * Index = (chash, n_refs) occurrence counts, folded additively per
  * batch; batch-keyed bloom pruning applies (the judge only consumes
  * index rows whose chash the batch contains). Crash protocol is the
  * shared ScrubEngine one. */
object CdcScrub {

  private def family(maskBits: Int) = ScrubFamily(
    subdir = "chunks", keyCol = "chash", cntCol = "n_refs",
    statCols = Seq("n_chunks", "dup_chunks", "dup_ratio_micro"),
    indexOf = Cdc.chunkIndex(_, _, _, maskBits),
    incremental = Cdc.chunkDupIncremental(_, _, _, _, maskBits),
    bloomPrune = true)

  /** Seed the index with an existing corpus's chunks (batch = -1). */
  def seedIndex(corpus: DataFrame, idCol: String, contentCol: String,
      indexDir: String, maskBits: Int = 8): Unit =
    ScrubEngine.seedIndex(family(maskBits), corpus, idCol, contentCol,
      indexDir)

  /** One batch through the scorer, callable directly (the
    * x_stream_cdc gate's driver-chained form) or from [[run]]'s
    * foreachBatch. */
  def ingestBatch(batch: DataFrame, idCol: String, contentCol: String,
      wh: Warehouse, fact: String, indexDir: String, batchId: Long,
      maskBits: Int = 8, dedupFact: Boolean = false): Unit =
    ScrubEngine.ingestBatch(family(maskBits), batch, idCol, contentCol,
      wh, fact, indexDir, batchId, dedupFact)

  def run(stream: DataFrame, idCol: String, contentCol: String,
      wh: Warehouse, fact: String, indexDir: String, checkpointDir: String,
      maskBits: Int = 8): StreamingQuery =
    ScrubEngine.run(family(maskBits), stream, idCol, contentCol, wh,
      fact, indexDir, checkpointDir)

  /** Fold index partitions `batch <= upToBatchId` into `batch=-1`
    * (retention; horizon contract at [[TileScrub.compactIndex]]). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatchId: Long, maskBits: Int = 8): Int =
    ScrubEngine.compactIndex(spark, family(maskBits), indexDir,
      upToBatchId)
}
