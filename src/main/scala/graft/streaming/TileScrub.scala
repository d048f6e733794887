package graft.streaming

import graft.ext.Dedup
import graft.snapshot.Warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
  * The streamed frame must carry (idCol, textCol, `year`). */
object TileScrub {

  /** Seed the index with an existing corpus's tiles (batch = -1). */
  def seedIndex(corpus: DataFrame, idCol: String, textCol: String,
      indexDir: String, tileWords: Int = 8): Unit =
    Dedup.tileIndex(corpus, idCol, textCol, tileWords)
      .write.mode("overwrite").parquet(s"$indexDir/tiles/batch=-1")

  /** The current index EXCLUDING `batchId`'s own partition, collapsed
    * to one row per tile hash. */
  private def readIndex(batch: DataFrame, indexDir: String,
      batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val tilesDir = s"$indexDir/tiles"
    val fs = new Path(tilesDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // the dir may exist but hold no batch=* partition (first batch, or a
    // crash erased the only one) — schema inference would die on it
    val hasParts = fs.exists(new Path(tilesDir)) &&
      fs.listStatus(new Path(tilesDir)).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (hasParts)
      spark.read.option("basePath", tilesDir).parquet(tilesDir)
        .filter(col("batch") =!= batchId)
        .groupBy(col("tile_hash")).agg(sum(col("n_refs")).as("n_refs"))
    else
      spark.emptyDataFrame
        .select(lit(0L).as("tile_hash"), lit(0L).as("n_refs")).limit(0)
  }

  /** One batch through the scrub, callable directly (the driver-chained
    * form the x_stream_substr gate replays) or from [[run]]'s
    * foreachBatch. Appends (idCol, year, n_tiles, dup_tiles, dup_ratio,
    * clean_text) to the fact and overwrites the batch's index
    * partition. `dedupFact` anti-joins ids already present in the fact
    * (crash-replay path only — steady state never probes the fact). */
  def ingestBatch(batch: DataFrame, idCol: String, textCol: String,
      wh: Warehouse, fact: String, indexDir: String, batchId: Long,
      tileWords: Int = 8, dedupFact: Boolean = false): Unit = {
    val index = readIndex(batch, indexDir, batchId)
    val scrubbed = Dedup.tileDuplicationIncremental(
        batch.select(col(idCol), col(textCol)), idCol, textCol,
        index, tileWords)
      .join(batch.select(col(idCol), col("year")), idCol)
      .select(col(idCol), col("year"), col("n_tiles"), col("dup_tiles"),
        col("dup_ratio"), col("clean_text"))
      .localCheckpoint(true)
    val factLeg =
      if (!dedupFact) scrubbed
      else wh.read(fact) match {
        case None => scrubbed
        case Some(existing) =>
          val years = scrubbed.select(col("year")).distinct()
            .collect().map(_.getLong(0))
          scrubbed.join(existing
            .filter(col("year").isin(years.map(Long.box): _*))
            .select(col(idCol)), Seq(idCol), "left_anti")
      }
    if (!factLeg.isEmpty) wh.append(fact, factLeg)
    Dedup.tileIndex(batch, idCol, textCol, tileWords)
      .write.mode("overwrite").parquet(s"$indexDir/tiles/batch=$batchId")
  }

  def run(stream: DataFrame, idCol: String, textCol: String,
      wh: Warehouse, fact: String, indexDir: String, checkpointDir: String,
      tileWords: Int = 8): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val markerRoot = new Path(checkpointDir, "_graft_markers")
        val fs = markerRoot.getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        fs.mkdirs(markerRoot)
        val marker = new Path(markerRoot, s"_batch_$batchId")
        val intent = new Path(markerRoot, s"_intent_$batchId")
        if (!fs.exists(marker)) {
          val crashReplay = fs.exists(intent)
          if (!crashReplay) fs.create(intent, true).close()
          ingestBatch(batch, idCol, textCol, wh, fact, indexDir, batchId,
            tileWords, dedupFact = crashReplay)
          fs.create(marker, true).close()
          fs.delete(intent, false)
        }
        ()
      }
      .start()
}
