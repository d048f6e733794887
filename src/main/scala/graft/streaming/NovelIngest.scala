package graft.streaming

import graft.ext.Dedup
import graft.snapshot.Warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuously-deduped corpus ingestion — the end-to-end composition the
  * incremental pieces exist for: each arriving micro-batch of documents
  * is filtered to NOVEL ones ([[Dedup.filterNovel]]: near-dups of the
  * indexed corpus drop, within-batch clusters keep their root) against
  * the PERSISTED minhash index, the accepted documents append to a
  * [[Warehouse]] fact, and their index delta appends to the index tables
  * — so no batch ever re-reads, let alone re-shingles, the corpus.
  *
  * Index layout: two parquet dirs under `indexDir` (`bands`, `shingles`)
  * matching [[Dedup.MinhashIndex]]; the caller may pre-seed them via
  * [[seedIndex]]. Batch replay (micro-batch retry after a crash) is
  * guarded by a per-batch marker file written AFTER both appends: a
  * replayed batch id short-circuits, so the fact and index never receive
  * a batch twice. A crash between the appends and the marker re-runs the
  * whole batch; filterNovel then drops every document the crashed
  * attempt already indexed (they collide with themselves at Jaccard 1),
  * so the fact cannot double — the same self-healing idempotency shape
  * as the snapshot probe.
  *
  * The streamed frame must carry (idCol, textCol, `year`) — ids unique
  * across corpus and batches by contract. */
object NovelIngest {

  def seedIndex(corpus: DataFrame, idCol: String, textCol: String,
      indexDir: String, n: Int = 3, numHashes: Int = 128,
      bands: Int = 32): Unit = {
    val idx = Dedup.minhashIndex(corpus, idCol, textCol, n, numHashes, bands)
    idx.bands.write.mode("append").parquet(s"$indexDir/bands")
    idx.shingles.write.mode("append").parquet(s"$indexDir/shingles")
  }

  def run(stream: DataFrame, idCol: String, textCol: String,
      wh: Warehouse, fact: String, indexDir: String, checkpointDir: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new Path(indexDir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val marker = new Path(indexDir, s"_batch_$batchId")
        if (!fs.exists(marker)) {
          val bandsDir = s"$indexDir/bands"
          val idx =
            if (fs.exists(new Path(bandsDir)))
              Dedup.MinhashIndex(spark.read.parquet(bandsDir),
                spark.read.parquet(s"$indexDir/shingles"))
            else // no corpus yet: empty index in the right schema
              Dedup.minhashIndex(batch.limit(0), idCol, textCol,
                n, numHashes, bands)
          // the batch feeds two writes and the novel filter walks it
          // several times — cut lineage once
          val novel = Dedup.filterNovel(batch, idCol, textCol, idx,
            n, numHashes, bands, threshold).localCheckpoint(true)
          if (!novel.isEmpty) {
            wh.append(fact, novel)
            val delta = Dedup.minhashIndex(
              novel.select(col(idCol), col(textCol)), idCol, textCol,
              n, numHashes, bands)
            delta.bands.write.mode("append").parquet(bandsDir)
            delta.shingles.write.mode("append").parquet(s"$indexDir/shingles")
          }
          fs.create(marker, true).close()
        }
        ()
      }
      .start()
}
