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
  * guarded by an intent/marker file pair: `_intent_<id>` is written
  * BEFORE the appends, `_batch_<id>` AFTER both — a replayed batch id
  * with the final marker short-circuits outright. Every crash window
  * then keeps the fact single-copy: a crash AFTER both appends replays
  * into filterNovel, where the batch collides with its own indexed
  * shingles at Jaccard 1 and drops; a crash BETWEEN the fact and index
  * appends is detected by the dangling intent — the replay anti-joins
  * already-present ids out of the FACT leg only (partition-scoped to
  * the batch's years) while still indexing them, the window the
  * marker-only protocol would have DOUBLED; a crash before the fact
  * append recovers as a plain re-run. The anti-join runs only on
  * intent-flagged replays — steady-state batches never probe the fact.
  * (A crash inside the index append itself can leave duplicate band
  * rows; duplicates only repeat candidate pairs, never change a
  * verdict.)
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
        val intent = new Path(indexDir, s"_intent_$batchId")
        if (!fs.exists(marker)) {
          // a dangling intent = a prior attempt may have appended to the
          // fact without reaching the index append (the one window where
          // self-collision cannot catch the replay)
          val crashReplay = fs.exists(intent)
          if (!crashReplay) fs.create(intent, true).close()
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
            // fact leg: on a crash replay, drop ids the crashed attempt
            // already appended — probe only the batch's year partitions
            val factLeg =
              if (!crashReplay) novel
              else wh.read(fact) match {
                case None => novel
                case Some(existing) =>
                  val years = novel.select(col("year")).distinct()
                    .collect().map(_.getLong(0))
                  novel.join(existing
                    .filter(col("year").isin(years.map(Long.box): _*))
                    .select(col(idCol)), Seq(idCol), "left_anti")
              }
            if (!factLeg.isEmpty) wh.append(fact, factLeg)
            // index leg always covers the full accepted set
            val delta = Dedup.minhashIndex(
              novel.select(col(idCol), col(textCol)), idCol, textCol,
              n, numHashes, bands)
            delta.bands.write.mode("append").parquet(bandsDir)
            delta.shingles.write.mode("append").parquet(s"$indexDir/shingles")
          }
          fs.create(marker, true).close()
          fs.delete(intent, false)
        }
        ()
      }
      .start()
}
