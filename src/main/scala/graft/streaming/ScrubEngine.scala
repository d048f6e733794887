package graft.streaming

import graft.snapshot.Warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The shared micro-batch scrub machinery behind [[TileScrub]] and
  * [[LineScrub]]: the two families differ ONLY in their text unit
  * (disjoint word tiles vs lines), i.e. the index builder, the
  * incremental judge, and the column names — while the partitioned-
  * index crash protocol, the fact intent/marker leg, and the
  * foreachBatch loop are identical and live here once.
  *
  * Protocol (documented in full at [[TileScrub]], the original):
  * per-batch index partitions under `indexDir/<subdir>/batch=<id>`
  * written with idempotent overwrite; the index read excludes the
  * current batch's partition so replays recompute identical verdicts;
  * the fact leg uses the intent/marker pair under
  * `checkpointDir/_graft_markers` with an anti-join on crash replay. */
private[streaming] final case class ScrubFamily(
    subdir: String,
    keyCol: String,
    cntCol: String,
    statCols: Seq[String],
    indexOf: (DataFrame, String, String) => DataFrame,
    incremental: (DataFrame, String, String, DataFrame) => DataFrame,
    // collapse = true: the index read folds per-batch partitions into
    // one (keyCol, Σ cntCol) row per key. false: the raw stored rows
    // pass through untouched (minus the own-batch partition) — for
    // families whose index carries precomputed probe columns the judge
    // equi-joins directly (ImageIngest's persisted band keys), where a
    // per-batch O(corpus) groupBy shuffle would defeat the point.
    collapse: Boolean = true,
    // extra all-LongType index columns beyond (keyCol, cntCol), for the
    // empty-index schema when no partition exists yet
    extraIndexCols: Seq[String] = Nil,
    // bloom-prune the index read with the BATCH's own unit keys: the
    // incremental judge only consumes index rows whose keyCol appears
    // in the batch (equi-join semantics), so a filter built from the
    // trigger-bounded batch keys discards the rest of the index scan
    // map-side — BEFORE the collapse groupBy / join exchange. False
    // positives only pass harmless extra rows. The pattern generalizes
    // to every collapse family (line/URL); families that join on
    // derived keys (ImageIngest's band keys) need the bloom keyed on
    // those instead.
    bloomPrune: Boolean = false)

private[streaming] object ScrubEngine {

  def seedIndex(fam: ScrubFamily, corpus: DataFrame, idCol: String,
      textCol: String, indexDir: String): Unit =
    fam.indexOf(corpus, idCol, textCol)
      .write.mode("overwrite")
      .parquet(s"$indexDir/${fam.subdir}/batch=-1")

  /** The current index EXCLUDING `batchId`'s own partition, collapsed
    * to one row per unit hash; `prune` runs on the RAW stored rows,
    * before any collapse shuffle (the bloom-prune hook point). */
  private def readIndex(fam: ScrubFamily, batch: DataFrame,
      indexDir: String, batchId: Long,
      prune: DataFrame => DataFrame = identity): DataFrame = {
    val spark = batch.sparkSession
    val dir = s"$indexDir/${fam.subdir}"
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val hasParts = fs.exists(new Path(dir)) &&
      fs.listStatus(new Path(dir)).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (hasParts) {
      val raw = prune(spark.read.option("basePath", dir).parquet(dir)
        .filter(col("batch") =!= batchId))
      if (fam.collapse)
        raw.groupBy(col(fam.keyCol)).agg(sum(col(fam.cntCol)).as(fam.cntCol))
      else raw.drop("batch")
    } else
      spark.emptyDataFrame
        .select((Seq(fam.keyCol, fam.cntCol) ++ fam.extraIndexCols)
          .map(c => lit(0L).as(c)): _*).limit(0)
  }

  def ingestBatch(fam: ScrubFamily, batch: DataFrame, idCol: String,
      textCol: String, wh: Warehouse, fact: String, indexDir: String,
      batchId: Long, dedupFact: Boolean): Unit = {
    // the batch's own index view is used twice (bloom keys + the final
    // index write); compute once
    val batchIndex = fam.indexOf(batch, idCol, textCol)
      .localCheckpoint(true)
    val prune: DataFrame => DataFrame =
      if (!fam.bloomPrune) identity
      else { raw =>
        val bits = 1 << 17 // 16 KiB filter: ~1% fp at 10^4 batch keys
        val words = graft.ext.BloomJoin.buildFilter(
          batchIndex.select(col(fam.keyCol)), fam.keyCol, bits, 4)
        graft.ext.BloomJoin.pruneProbe(raw, fam.keyCol, words, bits, 4)
      }
    val index = readIndex(fam, batch, indexDir, batchId, prune)
    val scrubbed = fam.incremental(
        batch.select(col(idCol), col(textCol)), idCol, textCol, index)
      .join(batch.select(col(idCol), col("year")), idCol)
      .select((col(idCol) :: col("year") ::
        fam.statCols.map(col).toList): _*)
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
    batchIndex
      .write.mode("overwrite")
      .parquet(s"$indexDir/${fam.subdir}/batch=$batchId")
  }

  def run(fam: ScrubFamily, stream: DataFrame, idCol: String,
      textCol: String, wh: Warehouse, fact: String, indexDir: String,
      checkpointDir: String): StreamingQuery =
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
          ingestBatch(fam, batch, idCol, textCol, wh, fact, indexDir,
            batchId, dedupFact = crashReplay)
          fs.create(marker, true).close()
          fs.delete(intent, false)
        }
        ()
      }
      .start()
}
