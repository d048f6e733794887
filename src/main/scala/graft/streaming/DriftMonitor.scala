package graft.streaming

import graft.snapshot.Warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous corpus-drift monitoring — the streaming leg of
  * [[graft.ext.Drift.wordPsiByPeriod]]: each arriving micro-batch's word
  * distribution is PSI'd against a FROZEN, persisted reference corpus
  * (its word counts — the only representation that ever leaves the
  * reference job), and one summary row per batch appends to a
  * [[Warehouse]] fact. The fact IS the drift time series: a rising
  * `psi_pico` flags the ingestion source shifting while the batches are
  * still arriving — before a scheduled batch comparison would run.
  *
  * Arithmetic is exactly the per-period leg of `wordPsiByPeriod`
  * (add-one smoothing over the union vocabulary of reference ∪ batch,
  * per-term floor-quantized pico contributions summed as longs), so the
  * series replays on any engine and matches the batch operator row for
  * row when the batch partitioning matches the period column.
  *
  * Per batch: one explode + one vocab-keyed full-outer join against the
  * reference counts (vocabulary-sized — AQE broadcasts a small
  * reference) + a 1-row total. Replay protocol: the [[QualityGate]]
  * intent/marker pair under `checkpointDir/_graft_markers`; the
  * appended row is keyed by batch id, and a dangling intent anti-joins
  * already-present batch ids out of the append. */
object DriftMonitor {

  /** Persist the frozen reference: word counts + a 1-row totals frame. */
  def saveReference(ref: DataFrame, textCol: String, dir: String): Unit = {
    val counts = ref
      .select(explode(split(col(textCol), " ")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("c_a"))
    counts.write.mode("overwrite").parquet(s"$dir/counts")
    counts.agg(sum(col("c_a")).as("na"))
      .write.mode("overwrite").parquet(s"$dir/totals")
  }

  /** One batch against the frozen reference: compute the PSI summary row
    * and append (batch, year, n_tokens, vocab_union, psi_pico) to the
    * fact. `year` is the batch's max year (monitor batches are normally
    * period-homogeneous); `dedupFact` anti-joins an already-appended
    * batch id (crash-replay path only). */
  def ingestBatch(batch: DataFrame, textCol: String, refDir: String,
      wh: Warehouse, fact: String, batchId: Long,
      dedupFact: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val refCounts = spark.read.parquet(s"$refDir/counts")
    val na = spark.read.parquet(s"$refDir/totals").head().getLong(0)
    val curW = batch
      .select(explode(split(col(textCol), " ")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("c_b"))
    val joined = refCounts.join(curW, Seq("__w"), "full_outer")
      .select(coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val tot = joined.agg(sum(col("c_b")).as("__nb"), count(lit(1)).as("__v"))
    val pa = (col("c_a") + 1).cast("double") / (lit(na) + col("__v"))
    val pb = (col("c_b") + 1).cast("double") / (col("__nb") + col("__v"))
    val psi = joined.crossJoin(broadcast(tot))
      .select(floor((pa - pb) * log(pa / pb) * lit(1e12)).cast("long")
        .as("__c"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("psi_pico")).head().getLong(0)
    val t = tot.head()
    val year = batch.agg(max(col("year"))).head().getLong(0)
    import spark.implicits._
    val row = Seq((batchId, year, t.getLong(0), t.getLong(1), psi))
      .toDF("batch", "year", "n_tokens", "vocab_union", "psi_pico")
    val out =
      if (!dedupFact) row
      else wh.read(fact) match {
        case None => row
        case Some(existing) => row.join(
          existing.select(col("batch")), Seq("batch"), "left_anti")
      }
    if (!out.isEmpty) wh.append(fact, out)
  }

  def run(stream: DataFrame, textCol: String, refDir: String,
      wh: Warehouse, fact: String, checkpointDir: String): StreamingQuery =
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
          ingestBatch(batch, textCol, refDir, wh, fact, batchId,
            dedupFact = crashReplay)
          fs.create(marker, true).close()
          fs.delete(intent, false)
        }
        ()
      }
      .start()
}
