package graft.streaming

import graft.ext.{NgramLm, Repetition}
import graft.snapshot.Warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous quality screening — the streaming leg of the Gopher + LM
  * family: each arriving micro-batch of documents is (1) screened by
  * [[Repetition.gopherFilter]] and (2) scored by a FROZEN, persisted
  * [[NgramLm]] model (trained once on the trusted slice; the stream
  * never retrains), and the documents passing both screens append to a
  * [[Warehouse]] fact with their scores — the continuously-curated
  * corpus the batch operators would have produced.
  *
  * Model persistence: [[saveModel]] writes the three count tables plus a
  * one-row totals table under `modelDir`; [[loadModel]] rebuilds the
  * model without touching the training corpus — at 100 TB the counts are
  * the only representation that ever leaves the training job.
  *
  * Replay protocol (same intent/marker pair as
  * [[NovelIngest]]): `_intent_<id>` before the append, `_batch_<id>`
  * after. A replayed batch with the final marker short-circuits; a
  * dangling intent means the append may have landed, so the replay
  * anti-joins already-present ids out of the batch before appending —
  * the fact stays single-copy through every crash window. Steady-state
  * batches never probe the fact.
  *
  * The markers live under `checkpointDir/_graft_markers` — the SAME
  * per-stream state root Spark keys batch ids to — never under
  * `modelDir`: the model is a shared read-only input, and marker files
  * there would collide across two streams scoring against the same
  * frozen model, or wrongly short-circuit a restarted stream whose
  * fresh checkpoint reset batch ids to 0 (silent data loss). */
object QualityGate {

  def saveModel(m: NgramLm.Model, dir: String): Unit = {
    val spark = m.uni.sparkSession
    import spark.implicits._
    // the four tables are independent actions on disjoint output dirs
    // (each count table re-runs its own corpus aggregation — the train
    // frames are deliberately unpersisted, see NgramLm.train): run them
    // CONCURRENTLY so the three corpus scans overlap instead of paying
    // three serial stage ladders (optimization guide, "overlap
    // independent jobs")
    Concurrent.all(Seq(
      () => m.uni.write.mode("overwrite").parquet(s"$dir/uni"),
      () => m.bi.write.mode("overwrite").parquet(s"$dir/bi"),
      () => m.tri.write.mode("overwrite").parquet(s"$dir/tri"),
      () => Seq((m.n, m.v)).toDF("n", "v")
        .write.mode("overwrite").parquet(s"$dir/totals")))
  }

  def loadModel(spark: SparkSession, dir: String): NgramLm.Model = {
    val t = spark.read.parquet(s"$dir/totals").collect()(0)
    NgramLm.Model(spark.read.parquet(s"$dir/uni"),
      spark.read.parquet(s"$dir/bi"), spark.read.parquet(s"$dir/tri"),
      t.getLong(0), t.getLong(1))
  }

  /** Screen `stream` (idCol, textCol, `year`) against the persisted
    * model: documents with `lm_score >= minScore` AND a true Gopher vote
    * append to `fact` as (idCol, year, lm_score). */
  def run(stream: DataFrame, idCol: String, textCol: String,
      modelDir: String, wh: Warehouse, fact: String, checkpointDir: String,
      minScore: Double): StreamingQuery = {
    val spark = stream.sparkSession
    // materialize the frozen counts ONCE per stream: loadModel's
    // DataFrames are lazy plans, so without this every trigger
    // re-reads the model parquet and re-plans the scan — the r13
    // bench watch item. persist() (NOT localCheckpoint) is the
    // cluster-safe form: it caches the blocks but KEEPS lineage, so
    // losing an executor mid-stream recomputes from the parquet
    // instead of failing the whole StreamingQuery with
    // missing-checkpoint-block errors. An eager count() forces the
    // one materialization pass up front.
    def pin(df: DataFrame): DataFrame = { df.persist(); df }
    val lazyModel = loadModel(spark, modelDir)
    val model = lazyModel.copy(
      uni = pin(lazyModel.uni),
      bi = pin(lazyModel.bi),
      tri = pin(lazyModel.tri))
    // the three forcing counts are independent tiny scans — overlap
    // them instead of paying three serial scheduler round-trips
    Concurrent.all(Seq(
      () => { model.uni.count(); () },
      () => { model.bi.count(); () },
      () => { model.tri.count(); () }))
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val markerRoot = new Path(checkpointDir, "_graft_markers")
        val fs = markerRoot.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        fs.mkdirs(markerRoot)
        val marker = new Path(markerRoot, s"_batch_$batchId")
        val intent = new Path(markerRoot, s"_intent_$batchId")
        if (!fs.exists(marker)) {
          val crashReplay = fs.exists(intent)
          if (!crashReplay) fs.create(intent, true).close()
          // the Gopher vote is per-row: annotate and filter in place
          // (verdict identical to gopherFilter's keep) instead of
          // screening an id projection and joining the survivors back —
          // one join fewer per trigger, one fewer batch scan
          val screened = Repetition
            .repetitionKeep(batch.select(col(idCol), col(textCol),
              col("year")), textCol, "__rep_keep")
            .filter(col("__rep_keep")).select(col(idCol), col("year"))
          val scored = NgramLm.score(model, batch, idCol, textCol)
            .filter(col("lm_score") >= lit(minScore))
            .select(col(idCol), col("lm_score"))
          val accepted = screened.join(scored, idCol)
          val out =
            if (!crashReplay) accepted
            else wh.read(fact) match {
              case Some(existing) => accepted.join(
                existing.select(col(idCol)), Seq(idCol), "left_anti")
              case None => accepted
            }
          wh.append(fact, out)
          fs.create(marker, true).close()
          fs.delete(intent, false)
        }
        ()
      }
      .start()
  }
}
