package graft.streaming

import graft.ext.{Multimodal, WavSpectralStats}
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous AUDIO ingest dedup — the streaming leg of
  * [[Multimodal.audioNearDupPairs]] and the audio twin of
  * [[ImageIngest]]: each arriving batch of clips keeps only the ones
  * whose SPECTRAL fingerprint
  * ([[graft.ext.WavKernel.spectralFingerprint]] — 8 windows × 8
  * square-wave bands over REAL decoded PCM, amplitude-invariant) is
  * NOVEL — no Hamming-≤ t collision against the persisted fingerprint
  * index, and not dominated by a smaller-id batch sibling within the
  * ball. The energy-contour fingerprint is deliberately NOT the key
  * (its measured cross-class minima reach 1 — the
  * [[graft.ext.WavKernel.energyFingerprint]] caveat); the spectral
  * hash is the class-discriminating one. Undecodable or hash-less
  * (under-256-sample) clips are ALWAYS kept.
  *
  * Index rows are `(audio_fp, n_refs, t, v)` with the 56 banded probe
  * keys PERSISTED at write time; the probe broadcasts the batch's keys
  * and equi-joins the stored ones — per-trigger work O(batch·56), never
  * O(corpus). Probe contract, crash protocol (idempotent per-batch
  * index overwrite, own-partition exclusion, intent/marker replay) and
  * the first-sighting-keeps policy are all the shared [[FpIngest]] /
  * [[ScrubEngine]] machinery — see [[ImageIngest]]'s scaladoc for the
  * full account.
  *
  * The streamed frame must carry (idCol, contentCol, `year`), with
  * NONNEGATIVE ids. */
object AudioIngest {

  /** Hamming radius of the near-dup ball (≤ 6: the banding recall
    * guarantee). */
  val MaxHamming = 4

  private val fpAdd = FpIngest.statsFp(
    WavSpectralStats(_), "sfp_hi", "sfp_lo")

  /** (audio_fp, n_refs, t, v) — the persisted-band-key index unit. */
  def audioIndex(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    FpIngest.index(df, contentCol, fpAdd, "audio_fp")

  /** The batch's novel rows against a prior index (hash-less rows
    * always pass, audio_fp NULL). */
  def novelAgainst(batch: DataFrame, idCol: String, contentCol: String,
      index: DataFrame): DataFrame =
    FpIngest.novelAgainst(batch, idCol, contentCol, index, fpAdd,
      "audio_fp", MaxHamming)

  private val fam = FpIngest.family("audfps", "audio_fp", fpAdd, MaxHamming)

  /** Seed the index with an already-ingested corpus (batch = -1). */
  def seedIndex(corpus: DataFrame, idCol: String, contentCol: String,
      indexDir: String): Unit =
    ScrubEngine.seedIndex(fam, corpus, idCol, contentCol, indexDir)

  /** One batch through the screen, callable directly (the driver-chained
    * form the x_stream_audingest gate replays) or from [[run]]'s
    * foreachBatch. Appends (idCol, year, audio_fp) for the novel rows. */
  def ingestBatch(batch: DataFrame, idCol: String, contentCol: String,
      wh: Warehouse, fact: String, indexDir: String, batchId: Long,
      dedupFact: Boolean = false): Unit =
    ScrubEngine.ingestBatch(fam, batch, idCol, contentCol, wh, fact,
      indexDir, batchId, dedupFact)

  def run(stream: DataFrame, idCol: String, contentCol: String,
      wh: Warehouse, fact: String, indexDir: String,
      checkpointDir: String): StreamingQuery =
    ScrubEngine.run(fam, stream, idCol, contentCol, wh, fact, indexDir,
      checkpointDir)

  /** Fold fingerprint-index partitions `batch <= upToBatchId` into
    * `batch=-1` (retention; horizon contract at
    * [[TileScrub.compactIndex]]). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatchId: Long): Int =
    ScrubEngine.compactIndex(spark, fam, indexDir, upToBatchId)
}
