package graft.streaming

import graft.ext.SignLshSignatures
import graft.snapshot.Warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous EMBEDDING ingest dedup — SemDeDup at the door: each
  * arriving batch of embedding rows keeps only the ones whose 63-bit
  * sign-LSH fingerprint ([[SignLshSignatures]], one table × 63
  * hyperplanes, bit 63 reserved so the value stays nonnegative like
  * every other [[FpIngest]] hash) is NOVEL — no Hamming-≤ t collision
  * against the persisted fingerprint index, and not dominated by a
  * smaller-id batch sibling. Hamming distance over sign bits estimates
  * angle (Charikar '02: P[bit differs] = θ/π), so the radius-t ball is
  * an angular near-duplicate ball — the batch analog is
  * [[graft.ext.Dedup.semDeDup]], which pays a k-means training to
  * scope exact cosines; the ingest screen trades that for a fixed
  * 63-plane projection, the right price at the door of a stream.
  * NULL-embedding rows are ALWAYS kept (the shared stance: a screen
  * that cannot judge must not drop).
  *
  * Index rows are `(emb_fp, n_refs, t, v)` with the 56 banded probe
  * keys PERSISTED at write time; per-trigger probe work is
  * O(batch·56), never O(corpus) — the whole [[FpIngest]] contract,
  * crash protocol included ([[ImageIngest]]'s scaladoc has the full
  * account).
  *
  * The streamed frame must carry (idCol, vecCol, `year`), with
  * NONNEGATIVE ids. `dim`/`seed` fix the hyperplanes — the SAME values
  * must be used for seeding and for every batch (the fingerprints are
  * only comparable within one plane draw). */
object EmbeddingIngest {

  /** Hamming radius of the near-dup ball (≤ 6: the banding recall
    * guarantee). At 63 planes, radius 4 ≈ an angular ball of ~11°
    * in expectation. */
  val MaxHamming = 4

  private def fpAdd(dim: Int, seed: Long): FpIngest.FpAdd =
    FpIngest.colFp((vec: Column) =>
      element_at(SignLshSignatures(vec, tables = 1, bits = 63,
        dim = dim, seed = seed), 1))

  private def fam(dim: Int, seed: Long): ScrubFamily =
    // materializeFp = false: the sign-LSH fingerprint is a cheap in-row
    // projection — checkpointing it per trigger measured SLOWER than
    // recomputing it (see FpIngest.novelAgainst). RE-MEASURED after the
    // shared-prepare refactor (when the checkpoint would also feed the
    // index leg): 6.73 vs 6.66 s — a wash; the trigger floor is
    // warehouse/index IO, not the projection. Opt-out kept.
    FpIngest.family("embfps", "emb_fp", fpAdd(dim, seed), MaxHamming,
      materializeFp = false)

  /** (emb_fp, n_refs, t, v) — the persisted-band-key index unit. */
  def embeddingIndex(df: DataFrame, vecCol: String, dim: Int,
      seed: Long = 42L): DataFrame =
    FpIngest.index(df, vecCol, fpAdd(dim, seed), "emb_fp")

  /** The batch's novel rows against a prior index (NULL-embedding rows
    * always pass, emb_fp NULL). */
  def novelAgainst(batch: DataFrame, idCol: String, vecCol: String,
      index: DataFrame, dim: Int, seed: Long = 42L): DataFrame =
    FpIngest.novelAgainst(batch, idCol, vecCol, index, fpAdd(dim, seed),
      "emb_fp", MaxHamming, materializeFp = false)

  /** Seed the index with an already-ingested corpus (batch = -1). */
  def seedIndex(corpus: DataFrame, idCol: String, vecCol: String,
      indexDir: String, dim: Int, seed: Long = 42L): Unit =
    ScrubEngine.seedIndex(fam(dim, seed), corpus, idCol, vecCol, indexDir)

  /** One batch through the screen, callable directly (the driver-chained
    * form the x_stream_embingest gate replays) or from [[run]]'s
    * foreachBatch. Appends (idCol, year, emb_fp) for the novel rows. */
  def ingestBatch(batch: DataFrame, idCol: String, vecCol: String,
      wh: Warehouse, fact: String, indexDir: String, batchId: Long,
      dim: Int, seed: Long = 42L, dedupFact: Boolean = false): Unit =
    ScrubEngine.ingestBatch(fam(dim, seed), batch, idCol, vecCol, wh,
      fact, indexDir, batchId, dedupFact)

  def run(stream: DataFrame, idCol: String, vecCol: String,
      wh: Warehouse, fact: String, indexDir: String, checkpointDir: String,
      dim: Int, seed: Long = 42L): StreamingQuery =
    ScrubEngine.run(fam(dim, seed), stream, idCol, vecCol, wh, fact,
      indexDir, checkpointDir)
}
