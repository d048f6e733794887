package graft.streaming

import graft.ext.{Hamming64, Multimodal}
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous IMAGE ingest dedup — the streaming leg of
  * [[Multimodal.imageNearDupPairs]]: each arriving batch of images keeps
  * only the ones whose perceptual hash (aHash over REAL decoded pixels,
  * container-sniffed — PNG, JPEG and GIF share one fingerprint space)
  * is NOVEL — no Hamming-≤ t collision against the persisted fingerprint
  * index (earlier batches / the seeded corpus), and not dominated by a
  * smaller-id batch sibling within Hamming ≤ t (first-sighting-keeps,
  * the [[UrlIngest]] policy under a near-match relation: j drops iff
  * some i < j in the batch sits within the ball — deterministic, and
  * exactly the batch min-id rule when duplicate groups are exact).
  * Undecodable or hash-less (too-small) images are ALWAYS kept — the
  * [[graft.ext.UrlFilter]] stance: a screen that silently drops what it
  * cannot judge biases the corpus.
  *
  * Index rows are `(img_fp, n_refs, t, v)` — the 56 banded probe keys
  * ([[Hamming64]]'s block-pair tables) are PERSISTED at index-write
  * time, once per accepted batch, additive like `n_refs`. The probe
  * then equi-joins the current batch's 56·|batch| derived keys
  * (broadcast — a micro-batch is trigger-bounded) against the stored
  * keys: per-trigger work is O(batch·56) compute plus one pruned
  * columnar index read, never an O(corpus) re-derivation — the same
  * "O(delta), never O(fact)" rule the other scrub families hold. On a
  * real lake, bucket the stored keys by `v` to add partition-level
  * pruning to the read; the probe join shape is already shuffle-free
  * on the index side.
  *
  * Crash protocol identical to [[UrlIngest]] via the shared
  * [[ScrubEngine]]: idempotent per-batch index overwrite, own-partition
  * exclusion on read (replays recompute identical verdicts),
  * intent/marker fact leg with the anti-join replay.
  *
  * The streamed frame must carry (idCol, contentCol, `year`), with
  * NONNEGATIVE ids (index-side probe rows take synthetic negative ids
  * so the generic i < j pair join orients index → batch). */
object ImageIngest {

  /** Hamming radius of the near-dup ball (≤ 6: the banding recall
    * guarantee). */
  val MaxHamming = 4

  // ORIENTATION-NORMALIZED since round 13: the door hashes EXIF-upright
  // pixels, so a camera-rotated JPEG re-upload collapses onto its
  // original's fingerprint and drops. On EXIF-less content (PNG/GIF/
  // BMP/TIFF, or EXIF-less JPEG) this is bit-identical to the plain
  // sniffing stats — orientation-free verdicts are unchanged.
  private val fpAdd = FpIngest.statsFp(
    graft.ext.OrientedImageGrayStats(_), "ahash_hi", "ahash_lo")

  /** (img_fp, n_refs, t, v) — fingerprint counts of a frame exploded
    * into their 56 persisted band keys, the index unit (undecodable /
    * hash-less images contribute nothing). Keys are derived ONCE here,
    * at write time, so no probe ever re-derives them ([[FpIngest]],
    * the shared probe contract). The hash rides
    * [[graft.ext.ImageGrayStats]]' container sniff — PNG, JPEG and GIF
    * arrivals share ONE fingerprint space, so a JPEG re-encode of an
    * already-ingested PNG is caught as the near-duplicate it is. */
  def imageIndex(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    FpIngest.index(df, contentCol, fpAdd, "img_fp")

  /** The batch's novel rows against a prior index: no index fp within
    * Hamming ≤ [[MaxHamming]], no smaller-id batch sibling within the
    * same ball; hash-less rows always pass (img_fp NULL). `index`
    * carries STORED band keys (t, v) per [[imageIndex]] — the probe
    * derives keys for the batch only, broadcasts them, and equi-joins
    * against the stored keys (banding guarantees every Hamming-≤ 6
    * pair shares a clean key; the exact bit_count filter closes the
    * ball), so the index side is never exploded, shuffled, or
    * re-keyed ([[FpIngest.novelAgainst]]). */
  def novelAgainst(batch: DataFrame, idCol: String, contentCol: String,
      index: DataFrame): DataFrame =
    FpIngest.novelAgainst(batch, idCol, contentCol, index, fpAdd,
      "img_fp", MaxHamming)

  private val fam = FpIngest.family("imgfps", "img_fp", fpAdd, MaxHamming)

  /** Seed the index with an already-ingested corpus (batch = -1). */
  def seedIndex(corpus: DataFrame, idCol: String, contentCol: String,
      indexDir: String): Unit =
    ScrubEngine.seedIndex(fam, corpus, idCol, contentCol, indexDir)

  /** One batch through the screen, callable directly (the driver-chained
    * form the x_stream_imgingest gate replays) or from [[run]]'s
    * foreachBatch. Appends (idCol, year, img_fp) for the novel rows. */
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
    * `batch=-1` (retention; see [[TileScrub.compactIndex]] for the
    * horizon contract). Duplicate (fp, t, v) rows merge with summed
    * `n_refs` — probe verdicts are unchanged (the probe dedups hits
    * and never reads `n_refs`). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatchId: Long): Int =
    ScrubEngine.compactIndex(spark, fam, indexDir, upToBatchId)
}
