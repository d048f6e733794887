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

  /** (img_fp, n_refs, t, v) — fingerprint counts of a frame exploded
    * into their 56 persisted band keys, the index unit (undecodable /
    * hash-less images contribute nothing). Keys are derived ONCE here,
    * at write time, so no probe ever re-derives them. The hash rides
    * [[graft.ext.ImageGrayStats]]' container sniff — PNG, JPEG and GIF
    * arrivals share ONE fingerprint space, so a JPEG re-encode of an
    * already-ingested PNG is caught as the near-duplicate it is. */
  def imageIndex(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    Hamming64.withBandKeys(
      df.select(graft.ext.ImageGrayStats(col(contentCol)).as("__s"))
        .filter(col("__s.ahash_hi").isNotNull)
        .select(shiftleft(col("__s.ahash_hi"), 32)
          .bitwiseOR(col("__s.ahash_lo")).as("img_fp"))
        .groupBy(col("img_fp")).agg(count(lit(1)).as("n_refs")),
      "img_fp")

  /** The batch's novel rows against a prior index: no index fp within
    * Hamming ≤ [[MaxHamming]], no smaller-id batch sibling within the
    * same ball; hash-less rows always pass (img_fp NULL). `index`
    * carries STORED band keys (t, v) per [[imageIndex]] — the probe
    * derives keys for the batch only, broadcasts them, and equi-joins
    * against the stored keys (banding guarantees every Hamming-≤ 6
    * pair shares a clean key; the exact bit_count filter closes the
    * ball), so the index side is never exploded, shuffled, or
    * re-keyed. */
  def novelAgainst(batch: DataFrame, idCol: String, contentCol: String,
      index: DataFrame): DataFrame = {
    val withFp = batch
      .withColumn("__s", graft.ext.ImageGrayStats(col(contentCol)))
      .withColumn("img_fp",
        when(col("__s.ahash_hi").isNotNull,
          shiftleft(col("__s.ahash_hi"), 32).bitwiseOR(col("__s.ahash_lo"))))
      .drop("__s")
    val hashed = withFp.filter(col("img_fp").isNotNull)
      .select(col(idCol), col("img_fp"))
    val batchSide = hashed.select(col(idCol).as("id"), col("img_fp").as("fp"))
    val batchKeys = Hamming64.withBandKeys(batchSide, "fp")
    val indexHits = index.select(col("img_fp"), col("t"), col("v"))
      .join(broadcast(batchKeys), Seq("t", "v"))
      .filter(bit_count(col("img_fp").bitwiseXOR(col("fp")))
        .cast("long") <= MaxHamming)
      .select(col("id").as(idCol)).distinct()
    // within-batch dominators: j drops iff some smaller batch id pairs
    val batchHits = Hamming64.pairs(batchSide, "id", "fp", MaxHamming)
      .select(col("j").as(idCol)).distinct()
    withFp.filter(col("img_fp").isNotNull)
      .join(indexHits.unionByName(batchHits).distinct(), Seq(idCol),
        "left_anti")
      .select(col(idCol), col("img_fp"))
      .unionByName(withFp.filter(col("img_fp").isNull)
        .select(col(idCol), col("img_fp")))
  }

  private val fam = ScrubFamily(
    subdir = "imgfps", keyCol = "img_fp", cntCol = "n_refs",
    statCols = Seq("img_fp"),
    indexOf = imageIndex(_, _, _),
    incremental = novelAgainst(_, _, _, _),
    // the stored rows ARE the probe side: no per-batch collapse shuffle
    collapse = false, extraIndexCols = Seq("t", "v"))

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
}
