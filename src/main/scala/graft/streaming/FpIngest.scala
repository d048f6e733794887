package graft.streaming

import graft.ext.Hamming64

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared 64-bit-fingerprint ingest-dedup shape — extracted from
  * [[ImageIngest]] so every perceptual-hash modality (image aHash,
  * audio spectral hash, embedding sign-LSH, any future 64-bit LSH)
  * rides ONE probe contract instead of copy-pasting it:
  *
  *  - the index unit is `(fpCol, n_refs, t, v)` — the 56 [[Hamming64]]
  *    block-pair band keys are PERSISTED at index-write time, once per
  *    accepted batch, additive like `n_refs`;
  *  - the probe derives keys for the BATCH only, broadcasts them
  *    (trigger-bounded), and equi-joins against the stored keys, so
  *    per-trigger work is O(batch·56) compute plus one pruned columnar
  *    index read — never an O(corpus) re-derivation ("O(delta), never
  *    O(fact)");
  *  - banding guarantees every Hamming-≤ 6 pair shares a clean key;
  *    the exact bit_count filter closes the ball;
  *  - hash-less rows (undecodable / too-small content) always pass —
  *    a screen that silently drops what it cannot judge biases the
  *    corpus.
  *
  * A modality plugs in with an `FpAdd`: a projection step appending
  * its nullable LongType fingerprint column. [[statsFp]] builds one
  * from a decode-stats struct expression (evaluated ONCE per row — the
  * struct lands in its own projection and the fields are read from
  * it, never by re-inlining the decode); [[colFp]] wraps a direct
  * single-reference fingerprint expression (sign-LSH over a vector
  * column). */
private[streaming] object FpIngest {

  /** Append fingerprint column `fpName` derived from `contentCol`. */
  type FpAdd = (DataFrame, String, String) => DataFrame

  /** [[FpAdd]] from a decode-stats STRUCT expression with nullable
    * hi/lo 32-bit-half fingerprint fields. */
  def statsFp(stats: Column => Column, hiField: String,
      loField: String): FpAdd = (df, contentCol, fpName) =>
    df.withColumn("__s", stats(col(contentCol)))
      .withColumn(fpName,
        when(col(s"__s.$hiField").isNotNull,
          shiftleft(col(s"__s.$hiField"), 32)
            .bitwiseOR(col(s"__s.$loField"))))
      .drop("__s")

  /** [[FpAdd]] from a direct nullable-LongType fingerprint column
    * (the expression must reference the content column once). */
  def colFp(fpOf: Column => Column): FpAdd = (df, contentCol, fpName) =>
    df.withColumn(fpName, fpOf(col(contentCol)))

  /** The (id, fp) frame both trigger legs consume — fpAdd's projection,
    * materialized when the fingerprint derivation is expensive (content
    * decode): trigger-bounded 16-byte rows, localCheckpoint so blocks
    * free when the trigger's references drop (per-trigger persist would
    * leak CacheManager entries on a long-running stream). */
  def prepared(df: DataFrame, idCol: String, contentCol: String,
      fpAdd: FpAdd, fpName: String, materializeFp: Boolean): DataFrame = {
    val projected = fpAdd(df.select(col(idCol), col(contentCol)),
        contentCol, fpName)
      .select(col(idCol), col(fpName))
    if (materializeFp) projected.localCheckpoint(true) else projected
  }

  /** Index rows from an already-prepared (id, fp) frame. */
  private def indexFromFp(withFp: DataFrame, fpName: String): DataFrame =
    Hamming64.withBandKeys(
      withFp.filter(col(fpName).isNotNull)
        .select(col(fpName))
        .groupBy(col(fpName)).agg(count(lit(1)).as("n_refs")),
      fpName)

  /** `(fpName, n_refs, t, v)` — fingerprint counts of a frame exploded
    * into their 56 persisted band keys, the index unit (hash-less rows
    * contribute nothing). Keys are derived ONCE here, at write time,
    * so no probe ever re-derives them. */
  def index(df: DataFrame, contentCol: String, fpAdd: FpAdd,
      fpName: String): DataFrame =
    Hamming64.withBandKeys(
      fpAdd(df, contentCol, fpName)
        .filter(col(fpName).isNotNull)
        .select(col(fpName))
        .groupBy(col(fpName)).agg(count(lit(1)).as("n_refs")),
      fpName)

  /** The batch's novel rows against a prior index: no index fp within
    * Hamming ≤ `maxHamming`, no smaller-id batch sibling within the
    * same ball; hash-less rows always pass (fpName NULL). `index`
    * carries STORED band keys (t, v) per [[index]]. Output
    * (idCol, fpName). */
  def novelAgainst(batch: DataFrame, idCol: String, contentCol: String,
      index: DataFrame, fpAdd: FpAdd, fpName: String,
      maxHamming: Int, materializeFp: Boolean = true): DataFrame =
    // (id, fp) materialized ONCE (the batchIndex localCheckpoint
    // discipline): the decode behind fpAdd is the expensive half of a
    // perceptual-hash trigger, and this frame used to be re-derived by
    // every consumer of the judge — band-keying, the within-batch pair
    // join, and both halves of the final verdict union, ~4 decode
    // passes per trigger (measured: imgingest 8.9 -> 6.8 s, audingest
    // 8.0 -> 6.9 s per gate). Trigger-bounded rows, 16 bytes each;
    // blocks are freed when the trigger's references drop
    // (ContextCleaner), like every other per-batch checkpoint here.
    // `materializeFp = false` skips the checkpoint for modalities whose
    // fingerprint is a cheap projection (sign-LSH over an in-row
    // vector): there the extra job costs more than the recompute
    // (measured: embingest 5.0 -> 5.9 s WITH the checkpoint).
    novelPrepared(
      prepared(batch, idCol, contentCol, fpAdd, fpName, materializeFp),
      idCol, index, fpName, maxHamming)

  /** The judge against an already-prepared (id, fp) frame — inside a
    * [[ScrubFamily]] trigger the SAME prepared frame also feeds the
    * index write, so the batch decodes once per trigger, not once per
    * leg. Output (idCol, fpName), verdicts identical to the wrapper. */
  def novelPrepared(withFp: DataFrame, idCol: String, index: DataFrame,
      fpName: String, maxHamming: Int): DataFrame = {
    val batchSide = withFp.filter(col(fpName).isNotNull)
      .select(col(idCol).as("id"), col(fpName).as("fp"))
    val batchKeys = Hamming64.withBandKeys(batchSide, "fp")
    val indexHits = index.select(col(fpName), col("t"), col("v"))
      .join(broadcast(batchKeys), Seq("t", "v"))
      .filter(bit_count(col(fpName).bitwiseXOR(col("fp")))
        .cast("long") <= maxHamming)
      .select(col("id").as(idCol)).distinct()
    // within-batch dominators: j drops iff some smaller batch id pairs
    val batchHits = Hamming64.pairs(batchSide, "id", "fp", maxHamming)
      .select(col("j").as(idCol)).distinct()
    withFp.filter(col(fpName).isNotNull)
      .join(indexHits.unionByName(batchHits).distinct(), Seq(idCol),
        "left_anti")
      .select(col(idCol), col(fpName))
      .unionByName(withFp.filter(col(fpName).isNull)
        .select(col(idCol), col(fpName)))
  }

  /** The [[ScrubFamily]] of a fingerprint modality: stored rows ARE the
    * probe side (collapse = false — no per-batch O(corpus) groupBy),
    * band keys persisted as extra index columns. */
  def family(subdir: String, fpName: String, fpAdd: FpAdd,
      maxHamming: Int, materializeFp: Boolean = true): ScrubFamily =
    ScrubFamily(
      subdir = subdir, keyCol = fpName, cntCol = "n_refs",
      statCols = Seq(fpName),
      // prepare decodes the trigger ONCE into (id, fp); index and judge
      // both read the prepared frame (was: one decode pass per leg)
      prepare = (df, idCol, contentCol) =>
        prepared(df, idCol, contentCol, fpAdd, fpName, materializeFp),
      indexOf = (prep, _, _) => indexFromFp(prep, fpName),
      incremental = (prep, idCol, _, idx) =>
        novelPrepared(prep, idCol, idx, fpName, maxHamming),
      collapse = false, extraIndexCols = Seq("t", "v"),
      // the probe equi-joins stored rows on the band keys, so the
      // per-partition sidecar blooms key on (t, v) — a batch whose
      // derived keys miss a partition's sidecar skips its files
      fileKeyCols = Seq("t", "v"))
}
