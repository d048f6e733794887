package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (BASELINE north
  * star). Four families, all shuffle-bounded and scale-safe:
  *
  *  - exact: hash the normalized content, dropDuplicates — one shuffle.
  *  - n-gram Jaccard (exact): inverted shingle index + count-sharing join —
  *    only pairs that share >= 1 shingle are materialized, never O(n^2).
  *  - MinHash + LSH: signature banding -> bucket self-join -> exact verify
  *    on the candidates.
  *  - SimHash: 64-bit fingerprints -> byte-chunk banding -> Hamming filter
  *    -> exact verify.
  */
object Dedup {

  /** Exact dedup on normalized content (first occurrence by idCol kept
    * deterministic via min). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = regexp_replace(lower(col(textCol)), "\\s+", " ")
    df.withColumn("__fp", xxhash64(norm))
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("__fp")
  }

  /** Exact pairwise n-gram Jaccard >= `threshold` via inverted index:
    * explode shingles, self-join on shingle, count shared shingles per
    * pair, then jac = |A∩B| / (|A|+|B|-|A∩B|). Pairs sharing zero shingles
    * never appear (their Jaccard is 0). At 100 TB add a document-frequency
    * cap on shingles (drop shingles in > maxDf docs) to bound the hottest
    * join keys — parameterized here, default off for exactness. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Option[Long] = None): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, n)
    val sizes = sh.select(col("id"), size(col("sh")).as("sz"))
    // join on the 64-bit shingle hash: 8-byte shuffle keys instead of the
    // shingle text (collision odds ~|shingles|^2 / 2^65 — negligible)
    val inv0 = sh.select(col("id"), explode(col("sh")).as("s0"))
      .select(col("id"), xxhash64(col("s0")).as("s"))
    val inv = maxDf match {
      case Some(cap) =>
        val dfreq = inv0.groupBy("s").count().filter(col("count") <= cap).select("s")
        inv0.join(dfreq, "s")
      case None => inv0
    }
    val shared = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("inter"))
    shared
      .join(sizes.withColumnRenamed("id", "i").withColumnRenamed("sz", "sz_i"), "i")
      .join(sizes.withColumnRenamed("id", "j").withColumnRenamed("sz", "sz_j"), "j")
      .withColumn("jac", col("inter").cast("double") /
        (col("sz_i") + col("sz_j") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), col("jac"))
  }

  /** MinHash signature: min over shingle hashes per permutation — native
    * single-pass Catalyst expression (see MinHashSignature). Per-row work,
    * no shuffle. */
  def minhashSignature(shingleArr: Column, numHashes: Int, seed: Long = 42L): Column =
    MinHashSignature(shingleArr, numHashes, seed)

  /** MinHash+LSH near-dup pairs: band the signature (bands x rowsPerBand =
    * numHashes), bucket-join docs sharing any band, verify candidates with
    * exact shingle Jaccard. Candidate generation is one explode + one
    * equi-join shuffle on band keys — never O(n^2). Recall at `threshold`
    * is 1-(1-t^r)^b (e.g. b=32, r=4: >0.9999 at t=0.8). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sh = shingleSets(df, idCol, textCol, n)
    val sig = sh.select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
    // persisted: the band self-join reads this twice
    val banded = sig.select(col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), hash(slice(col("sig"), b * r + 1, r)).as("bh"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j")).distinct()
    verifyJaccard(cands, sh, threshold)
  }

  /** SimHash near-dup pairs: 64-bit fingerprint per doc, band by the 8
    * bytes, filter by Hamming <= maxHamming, verify with exact Jaccard.
    *
    * Recall guarantee: byte banding catches EVERY pair with Hamming <= 7
    * (pigeonhole); pairs in (7, maxHamming] are found only when their
    * differing bits cluster so that >= 1 byte matches — probabilistic.
    * Near-dups at the default verify threshold (Jaccard 0.9 => expected
    * Hamming ~4-6 of 64) sit comfortably inside the guaranteed band; raise
    * the band count (finer chunks) before raising maxHamming if you need
    * guaranteed recall deeper into the tail. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxHamming: Int = 24, threshold: Double = 0.9): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, n)
    val fp = sh.select(col("id"), SimHash64(col("sh")).as("fp"))
    // two chunkings (bytes of fp, bytes of fp rotated 4 bits): each
    // guarantees candidates at Hamming <= 7; jointly they catch most
    // higher-Hamming near-dups (short docs inflate bit-vote noise —
    // e.g. ~40-token docs at Jaccard 0.97 measured Hamming 14)
    val rot = shiftrightunsigned(col("fp"), 4)
      .bitwiseOR(shiftleft(col("fp"), 60)).as("fp_rot")
    val chunked = fp.select(col("id"), col("fp"), rot)
      .select(col("id"), col("fp"),
        explode(array((0 until 16).map { c =>
          val src = if (c < 8) col("fp") else col("fp_rot")
          struct(lit(c).as("c"),
            shiftright(src, (c % 8) * 8).bitwiseAND(lit(255L)).as("v"))
        }: _*)).as("ck"))
      .select(col("id"), col("fp"), col("ck.c").as("c"), col("ck.v").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = chunked.as("a").join(chunked.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .filter(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= maxHamming)
      .select(col("a.id").as("i"), col("b.id").as("j")).distinct()
    verifyJaccard(cands, sh, threshold)
  }

  /** Shingle sets per doc, persisted: every pair pipeline reads them at
    * least twice (index/signature build + exact verify). Comparable in
    * size to the corpus text itself, so MEMORY_AND_DISK (spills, never
    * OOMs). Lifecycle is session-scoped: callers running many pipelines in
    * one long-lived session should `spark.catalog.clearCache()` between
    * corpora. */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.shingles(col(textCol), n).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Exact-Jaccard verification of candidate (i, j) pairs against the
    * shingle sets. Candidates are few by construction; the join is two
    * broadcast-friendly lookups. */
  private def verifyJaccard(cands: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(sh.select(col("id").as("i"), col("sh").as("sh_i")), "i")
      .join(sh.select(col("id").as("j"), col("sh").as("sh_j")), "j")
      .withColumn("jac",
        size(array_intersect(col("sh_i"), col("sh_j"))).cast("double") /
          size(array_union(col("sh_i"), col("sh_j"))))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), col("jac"))

  /** Embedding near-dup pairs: cosine >= threshold via sign-LSH bucketing
    * + exact rerank (delegates candidate generation to Similarity). */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    Similarity.cosinePairsLsh(df, idCol, vecCol, threshold)
}
