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

  /** Pipeline-scoped cache lifecycle for the pair-level entry points: the
    * session-scoped persists they plant (shingle sets, inverted indexes,
    * banded signatures) are the right default for batch jobs — the caller
    * may verify/cluster off the same intermediates — but a long-lived
    * service calling pair ops per request would accumulate cache blocks
    * until `clearCache()`. With `eager = true` the result is materialized
    * (localCheckpoint — also cuts the lineage) and every internal persist
    * is released before returning: no CacheManager entry outlives the call.
    *
    * Fault-tolerance caveat: localCheckpoint blocks live in executor block
    * managers until the RDD is GC'd and, because lineage is cut, they are
    * NOT recomputable — losing an executor (dynamic allocation, preemption)
    * makes later reads of the eager result fail permanently.
    *
    * Services with executor churn opt into the RELIABLE variant by setting
    * the session conf `spark.graft.eagerCheckpoint.reliable=true` (plus
    * `sparkContext.setCheckpointDir` to durable storage): the result then
    * materializes via `checkpoint(eager=true)` — one write to the
    * checkpoint dir buys results that survive any executor loss. Same
    * cache-lifecycle contract either way; the conf only picks where the
    * materialized blocks live. */
  private[ext] def finishEager(out: DataFrame, eager: Boolean,
      caches: Seq[DataFrame]): DataFrame =
    if (!eager) out
    else {
      val spark = out.sparkSession
      val reliable = spark.conf
        .getOption("spark.graft.eagerCheckpoint.reliable").exists(_.toBoolean)
      val mat =
        if (reliable) {
          require(spark.sparkContext.getCheckpointDir.isDefined,
            "reliable eager checkpoint needs sparkContext.setCheckpointDir " +
              "(durable storage) before the call")
          out.checkpoint(true)
        } else out.localCheckpoint(true)
      caches.foreach(_.unpersist())
      mat
    }

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
    * explode shingles, self-join on shingle, then exact
    * jac = |A∩B| / |A∪B| per candidate pair. Pairs sharing zero shingles
    * never appear (their Jaccard is 0).
    *
    * Design notes (both alternatives measured at sf0.1, 5000 docs):
    *  - The shared-shingle count aggregates map-side (codegen'd partial
    *    count over narrow rows), so the exact intersection comes out of
    *    ONE shuffle. This beats a PPJoin-style prefix-filter index + per-
    *    candidate set verify here: with a small vocabulary the candidate
    *    set stays large (~0.4M pairs after prefix+size filtering), and
    *    per-candidate array intersection costs ~4x more than the count
    *    shuffle it replaces.
    *  - A size-ratio predicate inside the join (jac >= t forces
    *    t·|B| <= |A| <= |B|/t) prunes pairs that cannot pass the
    *    threshold BEFORE the aggregation. The predicate depends only on
    *    the riding sz columns, so it removes whole pairs, never
    *    individual count rows — surviving counts stay exact.
    *  - Set sizes ride along in the index (8 bytes/row of extra shuffle)
    *    so the aggregation emits them directly — two join stages cheaper
    *    than attaching sizes to the aggregated pairs afterwards.
    *
    * `maxDf` (ON by default — the 100 TB guard) drops shingles present in
    * more than maxDf documents from the CANDIDATE index only: a shingle in
    * df docs contributes C(df,2) candidate pairs, so on natural text a
    * single boilerplate shingle with df ~ n makes candidate generation
    * quadratic. Jaccard values are still exact — hot shingles are removed
    * only from the join, then restored into the intersection count from
    * small per-doc hot-shingle sets (see splitHot). The only recall change
    * is that a pair is missed iff EVERY shingle it shares is corpus-hot
    * (> maxDf docs). A pair at jac >= t shares >= t/(1+t) * (|A|+|B|)
    * shingles, so any genuine near-dup with at least one sub-boilerplate
    * shingle survives. `maxDf = None` restores exhaustive recall. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5,
      maxDf: Option[Long] = Some(1000L), eager: Boolean = false): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, n)
    // join on the 64-bit shingle hash: 8-byte shuffle keys instead of the
    // shingle text (collision odds ~|shingles|^2 / 2^65 — negligible)
    val inv0 = sh.select(col("id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("s0"))
      .select(col("id"), col("sz"), xxhash64(col("s0")).as("s"))
    val (inv, hotCorrection, invCaches) = splitHot(inv0, "s", maxDf)
    // the 1e-9 slack keeps t*|B| from rounding UP past the true value
    // (9 >= 10*0.9 must hold despite 10*0.9 == 9.000000000000002)
    val eps = lit(1e-9)
    val shared = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          col("a.sz") >= col("b.sz") * threshold - eps &&
          col("b.sz") >= col("a.sz") * threshold - eps)
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("inter_cold"),
        first(col("a.sz")).as("sz_i"), first(col("b.sz")).as("sz_j"))
    val out = hotCorrection(shared)
      .withColumn("jac", col("inter").cast("double") /
        (col("sz_i") + col("sz_j") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), col("jac"))
    finishEager(out, eager, sh +: invCaches)
  }

  /** The df-cap machinery shared by the inverted-index pair pipelines.
    * Splits the index into cold keys (df <= cap; drive candidate
    * generation and the bulk shared count) and hot keys (df > cap;
    * boilerplate — JOINING on them is quadratic, but each document holds
    * only a handful, so they ride along as a small per-doc array and the
    * exact shared count is restored per candidate pair by intersecting
    * those arrays). Returns the cold index, a function adding the exact
    * `inter` column to a (i, j, inter_cold) pair frame, and the persisted
    * frames it planted (for eager-lifecycle release). */
  private[ext] def splitHot(inv0: DataFrame, key: String,
      maxDf: Option[Long]): (DataFrame, DataFrame => DataFrame, Seq[DataFrame]) =
  maxDf match {
    case None =>
      (inv0, _.withColumn("inter", col("inter_cold")), Nil)
    case Some(cap) =>
      // three consumers (df counts, cold anti-join, hot sets): persist the
      // exploded index instead of recomputing the explode+hash per use.
      // Lifecycle matches shingleSets: session-scoped, clearCache() between
      // corpora in long-lived sessions.
      val inv = inv0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfreq = inv.groupBy(key).count()
      val hotKeys = dfreq.filter(col("count") > cap).select(key)
      // no broadcast hint: hot-key cardinality is data-dependent (up to
      // index-entries/cap at corpus scale) — AQE broadcasts when the set
      // is actually small and falls back to a shuffle join when not
      val cold = inv.join(hotKeys, Seq(key), "left_anti")
      val hotSets = inv.join(hotKeys, key)
        .groupBy("id").agg(collect_set(col(key)).as("hot"))
      val empty = array().cast("array<bigint>")
      val correct = (shared: DataFrame) => shared
        .join(hotSets.select(col("id").as("i"), col("hot").as("hot_i")), Seq("i"), "left")
        .join(hotSets.select(col("id").as("j"), col("hot").as("hot_j")), Seq("j"), "left")
        .withColumn("inter", col("inter_cold") +
          size(array_intersect(coalesce(col("hot_i"), empty),
            coalesce(col("hot_j"), empty))))
      (cold, correct, Seq(inv))
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
      threshold: Double = 0.8, eager: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sh = shingleSets(df, idCol, textCol, n)
    // persisted: the band self-join reads this twice
    val banded = bandKeys(sh, numHashes, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j")).distinct()
    finishEager(verifyJaccard(cands, sh, threshold), eager, Seq(sh, banded))
  }

  /** LSH band keys (id, band, bh) from a shingle-set frame (id, sh): the
    * single definition both the batch self-join and the incremental index
    * use — a signature banded today MUST collide with the same document
    * banded last month, so the band-hash construction can never fork. */
  private def bandKeys(sh: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val r = numHashes / bands
    sh.select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
      .select(col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"), hash(slice(col("sig"), b * r + 1, r)).as("bh"))
        }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
  }

  /** Persisted MinHash index for INCREMENTAL dedup — the shape a 100 TB
    * continuous-ingestion pipeline actually needs: the corpus is
    * signatured ONCE, and each arriving batch is checked against the
    * index without ever re-reading (let alone re-shingling) the corpus.
    *
    * Two frames, both keyed by doc id, meant to live as warehouse/parquet
    * tables the caller appends each accepted batch's [[Dedup.minhashIndex]]
    * delta to:
    *  - `bands`: (id, band, bh) — the LSH bucket keys, 8-byte rows,
    *    `bands`-per-doc; the candidate probe target.
    *  - `shingles`: (id, sh) — the shingle sets backing exact-Jaccard
    *    verification of candidates. */
  final case class MinhashIndex(bands: DataFrame, shingles: DataFrame)

  /** Build the index rows for a corpus or batch (also the per-batch delta
    * to append after [[filterNovel]] accepts documents). Pure per-row work
    * plus the band explode — no shuffle. */
  def minhashIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32): MinhashIndex = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sh = df.select(col(idCol).as("id"),
      TextAnalysis.shingles(col(textCol), n).as("sh"))
    MinhashIndex(bandKeys(sh, numHashes, bands), sh)
  }

  /** Near-dup pairs between a NEW batch and (indexed corpus ∪ the batch
    * itself) — equal to `minhashPairs(corpus ∪ batch)` restricted to pairs
    * touching >= 1 batch document, without touching the corpus text.
    *
    * Scale shape: with `broadcastBatch` (the default — a batch is small
    * next to the corpus by contract) the batch's band keys broadcast, so
    * the corpus-scale index is PROBED in place: one scan, no index
    * shuffle, no corpus re-signaturing. Candidates verify by exact
    * Jaccard against `index.shingles` + the batch's own shingle sets.
    * Set broadcastBatch = false for a jumbo batch; the probe becomes a
    * plain equi-join (AQE still broadcasts if the batch turns out small).
    *
    * Ids must be unique across corpus ∪ batch; a re-ingested id produces
    * no self-pair, and the batch's shingle sets take precedence in
    * verification. `n`/`numHashes`/`bands` must match the index build. */
  def incrementalMinhashPairs(newDf: DataFrame, idCol: String,
      textCol: String, index: MinhashIndex, n: Int = 3,
      numHashes: Int = 128, bands: Int = 32, threshold: Double = 0.8,
      broadcastBatch: Boolean = true, eager: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val newSh = shingleSets(newDf, idCol, textCol, n)
    val newBanded = bandKeys(newSh, numHashes, bands).persist(lvl)
    val probe = if (broadcastBatch) broadcast(newBanded) else newBanded
    val newOld = index.bands.as("b").join(probe.as("a"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("i"),
        greatest(col("a.id"), col("b.id")).as("j"))
    val newNew = newBanded.as("a").join(newBanded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
    val cands = newOld.unionByName(newNew).distinct()
    // batch shingles take precedence on id collision (re-ingest): anti-join
    // the index side on the batch's (broadcast-small) id set
    val shAll = index.shingles.select(col("id"), col("sh"))
      .join(broadcast(newSh.select(col("id"))), Seq("id"), "left_anti")
      .unionByName(newSh)
    finishEager(verifyJaccard(cands, shAll, threshold), eager,
      Seq(newSh, newBanded))
  }

  /** Incremental ingestion filter: the batch documents that are NOT
    * near-dups of the indexed corpus or of each other — the per-batch
    * accept step of a continuously-deduped corpus. Cluster-granularity
    * policy, matching [[dropNearDuplicates]]'s resolution semantics:
    *
    *  - a batch doc pairing with any indexed doc is dropped;
    *  - within-batch clusters (connected components over batch-batch
    *    pairs) keep exactly their min-id root — unless any member touches
    *    the corpus, which taints and drops the whole cluster (its content
    *    already exists transitively).
    *
    * Append `minhashIndex(filterNovel(...))` to the index afterwards to
    * complete the ingestion cycle. The pair set is small by construction;
    * everything downstream of the probe operates on it, never on the
    * corpus. */
  def filterNovel(newDf: DataFrame, idCol: String, textCol: String,
      index: MinhashIndex, n: Int = 3, numHashes: Int = 128,
      bands: Int = 32, threshold: Double = 0.8,
      broadcastBatch: Boolean = true): DataFrame = {
    val pairs = incrementalMinhashPairs(newDf, idCol, textCol, index, n,
      numHashes, bands, threshold, broadcastBatch, eager = true)
    // tag pair ends against the BATCH id set (broadcast-small), never the
    // corpus-scale index: every id is either indexed or in the batch, so
    // old = not-new, and nothing here shuffles
    val newIds = newDf.select(col(idCol).as("id"))
    val tagged = pairs
      .join(broadcast(newIds.select(col("id").as("i"), lit(true).as("__i_new"))),
        Seq("i"), "left")
      .join(broadcast(newIds.select(col("id").as("j"), lit(true).as("__j_new"))),
        Seq("j"), "left")
      .localCheckpoint(true)
    val touchOld = tagged
      .filter(col("__i_new").isNull || col("__j_new").isNull)
      // the indexed end stays, the batch end drops
      .select(when(col("__j_new").isNull, col("i"))
        .otherwise(col("j")).as("id"))
    val batchPairs = tagged
      .filter(col("__i_new").isNotNull && col("__j_new").isNotNull)
      .select(col("i"), col("j"))
    val labels = connectedComponents(batchPairs)
    val taintedRoots = labels
      .join(touchOld.withColumnRenamed("id", "node"), Seq("node"), "left_semi")
      .select(col("label")).distinct()
    val taintedNodes = labels.join(taintedRoots, Seq("label"), "left_semi")
      .select(col("node").as("id"))
    val nonRoots = labels.filter(col("node") =!= col("label"))
      .select(col("node").as("id"))
    // drop set materialized (pair-bounded, tiny) so the labels cache and
    // the iterative lineage release before the corpus-side anti-join
    val drops = touchOld.unionByName(taintedNodes).unionByName(nonRoots)
      .distinct().withColumnRenamed("id", idCol).localCheckpoint(true)
    labels.unpersist()
    newDf.join(drops, Seq(idCol), "left_anti")
  }

  /** SimHash near-dup pairs: 64-bit fingerprint per doc, candidate
    * generation by 16-bit banding keys, filter by Hamming <= maxHamming,
    * verify with exact Jaccard.
    *
    * Candidate keyspace (the 100 TB-scale design point): every key is
    * 16 bits wide, so unrelated documents collide on a given table with
    * probability 2^-16 — candidate volume stays ~linear in corpus size
    * instead of the ~n^2/32 a byte-value keyspace produces. Two key
    * families, unioned:
    *
    *  - Block-combination tables (Manku et al., WWW'07 "Detecting
    *    near-duplicates for web crawling": block-permuted fingerprint
    *    tables keyed on multi-block prefixes). The fingerprint splits into
    *    8 byte-blocks; each of the C(8,2)=28 ordered block pairs forms one
    *    16-bit key table, over both chunkings (fp, fp rotated 4 bits).
    *    Pigeonhole guarantee: Hamming <= 6 implies at most 6 dirty blocks,
    *    hence >= 2 clean blocks, hence one fully-clean table key — every
    *    such pair is a candidate. Pairs in (6, maxHamming] match when >= 2
    *    blocks of either chunking are clean — increasingly probable below
    *    ~12 bits, which is where simhash concentrates genuine near-dups on
    *    documents with enough features (expected Hamming at the
    *    Jaccard-0.9 decision boundary is ~6.6 of 64).
    *  - Short-document minhash assist: documents with few shingles have
    *    noisy bit votes (measured: ~40-token docs at Jaccard 0.97 landing
    *    at Hamming 14, where any 16-bit exact-match family whiffs), so
    *    docs with <= minhashAssistMaxShingles shingles also emit 12 banded
    *    minhash keys (r=4 rows/band). Recall at Jaccard j is jaccard-level,
    *    independent of Hamming: 1-(1-j^4)^12 (>0.999997 at j=0.9); random
    *    pairs collide at ~12*j_bg^4 (~1e-4 at background similarity 0.07).
    *
    * Both families produce only candidates; the Hamming filter and the
    * exact-Jaccard verify define the result set. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxHamming: Int = 24, threshold: Double = 0.9,
      minhashAssistMaxShingles: Int = 512, eager: Boolean = false): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, n)
    val keyed = simhashKeys(sh, minhashAssistMaxShingles)
    // Hamming filter BEFORE the distinct: the per-row bit_count is cheaper
    // than deduplicating pairs that the filter would discard anyway
    val cands = simhashJoined(keyed)
      .filter(bit_count(col("fp_i").bitwiseXOR(col("fp_j"))) <= maxHamming)
      .select(col("i"), col("j")).distinct()
    finishEager(verifyJaccard(cands, sh, threshold), eager, Seq(sh, keyed))
  }

  /** Banding keys for simhashPairs: (id, fp, t, v) with t the table id and
    * v the 16-bit (or band-hash) key value. Persisted — the candidate
    * self-join reads it twice. Exposed for the scaling spec. */
  private[ext] def simhashKeys(sh: DataFrame, minhashAssistMaxShingles: Int): DataFrame = {
    val base = sh.filter(size(col("sh")) > 0).select(col("id"), col("sh"),
      SimHash64(col("sh")).as("fp"),
      // assist signature only where the assist tier applies: long docs
      // (concentrated simhash regime) skip the O(48*|shingles|) minhash
      when(size(col("sh")) <= minhashAssistMaxShingles,
        MinHashSignature(col("sh"), numHashes = 48)).as("sig"))
    val rot = shiftrightunsigned(col("fp"), 4)
      .bitwiseOR(shiftleft(col("fp"), 60))
    def byteOf(src: Column, k: Int): Column =
      shiftright(src, k * 8).bitwiseAND(lit(255L))
    // 2 chunkings x C(8,2) block pairs = 56 tables of 16-bit keys
    val manku = for {
      (src, c) <- Seq((col("fp"), 0), (rot, 1))
      i <- 0 until 8; j <- (i + 1) until 8
    } yield struct(
      lit(c * 28 + (i * (15 - i)) / 2 + (j - i - 1)).as("t"),
      shiftleft(byteOf(src, i), 8).bitwiseOR(byteOf(src, j)).as("v"))
    val assist = (0 until 12).map { b =>
      struct(lit(100 + b).as("t"),
        hash(slice(col("sig"), b * 4 + 1, 4)).cast("long").as("v"))
    }
    base.select(col("id"), col("fp"), explode(concat(
        array(manku: _*),
        when(size(col("sh")) <= minhashAssistMaxShingles, array(assist: _*))
          .otherwise(array().cast("array<struct<t:int,v:bigint>>")))).as("k"))
      .select(col("id"), col("fp"), col("k.t").as("t"), col("k.v").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Raw key-collision rows (one per colliding table, pre-distinct);
    * one equi-join shuffle on (table, key). */
  private def simhashJoined(keyed: DataFrame): DataFrame =
    keyed.as("a").join(keyed.as("b"),
        col("a.t") === col("b.t") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        col("a.fp").as("fp_i"), col("b.fp").as("fp_j"))

  /** Distinct candidate pairs from the banding keys (pre-Hamming-filter);
    * exposed for the scaling spec. */
  private[ext] def simhashCandidates(keyed: DataFrame): DataFrame =
    simhashJoined(keyed).distinct()

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
      threshold: Double, eager: Boolean = false): DataFrame =
    Similarity.cosinePairsLsh(df, idCol, vecCol, threshold, eager = eager)

  /** Connected components over near-dup pairs: every pair member gets its
    * component's minimum id as `label` — the cluster-resolution step that
    * turns pairwise similarity into KEEP/DROP decisions (keep the label
    * row, drop the rest). Near-duplicate similarity is not transitive, so
    * clusters (a~b, b~c without a~c) are exactly what pairs alone miss.
    *
    * Min-label propagation: each iteration every node takes the minimum
    * label among itself and its neighbors — one equi-join + partial-min
    * shuffle per iteration, converging in graph-diameter iterations (near
    * -dup clusters are shallow; the driver only ever collects the 1-row
    * convergence check, never the labels).
    *
    * The returned labels frame is persisted (it was materialized by the
    * convergence check, and callers typically both aggregate and join it);
    * its lifecycle is caller-owned — unpersist it (or
    * spark.catalog.clearCache()) when done. All internal intermediates are
    * unpersisted before returning. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // symmetrize via explode, NOT a union of two selects: a union would
    // evaluate the (possibly expensive) pairs plan once per branch
    val edges = pairs.select(explode(array(
        struct(col("i").as("a"), col("j").as("b")),
        struct(col("j").as("a"), col("i").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .persist(lvl)
    // seed each node with min(self, neighbors) — the same groupBy shuffle
    // the plain distinct-nodes init would cost, but it IS iteration one,
    // so cliques (the common near-dup shape) converge one round earlier
    var labels = edges.groupBy(col("a").as("node")).agg(min(col("b")).as("nmin"))
      .select(col("node"), least(col("node"), col("nmin")).as("label"))
      .persist(lvl)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("node").as("b"), col("label").as("nl")), "b")
        .groupBy(col("a").as("node")).agg(min(col("nl")).as("nmin"))
      // fold the changed flag into the frame: ONE job per iteration
      // (materialize + convergence check together), not a separate
      // compare-join action
      val next = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (coalesce(col("nmin"), col("label")) < col("label")).cast("long").as("chg"))
        .persist(lvl)
      // coalesce: sum over ZERO rows is null (a clean corpus produces an
      // empty pairs frame — that must mean "converged", not an NPE)
      converged = next.agg(coalesce(sum(col("chg")), lit(0L)))
        .collect()(0).getLong(0) == 0L
      labels.unpersist()
      labels = next.drop("chg")
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter " +
      "iterations (pathologically deep cluster chain)")
    // edges are fully consumed (labels was materialized by the convergence
    // check above); don't leave their cache blocks taxing the session
    edges.unpersist()
    labels
  }

  /** Near-dup cluster summary on a text corpus: exact n-gram Jaccard pairs
    * -> connected components -> (root, n_members) per cluster of size >= 2. */
  def ngramClusters(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5,
      maxDf: Option[Long] = Some(1000L)): DataFrame = {
    val labels = connectedComponents(
      ngramJaccardPairs(df, idCol, textCol, n, threshold, maxDf))
    // materialize the (tiny — one row per cluster) summary off the cached
    // labels, then release them: the iterative lineage must not be
    // re-runnable, and the cache blocks must not outlive the call
    val out = labels.groupBy(col("label").as("root"))
      .agg(count(lit(1)).as("n_members"))
      .localCheckpoint(true)
    labels.unpersist()
    out
  }

  /** The end-to-end resolution a training pipeline actually runs: corpus
    * in, near-dup-free corpus out. Every cluster keeps exactly its
    * min-id root; singletons (never paired) pass through untouched. One
    * left-anti join of the corpus against the non-root cluster members —
    * the drop set is pair-bounded, tiny next to the corpus. */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5,
      maxDf: Option[Long] = Some(1000L)): DataFrame = {
    val labels = connectedComponents(
      ngramJaccardPairs(df, idCol, textCol, n, threshold, maxDf))
    // drop set materialized eagerly (pair-bounded, tiny next to the
    // corpus) so the labels cache can be released before returning; the
    // checkpoint also cuts the iterative lineage out of the caller's plan
    val drops = labels.filter(col("node") =!= col("label"))
      .select(col("node").as(idCol))
      .localCheckpoint(true)
    labels.unpersist()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** [[dropNearDuplicates]] with a QUALITY keeper policy: each near-dup
    * cluster keeps its LONGEST member (token count, ties to the smaller
    * id) instead of the smallest id — the C4-style choice when
    * near-duplicates are truncations/excerpts of one another and the
    * fullest copy is the one worth training on. Same pair graph and
    * component resolution; the keeper pick is one rank window over the
    * pair-bounded label table, so the policy change costs nothing
    * against the corpus. */
  def dropNearDuplicatesKeepBest(df: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshold: Double = 0.5,
      maxDf: Option[Long] = Some(1000L)): DataFrame = {
    val labels = connectedComponents(
      ngramJaccardPairs(df, idCol, textCol, n, threshold, maxDf))
    val lens = df.select(col(idCol).as("node"),
      TextAnalysis.tokenCount(col(textCol)).as("__len"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("__len").desc, col("node"))
    val drops = labels.join(lens, Seq("node"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") =!= 1)
      .select(col("node").as(idCol))
      .localCheckpoint(true)
    labels.unpersist()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Quality-keeper policy: each near-dup cluster keeps the member with
    * the HIGHEST `score` (ties: longer text, then lower id) — the
    * FineWeb-style pick when a quality signal exists (LM score, Gopher
    * vote count, classifier probability): among near-copies, keep the
    * one worth training on, not merely the longest. Same cluster graph
    * and window shape as [[dropNearDuplicatesKeepBest]] (which is the
    * scoreless length-only special case); the score column evaluates
    * once per doc in the scan. */
  def dropNearDuplicatesKeepBestBy(df: DataFrame, idCol: String,
      textCol: String, score: Column, n: Int = 3, threshold: Double = 0.5,
      maxDf: Option[Long] = Some(1000L)): DataFrame = {
    val labels = connectedComponents(
      ngramJaccardPairs(df, idCol, textCol, n, threshold, maxDf))
    val scores = df.select(col(idCol).as("node"), score.as("__sc"),
      TextAnalysis.tokenCount(col(textCol)).as("__len"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"))
      .orderBy(col("__sc").desc, col("__len").desc, col("node"))
    val drops = labels.join(scores, Seq("node"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") =!= 1)
      .select(col("node").as(idCol))
      .localCheckpoint(true)
    labels.unpersist()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** SemDeDup-style semantic dedup (Abbas et al., arXiv 2303.09540 —
    * public paper): k-means the embedding space, then compare pairs ONLY
    * within a cluster and drop every vector whose cosine to a LOWER-id
    * cluster-mate reaches `threshold` (keep-first policy — deterministic,
    * no transitive closure). Output: surviving (id, cid) rows.
    *
    * This is the scale path for embedding dedup when sign-LSH recall
    * isn't wanted as a semantics knob: clustering makes the quadratic
    * step O(Σ|cluster|²) instead of O(N²), and k is chosen so clusters
    * stay small (the paper uses k ≈ N/5000 at web scale). The pairwise
    * step is one equi-join on cid — shuffled by cluster, so each
    * cluster's block never leaves one task; a pathologically hot cluster
    * is the [[Skew]] salting case.
    *
    * Training reuses [[KMeans.fitAssign]] verbatim (md5 seeds, argmin
    * ties to cid, decimal centroid sums), so the whole pipeline —
    * training, assignment, pair cosines, drop policy — replays exactly
    * on any SQL engine. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2, threshold: Double = 0.95,
      eager: Boolean = false): DataFrame = {
    val assigned = KMeans.fitAssign(df, idCol, vecCol, k, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // norms are per-ROW values: hoist them before the pair join so each
    // vector's norm fold runs once per row, not once per cluster-mate
    // pair (the interpreted-HOF cost is O(pairs·dim) otherwise). The
    // cosine below divides the same dot by the same two sqrt values in
    // the same order — bit-identical to Similarity.cosine per pair.
    val a = assigned.select(col("cid"), col("id").as("i"), col("v").as("vi"),
      Similarity.norm(col("v")).as("__ni"))
    val b = assigned.select(col("cid"), col("id").as("j"), col("v").as("vj"),
      Similarity.norm(col("v")).as("__nj"))
    val dropped = a.join(b, "cid")
      .filter(col("i") < col("j"))
      .filter(Similarity.dot(col("vi"), col("vj")) /
        (col("__ni") * col("__nj")) >= threshold)
      .select(col("j").as("id")).distinct()
    val out = assigned.join(dropped, Seq("id"), "left_anti")
      .select(col("id"), col("cid"))
    finishEager(out, eager, Seq(assigned))
  }

  /** Exact SUBSTRING duplication — the within-document granularity the
    * doc-level families above cannot see (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better":
    * ExactSubstr removes every verbatim span that occurs twice anywhere
    * in the corpus, because duplicated BYTES, not duplicated documents,
    * are what the model memorizes). The paper builds one corpus-wide
    * suffix array — a single-machine structure. The distributed
    * formulation here tiles each document into disjoint `tileWords`-word
    * windows and group-bys the corpus on the tile text: linear explode,
    * one map-side-combinable count shuffle, no index build. Detection
    * fires when both occurrences of a span cover a full tile window AT
    * THE SAME OFFSET relative to each document's own tile grid — always
    * true for whole-document copies, shared prefixes, and grid-aligned
    * boilerplate (the dominant web-scrape cases), but a verbatim run
    * whose two occurrences start at different offsets mod `tileWords`
    * tiles differently in each and can slip through. For guaranteed
    * recall of every run >= windowWords use [[windowDuplication]]
    * (overlapping windows, stride dial) as the detector; this operator
    * is the REMOVER — disjoint tiles are what can be stripped without
    * double-deleting overlapped words.
    *
    * Emits per document: `n_tiles`, `dup_tiles` (tiles whose corpus
    * occurrence count > 1 — self-repetition inside one document counts,
    * same rule as the paper's self-similar spans), `dup_ratio`, and
    * `clean_text` with every duplicated tile stripped (ALL occurrences,
    * first included, as in ExactSubstr §4) while the sub-tile tail past
    * the last full window is always kept.
    *
    * Scale: tile rows are linear in corpus words; the occurrence count
    * and the per-document fold are the only shuffles (on tile-hash and
    * on id, both partial-agg); `collect_list` is bounded by a single
    * document's tile count.
    *
    * Shuffle keys are `xxhash64(tile)` (8 bytes), never the tile TEXT
    * (~50–100 bytes for 8 words) — the count shuffle and the count-join
    * carry ~10× less key volume, which is the dominant wire cost of this
    * family at corpus scale. Collision stance: two DIFFERENT tiles
    * sharing a 64-bit hash would merge their counts and could mark a
    * unique tile duplicated; with n distinct tiles the expected affected
    * fraction is n/2⁶⁴ — at 10¹³ tiles (≈100 TB of text) that is ~5·10⁻⁷
    * of tiles, i.e. a few spurious 8-word strips per ~2M documents,
    * far below the noise floor of the screen itself. Tile text is kept
    * ONLY on the per-document side, where `clean_text` reassembly needs
    * it. */
  def tileDuplication(df: DataFrame, idCol: String, textCol: String,
      tileWords: Int = 8): DataFrame = {
    val counts = tilesOf(df, idCol, textCol, tileWords)
      .filter(col("__tile").isNotNull)
      .select(xxhash64(col("__tile")).as("__th"))
      .groupBy(col("__th")).agg(count(lit(1)).as("__cnt"))
    tileFold(df, idCol, textCol, tileWords, counts)
  }

  private def wordsOf(textCol: String) = split(trim(col(textCol)), "\\s+")

  /** (idCol, __i, __tile) rows — one per full tile window, plus a
    * (null, null) marker row for tile-less docs (posexplode_outer).
    *
    * The word array is BOUND to a column before the tile lambda touches
    * it: higher-order functions evaluate interpreted, re-running any
    * expression subtree inside the lambda once per element — a lambda
    * over the raw `split()` re-splits the whole document per tile,
    * O(words²/tileWords) per doc (the round-9 RepetitionStats lesson,
    * still live here). Bound as an attribute, the split runs once per
    * row and each slice is O(tileWords). Tiles, hashes, and counts are
    * byte-identical either way. */
  private def tilesOf(df: DataFrame, idCol: String, textCol: String,
      tileWords: Int): DataFrame = {
    require(tileWords > 0, "tileWords must be positive")
    val wsb = col("__ws")
    val ntb = floor(size(wsb) / lit(tileWords)).cast("long")
    val tiles = transform(sequence(lit(0L), ntb - 1),
      i => array_join(slice(wsb, (i * tileWords + 1).cast("int"), lit(tileWords)), " "))
    df.select(col(idCol), wordsOf(textCol).as("__ws"))
      .select(col(idCol),
        when(ntb > 0, tiles).otherwise(array().cast("array<string>")).as("__tiles"))
      .select(col(idCol), posexplode_outer(col("__tiles")).as(Seq("__i", "__tile")))
  }

  /** Per-doc fold shared by the batch and incremental paths: `counts`
    * is (__th = xxhash64(tile), __cnt) with __cnt the TOTAL occurrence
    * count a tile is judged against (> 1 = duplicated). The join key is
    * the hash; tile text rides along only for `clean_text` reassembly.
    * Marker rows for tile-less docs hash NULL and fall through the left
    * join unharmed (count(__tile) skips them either way). */
  private def tileFold(df: DataFrame, idCol: String, textCol: String,
      tileWords: Int, counts: DataFrame): DataFrame = {
    val ws = wordsOf(textCol)
    val nt = floor(size(ws) / lit(tileWords)).cast("long")
    val perDoc = tilesOf(df, idCol, textCol, tileWords)
      .withColumn("__th", xxhash64(col("__tile")))
      .join(counts, Seq("__th"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__tile")).as("n_tiles"),
        coalesce(sum(when(col("__cnt") > 1, 1L)), lit(0L)).as("dup_tiles"),
        array_join(transform(array_sort(collect_list(
          when(col("__cnt") === 1, struct(col("__i"), col("__tile"))))),
          t => t.getField("__tile")), " ").as("__kept"))
    val tail = df.select(col(idCol),
      array_join(slice(ws, (nt * tileWords + 1).cast("int"), size(ws)), " ")
        .as("__tail"))
    perDoc.join(tail, Seq(idCol))
      .select(col(idCol), col("n_tiles"), col("dup_tiles"),
        round(when(col("n_tiles") > 0,
          col("dup_tiles").cast("double") / col("n_tiles")).otherwise(0.0), 6)
          .as("dup_ratio"),
        trim(concat_ws(" ", col("__kept"), col("__tail"))).as("clean_text"))
  }

  /** Persisted tile index for [[tileDuplicationIncremental]]: corpus
    * occurrence counts per tile — `(tile_hash, n_refs)` with
    * `tile_hash = xxhash64(tile text)`, writable as parquet. Storing the
    * 8-byte hash instead of the ~50–100-byte tile text shrinks the
    * persisted index ~10× and makes every probe join fixed-width (same
    * collision stance as [[tileDuplication]]). The index is the corpus's
    * ONLY representation the incremental path ever touches (text is
    * never re-read); after accepting a batch, merge its [[tileIndex]] in
    * with [[mergeTileIndex]]. */
  def tileIndex(df: DataFrame, idCol: String, textCol: String,
      tileWords: Int = 8): DataFrame =
    tilesOf(df, idCol, textCol, tileWords)
      .filter(col("__tile").isNotNull)
      .groupBy(xxhash64(col("__tile")).as("tile_hash"))
      .agg(count(lit(1)).as("n_refs"))

  /** Fold a new batch's tile counts into a persisted index: one
    * map-side-combinable re-aggregation over the union. */
  def mergeTileIndex(index: DataFrame, add: DataFrame): DataFrame =
    index.unionByName(add)
      .groupBy(col("tile_hash")).agg(sum(col("n_refs")).as("n_refs"))

  /** Incremental [[tileDuplication]]: the arriving batch's duplication
    * stats and `clean_text` against (indexed corpus ∪ the batch itself),
    * equal to running the batch-mode operator over the full corpus and
    * keeping the batch rows — WITHOUT re-reading corpus text (the
    * continuous-ingestion contract shared with [[filterNovel]]). A batch
    * tile is duplicated iff its batch occurrences plus its indexed
    * `n_refs` exceed one. Cost is O(batch) plus one tile-keyed join
    * against the index (strategy left to AQE — a 100 TB corpus's index
    * shuffles, a small one broadcasts). */
  def tileDuplicationIncremental(batch: DataFrame, idCol: String,
      textCol: String, index: DataFrame, tileWords: Int = 8): DataFrame = {
    val counts = tilesOf(batch, idCol, textCol, tileWords)
      .filter(col("__tile").isNotNull)
      .select(xxhash64(col("__tile")).as("__th"))
      .groupBy(col("__th")).agg(count(lit(1)).as("__bc"))
      .join(index.select(col("tile_hash").as("__th"), col("n_refs").as("__ic")),
        Seq("__th"), "left")
      .select(col("__th"),
        (col("__bc") + coalesce(col("__ic"), lit(0L))).as("__cnt"))
    tileFold(batch, idCol, textCol, tileWords, counts)
  }

  /** Span-level decontamination — the excise-the-span form of the
    * benchmark screen (the GPT-3 appendix-C / Pile approach: REMOVE the
    * contaminated overlap, keep the document; doc-level dropping
    * ([[TextAnalysis.dropContaminated]]) throws away a 10k-word document
    * for one quoted test question): a corpus document's disjoint
    * `tileWords`-word tile is contaminated iff its exact word sequence
    * appears at ANY alignment inside ANY benchmark document. The
    * benchmark side contributes every OVERLAPPING window (stride 1 —
    * full recall on corpus tiles wholly inside a quoted span); the
    * corpus side strips only its disjoint tiles, so the alignment
    * asymmetry documented on [[tileDuplication]] applies: a quoted span
    * can straddle a tile boundary and leave up to `tileWords - 1` words
    * on each flank.
    *
    * Output per corpus doc: `n_tiles`, `hit_tiles`, `hit_ratio`,
    * `clean_text` (surviving tiles + sub-tile tail, original order).
    *
    * Scale shape: benchmark windows reduce to a DISTINCT xxhash64 key
    * set (eval sets are corpus-tiny — AQE broadcasts the join side);
    * the corpus pays the same two linear passes as [[tileDuplication]]
    * plus one 8-byte-keyed distinct + left join. Collision stance
    * 2^-64, shared with the tile family. */
  def decontaminateSpans(corpus: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      tileWords: Int = 8): DataFrame = {
    require(tileWords > 0, "tileWords must be positive")
    val bws = split(trim(col(benchTextCol)), "\\s+")
    val wins = transform(
      sequence(lit(0L), (size(bws) - tileWords).cast("long")),
      i => xxhash64(array_join(
        slice(bws, (i + 1).cast("int"), lit(tileWords)), " ")))
    val benchHashes = bench
      .select(when(size(bws) >= tileWords, wins)
        .otherwise(array().cast("array<bigint>")).as("__whs"))
      .select(explode(col("__whs")).as("__th")).distinct()
    val counts = tilesOf(corpus, idCol, textCol, tileWords)
      .filter(col("__tile").isNotNull)
      .select(xxhash64(col("__tile")).as("__th")).distinct()
      .join(benchHashes.withColumn("__hit", lit(1)), Seq("__th"), "left")
      .select(col("__th"),
        when(col("__hit").isNotNull, lit(2L)).otherwise(lit(1L)).as("__cnt"))
    tileFold(corpus, idCol, textCol, tileWords, counts)
      .withColumnRenamed("dup_tiles", "hit_tiles")
      .withColumnRenamed("dup_ratio", "hit_ratio")
  }

  /** Line-level exact dedup (the RefinedWeb/C4 line screen, Penedo '23
    * §3; the MassiveText "repetitious line" family's cross-document
    * form): a LINE occurring in more than `maxDocs` distinct documents
    * is boilerplate (nav bars, cookie banners, licence headers) and is
    * stripped from EVERY document; per doc the result is `n_lines`,
    * `dup_lines`, `dup_ratio`, and `clean_text` (surviving lines
    * rejoined in original order with newlines).
    *
    * Relationship to the [[TextAnalysis]] line scrubs (deliberate
    * siblings, different contracts): [[TextAnalysis.dropBoilerplateLines]]
    * is the scrub-ONLY form — no per-doc audit stats, emptied documents
    * drop, and the hot set force-broadcasts (valid when `maxLineDf` is
    * large, so the set is bounded small); THIS operator reports the
    * audit columns, keeps emptied documents (the funnel accounts for
    * them), leaves the count join to AQE (at `maxDocs = 1` the
    * duplicated-line set is NOT bounded small — a forced broadcast
    * would not survive 100 TB), and is the one with the persisted-index
    * incremental ([[lineDedupIncremental]]) and streaming
    * ([[graft.streaming.LineScrub]]) forms.
    * [[TextAnalysis.dedupLines]] is the keep-first-occurrence dedup
    * (one canonical copy survives) — a different semantics entirely.
    *
    * Matching is exact bytes — no trimming or case folding (compose
    * [[TextNormalize]] upstream for canonicalized matching). Blank
    * lines are lines: corpus-duplicated blanks strip like any other
    * boilerplate.
    *
    * Scale shape (the [[tileDuplication]] discipline): one linear
    * posexplode of lines; the corpus count table keys on
    * `xxhash64(line)` — an 8-byte shuffle/join key, ~10x smaller than
    * line text, collisions at the documented 2^-64 stance — built with
    * TWO hash-aggs (distinct (line, doc) then per-line doc count, both
    * map-side combinable); the count join back is AQE-planned; the
    * reassembly is one per-doc sort of surviving (pos, line) structs.
    * Nothing all-pairs, nothing driver-side. */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      maxDocs: Long = 1L): DataFrame = {
    require(maxDocs >= 1, s"maxDocs=$maxDocs must be >= 1")
    lineFold(df, idCol, textCol, maxDocs,
      lineIndex(df, idCol, textCol)
        .select(col("line_hash").as("__lh"), col("n_docs").as("__nd")))
  }

  /** Per-doc fold shared by the batch and incremental line paths:
    * `counts` is (__lh = xxhash64(line), __nd) with __nd the distinct-
    * document count a line is judged against. */
  private def lineFold(df: DataFrame, idCol: String, textCol: String,
      maxDocs: Long, counts: DataFrame): DataFrame =
    df.select(col(idCol),
        posexplode_outer(split(col(textCol), "\n")).as(Seq("__i", "__line")))
      .withColumn("__lh", xxhash64(col("__line")))
      .join(counts, Seq("__lh"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__line")).as("n_lines"),
        coalesce(sum(when(col("__nd") > maxDocs, 1L)), lit(0L))
          .as("dup_lines"),
        array_join(transform(array_sort(collect_list(
          when(col("__nd") <= maxDocs, struct(col("__i"), col("__line"))))),
          t => t.getField("__line")), "\n").as("clean_text"))
      .select(col(idCol), col("n_lines"), col("dup_lines"),
        round(when(col("n_lines") > 0,
          col("dup_lines").cast("double") / col("n_lines")).otherwise(0.0), 6)
          .as("dup_ratio"),
        col("clean_text"))

  /** Persisted line index for [[lineDedupIncremental]]: per line,
    * the number of DISTINCT documents containing it —
    * `(line_hash, n_docs)` with `line_hash = xxhash64(line)` (8-byte
    * rows, the [[tileIndex]] storage discipline). */
  def lineIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(split(col(textCol), "\n")).as("__line"))
      .select(xxhash64(col("__line")).as("line_hash"), col(idCol))
      .distinct()
      .groupBy(col("line_hash")).agg(count(lit(1)).as("n_docs"))

  /** Fold a batch's line index into a persisted one. Distinct-document
    * counts are additive ONLY across disjoint document sets — the
    * continuous-ingestion contract (batches are NEW documents; the
    * same doc re-observed across batches would double-count). */
  def mergeLineIndex(index: DataFrame, add: DataFrame): DataFrame =
    index.unionByName(add)
      .groupBy(col("line_hash")).agg(sum(col("n_docs")).as("n_docs"))

  /** Incremental [[lineDedup]]: the arriving batch screened against
    * (indexed corpus ∪ the batch itself) WITHOUT re-reading corpus
    * text — equal to batch mode over the full corpus restricted to the
    * batch rows, under the disjoint-batch contract of
    * [[mergeLineIndex]]. O(batch) plus one hash-keyed join against the
    * index (strategy left to AQE). */
  def lineDedupIncremental(batch: DataFrame, idCol: String,
      textCol: String, index: DataFrame, maxDocs: Long = 1L): DataFrame = {
    require(maxDocs >= 1, s"maxDocs=$maxDocs must be >= 1")
    val counts = lineIndex(batch, idCol, textCol)
      .withColumnRenamed("n_docs", "__bc")
      .join(index.select(col("line_hash"), col("n_docs").as("__ic")),
        Seq("line_hash"), "left")
      .select(col("line_hash").as("__lh"),
        (col("__bc") + coalesce(col("__ic"), lit(0L))).as("__nd"))
    lineFold(batch, idCol, textCol, maxDocs, counts)
  }

  /** The DETECTOR companion to [[tileDuplication]]: overlapping
    * `windowWords`-word windows at `stride`-word steps. With stride 1,
    * both occurrences of ANY verbatim run >= windowWords words emit the
    * identical window string regardless of alignment — full ExactSubstr
    * recall at that granularity (stride s relaxes the guarantee to runs
    * >= windowWords + s - 1 and divides the explode cost by s; the
    * stride-1 row count is windowWords x the corpus words, still linear).
    * Emits per document: `n_windows`, `dup_windows` (corpus occurrence
    * count > 1, self-repetition included), `dup_ratio`. Stripping stays
    * with the disjoint tiler — overlapped windows cannot be removed
    * without double-deleting shared words. */
  def windowDuplication(df: DataFrame, idCol: String, textCol: String,
      windowWords: Int = 8, stride: Int = 1): DataFrame = {
    require(windowWords > 0, "windowWords must be positive")
    require(stride > 0, "stride must be positive")
    // the word array is bound to a column before the window lambda uses
    // it (the tilesOf discipline): an un-bound split() inside the lambda
    // re-splits the document once PER WINDOW — at stride 1 that is
    // O(words²) per doc
    val wsb = col("__ws")
    val nPos = (floor((size(wsb) - windowWords) / lit(stride)) + 1).cast("long")
    // windows are NEVER needed as text downstream (stripping stays with
    // the tiler), so only their xxhash64 leaves the map side — both the
    // count shuffle and the count-join carry 8-byte keys instead of
    // ~50–100-byte window strings (same collision stance as
    // [[tileDuplication]]: expected affected fraction n/2⁶⁴)
    val wins = transform(sequence(lit(0L), nPos - 1),
      i => xxhash64(
        array_join(slice(wsb, (i * stride + 1).cast("int"), lit(windowWords)), " ")))
    val winned = df
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__ws"))
      .select(col(idCol),
        explode_outer(when(size(wsb) >= windowWords, wins)
          .otherwise(array().cast("array<bigint>"))).as("__wh"))
    val counts = winned.filter(col("__wh").isNotNull)
      .groupBy(col("__wh")).agg(count(lit(1)).as("__cnt"))
    winned.join(counts, Seq("__wh"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__wh")).as("n_windows"),
        coalesce(sum(when(col("__cnt") > 1, 1L)), lit(0L)).as("dup_windows"))
      .select(col(idCol), col("n_windows"), col("dup_windows"),
        round(when(col("n_windows") > 0,
          col("dup_windows").cast("double") / col("n_windows")).otherwise(0.0), 6)
          .as("dup_ratio"))
  }

  /** EXACT cross-corpus overlap: distinct word-`n`-gram shingle-set
    * sizes of corpus A, corpus B, their intersection and union, plus
    * Jaccard and containment(B in A) = inter/|B| — THE statistic that
    * decides whether a new crawl dump is worth deduplicating into an
    * existing corpus (a 0.9-contained dump adds 10% novel text).
    *
    * Scale shape: one explode per side, ONE shuffle keyed on
    * `xxhash64(shingle)` (8-byte keys, never shingle text — same
    * 2⁻⁶⁴-collision stance as [[tileDuplication]]) with map-side
    * combine folding each side's duplicates before anything moves,
    * then a single-row total — no join, no sort, linear in corpus
    * words. The divisions are single IEEE ops over exact BIGINTs,
    * identical on every engine. */
  def corpusOverlap(a: DataFrame, b: DataFrame, textCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    def side(df: DataFrame, ca: Int, cb: Int): DataFrame = df
      .select(explode(TextAnalysis.shingles(col(textCol), n)).as("__g"))
      .select(xxhash64(col("__g")).as("__h"),
        lit(ca.toLong).as("__a"), lit(cb.toLong).as("__b"))
    side(a, 1, 0).unionAll(side(b, 0, 1))
      .groupBy(col("__h"))
      .agg(max(col("__a")).as("__ia"), max(col("__b")).as("__ib"))
      .agg(sum(col("__ia")).as("n_a"), sum(col("__ib")).as("n_b"),
        sum(col("__ia") * col("__ib")).as("n_inter"),
        count(lit(1)).as("n_union"))
      .select(col("n_a"), col("n_b"), col("n_inter"), col("n_union"),
        // NULL on an empty side/union (ANSI double division throws)
        when(col("n_union") > 0,
          col("n_inter").cast("double") / col("n_union").cast("double"))
          .as("jaccard"),
        when(col("n_b") > 0,
          col("n_inter").cast("double") / col("n_b").cast("double"))
          .as("containment_b_in_a"))
  }

  /** KMV (k-minimum-values) SKETCH estimate of the same Jaccard
    * (Beyer '07 / Broder's bottom-k): each corpus reduces to its k
    * smallest distinct shingle hashes (TakeOrderedAndProject after the
    * distinct — per-partition bottom-k merges, never a global sort),
    * and est = |S ∩ Aₖ ∩ Bₖ| / |S| where S = bottom-k of the union.
    * Use when MANY corpus pairs are compared (N dumps pairwise): each
    * dump is scanned ONCE into a k-row sketch, and every pairwise
    * estimate after that is a k-row join — [[corpusOverlap]] rescans
    * both corpora per pair. Deterministic given the corpus (xxhash64,
    * no seed), so estimates are rerun-stable. */
  def corpusOverlapKmv(a: DataFrame, b: DataFrame, textCol: String,
      n: Int = 3, k: Int = 256): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val ka = kmvSketch(a, textCol, n, k).withColumn("__ia", lit(1L))
    val kb = kmvSketch(b, textCol, n, k).withColumn("__ib", lit(1L))
    val s = ka.select(col("__h")).unionAll(kb.select(col("__h")))
      .distinct().orderBy(col("__h")).limit(k)
    s.join(ka.select(col("__h"), col("__ia")), Seq("__h"), "left")
      .join(kb.select(col("__h"), col("__ib")), Seq("__h"), "left")
      .agg(count(lit(1)).as("s_size"),
        coalesce(sum(col("__ia") * col("__ib")), lit(0L)).as("s_both"))
      .select(col("s_size"), col("s_both"),
        when(col("s_size") > 0,
          col("s_both").cast("double") / col("s_size").cast("double"))
          .as("kmv_jaccard"))
  }

  /** One corpus's k-row KMV sketch: bottom-k distinct shingle hashes.
    * Persist per dump and compare sketches pairwise without rescanning
    * text ([[corpusOverlapKmv]] composes two of these). */
  def kmvSketch(df: DataFrame, textCol: String, n: Int = 3,
      k: Int = 256): DataFrame = df
    .select(explode(TextAnalysis.shingles(col(textCol), n)).as("__g"))
    .select(xxhash64(col("__g")).as("__h"))
    .distinct()
    .orderBy(col("__h")).limit(k)

  /** EXACT incremental form: the base corpus reduces ONCE to its
    * distinct shingle-hash set (persist this — the tileIndex pattern:
    * at 100 TB the index is rebuilt never, merged per dump), and each
    * new dump's overlap is one left join against it, base text never
    * re-read. `mergeShingleIndex` unions a newly accepted dump in, so
    * containment is always measured against everything ingested so
    * far. Columns: `shingle_hash`. */
  def shingleIndex(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    df.select(explode(TextAnalysis.shingles(col(textCol), n)).as("__g"))
      .select(xxhash64(col("__g")).as("shingle_hash"))
      .distinct()

  def mergeShingleIndex(index: DataFrame, add: DataFrame): DataFrame =
    index.unionByName(add).distinct()

  /** Containment of dump `b` against a persisted [[shingleIndex]]:
    * n_b distinct shingles, n_inter of them already indexed, and the
    * ratio — [[corpusOverlap]]'s `containment_b_in_a` computed without
    * rescanning corpus A. One explode + distinct on the dump side,
    * one hash-keyed left join (strategy left to AQE: a small index
    * broadcasts, a corpus-scale one shuffles both sides). */
  def containmentAgainst(index: DataFrame, b: DataFrame, textCol: String,
      n: Int = 3): DataFrame = {
    val sb = shingleIndex(b, textCol, n)
    sb.join(index.select(col("shingle_hash"), lit(1L).as("__in")),
        Seq("shingle_hash"), "left")
      .agg(count(lit(1)).as("n_b"),
        coalesce(sum(col("__in")), lit(0L)).as("n_inter"))
      .select(col("n_b"), col("n_inter"),
        when(col("n_b") > 0,
          col("n_inter").cast("double") / col("n_b").cast("double"))
          .as("containment"))
  }
}
