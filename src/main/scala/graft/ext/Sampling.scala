package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines: every
  * decision is a pure function of the row's key, so splits are stable
  * across runs, machines and partitionings (re-running the pipeline never
  * moves a document between train and validation), membership is joinable
  * after the fact, and nothing needs a shuffle — the split/filter runs
  * inside the scan's codegen stage.
  *
  * The key maps to one of `buckets` cells via `hashOf` (seed-42 xxhash64
  * by default — uniform even on sequential ids); weights carve the cell
  * range. */
object Sampling {

  val defaultBuckets = 10000

  private def bucketOf(key: Column, hashOf: Column => Column, buckets: Int): Column =
    pmod(hashOf(key), lit(buckets.toLong))

  /** Add a `split` label column ("train"/"val"/... by weight). Weights are
    * normalized; the last split absorbs integer-rounding remainder. */
  def assignSplit(df: DataFrame, keyCol: String,
      weights: Seq[(String, Double)], buckets: Int = defaultBuckets,
      hashOf: Column => Column = xxhash64(_)): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    // round CUMULATIVE sums, not per-weight increments: accumulating
    // rounded increments can exhaust the bucket range early and leave a
    // trailing split empty (0.45/0.45/0.1 over 10 buckets -> 5,10,!)
    val bounds = weights.map(_._2).scanLeft(0.0)(_ + _).tail.dropRight(1)
      .map(cum => math.round(cum / total * buckets)) // bounds of all but last
    val b = bucketOf(col(keyCol), hashOf, buckets)
    val label = bounds.zip(weights.map(_._1)).foldRight(
      lit(weights.last._1)) { case ((hi, name), rest) =>
      when(b < hi, name).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Keep a deterministic `fraction` of rows by key hash. */
  def sampleFraction(df: DataFrame, keyCol: String, fraction: Double,
      buckets: Int = defaultBuckets,
      hashOf: Column => Column = xxhash64(_)): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(bucketOf(col(keyCol), hashOf, buckets) <
      math.round(fraction * buckets))
  }

  /** Stratified sampling: a different deterministic fraction per stratum
    * (downsample the over-represented language/source, keep the rare one
    * whole — the standard training-mixture rebalance). Same key-hash
    * discipline as [[sampleFraction]]: the decision is a pure function of
    * (key, stratum fraction), so it is stable across runs and
    * partitionings and runs inside the scan — a literal when-chain, no
    * join, no shuffle. Strata missing from `fractions` get
    * `defaultFraction` (1.0 = pass through). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      buckets: Int = defaultBuckets,
      hashOf: Column => Column = xxhash64(_)): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions in [0,1]")
    val bound = fractions.toSeq.sortBy(_._1).foldRight(
      lit(math.round(defaultFraction * buckets))) { case ((s, f), rest) =>
      when(col(strataCol) === s, math.round(f * buckets)).otherwise(rest)
    }
    df.filter(bucketOf(col(keyCol), hashOf, buckets) < bound)
  }

  /** Integer upsampling by a per-row repeat count (mixture weighting:
    * high-quality sources repeated N times in the training mix). Rows with
    * repeat <= 0 are dropped; `copy` (0-based) distinguishes replicas. */
  def upsample(df: DataFrame, repeatCol: String): DataFrame =
    df.filter(col(repeatCol) > 0)
      .withColumn("copy",
        explode(sequence(lit(0L), col(repeatCol).cast("long") - 1)))

  /** The deterministic pseudo-random sort key shared by the exact-count
    * samplers: md5 of the key string — engine-portable (any SQL engine
    * reproduces the draw), uniform even on sequential ids. The key itself
    * tie-breaks, though md5 collisions never occur in practice. */
  private def drawOrder(keyCol: String): Seq[Column] =
    Seq(md5(col(keyCol).cast("string")), col(keyCol))

  /** EXACTLY `quota` rows per stratum (fewer if the stratum is smaller) —
    * the "100 documents per language" balanced-mixture draw, where
    * [[stratifiedSample]]'s per-stratum FRACTION cannot promise counts.
    * One shuffle on the stratum key; the rank <= quota predicate compiles
    * to WindowGroupLimit, which prunes to quota rows per stratum MAP-SIDE
    * before the shuffle — a skewed giant stratum never materializes
    * behind one task. Adds `rank` (1-based draw order within stratum). */
  def quotaSample(df: DataFrame, keyCol: String, strataCol: String,
      quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(drawOrder(keyCol): _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= quota)
  }

  /** EXACTLY `n` rows from the whole corpus by the same deterministic
    * draw — compiles to TakeOrderedAndProject (per-partition top-n, then
    * a driver-side merge of n-row heads), never a global sort. */
  def globalSample(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    df.orderBy(drawOrder(keyCol): _*).limit(n)
  }

  /** Training-mixture draw: per-source quotas ALLOCATED FROM TARGET
    * WEIGHTS — quota(s) = floor(weight(s) · total) — taken by the same
    * deterministic md5 order ([[quotaSample]] with data-dependent
    * quotas). Sources absent from `weights` drop; an under-populated
    * source yields what it has (the shortfall is the caller's signal to
    * re-weight, not something to silently backfill). This is the "mix
    * web : books : code at 70:20:10" step of corpus assembly.
    *
    * Same scale shape as quotaSample: the weight map rides as a literal,
    * the per-stratum rank is WindowGroupLimit-pruned map-side, and no
    * stratum ever concentrates into one task beyond its quota. Keep
    * weights × total in exactly-representable doubles (powers of two, or
    * integer-valued products) if cross-engine replay must be bit-exact. */
  def mixtureSample(df: DataFrame, keyCol: String, strataCol: String,
      weights: Seq[(String, Double)], total: Long): DataFrame = {
    require(weights.nonEmpty && total > 0, "mixture needs weights and total > 0")
    val wlit = typedlit(weights.toMap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(drawOrder(keyCol): _*)
    // LITERAL cap first: InferWindowGroupLimit only fires on a constant
    // bound, so the largest quota does the map-side prune and the exact
    // per-stratum quota filters the survivors
    val maxQuota = weights.map { case (_, wt) =>
      math.floor(wt * total).toLong }.max
    df.filter(element_at(wlit, col(strataCol)).isNotNull)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= maxQuota)
      .filter(col("rank") <=
        floor(element_at(wlit, col(strataCol)) * total).cast("long"))
  }

  /** Token-budget mixture — the form real pretraining mixes use: a
    * 70:20:10 web:books:code mix means 70% of the TOKENS, not 70% of
    * the documents (a books doc is 100× a web doc; doc-count quotas
    * would skew the realized token mix by exactly that ratio).
    * Per stratum, documents are drawn in the deterministic md5 order
    * until the stratum's token budget floor(weight · totalTokens) is
    * spent: a doc is selected iff its tokens BEGIN inside the budget
    * (`tok_start < budget` — the crossing doc is included, the same
    * span convention as [[weightedSystematic]] and `packSequences`),
    * so the realized overshoot is at most one document.
    *
    * Scale shape: NO single-partition stratum window. The per-stratum
    * prefix sum uses the `packSequences` bucketed trick — the md5
    * bucket is carved from the hash's leading hex chars, so global
    * (h, id) order within a stratum equals (bucket, h, id) order:
    * per-(stratum, bucket) totals cumulate on a tiny
    * strata × buckets frame (broadcast back), and each within-bucket
    * window holds 1/buckets of its stratum. Token arithmetic stays in
    * longs end to end — any engine replays the selection and every
    * `tok_start` exactly. Output: selected rows + `tok_start` (the
    * doc's first-token position in its stratum's draw line — an
    * assignment-binding checksum basis, not just membership).
    *
    * `buckets` must be a power of two <= 65536; size it to executor
    * count at scale. */
  def mixtureSampleTokens(df: DataFrame, keyCol: String,
      strataCol: String, weightCol: String,
      weights: Seq[(String, Double)], totalTokens: Long,
      buckets: Int = 64): DataFrame = {
    require(weights.nonEmpty && totalTokens > 0,
      "mixture needs weights and totalTokens > 0")
    require(buckets > 0 && buckets <= 65536 && (buckets & (buckets - 1)) == 0,
      s"buckets=$buckets must be a power of two <= 65536")
    val wlit = typedlit(weights.toMap)
    val step = 65536 / buckets
    val base = df.filter(element_at(wlit, col(strataCol)).isNotNull)
      .withColumn("__h", md5(col(keyCol).cast("string")))
      .withColumn("__b",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("long") / step)
          .cast("long"))
    val perBucket = base.groupBy(col(strataCol), col("__b"))
      .agg(sum(col(weightCol)).as("__tot"))
    // cumulate the tiny strata × buckets frame; broadcast back
    val offsets = perBucket.withColumn("__off",
      sum(col("__tot")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(strataCol)).orderBy(col("__b"))) - col("__tot"))
      .select(col(strataCol), col("__b"), col("__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("__b"))
      .orderBy(col("__h"), col(keyCol))
    base.join(broadcast(offsets), Seq(strataCol, "__b"))
      .withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn("tok_start",
        (col("__off") + col("__cum") - col(weightCol)).cast("long"))
      .filter(col("tok_start") <
        floor(element_at(wlit, col(strataCol)) * totalTokens).cast("long"))
      .drop("__h", "__b", "__cum")
  }

  /** Temperature-rebalanced mixture draw (the XLM-R / mT5 multilingual
    * step): stratum quotas proportional to n^0.5 instead of n, so
    * high-resource strata are downsampled and low-resource ones
    * over-represented relative to their share. α is FIXED at 0.5 because
    * sqrt is the one power IEEE 754 rounds correctly everywhere —
    * general `pow` is libm-specific and would break engine replay.
    *
    * The one order-dependent double — ΣΛ sqrt(n_λ) — is computed as a
    * running sum in stratum order (a window over the tiny strata frame),
    * so every engine adds in the same sequence; quotas are then
    * floor(total·w/W), and the draw itself is [[quotaSample]]'s
    * deterministic md5 order with the literal `total` cap doing the
    * map-side WindowGroupLimit prune under the data-dependent quota.
    * Output: selected rows + their stratum quota. */
  def temperatureSample(df: DataFrame, keyCol: String, strataCol: String,
      total: Long): DataFrame = {
    require(total > 0, s"total=$total must be positive")
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col(strataCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val strata = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", sqrt(col("__n").cast("double")))
      .withColumn("__cum", sum(col("__w")).over(wOrd))
      .localCheckpoint(true) // strata-sized; consumed twice below
    // W is ONE double of a strata-sized frame — the last running-sum
    // value rides back as a literal (the docLenStats bootstrap pattern)
    val bigW = strata.agg(max(col("__cum"))).head().getDouble(0)
    val quotas = strata.select(col(strataCol),
      floor(lit(total).cast("double") * col("__w") / lit(bigW))
        .cast("long").as("quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(drawOrder(keyCol): _*)
    df.join(broadcast(quotas), Seq(strataCol))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= total) // literal cap -> map-side prune
      .filter(col("rank") <= col("quota"))
  }

  /** Temperature mixing measured in TOKENS — the mT5/XLM-R recipe as it
    * is actually applied: stratum budgets proportional to
    * sqrt(tokens_λ), spent along the deterministic md5 draw line until
    * each budget is consumed (crossing doc included). Composes
    * [[temperatureSample]]'s sqrt-rebalancing (α fixed at 0.5 — sqrt is
    * the one power IEEE rounds correctly everywhere) with
    * [[mixtureSampleTokens]]'s budget-spending machinery, replacing the
    * doc-count quota with a token budget: a few long books can no
    * longer crowd out a low-resource language's whole allocation.
    *
    * ΣΛ sqrt(n_λ) is the one order-dependent double — computed as a
    * running sum in stratum order over the strata-sized frame, so every
    * engine adds in the same sequence; budgets are then
    * floor(totalTokens·w/W) longs and the spend is exact long
    * arithmetic (the bucketed prefix sum — no single-partition stratum
    * window). Output: rows + `budget` and `tok_start`. */
  def temperatureSampleTokens(df: DataFrame, keyCol: String,
      strataCol: String, weightCol: String, totalTokens: Long,
      buckets: Int = 64): DataFrame = {
    require(totalTokens > 0, s"totalTokens=$totalTokens must be positive")
    require(buckets > 0 && buckets <= 65536 && (buckets & (buckets - 1)) == 0,
      s"buckets=$buckets must be a power of two <= 65536")
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col(strataCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val strata = df.groupBy(col(strataCol)).agg(sum(col(weightCol)).as("__n"))
      .withColumn("__w", sqrt(col("__n").cast("double")))
      .withColumn("__cum", sum(col("__w")).over(wOrd))
      .localCheckpoint(true) // strata-sized; consumed twice below
    val bigW = strata.agg(max(col("__cum"))).head().getDouble(0)
    val budgets = strata.select(col(strataCol),
      floor(lit(totalTokens).cast("double") * col("__w") / lit(bigW))
        .cast("long").as("budget"))
    val step = 65536 / buckets
    val base = df.join(broadcast(budgets), Seq(strataCol))
      .withColumn("__h", md5(col(keyCol).cast("string")))
      .withColumn("__b",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("long") / step)
          .cast("long"))
    val perBucket = base.groupBy(col(strataCol), col("__b"))
      .agg(sum(col(weightCol)).as("__tot"))
    val offsets = perBucket.withColumn("__off",
      sum(col("__tot")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(strataCol)).orderBy(col("__b"))) - col("__tot"))
      .select(col(strataCol), col("__b"), col("__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("__b"))
      .orderBy(col("__h"), col(keyCol))
    base.join(broadcast(offsets), Seq(strataCol, "__b"))
      .withColumn("__cum", sum(col(weightCol)).over(w))
      .withColumn("tok_start",
        (col("__off") + col("__cum") - col(weightCol)).cast("long"))
      .filter(col("tok_start") < col("budget"))
      .drop("__h", "__b", "__cum")
  }

  /** Weight-proportional systematic sample: lay every row's integer
    * weight end-to-end along a line in the deterministic md5 draw order,
    * then keep each row whose span (g, g+w] covers a multiple of `step`.
    * Selection probability is w/step (rows with w ≥ step are always
    * kept), the expected sample is totalWeight/step rows, and — unlike
    * independent per-row coin flips — the spacing is even: a
    * token-budgeted corpus draw lands within one document of its budget
    * in every contiguous stretch. This is "sample 1 of every N tokens"
    * for mixture-weighted pretraining, with weight = token count.
    *
    * The global offset g is the distributed prefix sum of
    * [[graft.ext.TextAnalysis.packSequences]]: md5-prefix range buckets
    * (hash-prefix order IS global order), per-bucket window cumsum, the
    * |buckets|-row offset frame cumulated on one partition and broadcast
    * back. Only (key, weight) pairs shuffle; the span test is two long
    * divisions in codegen — exact at any corpus size (no double hop to
    * lose low bits past 2^53 total weight).
    *
    * Output: (key, weight, g) for selected rows — g is the evidence
    * column (and the join handle back to the full row). */
  def weightedSystematic(df: DataFrame, keyCol: String, weightCol: String,
      step: Long, buckets: Int = 64): DataFrame = {
    require(step > 0, s"step=$step must be positive")
    require(buckets > 0 && buckets <= 65536 && (buckets & (buckets - 1)) == 0,
      s"buckets=$buckets must be a power of two <= 65536")
    val bstep = 65536 / buckets
    val base = df.select(col(keyCol),
        md5(col(keyCol).cast("string")).as("__h"),
        col(weightCol).cast("long").as("weight"))
      .withColumn("__b",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("long") / bstep)
          .cast("long"))
    val offsets = base.groupBy(col("__b"))
      .agg(sum(col("weight")).as("__tot"))
      .withColumn("__off",
        sum(col("__tot")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__b"))) - col("__tot"))
      .select(col("__b"), col("__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__h"), col(keyCol))
    base.join(broadcast(offsets), "__b")
      .withColumn("__cum", sum(col("weight")).over(w))
      .withColumn("g", col("__off") + col("__cum") - col("weight"))
      // keep iff a multiple of step falls in (g, g+w]: both operands
      // nonnegative, so long `div` floors identically on every engine
      .filter(expr(s"(g + weight) div ${step}L") > expr(s"g div ${step}L"))
      .select(col(keyCol), col("weight"), col("g"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much more likely its tokens are under the TARGET
    * distribution than under the raw-corpus distribution, then keep the
    * top of the ranking. This is the bag-of-words member of the paper's
    * hashed-ngram family — features are the words themselves (the
    * paper's hashing is a memory optimization for the estimator, not a
    * semantic; with the estimator distributed, the vocabulary table IS
    * the compact representation). Add-one smoothing over the joint
    * vocabulary V:
    *
    *   weight(d) = Σ_w count_w(d) · ln( p̂_t(w) / p̂_r(w) ),
    *   p̂(w) = (cnt_w + 1) / (total + |V|).
    *
    * Determinism discipline (cross-engine replay): each per-word
    * log-ratio is one ln over ONE double division of identical integer
    * operands, rounded to 6 decimals and cast to DECIMAL; the per-doc
    * sum is decimal arithmetic — exact, summation-order independent —
    * and only the final weight returns to (rounded) double.
    *
    * Scale: the vocabulary table is bounded by |V| (heavy-tailed, far
    * smaller than the corpus); the totals are ONE scalar row broadcast
    * back; the per-doc fold shuffles once on (word, id) then once on id,
    * both with map-side partial aggregation. The vocab join strategy is
    * left to AQE — broadcast when |V| fits, shuffle join when a 100 TB
    * corpus's vocabulary does not. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val toks = df.select(col(idCol), isTarget.cast("boolean").as("__t"),
      explode(split(col(textCol), " ")).as("__w"))
    val vocab = toks.groupBy(col("__w")).agg(
      count(lit(1)).as("__r"),
      coalesce(sum(when(col("__t"), 1L)), lit(0L)).as("__tc"))
    val tot = vocab.agg(sum(col("__r")).as("__rt"), sum(col("__tc")).as("__tt"),
      count(lit(1)).as("__v"))
    val scored = vocab.crossJoin(broadcast(tot))
      .select(col("__w"),
        round(log(
          ((col("__tc") + 1).cast("double") * (col("__rt") + col("__v"))) /
          ((col("__r") + 1).cast("double") * (col("__tt") + col("__v")))), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("__lr"))
    toks.groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__c"))
      .join(scored, "__w")
      .groupBy(col(idCol))
      .agg(round(sum(col("__lr") * col("__c")).cast("double"), 6).as("weight"))
  }

  /** DSIR selection: the top `n` documents by importance weight
    * (deterministic variant — the paper's Gumbel-noise resampling is a
    * tie-breaking device for duplicate weights; here ties break on the
    * key, so the draw replays exactly). Compiles to
    * TakeOrderedAndProject, never a global sort. */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    dsirWeights(df, idCol, textCol, isTarget)
      .orderBy(col("weight").desc, col(idCol)).limit(n)
  }

  /** Deterministic global shuffle + sharding for training-corpus export:
    * every row gets a (shard, seq) position that is a pure function of
    * its key under `hashOf` — re-running the pipeline never reorders a
    * shard, a resumed export continues at the same seq, and NO global
    * sort exists anywhere: the shard is a hash bucket and seq is a
    * row_number inside the shard's partitioned window (numShards
    * independent sorts, each 1/numShards of the data — at export scale
    * numShards is thousands, so each window is one task's worth). The
    * writer side is `partitionBy(shard) + sortWithinPartitions(seq)`:
    * one file per shard, already in draw order. */
  def shuffleShards(df: DataFrame, keyCol: String, numShards: Int,
      hashOf: Column => Column = xxhash64(_)): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", hashOf(col(keyCol)))
      .withColumn("shard", pmod(col("__h"), lit(numShards.toLong)))
      .withColumn("seq", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Leakage-free split assignment: near-duplicate CLUSTERS move between
    * splits atomically. A plain per-document split leaks — a train doc's
    * near-copy lands in validation and the eval measures memorization,
    * the contamination the decontamination operators exist to prevent.
    * Here every document keys on its near-dup cluster root (exact n-gram
    * Jaccard pairs -> connected components, the [[Dedup.ngramClusters]]
    * graph); singletons key on themselves. The split label stays a pure
    * hash function of that key, so the [[assignSplit]] stability
    * contract holds (reruns never move a cluster) AND no pair of
    * near-dups ever straddles a split boundary.
    *
    * Scale shape: the pair graph + components are [[Dedup]]'s
    * linear-shuffle formulations; the label table is pair-bounded (tiny
    * next to the corpus) and joins back once; the split decision itself
    * is codegen in the scan, exactly like [[assignSplit]]. */
  def leakFreeSplit(df: DataFrame, idCol: String, textCol: String,
      weights: Seq[(String, Double)], n: Int = 3, threshold: Double = 0.5,
      maxDf: Option[Long] = Some(1000L), buckets: Int = defaultBuckets,
      hashOf: Column => Column = xxhash64(_)): DataFrame =
    leakFreeSplitFromPairs(df, idCol,
      Dedup.ngramJaccardPairs(df, idCol, textCol, n, threshold, maxDf),
      weights, buckets, hashOf)

  /** [[leakFreeSplit]] from a precomputed near-dup pair set (i, j) —
    * the 100 TB entry point: feed [[Dedup.minhashPairs]] (banded LSH,
    * linear shuffle) instead of the exact-Jaccard graph, or reuse pairs
    * a dedup pass already produced rather than re-shingling the corpus
    * for the split. */
  def leakFreeSplitFromPairs(df: DataFrame, idCol: String, pairs: DataFrame,
      weights: Seq[(String, Double)], buckets: Int = defaultBuckets,
      hashOf: Column => Column = xxhash64(_)): DataFrame = {
    val labels = Dedup.connectedComponents(pairs)
    // pair-bounded; checkpoint cuts the iterative lineage, then release
    val roots = labels.select(col("node").as(idCol), col("label").as("__root"))
      .localCheckpoint(true)
    labels.unpersist()
    val keyed = df.join(roots, Seq(idCol), "left")
      .withColumn("__key", coalesce(col("__root"), col(idCol)))
    assignSplit(keyed, "__key", weights, buckets, hashOf)
      .drop("__root", "__key")
  }
}
