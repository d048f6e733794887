package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the FineWeb/RefinedWeb-style funnel the
  * individual operators exist for, as ONE composition with per-stage
  * accounting (Penedo et al. 2024 report keep-rates per stage; the
  * funnel table is that evidence):
  *
  *   input → exact dedup (first occurrence by id per identical text)
  *         → Gopher repetition vote ([[Repetition.gopherFilter]])
  *         → LM quality threshold ([[NgramLm.score]] ≥ minScore)
  *
  * Returns the curated corpus AND the funnel (stage, stage_idx, n,
  * id_sum) — id_sum is an exact content checksum so two engines can
  * compare WHICH documents survived, not just how many.
  *
  * Scale shape: one hash-keyed group-by for the dedup (the only
  * corpus-keyed shuffle — same cost class as [[Dedup.exact]],
  * xxhash64 keys, never text bytes), then the per-row
  * Gopher vote and the LM join pipeline; each stage count is an
  * aggregate over the running frame. Running frames are persisted
  * between stages so the funnel's four counts don't recompute the
  * prefix, then RELEASED before returning: `curated` is materialized
  * (localCheckpoint — the [[Dedup.finishEager]] lifecycle) and `funnel`
  * is four checkpointed rows, so no cache entry outlives the call even
  * in a long-lived service. Callers streaming this composition
  * continuously should use [[graft.streaming.QualityGate]] instead. */
object Curation {

  case class Result(curated: DataFrame, funnel: DataFrame)

  def curate(docs: DataFrame, idCol: String, textCol: String,
      model: NgramLm.Model, minScore: Double,
      thresholds: Map[String, Double] = Repetition.gopherThresholds): Result = {
    val id = col(idCol)

    val input = docs.select(id, col(textCol)).persist()
    // dedup keys on xxhash64(text), never the text bytes (the hashed-
    // tile-key lesson: ~length/8 shuffle-volume cut; 2^-64 collision
    // stance as documented on Dedup.exact)
    val deduped = input.join(input
        .groupBy(xxhash64(col(textCol)).as("__fp")).agg(min(id).as(idCol))
        .select(id), idCol)
      .select(id, col(textCol)).persist()
    val screened = Repetition
      .gopherFilter(deduped, idCol, textCol, thresholds = thresholds)
      .filter(col("keep")).select(id)
      .join(deduped, idCol).select(id, col(textCol)).persist()
    val scored = NgramLm.score(model, screened, idCol, textCol)
      .filter(col("lm_score") >= lit(minScore)).select(id, col("lm_score"))
    val curated = screened.join(scored, idCol).localCheckpoint(true)

    def stage(df: DataFrame, name: String, idx: Int): DataFrame =
      df.agg(count(lit(1)).as("n"),
        coalesce(sum(id), lit(0L)).as("id_sum"))
        .select(lit(name).as("stage"), lit(idx.toLong).as("stage_idx"),
          col("n"), col("id_sum"))
    val funnel = stage(input, "input", 1)
      .unionByName(stage(deduped, "exact_dedup", 2))
      .unionByName(stage(screened, "gopher", 3))
      .unionByName(stage(curated, "lm_quality", 4))
      .localCheckpoint(true)
    Seq(input, deduped, screened).foreach(_.unpersist())
    Result(curated, funnel)
  }

  /** The COMPLETE pretraining chain as one composition — every screen,
    * both dedup legs, decontamination, and the export stages, each with
    * funnel accounting:
    *
    *   input → URL blocklist ([[UrlFilter.annotateBlocked]], keep
    *           unblocked; unparseable hosts pass through — flagged
    *           upstream, never silently dropped)
    *         → Gopher lexical ([[QualityRules.gopherLexical]] keep)
    *         → Gopher repetition ([[Repetition.gopherFilter]] keep)
    *         → LM quality ([[NgramLm.score]] ≥ minScore; the model is
    *           FROZEN upstream — trained before the funnel, as in
    *           production where the scorer predates the batch)
    *         → exact dedup (min id per identical text)
    *         → substring dedup ([[Dedup.tileDuplication]] tile-strip
    *           over the SURVIVING corpus, then drop docs whose cleaned
    *           text falls under minCleanWords — strip-then-rescreen)
    *         → decontamination ([[TextAnalysis.decontaminate]] vs an
    *           external benchmark; contaminated docs drop)
    *         → mixture ([[Sampling.mixtureSample]] per-source quotas)
    *         → pack ([[TextAnalysis.packSequences]]) and shard
    *           ([[Sampling.shuffleShards]]) over the selected set.
    *
    * The funnel is (stage, stage_idx, n, checksum): for the filter
    * stages checksum = Σ id (WHICH docs survived); for pack, n = number
    * of packed sequences and checksum = Σ id·(seq_id+1); for shard,
    * n = shards used and checksum = Σ id·(shard+1) — the weighted sums
    * bind every assignment, not just the membership.
    *
    * Scale shape: the screens are per-row codegen passes; the corpus-
    * keyed shuffles are exactly the two dedup group-bys (text, tile
    * hash) plus decontam's broadcast gram join — same cost classes as
    * the standalone operators; mixture/pack/shard run on the selected
    * subset. Each stage persists while the next consumes it, then
    * releases; outputs are localCheckpoint'd ([[Dedup.finishEager]]
    * lifecycle). */
  def curateFull(docs: DataFrame, idCol: String, textCol: String,
      urlCol: String, sourceCol: String,
      blocklist: DataFrame, model: NgramLm.Model, minScore: Double,
      benchmark: DataFrame, benchTextCol: String, benchN: Int,
      mixtureWeights: Seq[(String, Double)], mixtureTotal: Long,
      packBudget: Long, packBuckets: Int,
      numShards: Int, hashOf: Column => Column,
      lexMinWords: Long = 50L, tileWords: Int = 8,
      minCleanWords: Long = 50L,
      thresholds: Map[String, Double] = Repetition.gopherThresholds)
      : Result = {
    val id = col(idCol)
    def keepIds(flags: DataFrame): DataFrame =
      flags.filter(col("keep")).select(id)

    // Every stage materializes eagerly (localCheckpoint cuts the
    // lineage): each stage references its predecessor TWICE (the screen
    // and the join-back), so lazy lineage doubles per stage — 2^9 plan
    // copies by the shard stage, a driver-side planning blowup long
    // before any data moves. A per-stage funnel re-reads each stage
    // anyway, so the materialization is paid for, not extra.
    val input = docs.select(id, col(textCol), col(urlCol), col(sourceCol))
      .localCheckpoint(true)
    val unblocked = UrlFilter
      .annotateBlocked(input, idCol, urlCol, blocklist)
      .filter(!col("blocked"))
      .select(id, col(textCol), col(sourceCol)).localCheckpoint(true)
    val lexed = unblocked.join(keepIds(QualityRules.gopherLexical(
        unblocked, idCol, textCol, minWords = lexMinWords)), idCol)
      .localCheckpoint(true)
    val screened = lexed.join(keepIds(Repetition.gopherFilter(
        lexed, idCol, textCol, thresholds = thresholds)), idCol)
      .localCheckpoint(true)
    val scored = screened.join(NgramLm.score(model, screened, idCol, textCol)
        .filter(col("lm_score") >= lit(minScore)).select(id), idCol)
      .localCheckpoint(true)
    // hash-keyed exact dedup (same contract/collision stance as curate)
    val deduped = scored.join(scored
        .groupBy(xxhash64(col(textCol)).as("__fp")).agg(min(id).as(idCol))
        .select(id), idCol)
      .localCheckpoint(true)
    // strip corpus-duplicated tiles, then re-screen the cleaned length
    val cleanWc = when(col("clean_text") === "", lit(0L))
      .otherwise(size(split(col("clean_text"), " ")).cast("long"))
    val tiled = deduped.join(
        Dedup.tileDuplication(deduped, idCol, textCol, tileWords)
          .filter(cleanWc >= minCleanWords).select(id), idCol)
      .localCheckpoint(true)
    val decon = TextAnalysis
      .decontaminate(tiled, idCol, textCol, benchmark, benchTextCol, benchN)
      .filter(!col("contaminated"))
      .select(id, col(textCol), col(sourceCol)).localCheckpoint(true)
    val mixed = Sampling.mixtureSample(decon, idCol, sourceCol,
        mixtureWeights, mixtureTotal)
      .select(id, col(textCol), col(sourceCol)).localCheckpoint(true)
    val packed = TextAnalysis
      .packSequences(mixed, idCol, textCol, packBudget, packBuckets)
    val sharded = Sampling.shuffleShards(mixed.select(id), idCol,
      numShards, hashOf)

    def stage(df: DataFrame, name: String, idx: Int): DataFrame =
      df.agg(count(lit(1)).as("n"),
        coalesce(sum(id), lit(0L)).as("checksum"))
        .select(lit(name).as("stage"), lit(idx.toLong).as("stage_idx"),
          col("n"), col("checksum"))
    val packStage = packed
      .agg(countDistinct(col("seq_id")).as("n"),
        coalesce(sum(id * (col("seq_id") + 1L)), lit(0L)).as("checksum"))
      .select(lit("pack").as("stage"), lit(10L).as("stage_idx"),
        col("n"), col("checksum"))
    val shardStage = sharded
      .agg(countDistinct(col("shard")).as("n"),
        coalesce(sum(id * (col("shard") + 1L)), lit(0L)).as("checksum"))
      .select(lit("shard").as("stage"), lit(11L).as("stage_idx"),
        col("n"), col("checksum"))
    val funnel = stage(input, "input", 1)
      .unionByName(stage(unblocked, "url_filter", 2))
      .unionByName(stage(lexed, "gopher_lexical", 3))
      .unionByName(stage(screened, "gopher_repetition", 4))
      .unionByName(stage(scored, "lm_quality", 5))
      .unionByName(stage(deduped, "exact_dedup", 6))
      .unionByName(stage(tiled, "substr_dedup", 7))
      .unionByName(stage(decon, "decontam", 8))
      .unionByName(stage(mixed, "mixture", 9))
      .unionByName(packStage)
      .unionByName(shardStage)
      .localCheckpoint(true)
    val curated = mixed
      .join(packed.select(id, col("seq_id"), col("seq_off")), idCol)
      .join(sharded.select(id, col("shard"), col("seq")), idCol)
      .localCheckpoint(true)
    Result(curated, funnel)
  }
}
