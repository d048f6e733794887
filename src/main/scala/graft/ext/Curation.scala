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
    // the repetition vote is per-row (set-independent), so annotate and
    // filter in place — no survivors-id join back onto the corpus
    val screened = Repetition
      .repetitionKeep(deduped, textCol, "__rep_keep", thresholds = thresholds)
      .filter(col("__rep_keep")).select(id, col(textCol)).persist()
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

    // Stage materialization discipline (localCheckpoint cuts the
    // lineage): a stage whose successor references it TWICE (a screen
    // and a join-back) doubles lazy lineage per stage — 2^9 plan copies
    // by the shard stage, a driver-side planning blowup long before any
    // data moves. A per-stage funnel re-reads each stage anyway, so the
    // materialization is paid for, not extra.
    val input = docs.select(id, col(textCol), col(urlCol), col(sourceCol))
      .localCheckpoint(true)
    // The first three screens (URL blocklist, Gopher lexical, Gopher
    // repetition) are per-row verdicts — each document's vote depends
    // only on its own row and the frozen blocklist, never on which
    // OTHER documents survive. So ONE annotation pass computes all
    // three flags in place (the screens' own expressions via the
    // in-place annotators — one source of truth) and one checkpoint
    // replaces three: the former per-screen survivors-id joins back
    // onto the corpus (two id-keyed corpus shuffles at scale) and two
    // corpus materializations are gone, and the sequential-filter
    // funnel counts are recovered EXACTLY as cumulative conjunctions
    // of the flags.
    val flagged = Repetition.repetitionKeep(
        QualityRules.lexicalKeep(
          UrlFilter.annotateBlocked(input, idCol, urlCol, blocklist)
            .withColumn("__url_keep", !col("blocked")),
          textCol, "__lex_keep", minWords = lexMinWords),
        textCol, "__rep_keep", thresholds = thresholds)
      .select(id, col(textCol), col(sourceCol),
        col("__url_keep"), col("__lex_keep"), col("__rep_keep"))
      .localCheckpoint(true)
    // the LM stage scores SURVIVORS only (the screens are selective;
    // scoring everything would waste the model joins on dropped docs)
    val screened = flagged
      .filter(col("__url_keep") && col("__lex_keep") && col("__rep_keep"))
      .select(id, col(textCol), col(sourceCol))
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
    // funnel rows 1-4 from ONE pass over the flagged frame: stage k's
    // population is the cumulative conjunction of the first k-1 flags
    // (count counts non-null `when` branches; sum skips them) — exactly
    // the sequential-filter populations, without four separate corpus
    // aggregates
    val f14 = {
      val u = col("__url_keep"); val l = col("__lex_keep")
      val r = col("__rep_keep")
      flagged.agg(
        count(lit(1)).as("n1"), coalesce(sum(id), lit(0L)).as("c1"),
        count(when(u, 1)).as("n2"),
        coalesce(sum(when(u, id)), lit(0L)).as("c2"),
        count(when(u && l, 1)).as("n3"),
        coalesce(sum(when(u && l, id)), lit(0L)).as("c3"),
        count(when(u && l && r, 1)).as("n4"),
        coalesce(sum(when(u && l && r, id)), lit(0L)).as("c4"))
        .localCheckpoint(true)
    }
    def early(name: String, idx: Int, n: Column, c: Column): DataFrame =
      f14.select(lit(name).as("stage"), lit(idx.toLong).as("stage_idx"),
        n.as("n"), c.as("checksum"))
    val funnelPlan = early("input", 1, col("n1"), col("c1"))
      .unionByName(early("url_filter", 2, col("n2"), col("c2")))
      .unionByName(early("gopher_lexical", 3, col("n3"), col("c3")))
      .unionByName(early("gopher_repetition", 4, col("n4"), col("c4")))
      .unionByName(stage(scored, "lm_quality", 5))
      .unionByName(stage(deduped, "exact_dedup", 6))
      .unionByName(stage(tiled, "substr_dedup", 7))
      .unionByName(stage(decon, "decontam", 8))
      .unionByName(stage(mixed, "mixture", 9))
      .unionByName(packStage)
      .unionByName(shardStage)
    val curatedPlan = mixed
      .join(packed.select(id, col("seq_id"), col("seq_off")), idCol)
      .join(sharded.select(id, col("shard"), col("seq")), idCol)
    // the two closing materializations are independent reads of the
    // checkpointed stages (each recomputes pack/shard from `mixed` for
    // itself) — overlap them instead of paying two serial tails
    var funnel: DataFrame = null
    var curated: DataFrame = null
    graft.streaming.Concurrent.all(Seq(
      () => { funnel = funnelPlan.localCheckpoint(true); () },
      () => { curated = curatedPlan.localCheckpoint(true); () }))
    Result(curated, funnel)
  }
}
