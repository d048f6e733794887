package graft.ext

import org.apache.spark.sql.DataFrame
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
  * Scale shape: one groupBy(text) for the dedup (the only corpus-keyed
  * shuffle — same cost class as [[Dedup.exact]]), then the per-row
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
    val deduped = input
      .groupBy(col(textCol)).agg(min(id).as(idCol))
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
}
