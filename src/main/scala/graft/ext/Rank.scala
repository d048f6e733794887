package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion — combining several retrieval rankings (lexical BM25,
  * embedding cosine, recency, popularity) into one list, the standard
  * last step of a hybrid search stack.
  *
  * Reciprocal Rank Fusion (Cormack et al. SIGIR'09):
  * score(d) = Σ_runs 1/(k0 + rank_run(d)) — robust to incomparable
  * score scales because only ranks enter. Here each term is the PURE
  * INTEGER `1e15 div (k0 + rank)` — floor of the reciprocal in
  * femto-units — so the fused score is an exact integer sum: no double
  * summation order to diverge, nothing to round, bit-identical on any
  * engine (same policy as [[TextAnalysis.search]]'s quantized sums, but
  * with the division itself in integers).
  *
  * Scale shape: each run is (id, rank) — top-N lists, so the union is
  * runs·N rows regardless of corpus size; one id-keyed hash aggregation
  * fuses, and the final top-k leaves as TakeOrderedAndProject.
  */
object Rank {

  private val Unit = 1000000000000000L // 1e15: femto-unit reciprocals

  /** Fuse ranked runs (each (idCol, rankCol), rank 1-based) into
    * (id, n_runs, rrf_femto, rrf): `rrf_femto` is the exact integer
    * score, `rrf` its double rendering for human eyes. Documents missing
    * from a run simply contribute nothing for it. */
  def rrfFuse(runs: Seq[DataFrame], idCol: String, rankCol: String,
      k0: Long = 60L, k: Int = 20): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    require(k0 >= 0, s"k0=$k0 must be nonnegative")
    val tagged = runs.map(_.select(col(idCol).as("id"),
      col(rankCol).cast("long").as("__r")))
    val all = tagged.reduce(_ unionAll _)
    all
      .select(col("id"), expr(s"${Unit}L div (${k0}L + __r)").as("__t"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_runs"), sum(col("__t")).as("rrf_femto"))
      .select(col("id"), col("n_runs"), col("rrf_femto"),
        (col("rrf_femto").cast("double") / lit(1.0e15)).as("rrf"))
      .orderBy(col("rrf_femto").desc, col("id"))
      .limit(k)
  }

  /** Evaluate one ranked run against a relevance set — the retrieval
    * scorecard (MRR, precision@k, recall@k) a search pipeline regresses
    * on every index rebuild. MRR's reciprocal is the same PURE INTEGER
    * femto-unit as [[rrfFuse]] (`1e15 div first_rank`); precision and
    * recall are single divisions of exact counts. One row out:
    * (n_rel, n_hit, first_rank, mrr_femto, p_at_k, r_at_k).
    *
    * Scale shape: the run is a top-N list (N rows, corpus-independent);
    * the relevance set joins on id — broadcast when small, hash
    * otherwise — and three aggregates fold to one row. An empty
    * intersection yields rank NULL → mrr 0, not a crash. */
  def evalRun(run: DataFrame, relevant: DataFrame, idCol: String,
      rankCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val rel = relevant.select(col(idCol).as("id")).distinct()
    val r = run.select(col(idCol).as("id"), col(rankCol).cast("long").as("__r"))
    val nRel = rel.agg(count(lit(1)).as("n_rel"))
    r.join(rel, Seq("id"))
      .agg(count(lit(1)).as("n_hit"),
        min(col("__r")).as("first_rank"),
        sum(when(col("__r") <= k, 1L).otherwise(0L)).as("__hits"))
      .crossJoin(broadcast(nRel))
      .select(col("n_rel"), col("n_hit"), col("first_rank"),
        coalesce(expr(s"${Unit}L div first_rank"), lit(0L)).as("mrr_femto"),
        (coalesce(col("__hits"), lit(0L)).cast("double") /
          lit(k.toDouble)).as("p_at_k"),
        (coalesce(col("__hits"), lit(0L)).cast("double") /
          col("n_rel").cast("double")).as("r_at_k"))
  }

  /** nDCG@k with binary relevance — the position-weighted scorecard
    * [[evalRun]]'s P@k misses (a hit at rank 1 and a hit at rank 10
    * are not the same retrieval): DCG@k = Σ_{hits, r ≤ k} 1/log₂(r+1),
    * IDCG@k = the perfect-ranking sum over min(k, n_rel) front ranks,
    * nDCG = DCG/IDCG ∈ [0, 1].
    *
    * Determinism: each discount 1/log₂(r+1) floor-quantizes to femto
    * longs (the [[rrfFuse]] discipline — log₂ of a small-integer
    * operand is the identical double on any engine), so both sums are
    * exact integers and the final quotient divides identical operands.
    * Empty relevance set or zero hits → ndcg 0, not NULL/crash.
    *
    * Scale shape: the run is a top-N list; one broadcast-or-hash join
    * against the relevance ids, one global fold; IDCG is a bounded
    * k-term expression fold on the 1-row result. */
  def ndcgAtK(run: DataFrame, relevant: DataFrame, idCol: String,
      rankCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val rel = relevant.select(col(idCol).as("id")).distinct()
    val r = run.select(col(idCol).as("id"), col(rankCol).cast("long").as("__r"))
    val nRel = rel.agg(count(lit(1)).as("n_rel"))
    val discount = floor(lit(1.0e15) /
      log2(col("__r").cast("double") + lit(1.0))).cast("long")
    val idcg = when(col("n_rel") > 0,
      aggregate(sequence(lit(1L), least(lit(k.toLong), col("n_rel"))),
        lit(0L), (acc, i) => acc +
          floor(lit(1.0e15) / log2(i.cast("double") + lit(1.0)))
            .cast("long"))).otherwise(lit(0L))
    r.join(rel, Seq("id"))
      .filter(col("__r") <= k)
      .agg(count(lit(1)).as("n_hit_k"),
        coalesce(sum(discount), lit(0L)).as("dcg_femto"))
      .crossJoin(broadcast(nRel))
      .withColumn("idcg_femto", idcg)
      .select(col("n_rel"), col("n_hit_k"), col("dcg_femto"),
        col("idcg_femto"),
        when(col("idcg_femto") > 0, col("dcg_femto").cast("double") /
          col("idcg_femto").cast("double")).otherwise(lit(0.0)).as("ndcg"))
  }
}
