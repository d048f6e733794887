package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift between two snapshots — the monitoring step a
  * continuously-ingested corpus needs between curation runs: compare
  * the word distributions of snapshot A and snapshot B with the
  * Population Stability Index (the standard industry drift metric;
  * PSI(A,B) = Σ_w (pA − pB)·ln(pA/pB), symmetric and ≥ 0, per-word
  * terms always ≥ 0) and report the top drivers.
  *
  * Probabilities are add-one smoothed over the UNION vocabulary
  * (pX = (cX+1)/(NX+V)), so a word absent from one side contributes a
  * finite, honest term instead of ±∞. Per-word terms floor-quantize to
  * LONG picos (the repo's cross-engine reduction discipline), so the
  * ranking and every total replay exactly on any engine.
  *
  * Scale shape: one explode per side into a union (side-tagged) stream,
  * ONE hash-aggregate keyed by word (map-side partial), a broadcast
  * 1-row totals frame, and top-k via TakeOrderedAndProject — never a
  * global sort, nothing quadratic, vocabulary-sized intermediate. */
object Drift {

  /** Top-`k` drift DRIVERS between `a` and `b`: (word, c_a, c_b,
    * contrib_pico), ordered contrib desc then word. This is the
    * monitoring view — the k largest per-word terms, NOT the corpus
    * total (summing the top 20 of a 10M-word vocabulary undercounts).
    * For the full PSI, use [[wordPsiAll]] and sum `contrib_pico`. */
  def wordPsi(a: DataFrame, b: DataFrame, textCol: String,
      k: Int = 20): DataFrame =
    wordPsiAll(a, b, textCol)
      .orderBy(col("contrib_pico").desc, col("word"))
      .limit(k)

  /** Every vocabulary word's exact PSI term — `sum(contrib_pico)` over
    * this frame IS the corpus PSI in picos. Vocabulary-sized output,
    * ordered by word; same plan as [[wordPsi]] minus the top-k. */
  def wordPsiAll(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(explode(split(col(textCol), " ")).as("__w"),
        lit(tag).as("__s"))
    val counts = side(a, 0).unionByName(side(b, 1))
      .groupBy(col("__w"))
      .agg(coalesce(sum(when(col("__s") === 0, 1L)), lit(0L)).as("c_a"),
        coalesce(sum(when(col("__s") === 1, 1L)), lit(0L)).as("c_b"))
    val tot = counts.agg(sum(col("c_a")).as("__na"),
      sum(col("c_b")).as("__nb"), count(lit(1)).as("__v"))
    val pa = (col("c_a") + 1).cast("double") / (col("__na") + col("__v"))
    val pb = (col("c_b") + 1).cast("double") / (col("__nb") + col("__v"))
    counts.crossJoin(broadcast(tot))
      .select(col("__w").as("word"), col("c_a"), col("c_b"),
        floor((pa - pb) * log(pa / pb) * lit(1e12)).cast("long")
          .as("contrib_pico"))
      .orderBy(col("word"))
  }

  /** Drift TIME SERIES: PSI of each period's word distribution against
    * a fixed reference corpus — one row per period. This is the
    * monitoring loop a continuously-ingested corpus runs ("did this
    * week's crawl shift?"): the reference is the accepted corpus (or a
    * frozen golden slice), `cur` carries a period column, and a rising
    * `psi_pico` series flags the ingestion source drifting before the
    * quality screens feel it.
    *
    * Per period p the math is exactly [[wordPsiAll]] against that
    * period's slice: add-one smoothing over the UNION vocabulary of
    * (ref ∪ cur_p) — so V differs per period and every term stays
    * finite — with per-term floor-quantized pico contributions summed
    * as longs (order-independent, engine-exact).
    *
    * Scale shape: reference counts aggregate ONCE and expand by the
    * period list (periods are a bounded monitoring series — days or
    * weeks, not a data-scale key; the expansion is |vocab_ref| ×
    * |periods|); the full-outer join against per-period counts brings
    * in period-only words; totals are a |periods|-row broadcast.
    * `periodCol` must be non-null (a NULL period never equi-joins its
    * own counts — derive periods with a total function of the row, or
    * filter first). Output: (periodCol, n_tokens, vocab_union,
    * psi_pico). */
  def wordPsiByPeriod(ref: DataFrame, cur: DataFrame, textCol: String,
      periodCol: String): DataFrame = {
    val refW = ref.select(explode(split(col(textCol), " ")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("c_a"))
    val curW = cur.select(col(periodCol).as("__p"),
        explode(split(col(textCol), " ")).as("__w"))
      .groupBy(col("__p"), col("__w")).agg(count(lit(1)).as("c_b"))
    val periods = cur.select(col(periodCol).as("__p")).distinct()
    val joined = refW.crossJoin(broadcast(periods))
      .join(curW, Seq("__p", "__w"), "full_outer")
      .select(col("__p"), col("__w"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val na = refW.agg(sum(col("c_a")).as("__na"))
    val totp = joined.groupBy(col("__p"))
      .agg(sum(col("c_b")).as("__nb"), count(lit(1)).as("__v"))
    val pa = (col("c_a") + 1).cast("double") / (col("__na") + col("__v"))
    val pb = (col("c_b") + 1).cast("double") / (col("__nb") + col("__v"))
    val contrib = joined.join(broadcast(totp), Seq("__p"))
      .crossJoin(broadcast(na))
      .select(col("__p"),
        floor((pa - pb) * log(pa / pb) * lit(1e12)).cast("long").as("__c"))
      .groupBy(col("__p")).agg(sum(col("__c")).as("psi_pico"))
    contrib.join(broadcast(totp), Seq("__p"))
      .select(col("__p").as(periodCol),
        col("__nb").cast("long").as("n_tokens"),
        col("__v").cast("long").as("vocab_union"), col("psi_pico"))
      .orderBy(col(periodCol))
  }

  /** Top-`k` Jensen–Shannon drift drivers — same monitoring view as
    * [[wordPsi]] under the JSD lens. */
  def wordJsd(a: DataFrame, b: DataFrame, textCol: String,
      k: Int = 20): DataFrame =
    wordJsdAll(a, b, textCol)
      .orderBy(col("contrib_pico").desc, col("word"))
      .limit(k)

  /** Jensen–Shannon divergence between the two word distributions —
    * the BOUNDED complement to PSI (JSD = ½KL(P‖M) + ½KL(Q‖M) with
    * M = (P+Q)/2; total ≤ ln 2, so thresholds transfer across corpora
    * of any size, where PSI's unbounded terms need per-corpus
    * calibration). Per-word pointwise terms
    * ½·(pA·ln(pA/m) + pB·ln(pB/m)) are individually ≥ 0 (convexity of
    * x·ln x), so the same top-k driver view applies.
    *
    * Same engine-exact discipline and plan shape as [[wordPsiAll]]:
    * add-one smoothing over the union vocabulary (also keeps
    * 0·ln 0 out of the float path), floor-quantized pico terms,
    * one hash-aggregate + broadcast totals. `sum(contrib_pico)` over
    * this frame IS the corpus JSD in picos. */
  def wordJsdAll(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(explode(split(col(textCol), " ")).as("__w"),
        lit(tag).as("__s"))
    val counts = side(a, 0).unionByName(side(b, 1))
      .groupBy(col("__w"))
      .agg(coalesce(sum(when(col("__s") === 0, 1L)), lit(0L)).as("c_a"),
        coalesce(sum(when(col("__s") === 1, 1L)), lit(0L)).as("c_b"))
    val tot = counts.agg(sum(col("c_a")).as("__na"),
      sum(col("c_b")).as("__nb"), count(lit(1)).as("__v"))
    val pa = (col("c_a") + 1).cast("double") / (col("__na") + col("__v"))
    val pb = (col("c_b") + 1).cast("double") / (col("__nb") + col("__v"))
    val m = (pa + pb) / 2
    counts.crossJoin(broadcast(tot))
      .select(col("__w").as("word"), col("c_a"), col("c_b"),
        floor((pa * log(pa / m) + pb * log(pb / m)) * lit(0.5) * lit(1e12))
          .cast("long").as("contrib_pico"))
      .orderBy(col("word"))
  }

  /** PSI over a NUMERIC column — the tabular drift form: `bins`
    * fixed-width buckets over the combined [min, max] (shared edges, so
    * both sides bin identically; the top bucket is closed), add-one
    * smoothed bucket probabilities, pico-quantized terms. One pass for
    * the range, one side-tagged aggregate for the histogram; bucket
    * arithmetic is a fixed double expression, identical everywhere. */
  def numericPsi(a: DataFrame, b: DataFrame, valueCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(col(valueCol).cast("double").as("__x"), lit(tag).as("__s"))
    val all = side(a, 0).unionByName(side(b, 1))
    val range = all.agg(min(col("__x")).as("__lo"), max(col("__x")).as("__hi"))
    val bucket = least(lit(bins - 1), floor(
      (col("__x") - col("__lo")) / (col("__hi") - col("__lo")) * bins)
      .cast("int"))
    val counts = all.crossJoin(broadcast(range))
      .select(when(col("__hi") === col("__lo"), lit(0)).otherwise(bucket)
        .as("bin"), col("__s"))
      .groupBy(col("bin"))
      .agg(coalesce(sum(when(col("__s") === 0, 1L)), lit(0L)).as("c_a"),
        coalesce(sum(when(col("__s") === 1, 1L)), lit(0L)).as("c_b"))
    val tot = counts.agg(sum(col("c_a")).as("__na"),
      sum(col("c_b")).as("__nb"))
    val pa = (col("c_a") + 1).cast("double") / (col("__na") + lit(bins.toLong))
    val pb = (col("c_b") + 1).cast("double") / (col("__nb") + lit(bins.toLong))
    counts.crossJoin(broadcast(tot))
      .select(col("bin").cast("long").as("bin"), col("c_a"), col("c_b"),
        floor((pa - pb) * log(pa / pb) * lit(1e12)).cast("long")
          .as("contrib_pico"))
      .orderBy(col("bin"))
  }
}
