package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation over a scored corpus: the measurement
  * half the quality-classifier family ([[LogReg]], the LM screens) was
  * missing — you don't ship a screen whose threshold nobody evaluated.
  *
  * Scores are LONG micro-units (the repo-wide quantized-score
  * convention — [[LogReg.predict]]'s `score_micro` plugs in directly),
  * which makes every statistic here exact integer arithmetic until one
  * final double division, so the numbers replay bit-identically in SQL
  * and across partitionings.
  *
  * [[rocAuc]] is the exact Mann–Whitney form with average ranks for
  * ties: AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻), computed over the
  * DISTINCT-score table (corpus-sized input collapses to ≤ #distinct
  * scores rows in one hash aggregation). The rank prefix-sum is
  * DISTRIBUTED — scores bucket by value range, per-bucket totals
  * (≤ `buckets` rows, the only driver collect) become broadcast
  * offsets, and the window runs per bucket — the packSequences bucketed
  * prefix, not a single-partition global window. Doubled ranks
  * (2·avgrank = 2·cum_before + cnt + 1) keep the tie-halves integral;
  * Σ long terms stay exact below ~2e9 rows.
  */
object Eval {

  /** Exact ROC-AUC with tie handling: 1 row (auc, n_pos, n_neg).
    * `auc` is NULL when either class is empty (no ranking exists).
    * `labelCol` is 1 for positives, anything else negative. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    val spark = df.sparkSession
    val cnt = df.select(col(scoreCol).cast("long").as("s"),
        when(col(labelCol).cast("long") === 1L, 1L).otherwise(0L).as("p"))
      .groupBy(col("s"))
      .agg(sum(col("p")).as("np"), (count(lit(1)) - sum(col("p"))).as("nn"))
    val bounds = cnt.agg(min(col("s")), max(col("s"))).head()
    if (bounds.isNullAt(0)) {
      // empty input: one all-NULL/zero row, same schema
      return spark.range(1).select(lit(null).cast("double").as("auc"),
        lit(0L).as("n_pos"), lit(0L).as("n_neg"))
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // scores are quantized micro-units by contract; a range wider than
    // Long.MaxValue would wrap the bucket arithmetic — fail loudly
    require(BigInt(hi) - BigInt(lo) < BigInt(Long.MaxValue),
      s"score range [$lo, $hi] too wide for bucketed ranking")
    val width = math.max(1L, (hi - lo) / buckets + 1)
    val withB = cnt.withColumn("bucket",
      expr(s"(s - ${lo}L) DIV ${width}L"))
    // per-bucket totals -> cumulative offsets: bounded by `buckets`,
    // the one (small) driver round-trip that removes the global window
    val totals = withB.groupBy(col("bucket"))
      .agg(sum(col("np") + col("nn")).as("bc"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, c)) => (b, acc + c)
    }.sliding(2).map { case Array((_, off0), (b, _)) => (b, off0) }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("bucket", "off")
    val w = Window.partitionBy(col("bucket")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withB
      .withColumn("within", coalesce(sum(col("np") + col("nn")).over(w), lit(0L)))
      .join(broadcast(offDf), "bucket")
      .select(col("np"), col("nn"),
        (col("off") + col("within")).as("cumb"))
      .agg(sum(col("np") * (lit(2L) * col("cumb") + col("np") + col("nn") + lit(1L)))
          .as("s2"),
        sum(col("np")).as("npos"), sum(col("nn")).as("nneg"))
      .select(
        when(col("npos") > 0L && col("nneg") > 0L,
          (col("s2") - col("npos") * (col("npos") + lit(1L))).cast("double") /
            (lit(2.0) * col("npos").cast("double") * col("nneg").cast("double")))
          .as("auc"),
        col("npos").as("n_pos"), col("nneg").as("n_neg"))
  }

  /** Reliability-diagram bins for a probability score in MICRO-units
    * ([0, 1e6], [[LogReg.predict]]'s scale): per bin, (bin, n,
    * mean_pred, frac_pos) — a calibrated screen has mean_pred ≈
    * frac_pos per bin; the gap, n-weighted, is the expected calibration
    * error. Bin = floor(s·bins/1e6) clamped into [0, bins−1] (the
    * s = 1e6 edge folds into the top bin). One hash aggregation; counts
    * and micro-sums are exact longs, the two rates are final double
    * divisions. Out-of-range scores clamp into the edge bins rather
    * than vanish. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"need bins > 0, got $bins")
    df.select(col(scoreCol).cast("long").as("s"),
        when(col(labelCol).cast("long") === 1L, 1L).otherwise(0L).as("p"))
      .withColumn("bin",
        greatest(least(expr(s"(s * ${bins}L) DIV 1000000L"),
          lit((bins - 1).toLong)), lit(0L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("ssum"),
        sum(col("p")).as("npos"))
      .select(col("bin"), col("n"),
        (col("ssum").cast("double") / (lit(1e6) * col("n").cast("double")))
          .as("mean_pred"),
        (col("npos").cast("double") / col("n").cast("double")).as("frac_pos"))
  }

  /** Confusion counts and derived rates at `threshold` (score >=
    * threshold predicts positive): 1 row (tp, fp, fn, tn, prec, rec,
    * f1, acc). Rates are NULL when their denominator is empty — the
    * documented contract, not a crash (Spark 4 ANSI divides throw). */
  def binaryConfusion(df: DataFrame, scoreCol: String, labelCol: String,
      threshold: Long): DataFrame = {
    val s = col(scoreCol).cast("long")
    val y = col(labelCol).cast("long") === 1L
    val pred = s >= lit(threshold)
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val base = df.agg(
      cnt(pred && y).as("tp"), cnt(pred && !y).as("fp"),
      cnt(!pred && y).as("fn"), cnt(!pred && !y).as("tn"))
    def ratio(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den > 0L, num.cast("double") / den.cast("double"))
    base.select(col("tp"), col("fp"), col("fn"), col("tn"),
        ratio(col("tp"), col("tp") + col("fp")).as("prec"),
        ratio(col("tp"), col("tp") + col("fn")).as("rec"),
        ratio(col("tp") + col("tn"),
          col("tp") + col("fp") + col("fn") + col("tn")).as("acc"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        col("prec"), col("rec"),
        when(col("prec").isNotNull && col("rec").isNotNull &&
            (col("prec") + col("rec")) > 0.0,
          (lit(2.0) * col("prec") * col("rec")) / (col("prec") + col("rec")))
          .as("f1"),
        col("acc"))
  }

  /** Exact AVERAGE PRECISION (area under the step-wise PR curve — the
    * sklearn `average_precision_score` formula AP = Σ_t ΔR(t)·P(t)
    * over descending distinct thresholds; the metric that, unlike
    * [[rocAuc]], stays honest when positives are rare — the usual
    * situation for a quality screen over a web corpus). Ties need no
    * convention: a distinct threshold groups its ties into one step.
    *
    * Arithmetic: predict positive iff score ≥ t, so at each distinct
    * score TP = P − cum_np(below) and PP = N − cum_all(below) — both
    * from the same ASCENDING bucketed prefix [[rocAuc]] uses (range
    * buckets + broadcast offsets, never a single-partition window).
    * Per-threshold precision quantizes as `TP·1e6 div PP` micro-units
    * (exact longs: TP ≤ 2e9 keeps the product < 2e15), the numerator
    * is the exact long Σ np·prec_micro, and AP = Σ / (P·1e6) is one
    * final double division. 1 row (ap, n_pos, n_neg); `ap` NULL when
    * there are no positives. */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    val spark = df.sparkSession
    val cnt = df.select(col(scoreCol).cast("long").as("s"),
        when(col(labelCol).cast("long") === 1L, 1L).otherwise(0L).as("p"))
      .groupBy(col("s"))
      .agg(sum(col("p")).as("np"), (count(lit(1)) - sum(col("p"))).as("nn"))
    val bounds = cnt.agg(min(col("s")), max(col("s")),
      sum(col("np")), sum(col("np") + col("nn"))).head()
    if (bounds.isNullAt(0)) {
      return spark.range(1).select(lit(null).cast("double").as("ap"),
        lit(0L).as("n_pos"), lit(0L).as("n_neg"))
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val (pTot, nTot) = (bounds.getLong(2), bounds.getLong(3))
    require(BigInt(hi) - BigInt(lo) < BigInt(Long.MaxValue),
      s"score range [$lo, $hi] too wide for bucketed ranking")
    val width = math.max(1L, (hi - lo) / buckets + 1)
    val withB = cnt.withColumn("bucket",
      expr(s"(s - ${lo}L) DIV ${width}L"))
    val totals = withB.groupBy(col("bucket"))
      .agg(sum(col("np") + col("nn")).as("ba"), sum(col("np")).as("bp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val offsets = totals.scanLeft((Long.MinValue, 0L, 0L)) {
      case ((_, accA, accP), (b, ca, cp)) => (b, accA + ca, accP + cp)
    }.sliding(2).map { case Array((_, offA, offP), (b, _, _)) =>
      (b, offA, offP) }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("bucket", "offa", "offp")
    val w = Window.partitionBy(col("bucket")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withB
      .withColumn("wba",
        coalesce(sum(col("np") + col("nn")).over(w), lit(0L)))
      .withColumn("wbp", coalesce(sum(col("np")).over(w), lit(0L)))
      .join(broadcast(offDf), "bucket")
      .select(col("np"),
        (lit(pTot) - col("offp") - col("wbp")).as("tp"),
        (lit(nTot) - col("offa") - col("wba")).as("pp"))
      .agg(sum(col("np") * expr("(tp * 1000000L) DIV pp")).as("num"))
      .select(
        when(lit(pTot) > 0L,
          col("num").cast("double") / (lit(pTot).cast("double") * lit(1e6)))
          .as("ap"),
        lit(pTot).as("n_pos"), lit(nTot - pTot).as("n_neg"))
  }

  /** Per-feature mutual information with a binary label — the
    * feature-relevance scan for the classifier family: which of the
    * [[FeatureHash.textBigramFeatures]] buckets (or any numeric
    * features) actually carry label signal, BEFORE spending training
    * iterations on them. Each feature binarizes on its SIGN (f > 0 —
    * the natural split for signed hashed counts; pre-shift anything
    * else), the 2×2 joint counts come from ONE hash-aggregate over the
    * feature-exploded frame (F·n rows in, F rows out, map-side
    * combined), and MI = Σ_cells (n_by/n)·ln(n_by·n/(n_b·n_y)) with
    * every cell's term floor-quantized to nano units before the
    * (4-term, order-free) sum — the PSI/JSD discipline, so any engine
    * replays the integer exactly. Empty cells contribute 0 (the
    * standard convention, which also absorbs zero margins). Output:
    * (feature, n, mi_nano, mi), one row per feature. */
  def binaryMutualInfo(df: DataFrame, featureCols: Seq[String],
      labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature")
    // NULL feature/label rows carry no 2x2 cell, so they must not count
    // in n either — otherwise the derived n00 = n - nb1 - ny1 + n11
    // silently overcounts. Each feature filters its own NULLs.
    val pairs = df
      .filter(col(labelCol).isNotNull)
      .select(
      explode(array(featureCols.map(f => struct(lit(f).as("feature"),
        (col(f) > 0.0).cast("long").as("b"))): _*)).as("p"),
      (col(labelCol).cast("long") === 1L).cast("long").as("y"))
      .select(col("p.feature").as("feature"), col("p.b").as("b"), col("y"))
      .filter(col("b").isNotNull)
    val cells = pairs.groupBy(col("feature")).agg(
      count(lit(1)).as("n"),
      sum(col("b")).as("nb1"),
      sum(col("y")).as("ny1"),
      sum(col("b") * col("y")).as("n11"))
    def term(nby: Column, nb: Column, ny: Column, n: Column): Column =
      when(nby > 0L,
        floor(nby.cast("double") / n.cast("double") *
          log(nby.cast("double") * n.cast("double") /
            (nb.cast("double") * ny.cast("double"))) * lit(1e9))
          .cast("long"))
        .otherwise(0L)
    val n = col("n"); val nb1 = col("nb1"); val ny1 = col("ny1")
    val n11 = col("n11")
    val n10 = nb1 - n11
    val n01 = ny1 - n11
    val n00 = n - nb1 - ny1 + n11
    val mi = term(n11, nb1, ny1, n) +
      term(n10, nb1, n - ny1, n) +
      term(n01, n - nb1, ny1, n) +
      term(n00, n - nb1, n - ny1, n)
    cells.select(col("feature"), col("n"), mi.as("mi_nano"),
      (mi.cast("double") / lit(1e9)).as("mi"))
  }

  /** ANN index scorecard: per-query recall@k of an approximate result
    * set against the exact ground truth in the SAME metric —
    * |approx ∩ exact| / |exact| per query. This is the number that
    * justifies an index's nprobe/nlist/code-size dial settings: an
    * IVF-PQ configuration nobody measured is a guess, and at 100 TB
    * the measurement must itself be a bounded job — both inputs here
    * are (n_queries × k)-row frames (the per-query top-k outputs of
    * [[Similarity.bruteForceTopKL2]] and [[Ivf.topK]] /
    * [[Pq.ivfAdcTopK]]), so the comparison is one AQE-planned join +
    * one hash-aggregate over rows-not-corpus, regardless of corpus
    * size. Queries the index returned nothing for still score (0
    * hits over the truth count) — a silent-empty index must show as
    * recall 0, not as a missing row.
    *
    * `recall_micro` is the exact integer quotient (hits·10⁶ div
    * truth count — both ≤ k, so the double floor is exact) and
    * `recall` the display double; the mean over queries is the
    * headline recall@k. Output: (q, n_exact, n_hit, recall_micro,
    * recall), one row per DISTINCT ground-truth query. */
  def recallAtK(approx: DataFrame, exact: DataFrame, qCol: String,
      nCol: String): DataFrame = {
    // Defensive dedup: a duplicate (q, n) pair on the approx side would
    // multiply the joined exact row, inflating n_exact AND n_hit (recall
    // could exceed 1). The top-k producers emit unique pairs, but the
    // scorecard must not depend on an unstated precondition.
    val a = approx.select(col(qCol).as("__q"), col(nCol).as("__n"))
      .dropDuplicates("__q", "__n")
      .withColumn("__hit", lit(1L))
    exact.select(col(qCol).as("__q"), col(nCol).as("__n"))
      .join(a, Seq("__q", "__n"), "left")
      .groupBy(col("__q").as("q"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .select(col("q"), col("n_exact"), col("n_hit"),
        floor(col("n_hit") * lit(1000000L) / col("n_exact")).cast("long")
          .as("recall_micro"),
        (col("n_hit").cast("double") / col("n_exact").cast("double"))
          .as("recall"))
  }
}
