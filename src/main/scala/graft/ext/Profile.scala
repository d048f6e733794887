package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pass every ingestion pipeline runs
  * before trusting a new batch (null ratios, cardinalities, value ranges).
  * The reference has nothing of the kind (its only check is the existence
  * probe, OLAP.php:106); at warehouse scale this is the cheap guard that
  * catches a broken upstream export before it poisons a fact table.
  *
  * ONE aggregation job for all columns: counts/min/max partial-aggregate
  * map-side; the exact distinct counts share the same pass via Spark's
  * expand rewrite (one input row fans out once per distinct aggregate —
  * the standard cost of multi-column exact cardinality; pass
  * `approxDistinct = true` to swap in HLL++ and keep the fan-out at 1 for
  * the 100 TB profile run). The wide 1-row result is unpivoted in-plan to
  * one tidy row per column; nothing but the final per-column rows ever
  * reaches the driver.
  */
object Profile {

  def columns(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"${c}__distinct"),
        // min/max as strings: one output schema for mixed column types;
        // numeric order is preserved because min/max run on the NATIVE
        // type and only the result is rendered
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(cols.map { c =>
        struct(
          lit(c).as("column"),
          col("__total").as("n_rows"),
          (col("__total") - col(s"${c}__nonnull")).as("n_nulls"),
          col(s"${c}__distinct").as("n_distinct"),
          col(s"${c}__min").as("min_s"),
          col(s"${c}__max").as("max_s"))
      }: _*)).as("p"))
      .select(col("p.*"))
  }

  /** Sketch profile: per-column approximate distinct counts from the
    * engine-portable [[Hll]] registers, all columns in ONE scan (unpivot
    * to (column, key) rows, then one map-side-combining register
    * aggregation — 2^p rows per column leave each partition, never the
    * data). The 100 TB cardinality pass where even [[columns]]'
    * HLL++-by-expand costs a fan-out per column; and unlike the built-in
    * HLL++, the register tables replay bit-for-bit in any SQL engine
    * (the x_hll cross-engine contract, extended per-column). Columns
    * must stringify stably across engines (integers, strings, dates —
    * not doubles). */
  def columnsSketch(df: DataFrame, cols: Seq[String], p: Int = 8): DataFrame = {
    require(cols.nonEmpty, "sketch profile needs at least one column")
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("__k"))): _*)).as("s"))
      .select(col("s.column").as("column"), col("s.__k").as("__k"))
      .filter(col("__k").isNotNull)
    Hll.estimateByGroups(
      Hll.registersByGroups(stacked, Seq("column"), "__k", p),
      Seq("column"), p)
  }

  /** Winsorize a measure per group: clamp `valueCol` to that group's
    * [lo, hi] quantiles — the standard outlier-capping step before a
    * mean/regression that a single fat-fingered value would otherwise
    * own. Quantile cutoffs come from one per-group aggregation (the
    * group count is small; the per-group value buffer of EXACT
    * `percentile` is the cost — swap in `approx_percentile` at lake
    * scale where cutoff tolerance permits) and broadcast back; clamping
    * is per-row `least/greatest` in codegen. Returns the input with
    * `valueCol` replaced by its clamped value. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val q = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(lo)).as("__qlo"),
        percentile(col(valueCol), lit(hi)).as("__qhi"))
    df.join(broadcast(q), groupCol)
      .withColumn(valueCol,
        least(greatest(col(valueCol), col("__qlo")), col("__qhi")))
      .drop("__qlo", "__qhi")
  }

  /** Fixed-width histogram of `valueCol` per group over SHARED bin edges
    * (global min/max → the per-group histograms are directly comparable,
    * the distribution-drift view a profile run wants). Two aggregation
    * scans total: one tiny min/max pass broadcast back as a single row,
    * then one (group, bin) hash-agg — per-row binning is pure codegen
    * arithmetic, no shuffle beyond the final small agg. Bin `bins-1` is
    * closed on the right so `max` lands in the last bin; a constant
    * column degenerates to bin 0. All edge arithmetic is plain double
    * ops (identical IEEE results in any engine replaying it). */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
      bins: Int): DataFrame = {
    require(bins > 0, s"need bins > 0, got $bins")
    val edges = df.agg(
      min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    val w = (col("__hi") - col("__lo")) / lit(bins.toDouble)
    df.crossJoin(broadcast(edges))
      .withColumn("bin",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(
            floor((col(valueCol).cast("double") - col("__lo")) / w),
            lit(bins - 1L))))
      .withColumn("bin_lo", col("__lo") + col("bin").cast("double") * w)
      .groupBy(col(groupCol), col("bin"), col("bin_lo"))
      .agg(count(lit(1)).as("n"))
  }

  /** 2-D histogram (the heatmap/density grid behind "price × recency"
    * views and sampled scatter plots at scales where plotting rows is
    * absurd): both axes bin against global edges from ONE min/max pass
    * (broadcast back as a single row), per-row binning in codegen double
    * arithmetic with the same right-closed-last-bin rule as
    * [[histogram]], one (bx, by) hash aggregation — at most
    * binsX·binsY rows out of any fact size. */
  def histogram2d(df: DataFrame, xCol: String, yCol: String,
      binsX: Int, binsY: Int): DataFrame = {
    require(binsX > 0 && binsY > 0, "need positive bin counts")
    val edges = df.agg(
      min(col(xCol)).cast("double").as("__xlo"),
      max(col(xCol)).cast("double").as("__xhi"),
      min(col(yCol)).cast("double").as("__ylo"),
      max(col(yCol)).cast("double").as("__yhi"))
    def bin(c: String, lo: String, hi: String, k: Int) = {
      val w = (col(hi) - col(lo)) / lit(k.toDouble)
      when(col(hi) === col(lo), lit(0L))
        .otherwise(least(
          floor((col(c).cast("double") - col(lo)) / w), lit(k - 1L)))
    }
    df.crossJoin(broadcast(edges))
      .withColumn("bx", bin(xCol, "__xlo", "__xhi", binsX))
      .withColumn("by", bin(yCol, "__ylo", "__yhi", binsY))
      .groupBy(col("bx"), col("by"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-group simple linear regression (least squares) from the five
    * exact sufficient statistics — n, Σx, Σy, Σxy, Σx² — so the whole fit
    * is ONE map-side-combining aggregation over the fact however large it
    * is; the closed-form slope/intercept algebra runs on the handful of
    * group rows. `xCol` must be integral (sums stay exact in BIGINT /
    * DECIMAL); `yCol` is a 2-decimal money double (summed as
    * DECIMAL(18,2), the repo-wide exactness discipline). The final
    * division is the only inexact step, and it is the same IEEE
    * expression any replaying engine computes from identical operands. */
  def linearFit(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val d0 = org.apache.spark.sql.types.DecimalType(18, 0)
    val x = col(xCol).cast("long")
    val sums = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("double").as("__n"),
      sum(x).cast("double").as("__sx"),
      sum(col(yCol).cast(d2)).cast("double").as("__sy"),
      sum(x.cast(d0) * col(yCol).cast(d2)).cast("double").as("__sxy"),
      sum(x * x).cast("double").as("__sxx"))
    sums
      .withColumn("slope",
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")))
      .withColumn("intercept",
        (col("__sy") - col("slope") * col("__sx")) / col("__n"))
      .select(col(groupCol), col("__n").cast("long").as("n"),
        col("slope"), col("intercept"))
  }

  /** Per-group box-plot statistics: exact quartiles, the 1.5·IQR Tukey
    * fences, and the outlier count beyond them — the distribution
    * summary a profiling dashboard draws per segment. Two passes: one
    * per-group exact-percentile aggregation (same cost note as
    * [[winsorize]] — swap `approx_percentile` at lake scale), then the
    * tiny fence row broadcasts back for a conditional-count scan.
    * Quartile interpolation and fence arithmetic are plain double ops —
    * engine-replayable (the same interpolation DuckDB's quantile_cont
    * computes). */
  def boxplot(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val q = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      percentile(col(valueCol), lit(0.25)).as("q1"),
      percentile(col(valueCol), lit(0.5)).as("med"),
      percentile(col(valueCol), lit(0.75)).as("q3"))
      .withColumn("lo_fence", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi_fence", col("q3") + lit(1.5) * (col("q3") - col("q1")))
    df.join(broadcast(q), groupCol)
      .groupBy(col(groupCol), col("n"), col("q1"), col("med"), col("q3"),
        col("lo_fence"), col("hi_fence"))
      .agg(sum(when(col(valueCol) < col("lo_fence") ||
        col(valueCol) > col("hi_fence"), 1L).otherwise(0L)).as("n_out"))
  }

  /** Per-group robust outlier screen on median absolute deviation: MAD =
    * median(|v - median(v)|), flagging |v - med| > k·MAD — the
    * heavy-tail-safe complement to [[boxplot]]'s Tukey fences (a single
    * extreme value moves a mean/stddev fence arbitrarily far but moves
    * the median/MAD not at all, so planted corruption can't mask
    * itself). Default k = 5 ≈ 3.4σ under normality (the 1.4826
    * consistency constant folded into the threshold rather than scaling
    * MAD — one fewer multiplication to replay).
    *
    * Three passes by construction (median, then median-of-deviations,
    * then the fence count — the middle statistic cannot fuse with either
    * neighbor); each is a group-keyed aggregation with the tiny stat
    * rows broadcast back, same shape as [[boxplot]]. At lake scale swap
    * the exact percentiles for `approx_percentile` and keep the fence
    * scan. All fence arithmetic is exact-rounded double ops over the
    * same interpolated medians DuckDB's quantile_cont computes.
    * Output: (group, n, med, mad, n_out). */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 5.0): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol).cast("double"), lit(0.5)).as("med"))
    val dev = df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .join(broadcast(med), Seq(groupCol))
      .withColumn("__ad", abs(col("__v") - col("med")))
    val stats = dev.groupBy(col(groupCol), col("med"))
      .agg(count(lit(1)).as("n"), percentile(col("__ad"), lit(0.5)).as("mad"))
    dev.join(broadcast(stats), Seq(groupCol, "med"))
      .groupBy(col(groupCol), col("n"), col("med"), col("mad"))
      .agg(sum(when(col("__ad") > lit(k) * col("mad"), 1L).otherwise(0L))
        .as("n_out"))
      .select(col(groupCol), col("n"), col("med"), col("mad"), col("n_out"))
  }

  /** Per-group Gini coefficient of a 2-decimal money measure — the
    * inequality/concentration profile (how unequally is revenue spread
    * over orders within each segment?) that complements
    * [[graft.ext.Stats.concentration]]'s HHI: HHI measures concentration
    * over NAMED units, Gini over the anonymous value distribution.
    *
    * Computed from the rank form G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)
    * over the ascending-sorted values (tie order is irrelevant: equal
    * values contribute the same Σ i·xᵢ under any permutation of their
    * consecutive ranks). Values quantize to integer cents; the rank
    * products Σ i·xᵢ can pass 2^63, so they ride the same hi/lo 32-bit
    * split-word sums as [[correlation]] and recombine with ONE rounding —
    * the identical correctly-rounded double on every engine.
    *
    * Scale shape: one group-keyed shuffle serves the in-group rank
    * window, then one map-side-combining aggregation; nothing after the
    * window scales with row count. (At 100 TB the in-group sort is the
    * cost — rank can instead be derived from a per-group value-bucketed
    * prefix count, the [[TextAnalysis.packSequences]] trick applied
    * per group.) */
  def gini(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val cents = (col(valueCol).cast(d2) * lit(100))
      .cast(org.apache.spark.sql.types.DecimalType(20, 0)).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__v"))
    def splitHi(term: Column): Column = sum(shiftright(term, 32))
    def splitLo(term: Column): Column = sum(term.bitwiseAND(lit(4294967295L)))
    def recombine(hi: Column, lo: Column): Column =
      hi.cast("double") * lit(4294967296.0) + lo.cast("double")
    df.select(col(groupCol), cents.as("__v"))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__v")).cast("double").as("__sx"),
        splitHi(col("__i") * col("__v")).as("__sh"),
        splitLo(col("__i") * col("__v")).as("__sl"))
      .select(col(groupCol), col("n"),
        ((lit(2.0) * recombine(col("__sh"), col("__sl")) -
          (col("n").cast("double") + lit(1.0)) * col("__sx")) /
          (col("n").cast("double") * col("__sx"))).as("gini"))
  }

  /** Equal-frequency binning (quantile discretization): per group, rank
    * rows by value with a deterministic id tie-break and assign
    * bin = ((rank−1)·k) div n — PURE LONG arithmetic, so the bin edges
    * are engine-exact where `ntile` semantics differ subtly between
    * engines. Every bin holds n/k ± 1 rows by construction. Output is
    * the bin summary (group, bin, n_bin, lo, hi) — the feature-
    * discretization table an ML pipeline broadcasts back onto raw rows.
    *
    * Scale shape: one group-keyed shuffle serves the rank window and the
    * per-group count; the (group, bin) aggregation is cardinality-
    * bounded. (Exact in-group ranking is the cost — at 100 TB swap the
    * rank for the per-group value-bucketed prefix count, as with
    * [[gini]].) */
  def equalFreqBins(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(valueCol), col(idCol))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(cw))
      .withColumn("bin", expr(s"((__rn - 1) * $k) div __n"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_bin"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Per-group z-score standardization: z = (x − μ)/σ from ONE exact
    * integer-statistics aggregation (n, Σx, Σx² in cents — Σx² through
    * the [[correlation]] hi/lo split-word sums), broadcast back for a
    * per-row codegen projection. μ, σ², and every z replay bit-for-bit
    * cross-engine: fixed expression tree over exact operands, one IEEE
    * sqrt. The calibration step before pooling features of different
    * scales (complement of [[winsorize]]'s capping and
    * [[graft.ext.Normalize]]'s full distribution forcing). */
  def zscore(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val cents = (col(valueCol).cast(d2) * lit(100))
      .cast(org.apache.spark.sql.types.DecimalType(20, 0)).cast("long")
    def splitHi(term: Column): Column = sum(shiftright(term, 32))
    def splitLo(term: Column): Column = sum(term.bitwiseAND(lit(4294967295L)))
    val base = df.select(col(groupCol), col(idCol), cents.as("__x"))
    val stats = base.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).cast("double").as("__sx"),
        splitHi(col("__x") * col("__x")).as("__sh"),
        splitLo(col("__x") * col("__x")).as("__sl"))
      .select(col(groupCol), col("__n"), col("__sx"),
        (col("__sh").cast("double") * lit(4294967296.0) +
          col("__sl").cast("double")).as("__sxx"))
    val mu = col("__sx") / col("__n")
    val variance = (col("__n") * col("__sxx") - col("__sx") * col("__sx")) /
      (col("__n") * col("__n"))
    base.join(broadcast(stats), Seq(groupCol))
      .select(col(groupCol), col(idCol),
        (col("__x").cast("double") / lit(100.0)).as("v"),
        // constant group -> zero variance: z is NULL by contract (ANSI
        // mode would otherwise throw on the double division)
        when(variance > lit(0.0),
          (col("__x").cast("double") - mu) / sqrt(variance))
          .otherwise(lit(null).cast("double")).as("z"))
  }

  /** Fixed-bin histogram counts for [[quantileSketch]]: values quantize
    * to cents, clamp into [lo, hi], and bin by PURE LONG arithmetic
    * ((x − lo)·bins div span) — so the (group, bin, cnt) table is exact,
    * engine-portable, and MERGEABLE BY ADDITION: per-batch deltas sum
    * cell-wise into warehouse state the way [[CountMin]] cells do, which
    * is what makes the sketch streamable and incrementally maintainable
    * where an exact percentile buffer is neither. One map-side-combining
    * aggregation; ≤ groups·bins rows out regardless of corpus size. */
  def quantileBinCounts(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, s"need hi > lo and bins >= 1")
    val loC = BigDecimal(lo).setScale(2) * 100
    val hiC = BigDecimal(hi).setScale(2) * 100
    val span = hiC.toLongExact - loC.toLongExact + 1
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val x = (col(valueCol).cast(d2) * lit(100))
      .cast(org.apache.spark.sql.types.DecimalType(20, 0)).cast("long")
    val clamped = least(greatest(x, lit(loC.toLongExact)), lit(hiC.toLongExact))
    df.select(col(groupCol), clamped.as("__c"))
      .select(col(groupCol),
        expr(s"((__c - ${loC.toLongExact}L) * $bins) div ${span}L").as("bin"))
      .groupBy(col(groupCol), col("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a (group, bin, cnt) table built by
    * [[quantileBinCounts]] (directly, or folded from streamed deltas):
    * for each q the covering bin is found by exact integer rank
    * arithmetic over the per-group cumulative counts, and the estimate
    * is the bin midpoint — error bounded by (hi−lo)/(2·bins) by
    * construction, every operand in one fixed double tree. Runs
    * entirely on the bins·groups table; nothing touches raw data. */
  def quantilesFromCounts(counts: DataFrame, groupCol: String, lo: Double,
      hi: Double, bins: Int, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val t = floor(col("q") * (col("n") - 1).cast("double")).cast("long")
    val qdf = counts.sparkSession.range(1)
      .select(explode(array(qs.map(q => lit(q)): _*)).as("q"))
    counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wg))
      .crossJoin(broadcast(qdf))
      .filter(t >= col("cum") - col("cnt") && t <= col("cum") - 1)
      .select(col(groupCol), col("q"), col("n"), col("bin"),
        (lit(lo) + (col("bin").cast("double") + lit(0.5)) *
          ((lit(hi) - lit(lo)) / lit(bins.toDouble))).as("est"))
  }

  /** Portable fixed-bin quantile sketch — the approximate-percentile
    * path that survives 100 TB and streaming, where exact `percentile`
    * buffers every group's values and `approx_percentile`'s digest is
    * engine-private (unreplayable, unmergeable across engines). Fixed
    * [lo, hi] edges are the contract that makes sketches from different
    * batches/engines/days addable; pick them from domain knowledge or a
    * prior profile pass. */
  def quantileSketch(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int, qs: Seq[Double]): DataFrame =
    quantilesFromCounts(
      quantileBinCounts(df, groupCol, valueCol, lo, hi, bins),
      groupCol, lo, hi, bins, qs)

  /** EXACT per-group quantile at lake scale — the two-scan route that
    * backs the "swap the in-group sort for a bucketed prefix count"
    * notes on [[gini]]/[[equalFreqBins]]: exact `percentile` buffers
    * every group value on one task; this never materializes a group.
    * Pass 1 counts (group, bucket) with bucket = cents >> bucketBits
    * (arithmetic shift = floor division, negatives included) and finds
    * each group's target bucket + in-bucket offset by integer rank
    * arithmetic. Pass 2 ranks ONLY the target buckets' rows (≈ n/2^bits
    * of each group, the one data-dependent knob) and picks the value at
    * the offset — the exact order statistic, no approximation, no
    * per-group value buffer, both passes shuffle-bounded.
    *
    * The value at a rank is well-defined under ties whatever the tie
    * order, so the nondeterministic in-bucket tie break cannot change
    * the output. Returns (group, n, value) for
    * rank floor(q·(n−1)), value in currency units. */
  def exactQuantile(df: DataFrame, groupCol: String, valueCol: String,
      q: Double, bucketBits: Int = 10): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"q=$q out of [0, 1]")
    require(bucketBits >= 0 && bucketBits <= 40, "bucketBits in [0, 40]")
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val base = df.select(col(groupCol),
        (col(valueCol).cast(d2) * lit(100))
          .cast(org.apache.spark.sql.types.DecimalType(20, 0)).cast("long")
          .as("__x"))
      .withColumn("__b", shiftright(col("__x"), bucketBits))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val t = floor(lit(q) * (col("__n") - 1).cast("double")).cast("long")
    val targets = base.groupBy(col(groupCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wg))
      .filter(t >= col("__cum") - col("__c") && t <= col("__cum") - 1)
      .select(col(groupCol), col("__b"),
        (t - (col("__cum") - col("__c"))).as("__off"), col("__n"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__x"))
    base.join(broadcast(targets), Seq(groupCol, "__b"))
      .withColumn("__rn", row_number().over(win).cast("long"))
      .filter(col("__rn") - 1 === col("__off"))
      .select(col(groupCol), col("__n").as("n"),
        (col("__x").cast("double") / lit(100.0)).as("value"))
  }

  /** Robust per-group outlier screen (Iglewicz–Hoaglin modified
    * z-score): z = 0.6745·(x − median)/MAD with MAD the exact median
    * absolute deviation — the outlier rule that survives the outliers
    * themselves (mean/σ z-scores inflate σ with every anomaly they are
    * supposed to flag; median/MAD have a 50% breakdown point). Flags
    * |z| > `flagAt` (3.5, the published default).
    *
    * Exactness: both medians are [[exactQuantile]] order statistics
    * (bucketed prefix counts, no per-group buffer); x, median, and MAD
    * live in integer cents, so z is one double expression over
    * identical operands, floor-quantized to micro units — the flag is
    * an integer compare on any engine. MAD = 0 (over half the group
    * identical): z is NULL and any deviation flags (it is infinitely
    * many MADs away) — the documented degenerate contract.
    *
    * Scale shape: two exactQuantile passes (each two shuffle-bounded
    * scans) plus two group-sized joins — never a per-group sort of the
    * data. Output: (group, id, value, z_micro, outlier). */
  def robustZscore(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, flagAt: Double = 3.5): DataFrame = {
    require(flagAt > 0, s"flagAt=$flagAt must be positive")
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val d0 = org.apache.spark.sql.types.DecimalType(20, 0)
    def cents(c: org.apache.spark.sql.Column) =
      (c.cast(d2) * lit(100)).cast(d0).cast("long")
    val base = df.select(col(groupCol), col(idCol),
      cents(col(valueCol)).as("__xc"))
    // med and mad are group-sized; eager-checkpointing them keeps the
    // lazy tree from re-deriving each quantile chain in every branch
    // that references it (the codebook-checkpoint discipline of Pq)
    val med = exactQuantile(df, groupCol, valueCol, 0.5)
      .select(col(groupCol), cents(col("value")).as("__mc"))
      .localCheckpoint(true)
    val dev = base.join(med, Seq(groupCol))
    val mad = exactQuantile(
        dev.select(col(groupCol),
          (abs(col("__xc") - col("__mc")).cast("double") / lit(100.0))
            .as("__dv")),
        groupCol, "__dv", 0.5)
      .select(col(groupCol), cents(col("value")).as("__madc"))
      .localCheckpoint(true)
    val zMicro = floor(lit(0.6745) *
      (col("__xc") - col("__mc")).cast("double") /
      col("__madc").cast("double") * lit(1e6)).cast("long")
    val cap = math.floor(flagAt * 1e6).toLong
    dev.join(mad, Seq(groupCol))
      .select(col(groupCol), col(idCol),
        (col("__xc").cast("double") / lit(100.0)).as("value"),
        when(col("__madc") > 0, zMicro).as("z_micro"),
        when(col("__madc") > 0, abs(zMicro) > cap)
          .otherwise(col("__xc") =!= col("__mc")).as("outlier"))
  }

  /** Weighted exact quantile — [[exactQuantile]] with per-row integer
    * weights: the value at weighted rank floor(q·(W−1)) along the
    * weight line (token-weighted median document length, spend-weighted
    * median price). Same two shuffle-bounded passes: bucket-prefix
    * WEIGHT sums find the target bucket and in-bucket weight offset by
    * integer arithmetic; only the target buckets' rows get the in-bucket
    * running-weight window. Value ties make the picked VALUE
    * well-defined under any tie order (equal values, same answer), so
    * nothing depends on intra-bucket ordering luck. */
  def exactWeightedQuantile(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String, q: Double,
      bucketBits: Int = 10): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"q=$q out of [0, 1]")
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val base = df.select(col(groupCol),
        (col(valueCol).cast(d2) * lit(100))
          .cast(org.apache.spark.sql.types.DecimalType(20, 0)).cast("long")
          .as("__x"),
        col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0)
      .withColumn("__b", shiftright(col("__x"), bucketBits))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val t = floor(lit(q) * (col("__tw") - 1).cast("double")).cast("long")
    val targets = base.groupBy(col(groupCol), col("__b"))
      .agg(sum(col("__w")).as("__bw"))
      .withColumn("__cum", sum(col("__bw")).over(w))
      // NOT "__W": Spark resolves case-insensitively and it would
      // collide with the per-row "__w" after the join below
      .withColumn("__tw", sum(col("__bw")).over(wg))
      .filter(t >= col("__cum") - col("__bw") && t <= col("__cum") - 1)
      .select(col(groupCol), col("__b"),
        (t - (col("__cum") - col("__bw"))).as("__off"), col("__tw"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__x"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    base.join(broadcast(targets), Seq(groupCol, "__b"))
      .withColumn("__cw", sum(col("__w")).over(win))
      .filter(col("__off") >= col("__cw") - col("__w") &&
        col("__off") <= col("__cw") - 1)
      // value ties can cover the offset with several rows of the SAME
      // value — collapse to one row per group
      .groupBy(col(groupCol), col("__tw"))
      .agg(min(col("__x")).as("__v"))
      .select(col(groupCol), col("__tw").as("w_total"),
        (col("__v").cast("double") / lit(100.0)).as("value"))
  }

  /** Median imputation per group — fill NULL measures with the group's
    * exact median (computed by [[exactQuantile]]'s bucketed prefix
    * counts over the NON-NULL values, so no per-group buffer at any
    * scale), the standard repair before models that can't see NULL.
    * Returns the input plus `valueCol` filled and a `was_null` flag —
    * imputation that doesn't mark itself poisons every downstream
    * distribution silently. */
  def imputeMedian(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val med = exactQuantile(df.filter(col(valueCol).isNotNull),
        groupCol, valueCol, q = 0.5)
      .select(col(groupCol), col("value").as("__med"))
    df.join(broadcast(med), Seq(groupCol), "left")
      .withColumn("was_null", col(valueCol).isNull)
      .withColumn(valueCol, coalesce(col(valueCol), col("__med")))
      .drop("__med")
  }

  /** Per-group Pearson correlation from the same exact-sufficient-
    * statistics pattern as [[linearFit]] (one aggregation however large
    * the fact), extended with Σy². The closed form
    * r = (nΣxy − ΣxΣy) / (sqrt(nΣxx − (Σx)²) · sqrt(nΣyy − (Σy)²))
    * runs in double on the group rows; sqrt is correctly rounded by
    * IEEE 754 on every engine, so identical operands give identical r.
    *
    * `yCol` (2-decimal money) is quantized to INTEGER cents before
    * summation — r is scale-invariant, and integer sums sidestep a real
    * cross-engine trap: a fractional DECIMAL(38,4) Σy² lands on doubles
    * some engines convert by mantissa-then-scale (two roundings — DuckDB
    * gives ...887 where the correctly rounded double is ...883), while
    * integer-to-double conversion is correctly rounded everywhere.
    * `xCol` must be integral. */
  def correlation(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val x = col(xCol).cast("long")
    val yc = (col(yCol).cast(d2) * lit(100))
      .cast(org.apache.spark.sql.types.DecimalType(20, 0)).cast("long")
    // Product sums (Σxy, Σy²) can pass 2^63, where some engines convert
    // wide integers to double by halves with TWO roundings (DuckDB's
    // HUGEINT cast is off by 1 ulp at 2.5e19). Split each nonnegative
    // term into its hi/lo 32-bit words and sum those SEPARATELY: both
    // component sums stay under 2^53 (exact doubles up to 2^31 rows per
    // group), and hi*2^32 + lo re-rounds ONCE — the same correctly-
    // rounded double on every engine.
    def splitHi(term: Column): Column = sum(shiftright(term, 32))
    def splitLo(term: Column): Column = sum(term.bitwiseAND(lit(4294967295L)))
    def recombine(hi: Column, lo: Column): Column =
      hi.cast("double") * lit(4294967296.0) + lo.cast("double")
    df.groupBy(col(groupCol)).agg(
        count(lit(1)).cast("double").as("__n"),
        sum(x).cast("double").as("__sx"),
        sum(yc).cast("double").as("__sy"),
        splitHi(x * yc).as("__sxyh"), splitLo(x * yc).as("__sxyl"),
        sum(x * x).cast("double").as("__sxx"),
        splitHi(yc * yc).as("__syyh"), splitLo(yc * yc).as("__syyl"))
      .select(col(groupCol), col("__n").cast("long").as("n"),
        col("__n").as("__n"), col("__sx").as("__sx"), col("__sy").as("__sy"),
        recombine(col("__sxyh"), col("__sxyl")).as("__sxy"),
        col("__sxx").as("__sxx"),
        recombine(col("__syyh"), col("__syyl")).as("__syy"))
      .select(col(groupCol), col("n"),
        ((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (sqrt(col("__n") * col("__sxx") - col("__sx") * col("__sx")) *
            sqrt(col("__n") * col("__syy") - col("__sy") * col("__sy"))))
          .as("r"))
  }
}
