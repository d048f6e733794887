package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-column association and distribution-shape statistics — the
  * screens a curation pipeline runs before trusting a column as a
  * stratification key (is `source` informative about `lang`?), before
  * sampling (is traffic concentrated on a handful of users?), and while
  * monitoring (did Tuesday's volume fall outside its weekday band?).
  *
  * Engine-portability discipline (repo-wide): no transcendentals.
  * Chi-square, Herfindahl concentration, and the z-test are pure
  * rationals (plus IEEE-754 `sqrt`, which is correctly rounded and
  * therefore deterministic) over exact integer counts, so every number
  * replays bit-identically on any engine; multi-addend double sums go
  * through floor-quantized LONG units (see [[TextAnalysis.search]] for
  * the pattern's rationale).
  *
  * Reference scope: §2.5 beyond-parity — the reference's analytics stop
  * at sum/avg/count (`api-library-olap/README.md:138-150`); these are
  * the association/shape statistics its MySQL engine never had.
  */
object Stats {

  /** Pearson chi-square test of independence between two categorical
    * columns, with degrees of freedom and Cramér's V effect size — the
    * feature-association screen (keep a metadata column only if it
    * carries signal about the label you stratify on).
    *
    * Computed via the O² identity: Σ_all (O-E)²/E = Σ O²/E - N (since
    * ΣO = ΣE = N), so chi2 = Σ_observed N·O²/(Cx·Cy) - N — and the
    * OBSERVED cells suffice, because an empty cell's O²/E term is zero
    * (its E lands in the -N). A naive Σ(O-E)²/E over the groupBy output
    * would silently drop every empty cell's E contribution. Per-cell
    * terms go through floor-quantized LONG units; the subtraction can
    * land ~cells·1e-9 below zero on a perfectly independent table, so
    * chi2 clamps at 0 (keeping Cramér's V's sqrt real). Output: one row
    * (chi2, dof, n, cramers_v).
    *
    * Scale shape: one (x,y) hash aggregation with map-side combine is
    * the only pass over the data; marginals come from window sums over
    * the CELL table (nx·ny rows — bounded by the categorical
    * cardinalities, not the corpus), so nothing after the first
    * aggregation scales with row count. */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("obs"))
    val t = cells
      .withColumn("cx", sum(col("obs")).over(Window.partitionBy(col(xCol))))
      .withColumn("cy", sum(col("obs")).over(Window.partitionBy(col(yCol))))
      .withColumn("n", sum(col("obs")).over(Window.partitionBy()))
    val term = col("n").cast("double") * col("obs").cast("double") *
      col("obs").cast("double") /
      (col("cx").cast("double") * col("cy").cast("double"))
    val agg = t.agg(
      sum(floor(term * lit(1e9)).cast("long")).as("su"),
      countDistinct(col(xCol)).as("nx"),
      countDistinct(col(yCol)).as("ny"),
      max(col("n")).as("nn"))
    val chi2 = greatest(
      col("su").cast("double") / lit(1e9) - col("nn").cast("double"),
      lit(0.0))
    agg.select(
      chi2.as("chi2"),
      ((col("nx") - 1) * (col("ny") - 1)).as("dof"),
      col("nn").as("n"),
      sqrt(chi2 / (col("nn").cast("double") *
        least(col("nx") - 1, col("ny") - 1).cast("double")))
        .as("cramers_v"))
  }

  /** Distribution concentration per group: Herfindahl–Hirschman index
    * (Σ pᵢ² over unit shares — 1/HHI is the "effective number of
    * units"), top-unit share, and unit count — the log-free substitute
    * for entropy that answers the same curation question ("is this
    * event type organic traffic or three bots?") with pure rationals of
    * exact integer counts.
    *
    * Scale shape: the classic two-level aggregation — (group, unit)
    * counts first (map-side combine collapses repeats before the
    * shuffle), then one group-keyed pass for all three statistics.
    * Per-unit counts stay LONG-exact; Σc² fits while each group's total
    * stays under ~3e9 rows (then widen to DECIMAL). */
  def concentration(df: DataFrame, groupCol: String,
      unitCol: String): DataFrame = {
    val c = df.groupBy(col(groupCol), col(unitCol))
      .agg(count(lit(1)).as("c"))
    c.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_units"),
        sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("ss"),
        max(col("c")).as("cmax"))
      .select(col(groupCol), col("n_units"), col("total"),
        (col("ss").cast("double") /
          (col("total").cast("double") * col("total").cast("double")))
          .as("hhi"),
        (col("cmax").cast("double") / col("total").cast("double"))
          .as("top_share"))
  }

  /** Seasonal-baseline volume anomaly: bucket rows into calendar days,
    * band each day against its own ISO-weekday's mean ± 2σ, and flag
    * the days outside the band — the pipeline-monitoring query ("is
    * today's feed volume normal FOR A TUESDAY?") that catches both
    * upstream outages and duplicate-delivery storms.
    *
    * The 2σ comparison is EXACT integer arithmetic: with per-weekday
    * day-count n, sum s and sum-of-squares ss over daily counts c,
    * (c-μ)² > 4σ²  ⟺  (n·c - s)² > 4·(n·ss - s²), every operand a LONG
    * (no float, no boundary jitter — a day at exactly 2σ compares the
    * same on every engine). σ is the population deviation INCLUDING the
    * day under test, which bounds a single outlier's z at (n-1)/√n —
    * so a weekday needs ≥6 observed days before anything can flag at
    * 2σ (at 5 days a lone spike lands exactly ON the fence). Output:
    * (day, dow, cnt, is_anomaly) per day.
    *
    * Scale shape: one day-keyed hash aggregation over the events (the
    * only corpus-scale pass), then window sums over the DAY table —
    * hundreds of rows however large the corpus. */
  def seasonalAnomaly(df: DataFrame, tsCol: String): DataFrame = {
    val daily = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", (weekday(col("day")) + 1).cast("long"))
    val w = Window.partitionBy(col("dow"))
    val t = daily
      .withColumn("nd", count(lit(1)).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("ss", sum(col("cnt") * col("cnt")).over(w))
    t.select(col("day"), col("dow"), col("cnt"),
      ((col("nd") * col("cnt") - col("s")) *
        (col("nd") * col("cnt") - col("s")) >
        lit(4L) * (col("nd") * col("ss") - col("s") * col("s")))
        .as("is_anomaly"))
  }

  /** Two-proportion z-test for a hash-assigned A/B experiment: users
    * are split into variants by the repo-wide portable draw (md5 of the
    * user key — deterministic across engines, runs, and partitionings,
    * and uncorrelated with any behavioral column), conversion is "user
    * emitted `convType` at least `minCount` times" (the threshold keeps
    * the predicate discriminative when every user trips the event at
    * least once), and the statistic is the pooled-variance z for the
    * difference in conversion rates.
    *
    * z = (pa - pb) / sqrt(p̂(1-p̂)(1/na + 1/nb)) with p̂ the pooled rate —
    * rationals of exact integer counts plus one IEEE `sqrt`, so the
    * statistic replays bit-identically. Degenerate designs (an empty
    * variant, or p̂ ∈ {0, 1} so the pooled variance vanishes) yield a
    * NULL z rather than an ANSI divide-by-zero. Output: one row
    * (users_a, conv_a, users_b, conv_b, z).
    *
    * Scale shape: one user-keyed aggregation (conversion count is a SUM,
    * map-side combined) carrying the variant as a computed column; the
    * final fold is a 4-counter global aggregate. Nothing is ever
    * per-event after the first pass. */
  def abTest(df: DataFrame, userCol: String, typeCol: String,
      convType: String, minCount: Long = 1L): DataFrame = {
    val perUser = df.groupBy(col(userCol))
      .agg(sum(when(col(typeCol) === convType, 1L).otherwise(0L))
        .as("nc"))
      .select(col(userCol),
        when(col("nc") >= minCount, 1L).otherwise(0L).as("converted"),
        (conv(substring(md5(col(userCol).cast("string")), 1, 8), 16, 10)
          .cast("long") % 2).as("variant"))
    val counts = perUser.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("users_a"),
      sum(when(col("variant") === 0, col("converted")).otherwise(0L))
        .as("conv_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("users_b"),
      sum(when(col("variant") === 1, col("converted")).otherwise(0L))
        .as("conv_b"))
    val pa = col("conv_a").cast("double") / col("users_a").cast("double")
    val pb = col("conv_b").cast("double") / col("users_b").cast("double")
    val conv_t = col("conv_a") + col("conv_b")
    val users_t = col("users_a") + col("users_b")
    val p = conv_t.cast("double") / users_t.cast("double")
    val wellFormed = col("users_a") > 0 && col("users_b") > 0 &&
      conv_t > 0 && conv_t < users_t
    counts.select(col("users_a"), col("conv_a"), col("users_b"),
      col("conv_b"),
      when(wellFormed,
        (pa - pb) / sqrt(p * (lit(1.0) - p) *
          (lit(1.0) / col("users_a").cast("double") +
            lit(1.0) / col("users_b").cast("double"))))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /** Pareto front per group — "how many units carry `num/den` of the
    * value" (the 80/20 concentration question behind curation decisions
    * like "how many domains cover 80% of the corpus"). A unit belongs to
    * the front while the cumulative value BEFORE it is still short of
    * the threshold, tested as the EXACT decimal cross-product
    * cum_before·den < total·num — no percentage double ever computed,
    * so the front boundary cannot jitter across engines.
    *
    * Scale shape: one (group, unit) aggregation over the fact, then
    * windows over the unit table (bounded by unit cardinality) ordered
    * by (value desc, unit) — deterministic under value ties. Output one
    * row per group: (group, n_units, n_front, front_share). */
  def paretoFront(df: DataFrame, groupCol: String, unitCol: String,
      valueCol: String, num: Int = 4, den: Int = 5): DataFrame = {
    require(num > 0 && den > 0 && num < den, s"need 0 < $num/$den < 1")
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val dec = org.apache.spark.sql.types.DecimalType(38, 2)
    val units = df.select(col(groupCol), col(unitCol).as("__u"),
        col(valueCol).cast(d2).as("__v"))
      .groupBy(col(groupCol), col("__u"))
      .agg(sum(col("__v")).cast(dec).as("__uv"))
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__uv").desc, col("__u"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    units
      .withColumn("__before", coalesce(sum(col("__uv")).over(wo),
        lit(0).cast(dec)))
      .withColumn("__tot", sum(col("__uv")).over(wg))
      .withColumn("__in", col("__before") * lit(den) < col("__tot") * lit(num))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_units"),
        sum(when(col("__in"), 1L).otherwise(0L)).as("n_front"),
        (sum(when(col("__in"), col("__uv")).otherwise(lit(0).cast(dec)))
          .cast("double") / sum(col("__uv")).cast("double"))
          .as("front_share"))
  }

  /** Per-group mode (most frequent value, ties to the smallest) — the
    * ordered-set aggregate SQL surfaces call MODE() WITHIN GROUP: one
    * (group, value) hash aggregation bounded by value cardinality, one
    * per-group argmax window. Output (group, mode, cnt). */
  def mode(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("cnt").desc, col("mode"))
    df.select(col(groupCol), col(valueCol).as("mode"))
      .groupBy(col(groupCol), col("mode")).agg(count(lit(1)).as("cnt"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(groupCol), col("mode"), col("cnt"))
  }

  /** Single changepoint detection per group (binary-segmentation
    * statistic over the daily volume series): the split day t maximizing
    * the between-segment contrast
    * T(t) = (n_r·S_l − n_l·S_r)² div (n_l·n_r) — the integer-exact core
    * of the CUSUM/variance-reduction statistic ((mean_l − mean_r)² up to
    * the n/(n_l·n_r) factor). Did this event type's volume shift level,
    * and when? The level-shift complement of [[seasonalAnomaly]]'s
    * single-day spikes.
    *
    * Everything is LONG arithmetic over exact day counts and prefix
    * sums; ties break to the earliest day — fully engine-replayable, no
    * distributional approximation anywhere.
    *
    * Scale shape: one (group, day) hash aggregation over the fact; all
    * windows run on the bounded daily series (|days| rows per group),
    * partitioned by group — never a global sort, nothing after the first
    * aggregation scales with row count. */
  def changepoint(df: DataFrame, tsCol: String, groupCol: String): DataFrame = {
    val day = datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
      .cast("long")
    val daily = df.select(col(groupCol), day.as("__day"))
      .groupBy(col(groupCol), col("__day")).agg(count(lit(1)).as("__c"))
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__day"))
    val wall = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val scored = daily
      .withColumn("__nl", row_number().over(wo).cast("long"))
      .withColumn("__sl", sum(col("__c")).over(wo))
      .withColumn("__n", count(lit(1)).over(wall))
      .withColumn("__s", sum(col("__c")).over(wall))
      .filter(col("__nl") < col("__n")) // split must leave a right side
      .withColumn("__diff",
        (col("__n") - col("__nl")) * col("__sl") -
          col("__nl") * (col("__s") - col("__sl")))
      .withColumn("t_stat",
        expr("(__diff * __diff) div (__nl * (__n - __nl))"))
    val pick = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("t_stat").desc, col("__day"))
    scored.withColumn("__rk", row_number().over(pick))
      .filter(col("__rk") === 1)
      .select(col(groupCol), col("__day").as("split_day"), col("t_stat"),
        col("__nl").as("n_l"), (col("__n") - col("__nl")).as("n_r"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between the `valueCol`
    * distributions of `a` and `b` — the drift detector a pipeline runs
    * between yesterday's batch and today's before trusting a retrain
    * (did the price distribution move?), and the nonparametric
    * complement of [[seasonalAnomaly]]'s mean±σ band.
    *
    * D = max over x of |F_a(x) − F_b(x)| stays EXACT until the last
    * division: per-value counts collapse the union to its distinct
    * values, running sums give the cumulative counts, and the maximized
    * quantity is the integer |n_b·cum_a − n_a·cum_b| (every ECDF step
    * lands on a sample point, so checking distinct sample values is
    * exhaustive). One row out: (n_a, n_b, d_num, d) with
    * d = d_num / (n_a·n_b) — identical integer operands, one correctly-
    * rounded division, identical double everywhere.
    *
    * Scale shape: one hash aggregation over the tagged union is the only
    * pass over the data; the running sums order a table bounded by the
    * DISTINCT value cardinality, not the row count. When that cardinality
    * is genuinely dense at 100 TB, use [[ksTestBinned]] — the
    * first-class binned-ECDF form whose cumsum table is `bins`-sized by
    * construction. */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    def cents(df: DataFrame, tag: Int): DataFrame =
      df.select((col(valueCol).cast(d2) * lit(100))
        .cast(org.apache.spark.sql.types.DecimalType(20, 0)).cast("long")
        .as("__v"), lit(tag).as("__t"))
    val perValue = cents(a, 0).unionAll(cents(b, 1))
      .groupBy(col("__v"))
      .agg(sum(when(col("__t") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__t") === 1, 1L).otherwise(0L)).as("__cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    perValue
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .withColumn("__na", sum(col("__ca")).over(Window.partitionBy()))
      .withColumn("__nb", sum(col("__cb")).over(Window.partitionBy()))
      .groupBy(col("__na"), col("__nb"))
      .agg(max(abs(col("__nb") * col("__cuma") - col("__na") * col("__cumb")))
        .as("d_num"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), col("d_num"),
        (col("d_num").cast("double") /
          (col("__na") * col("__nb")).cast("double")).as("d"))
  }

  /** [[ksTest]] for DENSE value domains: the ECDFs are compared at the
    * upper edges of `bins` fixed-width buckets over the combined
    * [min, max] (shared edges exactly as in [[Drift.numericPsi]], top
    * bucket closed), so the running-sum table is `bins` rows by
    * CONSTRUCTION — never the distinct-value cardinality — and the
    * single-partition window the exact form needs on a dense domain
    * disappears.
    *
    * The reported D is EXACT for the binned distributions and a lower
    * bound on the un-binned D; the gap is at most the largest single-bin
    * probability mass, so `bins` dials precision against cumsum size
    * (1000 bins ≈ ±0.1% on a uniform-ish domain). Same integer
    * discipline as [[ksTest]]: per-bin counts, integer cumulative
    * sums, d_num = max |n_b·cum_a − n_a·cum_b|, one final division. */
  def ksTestBinned(a: DataFrame, b: DataFrame, valueCol: String,
      bins: Int = 1000): DataFrame = {
    require(bins >= 2, s"bins=$bins must be >= 2")
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(col(valueCol).cast("double").as("__x"), lit(tag).as("__t"))
    val all = side(a, 0).unionAll(side(b, 1))
    val range = all.agg(min(col("__x")).as("__lo"), max(col("__x")).as("__hi"))
    val bucket = least(lit(bins - 1), floor(
      (col("__x") - col("__lo")) / (col("__hi") - col("__lo")) * bins)
      .cast("int"))
    val counts = all.crossJoin(broadcast(range))
      .select(when(col("__hi") === col("__lo"), lit(0)).otherwise(bucket)
        .as("__bin"), col("__t"))
      .groupBy(col("__bin"))
      .agg(sum(when(col("__t") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__t") === 1, 1L).otherwise(0L)).as("__cb"))
    // windows over the bins-sized bucket table only — bounded by the
    // caller's constant, the point of this overload
    val w = Window.orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    counts
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .withColumn("__na", sum(col("__ca")).over(Window.partitionBy()))
      .withColumn("__nb", sum(col("__cb")).over(Window.partitionBy()))
      .groupBy(col("__na"), col("__nb"))
      .agg(max(abs(col("__nb") * col("__cuma") - col("__na") * col("__cumb")))
        .as("d_num"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), col("d_num"),
        (col("d_num").cast("double") /
          (col("__na") * col("__nb")).cast("double")).as("d"))
  }
}
