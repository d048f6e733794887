package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling: aggregate an event stream onto a regular time
  * grid WITH the empty buckets (a plain GROUP BY silently drops hours in
  * which nothing happened — poison for downstream rate math, anomaly
  * windows, and chart axes). The batch analog of the streaming
  * tumbling-window aggregation in EventStream.
  *
  * Shape: one aggregation shuffle on the truncated bucket (bounded by the
  * time span, not the data), a 2-scalar bounds aggregate, and a sequence
  * explode for the spine — which is tiny (one row per bucket), so the
  * gap-filling join broadcasts. Linear in events, never collects.
  */
object TimeSeries {

  /** `aggs` are aggregate Columns evaluated per bucket (empty buckets get
    * `fill`, default 0). `every` is a Spark interval expression string,
    * e.g. "1 hour"; `unit` must be the matching date_trunc unit. */
  def resample(df: DataFrame, tsCol: String, unit: String, every: String,
      aggs: Seq[Column], fill: Any = 0): DataFrame = {
    val bucket = date_trunc(unit, col(tsCol))
    val agged = df.groupBy(bucket.as("bucket")).agg(aggs.head, aggs.tail: _*)
    val valueCols = agged.columns.filter(_ != "bucket")
    // bounds stay in-plan (a 1-row frame), the spine explodes from them:
    // no driver round-trip, and the whole thing is one lazy DataFrame
    val spine = df
      .agg(date_trunc(unit, min(col(tsCol))).as("lo"),
        date_trunc(unit, max(col(tsCol))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr(s"interval $every"))).as("bucket"))
    val joined = spine.join(agged, Seq("bucket"), "left")
    valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(c), lit(fill)))
    }
  }

  /** Trailing time-RANGE features per key: for every event, the count
    * and exact-decimal sum of the key's events in the preceding
    * `windowSeconds` (inclusive) — the feature-store shape ("user's
    * 7-day spend at event time") that a ROWS frame cannot express when
    * event cadence varies. The frame is a RANGE over epoch MICROSECONDS
    * (integer arithmetic — interval bounds on truncated milliseconds
    * would disagree with another engine's full-precision timestamps in
    * the sub-millisecond boundary window).
    *
    * Scale shape: one key-partitioned window — a single shuffle keyed by
    * the entity, frames bounded by the time horizon; ties in the
    * ordering are frame-inclusive (RANGE semantics), so tied-timestamp
    * results are deterministic without a tie-break column. */
  def rollingByTime(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds=$windowSeconds must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSeconds * 1000000L, 0)
    df.withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win",
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w).cast("double"))
  }

  /** Trailing exponentially-weighted moving average per key with decay
    * 1/2 per event step, truncated at `depth` events back — the
    * recency-weighted feature (activity heat, spend velocity) that a
    * plain windowed mean over-smooths. ewma_n = Σ_{i=0..depth}
    * v_{n-i} · 2^-i / Σ 2^-i-ish, except we keep the raw weighted sum
    * (no normalization) — the conventional feature-store form.
    *
    * Exactness/portability: powers of two are the one decay family a
    * float engine computes exactly, and integer arithmetic makes the
    * sum order-independent — each value quantizes once to units of
    * 2^-`scaleBits` (floor: identical on any engine), each term scales
    * by the EXACT integer 2^(depth-i), and the integer term sum divides
    * back by 2^(depth+scaleBits) (exponent shift, no rounding). So any
    * engine replaying the same lags gets the same bits. A non-dyadic
    * decay would round at every multiply, order-dependently.
    *
    * Scale shape: one key-partitioned sort window serves all `depth+1`
    * lags (Spark collapses same-window functions into one WindowExec);
    * per-row state is `depth` longs, never an event list. */
  def ewmaTrailing(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      valueCol: String, depth: Int = 16, scaleBits: Int = 20): DataFrame = {
    require(depth >= 0 && depth <= 40, s"depth=$depth out of [0, 40]")
    require(scaleBits >= 0 && scaleBits <= 40, s"scaleBits=$scaleBits out of [0, 40]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val u = floor(col(valueCol) * lit(math.pow(2.0, scaleBits)))
    val units = (0 to depth).map { i =>
      coalesce(lag(u, i).over(w), lit(0L)) * lit(1L << (depth - i))
    }.reduce(_ + _)
    df.withColumn("ewma",
      units.cast("double") / lit(math.pow(2.0, depth + scaleBits)))
  }

  /** Linear-interpolation gap fill over a regular integer grid — the
    * value-series repair [[resample]]'s empty buckets can't do (a count
    * of 0 is true; a missing sensor reading is not 0). For each key,
    * missing slots fill with
    * v_prev + floor((v_next − v_prev)·(t − t_prev) / (t_next − t_prev))
    * — PURE LONG arithmetic (values pre-quantized by the caller), so the
    * fill replays bit-for-bit; floor is the documented rounding. Slots
    * before the first or after the last observation stay NULL (an
    * extrapolation would be invention, not interpolation).
    *
    * Scale shape: the spine comes from a per-key `sequence()` expansion
    * (no driver loop); prev/next ride two IGNORE-NULLS window passes over
    * the key-partitioned grid — one shuffle total, grid-sized frames. */
  def interpolate(grid: DataFrame, keyCol: String, slotCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wb = Window.partitionBy(col(keyCol)).orderBy(col(slotCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy(col(keyCol)).orderBy(col(slotCol))
      .rowsBetween(0, Window.unboundedFollowing)
    val pv = last(col(valueCol), ignoreNulls = true).over(wb)
    val pt = last(when(col(valueCol).isNotNull, col(slotCol)),
      ignoreNulls = true).over(wb)
    val nv = first(col(valueCol), ignoreNulls = true).over(wf)
    val nt = first(when(col(valueCol).isNotNull, col(slotCol)),
      ignoreNulls = true).over(wf)
    grid
      .withColumn("__pv", pv).withColumn("__pt", pt)
      .withColumn("__nv", nv).withColumn("__nt", nt)
      // Spark's long `div` and DuckDB's `//` BOTH truncate toward zero
      // (-7/2 = -3 on each, verified) — so the plain integral division
      // is the shared semantic even on falling segments with negative
      // numerators; truncation-toward-zero is the documented rounding
      .withColumn("__num",
        (col("__nv") - col("__pv")) * (col(slotCol) - col("__pt")))
      .withColumn("__den", col("__nt") - col("__pt"))
      .withColumn("filled",
        when(col(valueCol).isNotNull, col(valueCol))
          .otherwise(when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + expr("__num div __den"))))
      .withColumn("was_gap", col(valueCol).isNull)
      .drop("__pv", "__pt", "__nv", "__nt", "__num", "__den")
  }

  /** Seasonal-naive forecast backtest: predict each day's volume with
    * the value one season earlier (the classic "same weekday last week"
    * baseline every real forecaster must beat), score by MAE over the
    * days where both sides exist. The honesty check a metrics pipeline
    * runs BEFORE trusting any fancier model — all error sums are exact
    * integers, MAE is one division of exact operands.
    *
    * Scale shape: one (group, day) hash aggregation over the fact; the
    * backtest is a group+day equi-join of the bounded daily series with
    * itself shifted by `season` (never a window over raw events), then
    * one fold to a row per group. */
  def seasonalNaiveEval(df: DataFrame, tsCol: String, groupCol: String,
      season: Int = 7): DataFrame = {
    require(season >= 1, s"season=$season must be >= 1")
    val day = datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
      .cast("long")
    val daily = df.select(col(groupCol), day.as("__day"))
      .groupBy(col(groupCol), col("__day")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val prior = daily.select(col(groupCol),
      (col("__day") + season).as("__day"), col("__c").as("__pred"))
    daily.join(prior, Seq(groupCol, "__day"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("__c") - col("__pred"))).as("sum_abs_err"))
      .select(col(groupCol), col("n_eval"), col("sum_abs_err"),
        (col("sum_abs_err").cast("double") / col("n_eval").cast("double"))
          .as("mae"))
  }
}
