package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Portable HyperLogLog (Flajolet et al. 2007): approximate distinct
  * counting in one map-side-combining aggregation over `2^p` registers —
  * the cardinality sketch a 100 TB profile run uses where the exact
  * distinct's per-key shuffle would dominate the job (same role as
  * Spark's own HLL++ inside `approx_count_distinct`, which stays the
  * default in [[Profile.columns]]).
  *
  * What this adds over the built-in: an ENGINE-PORTABLE register
  * function — bucket and rank come from md5 over the stringified key
  * (the repo-wide portable draw), so any SQL engine replays the sketch
  * bit for bit, registers merge across engines, and a persisted register
  * table keeps meaning outside Spark. The harmonic mean is summed in
  * exact integer units of 2^-61 (every term 2^(61-M) is a whole number
  * of units; double summation would round order-dependently across the
  * 61-bit exponent span), so the only inexact step is the final division
  * from identical operands.
  *
  * No small-range bias correction on purpose: the linear-counting branch
  * needs `ln`, whose last-ulp behavior is libm-specific — the one
  * non-portable operation in the algorithm. Below ~2.5·2^p distincts,
  * use the exact count (that regime is cheap anyway).
  */
object Hll {

  /** The (bucket, m) register table: bucket = first p bits of md5, m =
    * max over keys of the 1-based leading-zero rank of the next 60 hash
    * bits (1..61). Registers never observed are absent (m = 0 planes are
    * filled in by [[approxDistinct]]). */
  def registers(df: DataFrame, keyCol: String, p: Int = 8): DataFrame = {
    require(p % 4 == 0 && p >= 4 && p <= 16,
      s"p must be a multiple of 4 in [4, 16] (hex-aligned buckets), got $p")
    val hexChars = p / 4
    val h = md5(col(keyCol).cast("string"))
    val w = conv(substring(h, hexChars + 1, 15), 16, 10).cast("long")
    df.select(
        conv(substring(h, 1, hexChars), 16, 10).cast("long").as("bucket"),
        when(w === 0L, lit(61)).otherwise(lit(61) - length(bin(w))).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("m"))
  }

  /** One-row estimate: (m, n_present, estimate). `estimate` is the raw
    * HLL harmonic-mean estimator alpha_m * m^2 / sum(2^-M_j), absent
    * registers contributing 2^0. */
  def approxDistinct(df: DataFrame, keyCol: String, p: Int = 8): DataFrame = {
    val m = 1L << p
    val unit = 1L << 61 // exact double, and the integer unit of 2^-61
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val dec = DecimalType(38, 0)
    registers(df, keyCol, p)
      .agg(count(lit(1)).as("n_present"),
        coalesce(
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(61 - m AS INT))").cast(dec)),
          lit(0).cast(dec)).as("__su"))
      .select(lit(m).as("m"), col("n_present"),
        (lit(alpha) * lit(m.toDouble) * lit(m.toDouble) /
          ((col("__su") + (lit(m) - col("n_present")).cast(dec) *
            lit(unit).cast(dec)).cast("double") / lit(unit.toDouble)))
          .as("estimate"))
  }

  /** Per-group register tables: (groupCols..., bucket, m). Register
    * tables with the same p MERGE by per-bucket MAX — across batches,
    * engines, or time slices — which is what makes the sketch a
    * persistable, incrementally-maintainable warehouse object. */
  def registersByGroups(df: DataFrame, groupCols: Seq[String],
      keyCol: String, p: Int = 8): DataFrame = {
    require(p % 4 == 0 && p >= 4 && p <= 16,
      s"p must be a multiple of 4 in [4, 16] (hex-aligned buckets), got $p")
    val hexChars = p / 4
    val h = md5(col(keyCol).cast("string"))
    val w = conv(substring(h, hexChars + 1, 15), 16, 10).cast("long")
    df.select(groupCols.map(col) ++ Seq(
        conv(substring(h, 1, hexChars), 16, 10).cast("long").as("bucket"),
        when(w === 0L, lit(61)).otherwise(lit(61) - length(bin(w))).as("rho")): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("m"))
  }

  /** Fold stored register tables to (groupCols..., n_present, estimate) —
    * the read side of a persisted sketch. */
  def estimateByGroups(regs: DataFrame, groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    val m = 1L << p
    val unit = 1L << 61
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val dec = DecimalType(38, 0)
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(61 - m AS INT))").cast(dec))
          .as("__su"))
      .select(groupCols.map(col) ++ Seq(col("n_present"),
        (lit(alpha) * lit(m.toDouble) * lit(m.toDouble) /
          ((col("__su") + (lit(m) - col("n_present")).cast(dec) *
            lit(unit).cast(dec)).cast("double") / lit(unit.toDouble)))
          .as("estimate")): _*)
  }

  /** Sketch set algebra: |A|, |B|, |A ∪ B| and the inclusion-exclusion
    * intersection estimate |A| + |B| − |A ∪ B| — from the register
    * tables alone. The union sketch is EXACTLY the sketch of the unioned
    * data (per-bucket MAX is the merge), so the union estimate carries
    * the standard error bound; the intersection inherits both errors
    * additively (can go negative for near-disjoint sets — that is the
    * estimator, not a bug). This is "how many users did campaigns A and
    * B share" without ever storing user sets.
    *
    * Scale shape: two register aggregations (each one map-side-combining
    * pass, 2^p rows out) and folds over 3·2^p register rows — nothing
    * downstream of the first aggregations touches the data again. */
  def setAlgebra(a: DataFrame, b: DataFrame, keyCol: String,
      p: Int = 8): DataFrame = {
    val ra = registers(a, keyCol, p).select(lit("a").as("side"),
      col("bucket"), col("m")).localCheckpoint(true)
    val rb = registers(b, keyCol, p).select(lit("b").as("side"),
      col("bucket"), col("m")).localCheckpoint(true)
    val ru = ra.unionAll(rb)
      .groupBy(col("bucket")).agg(max(col("m")).as("m"))
      .select(lit("u").as("side"), col("bucket"), col("m"))
    val est = estimateByGroups(ra.unionAll(rb).unionAll(ru), Seq("side"), p)
    est.agg(
        max(when(col("side") === "a", col("estimate"))).as("est_a"),
        max(when(col("side") === "b", col("estimate"))).as("est_b"),
        max(when(col("side") === "u", col("estimate"))).as("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"))
  }

  /** Sliding-window distinct counts (7-day active users, etc.) from
    * per-day register tables — the query that is brutally expensive
    * exactly (every day re-counts a week of raw keys) but one register
    * merge approximately: sketch each day ONCE, then each day's window
    * estimate is a per-bucket MAX over the trailing `windowSize` days'
    * registers. Day d's merged sketch is EXACTLY the sketch of the
    * window's raw data (max-merge = sketching the concatenation), so the
    * standard error bound applies per window.
    *
    * Scale shape: one (day, bucket) aggregation over the fact is the
    * only full pass; the window merge range-joins the tiny distinct-day
    * frame (broadcast) against day-registers — |days| · 2^p rows,
    * corpus-independent. Output (day, n_present, estimate), day as
    * epoch days. */
  def rollingDistinct(df: DataFrame, tsCol: String, keyCol: String,
      windowSize: Int = 7, p: Int = 8): DataFrame = {
    require(windowSize >= 1, s"windowSize=$windowSize must be >= 1")
    val dayNum = datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
      .cast("long")
    val regs = registersByGroups(
      df.withColumn("__day", dayNum), Seq("__day"), keyCol, p)
      .localCheckpoint(true)
    val days = regs.select(col("__day").as("day")).distinct()
    val merged = broadcast(days).join(regs,
        col("__day").between(col("day") - (windowSize - 1), col("day")))
      .groupBy(col("day"), col("bucket")).agg(max(col("m")).as("m"))
    estimateByGroups(merged, Seq("day"), p)
  }

  /** Per-group estimate — one (group, bucket) aggregation then one
    * group-keyed fold: the distinct-users-per-segment query at corpus
    * scale, one sketch per group instead of one count-distinct shuffle
    * per key. Same raw estimator and exactness discipline as
    * [[approxDistinct]]. */
  def approxDistinctByGroup(df: DataFrame, groupCol: String,
      keyCol: String, p: Int = 8): DataFrame =
    estimateByGroups(registersByGroups(df, Seq(groupCol), keyCol, p),
      Seq(groupCol), p)
}
