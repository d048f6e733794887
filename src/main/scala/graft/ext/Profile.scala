package graft.ext

import org.apache.spark.sql.DataFrame
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
}
