package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-group quantile normalization (the limma/genomics transform,
  * Bolstad et al. 2003): force every group's value distribution to be
  * IDENTICAL — each row's value is replaced by the mean, across groups,
  * of the value at its within-group rank. The score-calibration step
  * before pooling quality scores from heterogeneous sources: after it, a
  * global threshold cuts every source at the same quantile, so no source
  * dominates a "top 20%" selection just because its scorer runs hot.
  */
object Normalize {

  /** Equal-size groups only (the classic contract — ranks must align
    * one-to-one; fails loudly otherwise, one scalar driver check).
    * `tieCol` must be unique within a group: it makes the within-group
    * order — and therefore the whole transform — deterministic and
    * engine-replayable under ties.
    *
    * Scale shape: one group-keyed window shuffle assigns ranks, one
    * rank-keyed hash aggregation builds the reference distribution
    * (cardinality = group size, with only |groups| rows per rank), and
    * one rank-keyed shuffle join attaches it back. The rank means sum
    * in quantized DECIMAL (exact, partition-order-independent — the
    * [[Similarity.centroids]] pattern) and divide once in IEEE, so the
    * normalized values replay bit-identically on any engine.
    * Output: (group, tie, v, rank, nv). */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, quantize: Int = 6): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__v"), col(tieCol))
    val ranked = df.select(col(groupCol), col(tieCol),
        col(valueCol).cast("double").as("__v"))
      .withColumn("__r", row_number().over(w))
    val distinctSizes = ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      .agg(countDistinct(col("n")).as("k")).head().getLong(0)
    require(distinctSizes <= 1,
      "quantileNormalize requires equal group sizes (truncate or " +
        "subsample upstream); got differing counts per group")
    val dec = org.apache.spark.sql.types.DecimalType(28, quantize)
    val ref = ranked.groupBy(col("__r"))
      .agg((sum(round(col("__v"), quantize).cast(dec)).cast("double") /
        count(lit(1))).as("__ref"))
    ranked.join(ref, "__r")
      .select(col(groupCol), col(tieCol), col("__v").as("v"),
        col("__r").cast("long").as("rank"), col("__ref").as("nv"))
  }
}
