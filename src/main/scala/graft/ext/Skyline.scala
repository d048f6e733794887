package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto-optimal front) per group — the points no other
  * point beats on BOTH dimensions (Börzsönyi et al. ICDE'01): "orders
  * that are simultaneously among the largest and the most recent",
  * "documents longest AND highest-quality" — the multi-criteria shortlist
  * a single ranking can't produce.
  *
  * Both dimensions maximize. On the DISTINCT point set sorted by
  * (x DESC, y DESC), a point is dominated exactly when some earlier
  * point has y ≥ its y — so membership is one strict comparison against
  * the running maximum of y (equal points are deduplicated first; with
  * dominance requiring strict improvement somewhere, equal survivors
  * are the same point). One in-group sort window, pure integer
  * comparisons, no pairwise join anywhere.
  *
  * Scale shape: dedup + window share one group-keyed shuffle; the window
  * runs over DISTINCT (x, y) pairs, already a reduction. (At 100 TB the
  * in-group sort can become x-range buckets + per-bucket max-y prefix —
  * the [[graft.ext.TextAnalysis.packSequences]] trick on the second
  * dimension.) */
object Skyline {

  /** Distinct Pareto-optimal (group, x, y) points, both dims maximized;
    * dims quantize to cents so the comparisons are engine-exact. */
  def front2d(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    def cents(c: String) = (col(c).cast(d2) * lit(100))
      .cast(org.apache.spark.sql.types.DecimalType(20, 0)).cast("long")
    val pts = df.select(col(groupCol), cents(xCol).as("x"), cents(yCol).as("y"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("x").desc, col("y").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    pts.withColumn("__my", max(col("y")).over(w))
      .filter(col("__my").isNull || col("y") > col("__my"))
      .select(col(groupCol), col("x"), col("y"))
  }
}
