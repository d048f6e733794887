package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: each point row matched to the interval
  * rows [start, end] that contain it, with optional extra equi-keys —
  * events to sessions, timestamps to validity windows, values to tiers.
  *
  * Spark plans a plain `p BETWEEN start AND end` predicate as a broadcast
  * nested-loop / cartesian theta join — quadratic. The composition here
  * buckets time into fixed-width cells: intervals explode to the cells
  * they overlap, points hash to their single cell, and the match becomes
  * an EQUI-join on (keys, cell) + a residual range filter. Shuffle volume
  * is |points| + |intervals| * avg-cells-per-interval; pick `bucketMs`
  * near the typical interval length so that factor stays small. A point
  * joins an interval only through the point's own cell, so no
  * deduplication is needed.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointCol: String, startCol: String, endCol: String,
      bucketMs: Long = 3600000L): DataFrame = {
    val cell = (c: String) => floor(unix_millis(col(c)) / bucketMs)
    val ip = intervals.withColumn("__cell",
      explode(sequence(cell(startCol), cell(endCol))))
    val pp = points.withColumn("__cell", cell(pointCol))
    pp.join(ip, keys :+ "__cell")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__cell")
  }
}
