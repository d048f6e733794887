package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union ("gaps and islands"): coalesce each key's overlapping
  * or touching [start, end] spans into maximal islands, and report the
  * per-key union length — the uptime/SLA/coverage primitive (how long
  * was the device actually reporting? what fraction of the day did the
  * crawler hold a lease?) that a naive SUM(end - start) gets wrong the
  * moment two spans overlap.
  *
  * Distinct from gap-threshold sessionization ([[graft.streaming.EventStream]]):
  * sessions merge POINT events closer than a fixed gap; islands merge
  * SPANS of per-row varying length — a long-running span bridges events
  * a session gap would split.
  *
  * Bounds are integers (epoch millis); island detection and all lengths
  * stay LONG-exact, so results replay bit-identically on any engine.
  *
  * Scale shape: ONE key-keyed shuffle serves everything — the running
  * max(end) window, the island-id running sum (same partitioning, same
  * order), and the island/key aggregations above it. Per-key state in
  * the window is one LONG, never a span list, so a key with millions of
  * spans streams through its window frame.
  */
object Intervals {

  /** Maximal merged islands per key. Spans [start, end] with
    * start <= running-max(end) of earlier rows (ordered by start, then
    * end) merge; touching endpoints (next.start == prev.end) merge too
    * (closed-interval semantics — use end-1 upstream for half-open).
    * Output: (key, island_start, island_end, n_spans). */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_spans"))
      .drop("__island")
  }

  /** Per-key coverage summary over the merged islands: island count,
    * union length Σ(island_end - island_start) — exact, overlaps counted
    * once — and total span count. Output:
    * (key, n_islands, covered, n_spans). */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame =
    mergeIntervals(df, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("island_end") - col("island_start")).as("covered"),
        sum(col("n_spans")).as("n_spans"))
}
