package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden-record survivorship: collapse a multi-version entity feed
  * (CDC deltas, partial updates, multiple source systems) to one row
  * per key, each field independently taking its LATEST NON-NULL value
  * in version order — the entity-resolution merge step every customer/
  * document master table needs, and the piece a plain "latest row wins"
  * upsert ([[graft.snapshot.Warehouse.merge]]) gets wrong when updates
  * are partial (a later row's NULL would erase an earlier value).
  *
  * Scale shape: ONE key-keyed shuffle serves every field — the
  * last-non-null window (full-frame, ordered by the version column)
  * fills each field forward, then one aggregation on the same
  * partitioning collapses to a single row per key. Per-field window
  * state is one value, never a version list, so hot keys with deep
  * version chains stream through.
  */
object Golden {

  /** One survivor row per key: `fields` each resolve to the latest
    * non-null value ordered by `orderCol` (must be unique per key —
    * a version number or change timestamp — or resolution is
    * engine-defined on ties). Non-field, non-key columns are dropped.
    * A field null in EVERY version stays null. */
  def survivorship(df: DataFrame, keyCol: String, orderCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "survivorship needs at least one field")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val filled = fields.foldLeft(df) { (acc, f) =>
      acc.withColumn(s"__$f", last(col(f), ignoreNulls = true).over(w))
    }
    val aggs = fields.map(f => max(col(s"__$f")).as(f))
    filled.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
