package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for co-located joins — the pre-shuffle that pays for
  * itself: writing a fact bucketed (and sorted) by its join key means
  * every subsequent join/aggregation on that key skips the exchange
  * entirely, because rows are already hash-placed by bucket id. At 100 TB
  * the repeated per-query shuffle of a big fact table is THE dominant
  * cost; bucketing moves it to write time, once.
  *
  * Uses the session catalog's bucketed-table support (`bucketBy` +
  * `saveAsTable` with an explicit external path — plain `save` cannot
  * record bucket metadata, which lives in the catalog). Two tables
  * co-bucketed on their join keys with the SAME bucket count join with
  * zero Exchange on either side; `sortBy` additionally removes the
  * per-bucket sort of a sort-merge join.
  *
  * Bucket count is a capacity decision, not a correctness one: pick
  * buckets ~ (table size / healthy partition size), keep it a power of
  * two so co-bucketed tables at different counts can still coalesce
  * (Spark's bucket coalescing joins 512-bucket against 128-bucket
  * shuffle-free by reading 4:1). */
object Bucketing {

  /** Write `df` as a bucketed external table at `path`, registered as
    * `table` in the session catalog. Overwrites both data and catalog
    * entry (idempotent re-runs). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      keys: Seq[String], buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** The bucketed table as a DataFrame (reads carry the bucket spec, so
    * joins/aggs on the bucket keys plan without an exchange). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
