package graft.snapshot

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed fact-table catalog: one directory per fact under `root`,
  * partitioned by `year` so date cuts prune files at the source
  * (SURVEY.md §4 "Snapshot pruning"; the reference's implicit
  * (queryId, year, month, week, day) keying, OLAP.php:166-175).
  *
  * Appends are plain partition-local parquet writes; a widening schema
  * change (the reference's `CHANGE COLUMN`, S7) triggers a one-off rewrite
  * since parquet files are immutable. New nullable columns need no rewrite —
  * `mergeSchema` union-by-name covers them at read time.
  */
final class Warehouse(spark: SparkSession, val root: String) {

  private def path(fact: String) = s"$root/$fact"

  def exists(fact: String): Boolean =
    new java.io.File(path(fact)).exists()

  def read(fact: String): Option[DataFrame] =
    if (!exists(fact)) None
    else {
      val df = spark.read.option("mergeSchema", "true").parquet(path(fact))
      // partition-dir inference narrows `year` to int; restore the
      // authoritative injected type (long) for a stable schema
      Some(df.withColumn("year", col("year").cast("long")))
    }

  /** Append a batch, evolving the stored schema when needed (S5/S6/S7). */
  def append(fact: String, batch: DataFrame): Unit = read(fact) match {
    case None =>
      write(batch, SaveMode.Overwrite, fact)
    case Some(existing) =>
      val evolved = SchemaEvolution.evolvedSchema(existing.schema, batch.schema)
      if (evolved == existing.schema) {
        // no widening needed; mergeSchema handles new-at-read nothing
        val aligned = SchemaEvolution.unionEvolve(existing.limit(0), batch)
        write(aligned, SaveMode.Append, fact)
      } else if (SchemaEvolution.evolvedSchema(batch.schema, existing.schema) == batch.schema
          && existing.schema.fieldNames.forall(batch.schema.fieldNames.contains)) {
        // batch schema is a widening superset: append as-is, readers merge
        write(batch, SaveMode.Append, fact)
      } else {
        // incompatible widening (type change): one-off rewrite (ref S7
        // CHANGE COLUMN analog)
        val all = SchemaEvolution.unionEvolve(existing, batch)
        val tmp = path(fact) + ".tmp"
        all.write.partitionBy("year").mode(SaveMode.Overwrite).parquet(tmp)
        val dir = new java.io.File(path(fact))
        def delete(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(delete)); f.delete()
        }
        delete(dir)
        new java.io.File(tmp).renameTo(dir)
      }
  }

  private def write(df: DataFrame, mode: SaveMode, fact: String): Unit =
    df.write.partitionBy("year").mode(mode).parquet(path(fact))

  /** Compaction (SURVEY §7.4 risk 5): daily appends accumulate one small
    * file per run per partition; periodically rewrite each year partition
    * into few well-sized files. One shuffle by partition key, then a
    * size-capped write. */
  def compact(fact: String, maxRecordsPerFile: Long = 5000000L): Unit =
    read(fact).foreach { df =>
      val tmp = path(fact) + ".compact"
      df.repartition(col("year"))
        .write.partitionBy("year")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .mode(SaveMode.Overwrite).parquet(tmp)
      val dir = new java.io.File(path(fact))
      def delete(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(delete)); f.delete()
      }
      delete(dir)
      new java.io.File(tmp).renameTo(dir)
    }
}
