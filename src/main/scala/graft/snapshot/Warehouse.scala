package graft.snapshot

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed fact-table catalog: one directory per fact under `root`,
  * partitioned by `year` so date cuts prune files at the source
  * (SURVEY.md §4 "Snapshot pruning"; the reference's implicit
  * (queryId, year, month, week, day) keying, OLAP.php:166-175).
  *
  * All filesystem operations go through the Hadoop FileSystem API so the
  * root may live on any supported store (local, HDFS, S3A, ...), not just
  * the local disk.
  *
  * Appends are plain partition-local parquet writes; a widening schema
  * change (the reference's `CHANGE COLUMN`, S7) triggers a one-off rewrite
  * since parquet files are immutable. New nullable columns need no rewrite —
  * `mergeSchema` union-by-name covers them at read time.
  */
final class Warehouse(spark: SparkSession, val root: String) {

  private def path(fact: String) = new Path(root, fact)

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(fact: String): Boolean = fs.exists(path(fact))

  def read(fact: String): Option[DataFrame] =
    if (!exists(fact)) None
    else {
      val df = spark.read.option("mergeSchema", "true").parquet(path(fact).toString)
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
        // no widening needed: align the batch to the stored schema
        val aligned = SchemaEvolution.unionEvolve(existing.limit(0), batch)
        write(aligned, SaveMode.Append, fact)
      } else if (SchemaEvolution.evolvedSchema(batch.schema, existing.schema) == batch.schema
          && existing.schema.fieldNames.forall(batch.schema.fieldNames.contains)) {
        // batch schema is a widening superset: append as-is, readers merge
        write(batch, SaveMode.Append, fact)
      } else {
        // incompatible widening (type change): one-off rewrite (ref S7
        // CHANGE COLUMN analog)
        replaceWith(fact, SchemaEvolution.unionEvolve(existing, batch), ".tmp")
      }
  }

  private def write(df: DataFrame, mode: SaveMode, fact: String): Unit =
    df.write.partitionBy("year").mode(mode).parquet(path(fact).toString)

  /** Atomically-ish replace a fact directory with a rewritten DataFrame:
    * write to a sibling temp dir, swap via FS rename, fail loudly if the
    * swap cannot complete (never silently lose the table). */
  private def replaceWith(fact: String, df: DataFrame, suffix: String,
      writeOpts: Map[String, String] = Map.empty): Unit = {
    val target = path(fact)
    val tmp = new Path(target.getParent, target.getName + suffix)
    val old = new Path(target.getParent, target.getName + ".old")
    val f = fs
    if (f.exists(tmp)) f.delete(tmp, true)
    var w = df.repartition(col("year")).write.partitionBy("year")
    writeOpts.foreach { case (k, v) => w = w.option(k, v) }
    w.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (f.exists(old)) f.delete(old, true)
    if (!f.rename(target, old))
      throw new java.io.IOException(s"could not stage out $target")
    if (!f.rename(tmp, target)) {
      // roll back so the table is never lost
      f.rename(old, target)
      throw new java.io.IOException(s"could not swap in rewritten $target")
    }
    f.delete(old, true)
  }

  /** Compaction (SURVEY §7.4 risk 5): daily appends accumulate one small
    * file per run per partition; periodically rewrite each year partition
    * into few well-sized files. One shuffle by partition key, then a
    * size-capped write. */
  def compact(fact: String, maxRecordsPerFile: Long = 5000000L): Unit =
    read(fact).foreach { df =>
      replaceWith(fact, df, ".compact",
        Map("maxRecordsPerFile" -> maxRecordsPerFile.toString))
    }
}
