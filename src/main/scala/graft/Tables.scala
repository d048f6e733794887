package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver testdata layout (`TESTDATA.md`): one parquet file
  * per table under an sf directory. */
object Tables {

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize an event-time `ts` column to session-timezone TIMESTAMP,
    * whatever physical type the testdata generation emitted. The driver has
    * shipped three layouts across rounds:
    *
    *   - `TIMESTAMP(NANOS)` — unreadable by the vectorized reader; surfaced
    *     as nanos-in-a-LongType via `spark.sql.legacy.parquet.nanosAsLong`
    *     (set in [[load]]) and rebuilt here with `timestamp_micros(div 1000)`;
    *   - `timestamp[us]` without `isAdjustedToUTC` — inferred as
    *     TIMESTAMP_NTZ (Spark ≥3.4 default); cast to TIMESTAMP. The session
    *     timezone is pinned to UTC by every entrypoint, so the cast is
    *     value-preserving and matches DuckDB's naive-timestamp semantics
    *     (`unix_millis` et al. then agree with the oracle);
    *   - plain TIMESTAMP — identity.
    *
    * Every event-time consumer (batch loads AND the file-stream reader) must
    * go through this one function so the contract survives the next testdata
    * regeneration. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Legacy-layout guard: TIMESTAMP(NANOS) events read as nanos-long
    // (no-op for the current micros testdata). Harmless to set always.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** Register every present table as a temp view (idempotent, cheap —
    * schema-only driver work; no data read). */
  def register(spark: SparkSession, sfDir: String): Unit =
    all.foreach { t =>
      if (new java.io.File(s"$sfDir/$t.parquet").exists())
        load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
