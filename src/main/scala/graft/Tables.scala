package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata layout (`TESTDATA.md`): one parquet file
  * per table under an sf directory. */
object Tables {

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    // rejects; read nanos as long and rebuild a (microsecond) timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case None => df
    }
  }

  /** Register every present table as a temp view (idempotent, cheap —
    * schema-only driver work; no data read). */
  def register(spark: SparkSession, sfDir: String): Unit =
    all.foreach { t =>
      if (new java.io.File(s"$sfDir/$t.parquet").exists())
        load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
