package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader contract: `Tables.normalizeTs` must produce identical session-TZ
  * TIMESTAMP values whichever physical layout the driver's testdata
  * generation emitted for `events.ts` — TIMESTAMP(NANOS) surfaced as
  * nanos-in-a-long (rounds ≤6), `timestamp[us]`/TIMESTAMP_NTZ (round 7
  * regeneration), or plain TIMESTAMP. Guards against the r07 regression
  * where a regeneration silently flipped the type and broke the whole
  * event-time family. */
class TablesSpec extends SparkTestBase {

  private val micros = Seq(
    1609459200000000L, // 2021-01-01 00:00:00 UTC
    1609462800123456L, // 2021-01-01 01:00:00.123456 UTC
    1617235199999999L) // 2021-03-31 23:59:59.999999 UTC

  private def writeFixture(kind: String): String = {
    import spark.implicits._
    val dir = TempDirs.scratchDir(s"graft_tsfix_$kind").toString
    val base = micros.toDF("us")
      .withColumn("event_id", monotonically_increasing_id())
    val df = kind match {
      case "ntz" =>
        base.select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      case "nanos_long" => // what the legacy nanosAsLong read surfaces
        base.select(col("event_id"), (col("us") * 1000L).as("ts"))
      case "tz" =>
        base.select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("normalizeTs yields identical TIMESTAMP values across all three physical ts layouts") {
    val results = Seq("ntz", "nanos_long", "tz").map { kind =>
      val out = Tables.normalizeTs(spark.read.parquet(writeFixture(kind)))
      assert(out.schema("ts").dataType === TimestampType,
        s"layout $kind must normalize to TIMESTAMP")
      kind -> out.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }.toMap
    assert(results("ntz") === results("tz"))
    assert(results("nanos_long") === results("tz"))
    assert(results("tz").map(_._2) === micros)
  }

  test("normalizeTs leaves ts-less tables untouched") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "name")
    assert(Tables.normalizeTs(df).schema === df.schema)
  }

  test("normalizeTs: declared column list covers a second event-time column") {
    import spark.implicits._
    // two event-time columns in DIFFERENT physical layouts (one NTZ, one
    // nanos-long) plus a true long column that must NOT be touched
    val df = micros.toDF("us").select(
      timestamp_micros(col("us")).cast(TimestampNTZType).as("created_at"),
      (col("us") * 1000L).as("updated_at"),
      col("us").as("payload_size"))
    val out = Tables.normalizeTs(df, Seq("created_at", "updated_at"))
    assert(out.schema("created_at").dataType === TimestampType)
    assert(out.schema("updated_at").dataType === TimestampType)
    assert(out.schema("payload_size").dataType === LongType)
    val vals = out.select(unix_micros(col("created_at")),
      unix_micros(col("updated_at"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(vals === micros.map(m => (m, m)).sorted)
    // a declared column absent from the frame is ignored
    assert(Tables.normalizeTs(df, Seq("no_such", "updated_at"))
      .schema("updated_at").dataType === TimestampType)
  }

  test("load reads the driver events table with a session-TZ TIMESTAMP ts") {
    val ev = Tables.load(spark, sf("sf0.001"), "events")
    assert(ev.schema("ts").dataType === TimestampType)
    // epoch arithmetic must analyze (the r07 failure mode was
    // DATATYPE_MISMATCH on unix_millis over TIMESTAMP_NTZ)
    val n = ev.select(unix_millis(col("ts"))).limit(1).count()
    assert(n === 1)
  }
}
