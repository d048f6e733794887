package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("hourly windowed agg equals the batch equivalent") {
    val streamed = EventStream.runHourly(spark, sf("sf0.001"), "hourly_test")
    val batch = graft.Tables.load(spark, sf("sf0.001"), "events")
      .groupBy(window($"ts", "1 hour")("start").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("v"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming mview ingestion: multi-batch folds equal the batch aggregation") {
    val wh = new graft.snapshot.Warehouse(spark,
      graft.TempDirs.scratchDir("smv_spec").toString)
    val served = EventStream.runMviewIngest(spark, sf("sf0.001"), wh, "ev")
      .orderBy("event_type")
      .as[(String, Double, Long, Double, Double, Double)].collect().toSeq
    val batch = graft.Tables.load(spark, sf("sf0.001"), "events")
      .groupBy($"event_type")
      .agg(sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"),
        count(lit(1)).as("n"), min($"value").as("min_v"),
        max($"value").as("max_v"))
      .withColumn("avg_v", $"total" / $"n")
      .orderBy("event_type")
      .as[(String, Double, Long, Double, Double, Double)].collect().toSeq
    assert(served == batch)
    // the fold was genuinely incremental: the raw fact landed too, row
    // count equal to the full event stream
    assert(wh.read("ev").get.count() ==
      graft.Tables.load(spark, sf("sf0.001"), "events").count())
  }

  test("streaming hll ingestion: folded registers equal the one-shot sketch") {
    val wh = new graft.snapshot.Warehouse(spark,
      graft.TempDirs.scratchDir("shll_spec").toString)
    val served = EventStream.runHllIngest(spark, sf("sf0.001"), wh, "sk")
      .orderBy("year", "month")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val oneShot = graft.ext.Hll.estimateByGroups(
      graft.ext.Hll.registersByGroups(
        graft.Tables.load(spark, sf("sf0.001"), "events")
          .select($"user_id", year($"ts").cast("long").as("year"),
            month($"ts").cast("long").as("month")),
        Seq("year", "month"), "user_id"),
      Seq("year", "month"))
      .orderBy("year", "month")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(served == oneShot, "MAX-merge across batches must be lossless")
    // and the persisted state is registers, not keys: bounded by 2^p
    assert(wh.read("sk").get.count() <= 256L * oneShot.size)
  }

  test("streaming cms ingestion: summed cells equal the one-shot sketch") {
    val wh = new graft.snapshot.Warehouse(spark,
      graft.TempDirs.scratchDir("scms_spec").toString)
    val folded = EventStream.runCmsIngest(spark, sf("sf0.001"), wh, "sk")
      .orderBy("row", "pos").as[(Int, Long, Long)].collect().toSeq
    val oneShot = graft.ext.CountMin.sketch(
      graft.Tables.load(spark, sf("sf0.001"), "events"), "event_type")
      .orderBy("row", "pos").as[(Int, Long, Long)].collect().toSeq
    assert(folded == oneShot, "SUM-merge across batches must be lossless")
  }

  test("streaming quantile-sketch ingestion: folded bins equal the one-shot sketch") {
    val wh = new graft.snapshot.Warehouse(spark,
      graft.TempDirs.scratchDir("sqsk_spec").toString)
    val folded = EventStream.runQsketchIngest(spark, sf("sf0.001"), wh, "qb")
      .orderBy("event_type", "bin").as[(String, Long, Long)].collect().toSeq
    val oneShot = graft.ext.Profile.quantileBinCounts(
      graft.Tables.load(spark, sf("sf0.001"), "events"),
      "event_type", "value", 0.0, 500.0, 64)
      .orderBy("event_type", "bin").as[(String, Long, Long)].collect().toSeq
    assert(folded == oneShot, "bin counters must SUM losslessly across batches")
  }

  test("streaming moments ingestion: folded integer sums equal the one-shot statistics") {
    val wh = new graft.snapshot.Warehouse(spark,
      graft.TempDirs.scratchDir("smom_spec").toString)
    val folded = EventStream.runMomentsIngest(spark, sf("sf0.001"), wh, "mo")
      .orderBy("event_type").as[(String, Long, Long, Long, Long)].collect().toSeq
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val x = (col("value").cast(d2) * lit(100))
      .cast(org.apache.spark.sql.types.DecimalType(20, 0)).cast("long")
    val oneShot = graft.Tables.load(spark, sf("sf0.001"), "events")
      .select(col("event_type"), x.as("x"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(shiftright(col("x") * col("x"), 32)).as("sh"),
        sum((col("x") * col("x")).bitwiseAND(lit(4294967295L))).as("sl"))
      .orderBy("event_type").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(folded == oneShot, "moment sums must fold losslessly across batches")
  }

  test("streaming bitmap ingestion: OR-folded words equal the one-shot bitmap") {
    val wh = new graft.snapshot.Warehouse(spark,
      graft.TempDirs.scratchDir("sbmp_spec").toString)
    val folded = EventStream.runBitmapIngest(spark, sf("sf0.001"), wh, "ub")
      .orderBy("segment", "word").as[(String, Long, Long)].collect().toSeq
    val oneShot = graft.ext.Bitmap.build(
      graft.Tables.load(spark, sf("sf0.001"), "events"),
      "event_type", "user_id")
      .orderBy("segment", "word").as[(String, Long, Long)].collect().toSeq
    assert(folded == oneShot, "bit_or must fold losslessly across batches")
  }

  test("sessionization: state machine closes sessions on inactivity gaps") {
    // deterministic micro-stream via a temp parquet dir in the events schema
    val dir = java.nio.file.Files.createTempDirectory("sess_src")
    val rows = Seq(
      // user 1: two sessions separated by > 30 min
      (1L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-01 10:10:00", 1L),
      (3L, "2024-01-01 11:30:00", 1L), (4L, "2024-01-01 11:40:00", 1L),
      // user 2: one long session
      (5L, "2024-01-01 09:00:00", 2L), (6L, "2024-01-01 09:20:00", 2L),
      (7L, "2024-01-01 09:40:00", 2L),
      // a late event far in the future advances the watermark so all
      // earlier sessions time out and emit
      (8L, "2024-01-02 12:00:00", 1L))
      .toDF("event_id", "ts_s", "user_id")
      .select($"event_id",
        // nanos-as-long layout, matching the events schema contract
        (unix_timestamp($"ts_s").cast("long") * 1000000000L).as("ts"),
        $"user_id", lit("click").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
    // single parquet FILE named events.parquet (the testdata layout)
    val stage = java.nio.file.Files.createTempDirectory("sess_stage")
    rows.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = stage.toFile.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, dir.resolve("events.parquet"))

    val sessions = EventStream.runSessions(spark, dir.toString,
      gapMinutes = 30, name = "sess_test")
      .select($"user_id", $"n_events").as[(Long, Int)].collect().toSet
    // user 1: sessions of 2 and 2 events; user 2: one of 3. The last
    // session (the 2024-01-02 event) stays open - watermark hasn't passed.
    assert(sessions == Set((1L, 2), (2L, 3)) ||
      sessions == Set((1L, 2), (2L, 3), (1L, 1)),
      s"got $sessions")
  }

  test("streaming dedup equals batch distinct (watermark-bounded state)") {
    val deduped = EventStream.runDedup(spark, sf("sf0.001"),
      Seq("user_id", "event_type"), name = "dedup_test")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val batch = graft.Tables.load(spark, sf("sf0.001"), "events")
      .select($"user_id", $"event_type").distinct()
      .as[(Long, String)].collect().toSet
    // set-equal AND no duplicate emissions
    assert(deduped.length == batch.size)
    assert(deduped.toSet == batch)
  }

  test("stream-static enrichment equals the batch star join") {
    val dim = graft.Tables.load(spark, sf("sf0.001"), "customer")
      .select($"c_custkey", $"c_mktsegment")
    val streamed = EventStream.runEnriched(spark, sf("sf0.001"), dim,
      eventKey = "user_id", dimKey = "c_custkey",
      groupCol = "c_mktsegment", name = "enrich_test")
    val batch = graft.Tables.load(spark, sf("sf0.001"), "events")
      .join(dim, $"user_id" === $"c_custkey")
      .groupBy(window($"ts", "1 hour")("start").as("hour"), $"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("v"))
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("stream-stream interval join equals the batch join") {
    val streamed = EventStream.runPurchaseViewJoin(spark, sf("sf0.001"),
      name = "pv_join_test")
    val ev = graft.Tables.load(spark, sf("sf0.001"), "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"value".as("p_value"))
    val v = ev.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"ts".as("v_ts"))
    val batch = p.join(v,
      $"user_id" === $"v_user" &&
        $"v_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
        $"v_ts" <= $"p_ts")
      .select($"user_id", $"p_ts", $"p_value", $"v_ts")
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("batch sessionization cross-checks the streaming state machine") {
    // streaming emits only closed/timed-out sessions; batch over static
    // data emits all. Invariant: streaming sessions are exactly the batch
    // sessions minus (possibly) each user's final open session.
    // compare at millisecond precision: the streaming path's Timestamp
    // (getTime) truncates the micros that batch keeps
    def ms(df: org.apache.spark.sql.DataFrame) = df
      .select($"user_id", unix_millis($"start").as("s"),
        unix_millis($"end").as("e"), $"n_events")
      .as[(Long, Long, Long, Int)].collect().toSet
    val events = graft.Tables.load(spark, sf("sf0.001"), "events")
    val batch = ms(EventStream.sessionizeBatch(events, gapMinutes = 30))
    val streamed = ms(EventStream.runSessions(spark, sf("sf0.001"),
      gapMinutes = 30, name = "sess_xcheck"))
    assert(streamed.subsetOf(batch),
      s"streaming emitted sessions absent from batch: ${streamed -- batch}")
    val open = batch -- streamed
    // anything batch-only must be its user's LAST session (still open)
    val lastStart = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    open.foreach { case (u, start, _, _) =>
      assert(start == lastStart(u),
        s"batch-only session for user $u is not the final open one")
    }
    // and sub-second boundary behavior agrees (gap arithmetic identical):
    // every batch session count per user matches streaming + open count
    assert(open.size <= lastStart.size)
  }
}
