package graft.streaming

import graft.time.TimeScope

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface: the streaming analog of the snapshot
  * enrichment (SURVEY.md §2.5 "Streaming" — batch-only in the reference;
  * this is the `events`-style extension).
  *
  * Reads the events table as a file stream, applies watermarking and
  * tumbling-window aggregation, optionally enriched with the OPL time-scope
  * columns. Driven synchronously in tests/conformance via the memory sink +
  * `processAllAvailable` (deterministic: one batch over a static dir).
  */
object EventStream {

  def readStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Derive the stream schema from the file footer (schema-only driver
    // read, no data scan) instead of hardcoding a layout — the testdata's
    // physical ts type has changed across regenerations (nanos-as-long,
    // then timestamp[us]/NTZ), and Tables.normalizeTs is the one place
    // that knows every layout.
    val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // file streams need a directory; the testdata table is a single file —
    // expose it through a temp dir of symlinks (read-only testdata).
    val dir = graft.TempDirs.scratchDir("graft_stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    graft.Tables.normalizeTs(
      spark.readStream.schema(rawSchema).parquet(dir.toString))
  }

  /** Tumbling-window count/sum per event type with a watermark for
    * late-data handling. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // decimal sum: exact + partition-order-independent (oracle parity)
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("v"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("v"))

  /** Stateful queries create one state store PER shuffle partition, and
    * each store pays checkpoint/commit overhead every micro-batch — so the
    * partition count should track state volume (keys held), not core
    * count. 8 covers the local conformance corpora with room to spare
    * (measured: 32 stores ~doubles wall-clock at sf0.1); a cluster-scale
    * deployment raises it to spread state across executors. The session
    * conf is set for the query's lifetime (pinned into its checkpoint at
    * start) and restored afterwards. */
  private def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Run the streaming aggregation synchronously over the static dir and
    * return the materialized result (memory sink, complete mode). */
  def runHourly(spark: SparkSession, sfDir: String, name: String = "stream_out",
      statePartitions: Int = 8): DataFrame = {
    withStatePartitions(spark, statePartitions) {
      val q = hourlyAgg(readStream(spark, sfDir))
        .writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    spark.table(name)
  }

  /** Stream the hourly aggregation INTO the warehouse: `foreachBatch`
    * lands each epoch's full recomputed state as a year-partitioned fact
    * (complete mode -> overwrite -> idempotent under micro-batch retries),
    * making continuous ingestion feed the same fact tables the OLAP API
    * serves. Returns the fact read back through the warehouse. */
  def streamIntoWarehouse(spark: SparkSession, sfDir: String,
      warehouse: graft.snapshot.Warehouse, fact: String,
      statePartitions: Int = 8): DataFrame = {
    withStatePartitions(spark, statePartitions) {
      val q = hourlyAgg(readStream(spark, sfDir))
        .writeStream.outputMode("complete")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          warehouse.overwrite(fact,
            batch.withColumn("year", year(col("hour")).cast("long")))
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    warehouse.read(fact).getOrElse(throw new IllegalStateException(
      s"stream produced no batches: fact $fact was never written"))
  }

  /** Continuous ingestion with INCREMENTAL view maintenance: each
    * micro-batch of raw events appends to the fact AND folds its partial
    * aggregates into the [[graft.snapshot.MaterializedAgg]] state —
    * O(batch) per epoch, so the served aggregate stays fresh without
    * ever rescanning the fact. The streaming composition of the x_mview
    * contract (appendWithAgg per delta == from-scratch aggregation).
    *
    * The corpus is split into three files and streamed with
    * `maxFilesPerTrigger = 1`, so the fold genuinely happens across
    * multiple deltas; the final aggregate is file-order-insensitive
    * (sum/count/min/max partials commute). Raw-row append mode: no
    * state store, no watermark — the IVM state IS the streaming state,
    * and it lives in the warehouse, surviving restarts. Same retry
    * caveat as appendWithAgg: exactly-once needs the caller's batch-id
    * guard on redelivery (foreachBatch epoch ids; see NovelIngest's
    * marker files for the pattern). */
  def runMviewIngest(spark: SparkSession, sfDir: String,
      warehouse: graft.snapshot.Warehouse, fact: String): DataFrame = {
    import graft.snapshot.MaterializedAgg
    val dir = graft.TempDirs.scratchDir("graft_mview_stream")
    val src = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("value"),
        year(col("ts")).cast("long").as("year"))
    src.repartition(3).write.mode("overwrite").parquet(dir.toString)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MaterializedAgg.appendWithAgg(warehouse, fact, batch,
          Seq("event_type"), "value")
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    MaterializedAgg.readAgg(warehouse, fact, Seq("event_type"))
  }

  /** Streaming distinct-user sketch: each micro-batch folds its HLL
    * register deltas into a warehouse-resident (year, month, bucket, m)
    * table by per-bucket MAX — the "monthly unique users" dashboard kept
    * fresh with O(batch) work and 2^p rows of state per month, no
    * per-key dedup state, no fact rescan. Registers merge associatively
    * and idempotently (MAX), so replayed batches are harmless and the
    * folded table is bit-identical to a one-shot sketch of everything
    * seen — the property the gate's whole-corpus oracle checks. Same
    * warehouse-resident-state design as [[runMviewIngest]]: restarts
    * need no streaming checkpoint because the state IS warehouse data. */
  def runHllIngest(spark: SparkSession, sfDir: String,
      warehouse: graft.snapshot.Warehouse, fact: String): DataFrame = {
    import graft.ext.Hll
    val dir = graft.TempDirs.scratchDir("graft_hll_stream")
    val src = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), year(col("ts")).cast("long").as("year"),
        month(col("ts")).cast("long").as("month"))
    src.repartition(3).write.mode("overwrite").parquet(dir.toString)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = Hll.registersByGroups(batch, Seq("year", "month"), "user_id")
        warehouse.read(fact) match {
          case None => warehouse.append(fact, delta)
          case Some(old) =>
            val years = delta.select(col("year").cast("long")).distinct()
              .collect().map(_.getLong(0)).toSeq
            val merged = old.filter(col("year").isin(years: _*))
              .unionByName(delta)
              .groupBy(col("year"), col("month"), col("bucket"))
              .agg(max(col("m")).as("m"))
            warehouse.merge(fact, merged,
              keys = Seq("year", "month", "bucket"), validateKeys = false)
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    Hll.estimateByGroups(warehouse.read(fact).get, Seq("year", "month"))
  }

  /** Streaming KMV distinct-sketch fold: each micro-batch's own k hash
    * minima fold into the warehouse by MIN-UNION (the k smallest of
    * stored ∪ batch), keyed by rank so the ≤k-row state replaces in
    * place. The fold is lossless AND idempotent — the min of a set
    * ignores replays, unlike the CMS SUM fold — so the folded sketch
    * equals a one-shot whole-corpus sketch and the gate shares
    * x_sketch_kmv's oracle verbatim. O(batch) hash scan per trigger
    * plus a k-row state read; set algebra (intersections, Jaccard)
    * stays available downstream via [[graft.ext.Kmv.overlap]]. */
  def runKmvIngest(spark: SparkSession, sfDir: String,
      warehouse: graft.snapshot.Warehouse, fact: String,
      k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dir = graft.TempDirs.scratchDir("graft_kmv_stream")
    val src = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"))
    src.repartition(3).write.mode("overwrite").parquet(dir.toString)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = graft.ext.Kmv.sketch(batch, "doc_id", k).select(col("h"))
        val pool = warehouse.read(fact) match {
          case None => delta
          case Some(old) => old.select(col("h")).unionByName(delta)
        }
        // constant year: the warehouse partitions facts by year, and a
        // corpus-global sketch has no time scope
        val topk = pool.distinct().orderBy(col("h")).limit(k)
          .select(row_number().over(Window.orderBy(col("h")))
            .cast("long").as("rank"), col("h"), lit(0L).as("year"))
        warehouse.read(fact) match {
          case None => warehouse.append(fact, topk)
          case Some(_) => warehouse.merge(fact, topk,
            keys = Seq("rank"), validateKeys = false)
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    warehouse.read(fact).get.select(col("rank"), col("h"))
      .orderBy(col("rank"))
  }

  /** Streaming frequency sketch: the Count-Min twin of [[runHllIngest]].
    * Each micro-batch's (row, pos, cnt) cell deltas fold into the
    * warehouse table by per-cell SUM — counters add associatively, so
    * the folded sketch equals a one-shot sketch of everything seen
    * (the gate's oracle property). O(batch) per trigger, depth*width
    * rows of state, restart-safe without checkpoints. NOT idempotent
    * under replay (sums double-count — the at-most-once caveat vs the
    * HLL fold's MAX); front an exactly-once source or the dedup stream. */
  def runCmsIngest(spark: SparkSession, sfDir: String,
      warehouse: graft.snapshot.Warehouse, fact: String,
      width: Int = 1024, depth: Int = 4): DataFrame = {
    import graft.ext.CountMin
    val dir = graft.TempDirs.scratchDir("graft_cms_stream")
    val src = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"), year(col("ts")).cast("long").as("year"))
    src.repartition(3).write.mode("overwrite").parquet(dir.toString)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = CountMin.sketch(batch, "event_type", width, depth)
          .withColumn("year", lit(0L))
        warehouse.read(fact) match {
          case None => warehouse.append(fact, delta)
          case Some(old) =>
            val merged = old.unionByName(delta)
              .groupBy(col("year"), col("row"), col("pos"))
              .agg(sum(col("cnt")).as("cnt"))
            warehouse.merge(fact, merged,
              keys = Seq("year", "row", "pos"), validateKeys = false)
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    warehouse.read(fact).get.select(col("row"), col("pos"), col("cnt"))
  }

  /** Streaming quantile-sketch ingestion — the p99-over-all-time query
    * from O(groups·bins) warehouse state: each micro-batch bins its
    * values ([[graft.ext.Profile.quantileBinCounts]] — fixed edges are
    * the mergeability contract) and the deltas SUM cell-wise into the
    * state table, exactly the [[runCmsIngest]] counter fold (same
    * at-most-once caveat: counters add, so a replayed batch double-
    * counts; idempotence needs the HLL-style MAX fold, which counters
    * don't admit). Serving a quantile reads groups·bins rows, never an
    * event. */
  def runQsketchIngest(spark: SparkSession, sfDir: String,
      warehouse: graft.snapshot.Warehouse, fact: String,
      lo: Double = 0.0, hi: Double = 500.0, bins: Int = 64): DataFrame = {
    val dir = graft.TempDirs.scratchDir("graft_qsk_stream")
    val src = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("value"))
    src.repartition(3).write.mode("overwrite").parquet(dir.toString)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = graft.ext.Profile.quantileBinCounts(
            batch, "event_type", "value", lo, hi, bins)
          .withColumn("year", lit(0L))
        warehouse.read(fact) match {
          case None => warehouse.append(fact, delta)
          case Some(old) =>
            val merged = old.unionByName(delta)
              .groupBy(col("year"), col("event_type"), col("bin"))
              .agg(sum(col("cnt")).as("cnt"))
            warehouse.merge(fact, merged,
              keys = Seq("year", "event_type", "bin"), validateKeys = false)
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    warehouse.read(fact).get.select(col("event_type"), col("bin"), col("cnt"))
  }

  /** Streaming EXACT moment statistics — unlike the HLL/CMS/quantile
    * folds this one is not approximate at all: per-group (n, Σx, Σx²)
    * are plain integer sums (cents; Σx² through the hi/lo split-word
    * sums of `Profile.correlation`, so the fold stays exact past 2^63),
    * and sums add across batches losslessly — the folded state serves
    * mean/stddev/z-scores over ALL TIME from one row per group, with no
    * event ever re-read. Same warehouse fold and at-most-once caveat as
    * [[runCmsIngest]]. */
  def runMomentsIngest(spark: SparkSession, sfDir: String,
      warehouse: graft.snapshot.Warehouse, fact: String): DataFrame = {
    val dir = graft.TempDirs.scratchDir("graft_mom_stream")
    val src = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("value"))
    src.repartition(3).write.mode("overwrite").parquet(dir.toString)
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val x = (col("value").cast(d2) * lit(100))
          .cast(org.apache.spark.sql.types.DecimalType(20, 0)).cast("long")
        val delta = batch.select(col("event_type"), x.as("__x"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("__x")).as("s"),
            sum(shiftright(col("__x") * col("__x"), 32)).as("sh"),
            sum((col("__x") * col("__x")).bitwiseAND(lit(4294967295L))).as("sl"))
          .withColumn("year", lit(0L))
        warehouse.read(fact) match {
          case None => warehouse.append(fact, delta)
          case Some(old) =>
            val merged = old.unionByName(delta)
              .groupBy(col("year"), col("event_type"))
              .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
                sum(col("sh")).as("sh"), sum(col("sl")).as("sl"))
            warehouse.merge(fact, merged,
              keys = Seq("year", "event_type"), validateKeys = false)
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    warehouse.read(fact).get
      .select(col("event_type"), col("n"), col("s"), col("sh"), col("sl"))
  }

  /** Streaming bitmap ingestion — the OR-fold member of the warehouse-
    * state family (HLL folds by MAX, counters by SUM, bitmaps by
    * `bit_or`) and the only one that is REPLAY-IDEMPOTENT: re-folding a
    * delivered batch sets bits that are already set, so at-least-once
    * delivery needs no dedup guard. State is exact membership ((segment,
    * word, bits) — |keyspace|/64 words per segment), serving exact
    * audience set ops over all time via [[graft.ext.Bitmap.setOps]]. */
  def runBitmapIngest(spark: SparkSession, sfDir: String,
      warehouse: graft.snapshot.Warehouse, fact: String): DataFrame = {
    val dir = graft.TempDirs.scratchDir("graft_bmp_stream")
    val src = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("user_id"))
    src.repartition(3).write.mode("overwrite").parquet(dir.toString)
    val q = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = graft.ext.Bitmap.build(batch, "event_type", "user_id")
          .withColumn("year", lit(0L))
        warehouse.read(fact) match {
          case None => warehouse.append(fact, delta)
          case Some(old) =>
            val merged = old.unionByName(delta)
              .groupBy(col("year"), col("segment"), col("word"))
              .agg(bit_or(col("bits")).as("bits"))
            warehouse.merge(fact, merged,
              keys = Seq("year", "segment", "word"), validateKeys = false)
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    warehouse.read(fact).get.select(col("segment"), col("word"), col("bits"))
  }

  /** Streaming exact dedup: first occurrence per key set wins, with state
    * BOUNDED by the watermark (`dropDuplicatesWithinWatermark` evicts keys
    * once the watermark passes them — the unbounded-state `dropDuplicates`
    * is the classic streaming-ingestion leak at 100 TB/day). The
    * exactly-once ingestion guard for at-least-once upstream transports:
    * any redelivery within the watermark delay is suppressed. */
  def dedupStream(events: DataFrame, keys: Seq[String],
      watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Drive the streaming dedup synchronously over the static events dir
    * and return the deduped rows (append mode — rows emit as they pass the
    * dedup state, no aggregation to hold them back). */
  def runDedup(spark: SparkSession, sfDir: String, keys: Seq[String],
      name: String = "dedup_out", statePartitions: Int = 8): DataFrame = {
    withStatePartitions(spark, statePartitions) {
      val q = dedupStream(readStream(spark, sfDir), keys)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    spark.table(name)
  }

  /** Watermarked stream-stream interval join — the attribution pattern:
    * each purchase joined to the SAME user's views in the preceding
    * `windowMinutes`. Both sides carry watermarks and the join condition
    * bounds the event-time range, so each side's buffered state is
    * evicted as soon as rows can no longer match (the unbounded-state
    * stream-stream join is the other classic leak next to dropDuplicates).
    * Inner join: matches emit as they form, no watermark wait. */
  def purchaseViewJoin(purchases: DataFrame, views: DataFrame,
      windowMinutes: Int = 30, watermarkDelay: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", watermarkDelay)
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermarkDelay)
    p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .select(col("user_id"), col("p_ts"), col("p_value"), col("v_ts"))
  }

  /** Drive the purchase/view attribution join synchronously over the
    * static events dir (two independent file-stream reads of the same
    * table playing the two streams). */
  def runPurchaseViewJoin(spark: SparkSession, sfDir: String,
      windowMinutes: Int = 30, name: String = "pv_join_out",
      statePartitions: Int = 8): DataFrame = {
    withStatePartitions(spark, statePartitions) {
      val purchases = readStream(spark, sfDir)
        .filter(col("event_type") === "purchase")
      val views = readStream(spark, sfDir)
        .filter(col("event_type") === "view")
      val q = purchaseViewJoin(purchases, views, windowMinutes)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    spark.table(name)
  }

  /** Stream-static enrichment: the event stream joined to a static
    * dimension table — no state at all (the static side is just read per
    * micro-batch, broadcast when small), the streaming analog of the
    * OLAP star join. */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey))

  /** Drive stream-static enrichment + windowed aggregation synchronously:
    * events enriched with a dimension attribute, then the same hourly
    * watermarked aggregation keyed by the enriched column. */
  def runEnriched(spark: SparkSession, sfDir: String, dim: DataFrame,
      eventKey: String, dimKey: String, groupCol: String,
      name: String = "enrich_out", statePartitions: Int = 8): DataFrame = {
    withStatePartitions(spark, statePartitions) {
      val enriched = enrich(readStream(spark, sfDir), dim, eventKey, dimKey)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col(groupCol))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("v"))
        .select(col("w.start").as("hour"), col(groupCol), col("n"), col("v"))
      val q = enriched.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    spark.table(name)
  }

  // ---------------- stateful processing (sessionization) ----------------

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Int)

  /** Custom state machine over a keyed stream: per-user sessions closed
    * after `gapMinutes` of inactivity (`flatMapGroupsWithState` with an
    * event-time timeout). The OPL reference has no streaming at all; this
    * is the `events`-extension state operator the north star asks for. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def fn(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs =>
            cur = Some(s.copy(last = t, n = s.n + 1))
          case Some(s) =>
            closed ::= Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      if (state.hasTimedOut) {
        val out = cur.map(s => Session(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.last), s.n))
        state.remove()
        return (closed.reverse ++ out).iterator
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      closed.reverse.iterator
    }

    events.select($"user_id", $"ts", $"event_type").as[Event]
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  /** Batch sessionization — the same session semantics via window
    * functions (lag -> gap flag -> running session index -> group), one
    * shuffle on user_id. Complete over static data (no open sessions);
    * the cross-check for the streaming state machine and the right tool
    * for backfills. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    // millisecond gap arithmetic — EXACTLY the streaming state machine's
    // Timestamp.getTime comparison, so the two paths agree on gaps that
    // land within a second of the boundary
    val gapMs = gapMinutes * 60000L
    events
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev")) > gapMs)
          .cast("long"))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("start"), max(col("ts")).as("end"),
        count(lit(1)).cast("int").as("n_events"))
      .select(col("user_id"), col("start"), col("end"), col("n_events"))
  }

  /** Drive sessionization synchronously over the static events dir. Only
    * sessions closed by a later event are emitted in a single batch (the
    * final open session per user times out only when the watermark
    * advances past it — i.e. with more data; deterministic either way). */
  def runSessions(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30, name: String = "sessions_out",
      statePartitions: Int = 8): DataFrame = {
    withStatePartitions(spark, statePartitions) {
      val q = sessionize(readStream(spark, sfDir), gapMinutes)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    spark.table(name)
  }
}
