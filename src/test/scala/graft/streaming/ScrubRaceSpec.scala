package graft.streaming

import graft.SparkTestBase
import graft.snapshot.Warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-14 concurrency contract of the scrub index: a maintenance
  * `compactIndex` racing a live ingest trigger must never change a
  * verdict. Two layers under test — the per-family writer lease
  * (compact and ingest serialize) and the rename-in-first swap (any
  * reader outside the lease still sees every key's rows). The r13
  * delete-first swap had a window where a concurrent probe saw neither
  * the sources nor `batch=-1` and judged duplicates novel — this spec
  * reproduces exactly that interleaving pressure and asserts verdict
  * identity with the sequential run. Raced in a loop (single runs have
  * hidden 1-in-N flakes). */
class ScrubRaceSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = graft.TempDirs.scratchDir(p).toString

  private def run16(cls: Int) =
    (1 to 16).map(i => s"c${cls}w$i").mkString(" ")

  test("compactIndex racing ingest triggers: every dup verdict " +
      "identical to the sequential run (3 race rounds)") {
    for (round <- 0 until 3) {
      val wh = new Warehouse(spark, tmp(s"race_wh$round"))
      val idx = tmp(s"race_idx$round")
      // seed history: batches 0..5, disjoint tile classes 0..5
      for (b <- 0 to 5) {
        val df = Seq((b.toLong, run16(b), 2020L))
          .toDF("doc_id", "text", "year")
        TileScrub.ingestBatch(df, "doc_id", "text", wh, "f", idx, b.toLong)
      }
      // race phase: one thread compacts ever-larger horizons while the
      // main thread ingests batches that each REPEAT a seeded class —
      // expected verdict dup_tiles = 2 for every one of them, which a
      // mid-swap empty-index read would turn into 0 (false-novel)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val compactErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable](null)
      val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
      val compactor = new Thread(() => {
        try {
          var horizon = 1L
          while (!stop.get()) {
            TileScrub.compactIndex(spark, idx, horizon)
            compactions.incrementAndGet()
            horizon = math.min(horizon + 1, 5L)
          }
        } catch { case t: Throwable => compactErr.set(t) }
      }, s"race-compactor-$round")
      compactor.start()
      try {
        for (b <- 6 to 9) {
          val df = Seq((100L + b, run16(b - 6), 2021L))
            .toDF("doc_id", "text", "year")
          TileScrub.ingestBatch(df, "doc_id", "text", wh, "f", idx,
            b.toLong)
        }
      } finally {
        stop.set(true)
        compactor.join(120000)
      }
      assert(compactErr.get() == null,
        s"compactor thread failed: ${compactErr.get()}")
      assert(compactions.get() >= 1, "compactor never ran — no race")
      val verdicts = wh.read("f").get
        .filter(col("doc_id") >= 100L)
        .select("doc_id", "dup_tiles").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
      assert(verdicts == (6 to 9).map(b => (100L + b, 2L)),
        s"round $round: raced verdicts diverged: $verdicts")
    }
  }

  test("compactIndex waits for a held family lease instead of swapping " +
      "under it") {
    val wh = new Warehouse(spark, tmp("race_wh_lease"))
    val idx = tmp("race_idx_lease")
    for (b <- 0 to 3) {
      val df = Seq((b.toLong, run16(b), 2020L)).toDF("doc_id", "text", "year")
      TileScrub.ingestBatch(df, "doc_id", "text", wh, "f", idx, b.toLong)
    }
    // hold the family lease the way a live trigger does
    val leaseWh = new Warehouse(spark, idx)
    val token = leaseWh.acquireWriterLease("tiles", "spec-holder")
    val releasedAt = new java.util.concurrent.atomic.AtomicLong(0L)
    val foldedAt = new java.util.concurrent.atomic.AtomicLong(0L)
    val folded = new java.util.concurrent.atomic.AtomicInteger(-1)
    val t = new Thread(() => {
      folded.set(TileScrub.compactIndex(spark, idx, 2L))
      foldedAt.set(System.nanoTime())
    }, "lease-blocked-compactor")
    t.start()
    Thread.sleep(1500) // compactor must be parked on the lease
    assert(folded.get() == -1, "compaction ran under a held lease")
    releasedAt.set(System.nanoTime())
    leaseWh.releaseWriterLease("tiles", token)
    t.join(120000)
    assert(folded.get() == 3, s"expected 3 folded, got ${folded.get()}")
    assert(foldedAt.get() > releasedAt.get(),
      "compaction completed before the lease was released")
    // index still serves correct verdicts afterwards
    val b4 = Seq((40L, run16(1), 2021L)).toDF("doc_id", "text", "year")
    TileScrub.ingestBatch(b4, "doc_id", "text", wh, "f", idx, 4L)
    assert(wh.read("f").get.filter(col("doc_id") === 40L)
      .select("dup_tiles").as[Long].head() == 2L)
  }
}
