package graft.streaming

import graft.SparkTestBase
import graft.snapshot.Warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-13 index-layout features of the shared [[ScrubEngine]]:
  * per-partition `_keybloom.json` sidecars + file-level probe-read
  * pruning, and the crash-safe compaction/retention fold. Soundness
  * bar: verdicts with pruning/compaction are IDENTICAL to the plain
  * full-read protocol — the features only change which files are
  * opened and how many directories exist. */
class ScrubIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = graft.TempDirs.scratchDir(p).toString

  // disjoint 16-word runs per class: tiles of class k never collide
  // with class j's (exact 64-bit unit hashes — sidecar skipping is
  // sharp for the tile family)
  private def run16(cls: Int) =
    (1 to 16).map(i => s"c${cls}w$i").mkString(" ")

  test("sidecar pruning: a batch whose tiles live in ONE old partition " +
      "opens only that partition; verdicts exact; dirs without a " +
      "sidecar are always read") {
    val wh = new Warehouse(spark, tmp("si_wh1"))
    val idx = tmp("si_idx1")
    // 6 batches of disjoint tile classes
    for (b <- 0 to 5) {
      val df = Seq((b.toLong, run16(b), 2020L)).toDF("doc_id", "text", "year")
      TileScrub.ingestBatch(df, "doc_id", "text", wh, "f", idx, b.toLong)
    }
    // batch 6 repeats class 2 only -> exactly one partition can match
    val b6 = Seq((100L, run16(2), 2021L)).toDF("doc_id", "text", "year")
    TileScrub.ingestBatch(b6, "doc_id", "text", wh, "f", idx, 6L)
    assert(ScrubEngine.lastPartsTotal == 6,
      s"expected 6 prior partitions, saw ${ScrubEngine.lastPartsTotal}")
    assert(ScrubEngine.lastPartsRead <= 2, // bloom fp tolerance
      s"pruning opened ${ScrubEngine.lastPartsRead} of 6 partitions")
    val v = wh.read("f").get.filter(col("doc_id") === 100L)
      .select("dup_tiles").as[Long].head()
    assert(v == 2L) // both tiles of class 2 strip — verdict exact
    // batch 7 is all-new -> ZERO partitions should match
    val b7 = Seq((101L, run16(9), 2021L)).toDF("doc_id", "text", "year")
    TileScrub.ingestBatch(b7, "doc_id", "text", wh, "f", idx, 7L)
    assert(ScrubEngine.lastPartsRead == 0,
      s"all-novel batch opened ${ScrubEngine.lastPartsRead} partitions")
    assert(wh.read("f").get.filter(col("doc_id") === 101L)
      .select("dup_tiles").as[Long].head() == 0L)
    // strip one sidecar: that partition must be unconditionally read
    // (legacy layout — absence cannot be proven), verdicts unchanged
    val fs = new Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$idx/tiles/batch=3/_keybloom.json"), false)
    val b8 = Seq((102L, run16(3), 2021L)).toDF("doc_id", "text", "year")
    TileScrub.ingestBatch(b8, "doc_id", "text", wh, "f", idx, 8L)
    assert(ScrubEngine.lastPartsRead >= 1) // at least the sidecar-less one
    assert(wh.read("f").get.filter(col("doc_id") === 102L)
      .select("dup_tiles").as[Long].head() == 2L)
  }

  test("compaction folds partitions into batch=-1; later verdicts and " +
      "post-horizon replays identical; interrupted swap recovers") {
    val wh = new Warehouse(spark, tmp("si_wh2"))
    val idx = tmp("si_idx2")
    for (b <- 0 to 4) {
      val df = Seq((b.toLong, run16(b), 2020L)).toDF("doc_id", "text", "year")
      TileScrub.ingestBatch(df, "doc_id", "text", wh, "f", idx, b.toLong)
    }
    // batch 5 overlaps class 1; land it BEFORE compaction
    val b5 = Seq((50L, run16(1) + " x1 x2 x3", 2021L))
      .toDF("doc_id", "text", "year")
    TileScrub.ingestBatch(b5, "doc_id", "text", wh, "f", idx, 5L)
    val fs = new Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def partNames() = fs.listStatus(new Path(s"$idx/tiles"))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(partNames() == (0 to 5).map(b => s"batch=$b"))
    // compact the no-longer-replayable horizon (batches <= 3)
    val folded = TileScrub.compactIndex(spark, idx, 3L)
    assert(folded == 4)
    assert(partNames() == Seq("batch=-1", "batch=4", "batch=5"))
    // total refs preserved: 2 tiles per class batch (batches 0-4) +
    // batch 5's 2 repeats (its 3-word tail forms no 8-word tile)
    val refs = spark.read.option("basePath", s"$idx/tiles")
      .parquet(s"$idx/tiles").agg(sum(col("n_refs"))).as[Long].head()
    assert(refs == 12)
    // post-horizon batch 5 REPLAY (crash path): its own partition is
    // still excluded, the folded rows are count-identical -> verdict
    // identical (dup_tiles = 2, single fact copy)
    TileScrub.ingestBatch(b5, "doc_id", "text", wh, "f", idx, 5L,
      dedupFact = true)
    val got = wh.read("f").get.filter(col("doc_id") === 50L)
      .select("dup_tiles").as[Long].collect().toSeq
    assert(got == Seq(2L))
    // new batch against the folded index: class 0 tiles still strip
    val b6 = Seq((60L, run16(0), 2021L)).toDF("doc_id", "text", "year")
    TileScrub.ingestBatch(b6, "doc_id", "text", wh, "f", idx, 6L)
    assert(wh.read("f").get.filter(col("doc_id") === 60L)
      .select("dup_tiles").as[Long].head() == 2L)
    // interrupted swap: stage a fake tmp WITHOUT the _MERGED manifest
    // (crash before stage completion) -> discarded, sources intact
    val tmpDir = new Path(s"$idx/tiles/.compact_tmp")
    fs.mkdirs(new Path(tmpDir, "data"))
    val n0 = partNames().length
    assert(TileScrub.compactIndex(spark, idx, 3L) == 0) // nothing <= 3 left but recovery ran
    assert(!fs.exists(tmpDir))
    assert(partNames().length == n0)
  }

  test("fp-family compaction (image ingest): novel/drop verdicts " +
      "unchanged across the fold") {
    import graft.ext.GrayPngEncode
    val wh = new Warehouse(spark, tmp("si_wh3"))
    val idx = tmp("si_idx3")
    def img(seed: Long) = GrayPngEncode(lit(seed), lit(16L), lit(16L),
      lit(11L), lit(5L), lit(0L))
    // batches 0..2 ingest seeds 0..2
    for (b <- 0L to 2L) {
      val df = spark.range(1).select(lit(b * 10).as("media_id"),
        img(b).as("content"), lit(2020L).as("year"))
      ImageIngest.ingestBatch(df, "media_id", "content", wh, "novel",
        idx, b)
    }
    assert(ImageIngest.compactIndex(spark, idx, 1L) == 2)
    // a re-upload of seed 0 (compacted away into batch=-1) still drops
    val dup = spark.range(1).select(lit(99L).as("media_id"),
      img(0L).as("content"), lit(2021L).as("year"))
    ImageIngest.ingestBatch(dup, "media_id", "content", wh, "novel",
      idx, 3L)
    // a novel seed still keeps
    val nov = spark.range(1).select(lit(98L).as("media_id"),
      img(7L).as("content"), lit(2021L).as("year"))
    ImageIngest.ingestBatch(nov, "media_id", "content", wh, "novel",
      idx, 4L)
    val kept = wh.read("novel").get.select("media_id").as[Long]
      .collect().sorted.toSeq
    assert(kept == Seq(0L, 10L, 20L, 98L), s"kept $kept")
  }
}
