package graft.streaming

import graft.SparkTestBase
import graft.ext.Multimodal
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ImageIngest rides the same [[ScrubEngine]] protocol TileScrubSpec
  * exercises exhaustively; here the focus is the image family's own
  * semantics: near-dup (not just exact) collisions drop across batches,
  * min-id dominates within a batch, undecodable rows always pass. */
class ImageIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = graft.TempDirs.scratchDir(p).toString

  /** Real PNGs: seed classes are far apart (cross-class aHash Hamming
    * ~32), bump plants NEAR-duplicates within a class (Hamming ≤ 4). */
  private def media(rows: Seq[(Long, Long, Long)]): DataFrame =
    Multimodal.syntheticGrayPngCorpus(
        rows.toDF("doc_id", "seed", "bump"), "doc_id",
        col("seed"), lit(16), lit(16), col("bump"))
      .join(rows.toDF("media_id", "s", "b").select(col("media_id"),
        lit(2020L).as("year")), "media_id")

  test("near-dup collisions drop across batches; novel classes keep") {
    val wh = new Warehouse(spark, tmp("ii_wh1"))
    val idx = tmp("ii_idx1")
    // batch 0: class 3 (bump 0) and class 7
    ImageIngest.ingestBatch(media(Seq((1L, 3L, 0L), (2L, 7L, 0L))),
      "media_id", "content", wh, "f", idx, 0L)
    // batch 1: 10 is class 3 with a BUMP (near-dup, not byte-identical),
    // 11 is a novel class, 12 is undecodable
    val b1 = media(Seq((10L, 3L, 2L), (11L, 9L, 0L)))
      .unionByName(Seq((12L, "not a png".getBytes, 2020L))
        .toDF("media_id", "content", "year"))
    ImageIngest.ingestBatch(b1, "media_id", "content", wh, "f", idx, 1L)
    val got = wh.read("f").get.select("media_id", "img_fp")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 11L, 12L))
    assert(got(3)._2.isEmpty) // undecodable rides along with NULL fp
    // the near-dup really was near, not exact: different content bytes
    val cs = media(Seq((1L, 3L, 0L), (10L, 3L, 2L)))
      .select(sha2(col("content"), 256)).as[String].collect()
    assert(cs(0) != cs(1))
  }

  test("orientation-normalized door: a camera-rotated JPEG re-upload " +
      "of an ingested image drops; the rotation really scrambles the " +
      "raw hash (normalization is load-bearing)") {
    import graft.ext.{BlockJpegEncode, OrientedJpegEncode}
    val wh = new Warehouse(spark, tmp("ii_wh4"))
    val idx = tmp("ii_idx4")
    // batch 0: an upright block JPEG (no EXIF)
    val b0 = spark.range(1).select(lit(1L).as("media_id"),
      BlockJpegEncode(lit(5L), lit(6L), lit(4L)).as("content"),
      lit(2020L).as("year"))
    ImageIngest.ingestBatch(b0, "media_id", "content", wh, "f", idx, 0L)
    // batch 1: the SAME picture stored camera-rotated (EXIF orientation
    // 6, pixels inverse-rotated) + a novel class as control
    val b1 = spark.range(1).select(lit(10L).as("media_id"),
      OrientedJpegEncode(lit(5L), lit(6L), lit(4L), lit(6L)).as("content"),
      lit(2021L).as("year"))
      .unionByName(spark.range(1).select(lit(11L).as("media_id"),
        BlockJpegEncode(lit(9L), lit(6L), lit(4L)).as("content"),
        lit(2021L).as("year")))
    ImageIngest.ingestBatch(b1, "media_id", "content", wh, "f", idx, 1L)
    val kept = wh.read("f").get.select("media_id").as[Long]
      .collect().sorted.toSeq
    assert(kept == Seq(1L, 11L), s"rotated re-upload survived: $kept")
    // control: WITHOUT normalization the two hashes are far apart —
    // the drop above is the EXIF un-rotation working, not luck
    val raw = b0.unionByName(b1.filter(col("media_id") === 10L))
      .select(graft.ext.ImageGrayStats(col("content")).as("s"))
      .select(shiftleft(col("s.ahash_hi"), 32)
        .bitwiseOR(col("s.ahash_lo")).as("fp")).as[Long].collect()
    val rawHamming = java.lang.Long.bitCount(raw(0) ^ raw(1))
    assert(rawHamming > ImageIngest.MaxHamming,
      s"raw (unnormalized) Hamming only $rawHamming")
  }

  test("min id dominates within a batch; replay appends nothing") {
    val wh = new Warehouse(spark, tmp("ii_wh2"))
    val idx = tmp("ii_idx2")
    val b0 = media(Seq((9L, 5L, 0L), (4L, 5L, 1L), (7L, 8L, 0L)))
    ImageIngest.ingestBatch(b0, "media_id", "content", wh, "f", idx, 0L)
    assert(wh.read("f").get.select("media_id").as[Long].collect().toSet ==
      Set(4L, 7L)) // 9 dominated by 4 (same class, near-dup, 4 < 9)
    val n1 = wh.read("f").get.count()
    ImageIngest.ingestBatch(b0, "media_id", "content", wh, "f", idx, 0L,
      dedupFact = true)
    assert(wh.read("f").get.count() == n1)
  }

  test("mixed containers share the fingerprint space: a GIF re-encode " +
      "of an ingested PNG is dropped as its near-duplicate") {
    val wh = new Warehouse(spark, tmp("ii_wh_mix"))
    val idx = tmp("ii_idx_mix")
    // batch 0: a PNG of class 5
    ImageIngest.ingestBatch(media(Seq((1L, 5L, 0L))), "media_id",
      "content", wh, "f", idx, 0L)
    // batch 1: the SAME picture as a GIF (identical pixel contract,
    // bump 1 — a near-dup, not byte-identical), plus a novel-class GIF
    val gifs = Multimodal.syntheticGrayGifCorpus(
        Seq((20L, 5L, 1L), (21L, 12L, 0L)).toDF("doc_id", "s", "b"),
        "doc_id", col("s"), lit(16), lit(16), col("b"))
      .withColumn("year", lit(2020L))
    ImageIngest.ingestBatch(gifs, "media_id", "content", wh, "f", idx, 1L)
    assert(wh.read("f").get.select("media_id").as[Long].collect().toSet ==
      Set(1L, 21L)) // 20 dropped against the PNG's fingerprint
    // batch 2: the same picture AGAIN as an uncompressed BMP — the
    // fourth container, same fingerprint space, dropped too
    val bmps = Multimodal.syntheticGrayBmpCorpus(
        Seq((30L, 5L, 2L), (31L, 19L, 0L)).toDF("doc_id", "s", "b"),
        "doc_id", col("s"), lit(16), lit(16), col("b"))
      .withColumn("year", lit(2020L))
    ImageIngest.ingestBatch(bmps, "media_id", "content", wh, "f", idx, 2L)
    assert(wh.read("f").get.select("media_id").as[Long].collect().toSet ==
      Set(1L, 21L, 31L)) // 30 dropped against the PNG's fingerprint
    // batch 3 (round 14): the same picture as a LOSSLESS WEBP — the
    // modern crawl re-upload rides the same sniffed door and drops;
    // the VP8L decode (with its subtract-green inverse) is what lands
    // it on the shared fingerprint
    val webps = Multimodal.syntheticGrayWebpCorpus(
        Seq((40L, 5L, 3L), (41L, 26L, 0L)).toDF("doc_id", "s", "b"),
        "doc_id", col("s"), lit(16), lit(16), col("b"))
      .withColumn("year", lit(2020L))
    ImageIngest.ingestBatch(webps, "media_id", "content", wh, "f", idx, 3L)
    assert(wh.read("f").get.select("media_id").as[Long].collect().toSet ==
      Set(1L, 21L, 31L, 41L)) // 40 dropped against the PNG's fingerprint
  }

  test("probe plan: stored band keys are joined, never re-derived — no " +
      "explode above the index scan") {
    val idx = tmp("ii_idx_plan")
    ImageIngest.seedIndex(media(Seq((1L, 2L, 0L), (2L, 7L, 0L))),
      "media_id", "content", idx)
    val index = spark.read.parquet(s"$idx/imgfps/batch=-1")
    // stored schema carries the persisted keys
    assert(Set("img_fp", "n_refs", "t", "v")
      .subsetOf(index.columns.toSet))
    val out = ImageIngest.novelAgainst(media(Seq((10L, 2L, 1L))),
      "media_id", "content", index)
    val plan = out.queryExecution.optimizedPlan
    val gens = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty) // the batch side still derives its keys
    // every explode subtree is batch-side only: no parquet (index) leaf
    gens.foreach { g =>
      val leaves = g.collectLeaves().map(_.getClass.getSimpleName)
      assert(!leaves.exists(_.contains("LogicalRelation")),
        s"index scan under a Generate: ${g.treeString.take(400)}")
    }
    // and the result is still right: 10 collides with seeded class 2
    assert(out.filter(col("media_id") === 10L).count() == 0)
  }

  test("run(): a seeded corpus index blocks a streamed near-duplicate") {
    val wh = new Warehouse(spark, tmp("ii_wh3"))
    val idx = tmp("ii_idx3")
    val ck = tmp("ii_ck3")
    val src = tmp("ii_src3")
    ImageIngest.seedIndex(media(Seq((1L, 2L, 0L))), "media_id", "content",
      idx)
    // stream one batch: 20 collides with the seeded class 2, 21 is novel
    media(Seq((20L, 2L, 3L), (21L, 6L, 0L)))
      .write.mode("overwrite").parquet(src)
    val q = ImageIngest.run(
      spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src),
      "media_id", "content", wh, "f", idx, ck)
    q.processAllAvailable(); q.stop()
    assert(wh.read("f").get.select("media_id").as[Long].collect().toSet ==
      Set(21L))
  }
}
