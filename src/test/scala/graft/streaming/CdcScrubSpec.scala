package graft.streaming

import graft.SparkTestBase
import graft.ext.FormulaBlobEncode
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CdcScrub rides the shared [[ScrubEngine]] protocol; the focus here
  * is the chunk-level semantics: a re-upload with a junk PREFIX still
  * scores ~fully duplicated (content-defined boundaries re-align — the
  * property fixed tiles lack), novel payloads score 0, and the
  * incremental score equals batch-count + indexed-count semantics. */
class CdcScrubSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = graft.TempDirs.scratchDir(p).toString

  private def blobs(rows: Seq[(Long, Long, Int)]): DataFrame =
    rows.toDF("media_id", "seed", "n")
      .select(col("media_id"),
        FormulaBlobEncode(col("seed"), col("n")).as("content"))
      .withColumn("year", lit(2023L))

  test("a shifted re-upload scores near-1 duplication; novel payloads " +
      "score 0; within-batch copies see each other") {
    val wh = new Warehouse(spark, tmp("cs_wh1"))
    val idx = tmp("cs_idx1")
    // batch 0: two copies of payload 5 (see each other), one payload 9
    CdcScrub.ingestBatch(blobs(Seq((1L, 5L, 2000), (2L, 5L, 2000),
      (3L, 9L, 2000))), "media_id", "content", wh, "f", idx, 0L)
    // batch 1: 10 = payload 5 with an 11-byte junk prefix (re-upload),
    // 11 = novel payload
    val shifted = blobs(Seq((10L, 5L, 2000)))
      .select(col("media_id"),
        concat(FormulaBlobEncode(lit(77L), lit(11)), col("content"))
          .as("content"), col("year"))
    CdcScrub.ingestBatch(shifted.unionByName(blobs(Seq((11L, 14L, 2000)))),
      "media_id", "content", wh, "f", idx, 1L)
    val got = wh.read("f").get
      .select("media_id", "n_chunks", "dup_chunks", "dup_ratio_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    val m = got.map(r => r._1 -> r).toMap
    assert(m(1)._3 == m(1)._2 && m(2)._3 == m(2)._2) // full dups of each other
    assert(m(3)._3 == 0L && m(11)._3 == 0L)          // novel
    // the shifted re-upload: everything but the prefix-straddling head
    // chunk dedups — ratio must be high but below 1
    assert(m(10)._4 > 600000L && m(10)._4 < 1000000L,
      s"shifted ratio ${m(10)._4}")
    assert(got.map(_._1) == List(1L, 2L, 3L, 10L, 11L))
  }

  test("replay appends nothing; seeded corpus counts as prior content") {
    val wh = new Warehouse(spark, tmp("cs_wh2"))
    val idx = tmp("cs_idx2")
    CdcScrub.seedIndex(blobs(Seq((1L, 4L, 1500))), "media_id", "content",
      idx)
    val b0 = blobs(Seq((20L, 4L, 1500), (21L, 6L, 1500)))
    CdcScrub.ingestBatch(b0, "media_id", "content", wh, "f", idx, 0L)
    val got = wh.read("f").get
      .select("media_id", "dup_ratio_micro").as[(Long, Long)]
      .collect().toMap
    assert(got(20L) == 1000000L && got(21L) == 0L)
    val n1 = wh.read("f").get.count()
    CdcScrub.ingestBatch(b0, "media_id", "content", wh, "f", idx, 0L,
      dedupFact = true)
    assert(wh.read("f").get.count() == n1)
  }

  test("run(): streaming leg scores against the growing index") {
    val wh = new Warehouse(spark, tmp("cs_wh3"))
    val idx = tmp("cs_idx3")
    val ck = tmp("cs_ck3")
    val src = tmp("cs_src3")
    CdcScrub.seedIndex(blobs(Seq((1L, 8L, 1500))), "media_id", "content",
      idx)
    blobs(Seq((30L, 8L, 1500), (31L, 2L, 1500)))
      .write.mode("overwrite").parquet(src)
    val q = CdcScrub.run(
      spark.readStream.schema(spark.read.parquet(src).schema).parquet(src),
      "media_id", "content", wh, "f", idx, ck)
    q.processAllAvailable(); q.stop()
    val got = wh.read("f").get
      .select("media_id", "dup_ratio_micro").as[(Long, Long)]
      .collect().toMap
    assert(got(30L) == 1000000L && got(31L) == 0L)
  }
}
