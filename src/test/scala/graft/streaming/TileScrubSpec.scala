package graft.streaming

import graft.SparkTestBase
import graft.snapshot.Warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

class TileScrubSpec extends SparkTestBase {
  import spark.implicits._

  // 16 words = exactly 2 tiles, no tail
  private val run16 = (1 to 16).map(i => s"w$i").mkString(" ")
  private def tmp(p: String) = graft.TempDirs.scratchDir(p).toString

  test("streaming order: first sighting stays clean, later batches strip") {
    val wh = new Warehouse(spark, tmp("ts_wh1"))
    val idx = tmp("ts_idx1")
    val b0 = Seq((1L, run16, 2020L)).toDF("doc_id", "text", "year")
    // batch 1 re-uses batch 0's run plus its own 3-word tail
    val b1 = Seq((2L, run16 + " t1 t2 t3", 2021L)).toDF("doc_id", "text", "year")
    TileScrub.ingestBatch(b0, "doc_id", "text", wh, "f", idx, 0L)
    TileScrub.ingestBatch(b1, "doc_id", "text", wh, "f", idx, 1L)
    val got = wh.read("f").get
      .select("doc_id", "n_tiles", "dup_tiles", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, 2L, 0L, run16)))      // first sighting clean
    assert(got(1) == ((2L, 2L, 2L, "t1 t2 t3"))) // both tiles strip
  }

  test("replay after the index leg landed: verdicts and counts stay exact") {
    val wh = new Warehouse(spark, tmp("ts_wh2"))
    val idx = tmp("ts_idx2")
    val b0 = Seq((1L, run16, 2020L)).toDF("doc_id", "text", "year")
    TileScrub.ingestBatch(b0, "doc_id", "text", wh, "f", idx, 0L)
    // crash window: fact + index landed, marker never written -> the
    // stream replays the batch with the fact-dedup path on
    TileScrub.ingestBatch(b0, "doc_id", "text", wh, "f", idx, 0L,
      dedupFact = true)
    val fact = wh.read("f").get.select("doc_id", "dup_tiles")
      .as[(Long, Long)].collect().toSeq
    // single copy, and the replay did NOT double-count its own tiles
    // (the index read excludes the batch's own partition)
    assert(fact == Seq((1L, 0L)))
    val refs = spark.read.option("basePath", s"$idx/tiles")
      .parquet(s"$idx/tiles").agg(sum(col("n_refs"))).as[Long].head()
    assert(refs == 2L) // 2 tiles, once each — not 4
    // a later batch sees the corpus exactly once
    val b1 = Seq((2L, run16, 2021L)).toDF("doc_id", "text", "year")
    TileScrub.ingestBatch(b1, "doc_id", "text", wh, "f", idx, 1L)
    val d2 = wh.read("f").get.filter(col("doc_id") === 2L)
      .select("dup_tiles").as[Long].head()
    assert(d2 == 2L)
  }

  test("replay of the fact-only crash window: fact single-copy, index backfilled") {
    val wh = new Warehouse(spark, tmp("ts_wh3"))
    val idx = tmp("ts_idx3")
    val b0 = Seq((1L, run16, 2020L)).toDF("doc_id", "text", "year")
    TileScrub.ingestBatch(b0, "doc_id", "text", wh, "f", idx, 0L)
    // simulate the crash BETWEEN fact append and index write: remove the
    // batch's index partition, then replay with the intent-flagged path
    val part = new Path(s"$idx/tiles/batch=0")
    part.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(part, true)
    TileScrub.ingestBatch(b0, "doc_id", "text", wh, "f", idx, 0L,
      dedupFact = true)
    assert(wh.read("f").get.count() == 1L)
    val refs = spark.read.option("basePath", s"$idx/tiles")
      .parquet(s"$idx/tiles").agg(sum(col("n_refs"))).as[Long].head()
    assert(refs == 2L)
  }

  test("run(): markers live under the checkpoint; seeded index strips a stream doc") {
    val wh = new Warehouse(spark, tmp("ts_wh4"))
    val idx = tmp("ts_idx4")
    val ck = tmp("ts_ck4")
    val src = tmp("ts_src4")
    TileScrub.seedIndex(Seq((100L, run16)).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    Seq((1L, run16 + " tail1 tail2", 2020L)).toDF("doc_id", "text", "year")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema)
      .parquet(src)
    val q = TileScrub.run(stream, "doc_id", "text", wh, "f", idx, ck)
    q.processAllAvailable(); q.stop()
    val got = wh.read("f").get
      .select("doc_id", "dup_tiles", "clean_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, "tail1 tail2"))) // seeded tiles strip
    val fs = new Path(ck).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(ck, "_graft_markers/_batch_0")))
    assert(!fs.exists(new Path(ck, "_graft_markers/_intent_0")))
  }
}
