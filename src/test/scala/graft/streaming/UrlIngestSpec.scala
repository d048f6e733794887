package graft.streaming

import graft.SparkTestBase
import graft.snapshot.Warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** UrlIngest rides the same [[ScrubEngine]] protocol TileScrubSpec
  * exercises exhaustively; here the focus is the URL family's own
  * semantics: first sighting keeps, min-id within a batch, canonical
  * equivalence across tracker noise, null-URL immunity. */
class UrlIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = graft.TempDirs.scratchDir(p).toString

  test("first sighting keeps; canonical duplicates across batches drop") {
    val wh = new Warehouse(spark, tmp("ui_wh1"))
    val idx = tmp("ui_idx1")
    val b0 = Seq(
      (1L, "https://a.com/x?utm_source=f", 2020L),
      (2L, "https://b.com/y", 2020L)).toDF("doc_id", "url", "year")
    // 3 is a's canonical twin (tracker + fragment noise), 4 is novel,
    // 5 is unparseable and must survive
    val b1 = Seq(
      (3L, "HTTPS://A.COM/x#frag", 2020L),
      (4L, "https://c.com/z", 2020L),
      (5L, "garbage", 2020L)).toDF("doc_id", "url", "year")
    UrlIngest.ingestBatch(b0, "doc_id", "url", wh, "f", idx, 0L)
    UrlIngest.ingestBatch(b1, "doc_id", "url", wh, "f", idx, 1L)
    val got = wh.read("f").get.select("doc_id", "canon_url")
      .as[(Long, Option[String])].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 4L, 5L))
    assert(got(0)._2.contains("https://a.com/x"))
    assert(got(3)._2.isEmpty) // null canon rides along
  }

  test("min id wins within a batch; index partition counts are per batch") {
    val wh = new Warehouse(spark, tmp("ui_wh2"))
    val idx = tmp("ui_idx2")
    val b0 = Seq(
      (7L, "https://a.com/x", 2020L),
      (3L, "https://a.com/x?utm_campaign=c", 2020L),
      (9L, "https://b.com/y", 2020L)).toDF("doc_id", "url", "year")
    UrlIngest.ingestBatch(b0, "doc_id", "url", wh, "f", idx, 0L)
    val kept = wh.read("f").get.select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(3L, 9L))
    val parts = spark.read.option("basePath", s"$idx/urls")
      .parquet(s"$idx/urls")
    assert(parts.filter(col("batch") === 0L)
      .agg(sum(col("n_refs"))).collect()(0).getLong(0) == 3L)
  }

  test("replay of a landed batch with dedupFact appends nothing") {
    val wh = new Warehouse(spark, tmp("ui_wh3"))
    val idx = tmp("ui_idx3")
    val b0 = Seq((1L, "https://a.com/x", 2020L))
      .toDF("doc_id", "url", "year")
    UrlIngest.ingestBatch(b0, "doc_id", "url", wh, "f", idx, 0L)
    val n1 = wh.read("f").get.count()
    // crash replay: the index partition for batch 0 already exists; the
    // read excludes it, verdicts recompute identically, and the fact
    // anti-join swallows the duplicate append
    UrlIngest.ingestBatch(b0, "doc_id", "url", wh, "f", idx, 0L,
      dedupFact = true)
    assert(wh.read("f").get.count() == n1)
  }

  test("run(): a seeded corpus index blocks a streamed duplicate URL") {
    val wh = new Warehouse(spark, tmp("ui_wh4"))
    val idx = tmp("ui_idx4")
    val ck = tmp("ui_ck4")
    val src = tmp("ui_src4")
    UrlIngest.seedIndex(Seq((100L, "https://seen.com/p"))
      .toDF("doc_id", "url"), "doc_id", "url", idx)
    Seq((1L, "https://seen.com/p?utm_source=x", 2020L),
      (2L, "https://new.com/q", 2020L))
      .toDF("doc_id", "url", "year")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema)
      .parquet(src)
    val q = UrlIngest.run(stream, "doc_id", "url", wh, "f", idx, ck)
    q.processAllAvailable(); q.stop()
    val got = wh.read("f").get.select("doc_id", "canon_url")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "https://new.com/q")))
    val fs = new Path(ck).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(ck, "_graft_markers/_batch_0")))
  }
}
