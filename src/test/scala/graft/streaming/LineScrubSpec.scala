package graft.streaming

import graft.SparkTestBase
import graft.snapshot.Warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** LineScrub rides the same [[ScrubEngine]] protocol TileScrubSpec
  * exercises exhaustively (replay windows, marker lifecycle); here the
  * focus is the line family's own semantics through the engine. */
class LineScrubSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = graft.TempDirs.scratchDir(p).toString

  test("streaming order: first sighting publishes clean, later docs strip") {
    val wh = new Warehouse(spark, tmp("ls_wh1"))
    val idx = tmp("ls_idx1")
    val b0 = Seq((1L, "banner\nalpha one", 2020L))
      .toDF("doc_id", "text", "year")
    val b1 = Seq((2L, "banner\nbeta two", 2021L),
      (3L, "fresh\ngamma three", 2021L)).toDF("doc_id", "text", "year")
    LineScrub.ingestBatch(b0, "doc_id", "text", wh, "f", idx, 0L)
    LineScrub.ingestBatch(b1, "doc_id", "text", wh, "f", idx, 1L)
    val got = wh.read("f").get
      .select("doc_id", "n_lines", "dup_lines", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, 2L, 0L, "banner\nalpha one"))) // first sighting
    assert(got(1) == ((2L, 2L, 1L, "beta two")))          // banner strips
    assert(got(2) == ((3L, 2L, 0L, "fresh\ngamma three")))
  }

  test("replay after the index leg landed: distinct-doc counts stay exact") {
    val wh = new Warehouse(spark, tmp("ls_wh2"))
    val idx = tmp("ls_idx2")
    val b0 = Seq((1L, "banner\nalpha", 2020L)).toDF("doc_id", "text", "year")
    LineScrub.ingestBatch(b0, "doc_id", "text", wh, "f", idx, 0L)
    LineScrub.ingestBatch(b0, "doc_id", "text", wh, "f", idx, 0L,
      dedupFact = true)
    assert(wh.read("f").get.count() == 1L)
    val nd = spark.read.option("basePath", s"$idx/lines")
      .parquet(s"$idx/lines").agg(sum(col("n_docs"))).as[Long].head()
    assert(nd == 2L) // 2 lines x 1 doc — the replay did not double-count
    val b1 = Seq((2L, "banner\nother", 2021L)).toDF("doc_id", "text", "year")
    LineScrub.ingestBatch(b1, "doc_id", "text", wh, "f", idx, 1L)
    val d2 = wh.read("f").get.filter(col("doc_id") === 2L)
      .select("dup_lines").as[Long].head()
    assert(d2 == 1L)
  }

  test("run(): seeded corpus index strips a streamed doc's boilerplate") {
    val wh = new Warehouse(spark, tmp("ls_wh3"))
    val idx = tmp("ls_idx3")
    val ck = tmp("ls_ck3")
    val src = tmp("ls_src3")
    LineScrub.seedIndex(Seq((100L, "legal footer\nsome page"))
      .toDF("doc_id", "text"), "doc_id", "text", idx)
    Seq((1L, "legal footer\nnew content", 2020L))
      .toDF("doc_id", "text", "year")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema)
      .parquet(src)
    val q = LineScrub.run(stream, "doc_id", "text", wh, "f", idx, ck)
    q.processAllAvailable(); q.stop()
    val got = wh.read("f").get
      .select("doc_id", "dup_lines", "clean_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 1L, "new content")))
    val fs = new Path(ck).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(ck, "_graft_markers/_batch_0")))
  }
}
