package graft.streaming

import graft.SparkTestBase
import graft.ext.Drift
import graft.snapshot.Warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

class DriftMonitorSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = graft.TempDirs.scratchDir(p).toString

  test("batch leg matches wordPsiByPeriod exactly; replay appends once") {
    val ref = Seq.fill(15)("alpha beta gamma delta").toDF("text")
    val b0 = Seq.fill(8)(("alpha beta gamma delta", 2020L))
      .toDF("text", "year")
    val b1 = Seq.fill(8)(("zeta eta theta iota", 2021L))
      .toDF("text", "year")
    val refDir = tmp("dm_ref")
    DriftMonitor.saveReference(ref, "text", refDir)
    val wh = new Warehouse(spark, tmp("dm_wh"))
    DriftMonitor.ingestBatch(b0, "text", refDir, wh, "f", 0L)
    DriftMonitor.ingestBatch(b1, "text", refDir, wh, "f", 1L)
    val got = wh.read("f").get
      .select("batch", "year", "n_tokens", "vocab_union", "psi_pico")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // the batch operator over the same periods must agree row for row
    val cur = b0.withColumn("period", lit(0L))
      .unionByName(b1.withColumn("period", lit(1L)))
    val want = Drift.wordPsiByPeriod(ref, cur, "text", "period")
      .select("period", "n_tokens", "vocab_union", "psi_pico")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._3, r._4, r._5)) == want)
    assert(got.map(_._2) == Seq(2020L, 2021L))
    // in-distribution batch far under the disjoint one
    assert(got(0)._5 < got(1)._5)
    // crash replay: the batch id anti-joins out — fact stays 2 rows
    DriftMonitor.ingestBatch(b1, "text", refDir, wh, "f", 1L,
      dedupFact = true)
    assert(wh.read("f").get.count() == 2L)
  }

  test("run(): one micro-batch, marker lifecycle, series row lands") {
    val ref = Seq.fill(10)("alpha beta gamma").toDF("text")
    val refDir = tmp("dm_ref2")
    DriftMonitor.saveReference(ref, "text", refDir)
    val wh = new Warehouse(spark, tmp("dm_wh2"))
    val src = tmp("dm_src")
    val ck = tmp("dm_ck")
    Seq(("alpha beta new", 2022L)).toDF("text", "year")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema)
      .parquet(src)
    val q = DriftMonitor.run(stream, "text", refDir, wh, "f", ck)
    q.processAllAvailable(); q.stop()
    val rows = wh.read("f").get
      .select("batch", "year", "psi_pico")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.length == 1 && rows.head._1 == 0L && rows.head._2 == 2022L)
    val fs = new Path(ck).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(ck, "_graft_markers/_batch_0")))
    assert(!fs.exists(new Path(ck, "_graft_markers/_intent_0")))
  }
}
