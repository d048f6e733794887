package graft.snapshot

import graft.{SparkTestBase, TempDirs}

import org.apache.spark.sql.functions._

class MaterializedAggSpec extends SparkTestBase {
  import spark.implicits._

  private def freshWh = new Warehouse(spark,
    TempDirs.scratchDir("mview_spec").toString)

  private def batch(rows: (Long, String, Double)*) =
    rows.toDF("year", "grp", "value")

  test("incremental folds equal the from-scratch aggregation") {
    val wh = freshWh
    val b1 = batch((2023L, "a", 10.50), (2023L, "b", 1.25), (2024L, "a", 3.00))
    val b2 = batch((2023L, "a", 2.50), (2024L, "b", 7.75), (2024L, "a", 0.25))
    val b3 = batch((2025L, "a", 100.00))
    Seq(b1, b2, b3).foreach(b =>
      MaterializedAgg.appendWithAgg(wh, "f", b, Seq("grp"), "value"))
    val got = MaterializedAgg.readAgg(wh, "f", Seq("grp"))
      .orderBy("grp").as[(String, Double, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      ("a", 116.25, 5L, 0.25, 100.00, 116.25 / 5),
      ("b", 9.00, 2L, 1.25, 7.75, 9.00 / 2)))
    // and it matches a direct aggregation over the fact itself
    val direct = wh.read("f").get.groupBy("grp")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy("grp").as[(String, Double, Long)].collect().toSeq
    assert(direct == got.map(r => (r._1, r._2, r._3)))
  }

  test("maintenance is partition-scoped: untouched year files never rewrite") {
    val wh = freshWh
    val root = TempDirs.scratchDir("mview_scope")
    val wh2 = new Warehouse(spark, root.toString)
    MaterializedAgg.appendWithAgg(wh2, "f",
      batch((2023L, "a", 1.00), (2024L, "a", 2.00)), Seq("grp"), "value")
    val aggDir = new java.io.File(root.toFile,
      MaterializedAgg.aggTable("f") + "/year=2023")
    def files = aggDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified)).toSet
    val before = files
    // second batch touches only 2024 -> 2023's agg partition must not move
    MaterializedAgg.appendWithAgg(wh2, "f",
      batch((2024L, "b", 5.00)), Seq("grp"), "value")
    assert(files == before, "2023 agg partition rewrote on a 2024-only delta")
    val got = MaterializedAgg.readAgg(wh2, "f", Seq("grp"))
      .orderBy("grp").as[(String, Double, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq(("a", 3.00, 2L), ("b", 5.00, 1L)))
  }

  test("rebuild repairs a stale agg to the incremental result") {
    val wh = freshWh
    MaterializedAgg.appendWithAgg(wh, "f",
      batch((2023L, "a", 1.00), (2023L, "b", 2.00)), Seq("grp"), "value")
    // simulate a crash between fact append and agg merge: append the
    // fact directly, leaving the agg stale by one batch
    wh.append("f", batch((2024L, "a", 10.00)))
    val stale = MaterializedAgg.readAgg(wh, "f", Seq("grp"))
      .agg(sum("n")).as[Long].collect().head
    assert(stale == 2L)
    MaterializedAgg.rebuild(wh, "f", Seq("grp"), "value")
    val got = MaterializedAgg.readAgg(wh, "f", Seq("grp"))
      .orderBy("grp").as[(String, Double, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq(("a", 11.00, 2L), ("b", 2.00, 1L)))
  }
}
