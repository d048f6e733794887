package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class ExpectSpec extends SparkTestBase {
  import Expect._
  import spark.implicits._

  private lazy val dim = Seq(1L, 2L, 3L).toDF("id")

  test("each rule counts its own violations; clean data reports zeros") {
    val df = Seq(
      (1L, Some("a"), "F", 10.0, Some(1L)),
      (2L, None, "F", 20.0, Some(2L)),      // null prio
      (3L, Some("b"), "X", -4.0, Some(9L)), // bad status, range, dangling ref
      (3L, Some("c"), "O", 30.0, None),     // dup key; null ref is NOT a violation
      (4L, Some("d"), "P", 40.0, Some(3L))
    ).toDF("k", "prio", "status", "price", "fk")
    val got = Expect.report(df, Seq(
      NotNull("prio"), Accepted("status", Seq("F", "O", "P")),
      InRange("price", 0.0, 100.0), Unique(Seq("k")), Ref("fk", dim, "id")))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (0L, "not_null:prio", 1L), (1L, "accepted:status", 1L),
      (2L, "in_range:price", 1L), (3L, "unique:k", 2L),
      (4L, "ref:fk", 1L)))
    val clean = Expect.report(df.filter(col("k") === 1),
      Seq(NotNull("prio"), Unique(Seq("k")), Ref("fk", dim, "id")))
      .as[(Long, String, Long)].collect().toSeq
    assert(clean.forall(_._3 == 0L))
  }

  test("all scalar rules fuse into one corpus scan") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val p = Expect.report(docs, Seq(
      NotNull("text"), NotNull("lang"),
      Accepted("lang", Seq("en", "es", "de", "fr", "zh")),
      InRange("n_chars", 0.0, 1e9)))
      .queryExecution.executedPlan.toString()
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected one fused scan, got $scans:\n" + p.take(600))
  }
}
