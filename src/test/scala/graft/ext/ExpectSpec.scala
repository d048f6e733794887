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

  test("vector checks: each planted defect flags its own rule, independently") {
    val rows = Seq(
      (1L, Some(Seq(0.6, 0.8))),                          // clean, norm 1
      (2L, None),                                         // null
      (3L, Some(Seq(1.0))),                               // wrong dim
      (4L, Some(Seq(Double.NaN, 1.0))),                   // NaN
      (5L, Some(Seq(Double.PositiveInfinity, 1.0))),      // +Inf
      (6L, Some(Seq(0.0, 0.0))),                          // zero (and norm-low)
      (7L, Some(Seq(300.0, 400.0))))                      // norm 500 > hi
    val df = rows.toDF("id", "v")
    val a = Expect.annotateVectorChecks(df, "v", dim = 2,
      normLo = 0.5, normHi = 100.0).orderBy("id").collect()
    def flags(r: org.apache.spark.sql.Row) = (
      r.getAs[Boolean]("null_vec"), r.getAs[Boolean]("wrong_dim"),
      r.getAs[Boolean]("non_finite"), r.getAs[Boolean]("zero_vec"),
      r.getAs[Boolean]("norm_out"), r.getAs[Boolean]("vec_ok"))
    assert(flags(a(0)) == (false, false, false, false, false, true))
    assert(flags(a(1)) == (true, false, false, false, false, false))
    assert(flags(a(2)) == (false, true, false, false, false, false))
    assert(flags(a(3)) == (false, false, true, false, false, false))
    assert(flags(a(4)) == (false, false, true, false, false, false))
    // the zero vector flags BOTH zero_vec and norm_out (independence)
    assert(flags(a(5)) == (false, false, false, true, true, false))
    assert(flags(a(6)) == (false, false, false, false, true, false))
    val kept = Expect.dropInvalidVectors(df, "v", 2, 0.5, 100.0)
      .select("id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
    val rep = Expect.vectorReport(df, "v", 2, 0.5, 100.0)
      .as[(Long, String, Long)].collect().toSeq
    assert(rep == Seq((0L, "vector:null_vec", 1L),
      (1L, "vector:wrong_dim", 1L), (2L, "vector:non_finite", 2L),
      (3L, "vector:zero_vec", 1L), (4L, "vector:norm_out", 2L)))
  }

  test("vectorReport on an empty batch reads 0 violations, not NULL") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v").filter($"id" < 0)
    val rep = Expect.vectorReport(df, "v", 2, 0.5, 100.0)
      .as[(Long, String, Long)].collect().toSeq
    assert(rep.length == 5 && rep.forall(_._3 == 0L))
  }

  test("vector checks: norm guard skips defective vectors, empty array") {
    // a NaN vector of the RIGHT dim must not also count norm_out (its
    // norm is garbage), and an empty array is wrong_dim but never zero_vec
    val df = Seq((1L, Seq(Double.NaN, 1.0)), (2L, Seq.empty[Double]))
      .toDF("id", "v")
    val a = Expect.annotateVectorChecks(df, "v", 2, 0.5, 100.0)
      .orderBy("id").collect()
    assert(!a(0).getAs[Boolean]("norm_out"))
    assert(a(1).getAs[Boolean]("wrong_dim") &&
      !a(1).getAs[Boolean]("zero_vec"))
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
