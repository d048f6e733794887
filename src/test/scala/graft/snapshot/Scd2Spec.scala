package graft.snapshot

import graft.SparkTestBase

import java.sql.Date

import org.apache.spark.sql.DataFrame

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private def obs(rows: (Long, String, String)*): DataFrame =
    rows.map { case (k, p, ts) => (k, p, d(ts)) }.toDF("k", "prio", "ts")

  private def fold(batches: Seq[DataFrame]): Seq[(Long, String, Date, Option[Date])] =
    batches.tail.foldLeft(
      Scd2.init(batches.head, Seq("k"), Seq("prio"), "ts")) { (cur, b) =>
      Scd2.merge(cur, b, Seq("k"), Seq("prio"), "ts")
    }.orderBy("k", "valid_from")
      .as[(Long, String, Date, Option[Date])].collect().toSeq

  test("incremental folds equal one-shot chains; repeats collapse") {
    val all = obs(
      (1L, "hi", "2024-01-01"), (1L, "hi", "2024-01-05"), // repeat collapses
      (1L, "lo", "2024-02-01"),                           // change
      (1L, "lo", "2024-03-01"), (1L, "hi", "2024-04-01"), // back to hi
      (2L, "mid", "2024-01-15"))                          // single regime
    val oneShot = fold(Seq(all))
    assert(oneShot == Seq(
      (1L, "hi", d("2024-01-01"), Some(d("2024-02-01"))),
      (1L, "lo", d("2024-02-01"), Some(d("2024-04-01"))),
      (1L, "hi", d("2024-04-01"), None),
      (2L, "mid", d("2024-01-15"), None)))
    // same stream in three date-ordered batches
    val folded = fold(Seq(
      obs((1L, "hi", "2024-01-01"), (2L, "mid", "2024-01-15")),
      obs((1L, "hi", "2024-01-05"), (1L, "lo", "2024-02-01")),
      obs((1L, "lo", "2024-03-01"), (1L, "hi", "2024-04-01"))))
    assert(folded == oneShot)
  }

  test("merge is key-scoped: untouched keys pass through verbatim") {
    val dim = Scd2.init(obs(
      (1L, "a", "2024-01-01"), (2L, "b", "2024-01-01")),
      Seq("k"), Seq("prio"), "ts")
    val merged = Scd2.merge(dim, obs((1L, "c", "2024-02-01")),
      Seq("k"), Seq("prio"), "ts")
      .orderBy("k", "valid_from")
      .as[(Long, String, Date, Option[Date])].collect().toSeq
    assert(merged == Seq(
      (1L, "a", d("2024-01-01"), Some(d("2024-02-01"))),
      (1L, "c", d("2024-02-01"), None),
      (2L, "b", d("2024-01-01"), None)))
  }

  test("a batch observing the current attrs opens no new version") {
    val dim = Scd2.init(obs((1L, "a", "2024-01-01")),
      Seq("k"), Seq("prio"), "ts")
    val merged = Scd2.merge(dim, obs((1L, "a", "2024-06-01")),
      Seq("k"), Seq("prio"), "ts")
      .as[(Long, String, Date, Option[Date])].collect().toSeq
    assert(merged == Seq((1L, "a", d("2024-01-01"), None)))
  }
}
