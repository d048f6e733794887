package graft.ext

import graft.SparkTestBase

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("latest-at-or-before semantics, equal-time visibility, no-match nulls") {
    val events = Seq((1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 15L, "e3"),
      (1L, 25L, "e4"), (2L, 10L, "e5"))
      .toDF("user_id", "ts", "eid")
    val snaps = Seq((1L, 10L, "a"), (1L, 20L, "b"))
      .toDF("user_id", "snap_ts", "v")
    val got = AsofJoin.leftAsof(events, snaps, Seq("user_id"),
      "ts", "snap_ts", Seq("v"))
      .select("eid", "v").as[(String, Option[String])].collect().toMap
    assert(got == Map(
      "e1" -> None,      // before any snapshot
      "e2" -> Some("a"), // snapshot AT event time is visible
      "e3" -> Some("a"),
      "e4" -> Some("b"), // later snapshot supersedes
      "e5" -> None))     // key with no snapshots at all
  }

  test("left columns and row count preserved exactly") {
    val events = Seq((1L, 5L), (1L, 6L), (3L, 7L)).toDF("user_id", "ts")
    val snaps = Seq((1L, 1L, 9.5)).toDF("user_id", "snap_ts", "v")
    val out = AsofJoin.leftAsof(events, snaps, Seq("user_id"),
      "ts", "snap_ts", Seq("v"))
    assert(out.columns.toSeq == Seq("user_id", "ts", "v"))
    assert(out.count() == 3)
  }
}
