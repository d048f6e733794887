package graft.ext

import graft.SparkTestBase

import java.sql.Timestamp

import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private lazy val events = Seq(
    // user 1: clean view -> click -> purchase
    (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
    // user 2: purchase BEFORE the click -> stops at click
    (2L, "view", ts(0)), (2L, "purchase", ts(5)), (2L, "click", ts(10)),
    // user 3: click before the first view -> stops at view
    (3L, "click", ts(0)), (3L, "view", ts(5)),
    // user 4: never views -> not in the funnel at all
    (4L, "click", ts(0)), (4L, "purchase", ts(5)),
    // user 5: two views; funnel anchors on the FIRST, click after it counts
    (5L, "view", ts(0)), (5L, "view", ts(30)), (5L, "click", ts(15)),
    (5L, "purchase", ts(16))
  ).toDF("user_id", "event_type", "ts")

  test("funnel: strict sequential conversion, first-touch anchoring") {
    val f = EventAnalytics.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
    val rows = f.orderBy("user_id")
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp])]
      .collect().toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 3L, 5L), "user 4 never viewed")
    val byUser = rows.map(r => r._1 -> r).toMap
    assert(byUser(1L) == ((1L, ts(0), Some(ts(10)), Some(ts(20)))))
    // user 2's purchase precedes the click -> t2 null
    assert(byUser(2L) == ((2L, ts(0), Some(ts(10)), None)))
    // user 3's click precedes the first view -> t1 null
    assert(byUser(3L) == ((3L, ts(5), None, None)))
    // user 5 anchors on the FIRST view
    assert(byUser(5L) == ((5L, ts(0), Some(ts(15)), Some(ts(16)))))
  }

  test("funnelCounts: one row per step with reach counts") {
    val c = EventAnalytics.funnelCounts(events, "user_id", "event_type",
      "ts", Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSeq
    assert(c == Seq((0L, "view", 4L), (1L, "click", 3L),
      (2L, "purchase", 2L)))
  }

  test("sessionPaths: trigrams never span sessions; ties break on orderCol") {
    val ev = Seq(
      // user 1, session 1: a b c d -> trigrams a>b>c, b>c>d
      (1L, 10L, "a", ts(0)), (1L, 11L, "b", ts(1)),
      (1L, 12L, "c", ts(2)), (1L, 13L, "d", ts(3)),
      // user 1, session 2 (gap > 30 min): c d e -> c>d>e only — no
      // trigram may bridge the gap
      (1L, 14L, "c", ts(60)), (1L, 15L, "d", ts(61)), (1L, 16L, "e", ts(62)),
      // user 2: tied timestamps — event_id order decides: a b c
      (2L, 20L, "a", ts(0)), (2L, 21L, "b", ts(0)), (2L, 22L, "c", ts(0))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = EventAnalytics.sessionPaths(ev, "user_id", "event_type",
      "ts", "event_id", gapMinutes = 30, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got.toSet == Set(("a>b>c", 2L), ("b>c>d", 1L), ("c>d>e", 1L)))
    // ranking: count desc then path asc
    assert(got.head == (("a>b>c", 2L)))
  }

  test("retention: first-touch cohorts, distinct actives per period") {
    val ev = Seq(
      (1L, ts(0)), (1L, ts(1)),            // day 0 twice -> 1 distinct
      (1L, ts(60 * 24)),                   // day 1
      (2L, ts(60 * 24)), (2L, ts(60 * 48)) // cohort day 1, active day 1+2
    ).toDF("user_id", "ts")
    val r = EventAnalytics.retention(ev, "user_id", "ts",
        c => date_trunc("day", c).cast("date"))
      .orderBy("cohort", "period")
      .select(datediff(col("period"), col("cohort")).as("age"),
        col("users"))
      .as[(Int, Long)].collect().toSeq
    assert(r == Seq((0, 1L), (1, 1L), (0, 1L), (1, 1L)))
  }

  test("cooccurrence: unordered pairs, duplicate rows collapse, support cut") {
    val baskets = Seq(
      (1L, "x"), (1L, "y"), (1L, "y"), // dup (1,y) must not double-count
      (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "x"), (3L, "z")).toDF("b", "item")
    val all = EventAnalytics.cooccurrence(baskets, "b", "item")
      .orderBy("item_a", "item_b")
      .as[(String, String, Long)].collect().toSeq
    assert(all == Seq(("x", "y", 2L), ("x", "z", 2L), ("y", "z", 1L)))
    val cut = EventAnalytics.cooccurrence(baskets, "b", "item", minSupport = 2)
      .as[(String, String, Long)].collect().toSet
    assert(cut == Set(("x", "y", 2L), ("x", "z", 2L)))
  }

  test("cooccurrence basket cap drops pathological baskets whole") {
    val baskets = (Seq((1L, "a"), (1L, "b")) ++
      ('a' to 'j').map(c => (9L, c.toString))).toDF("b", "item")
    val capped = EventAnalytics.cooccurrence(baskets, "b", "item",
      maxItemsPerBasket = Some(5))
      .as[(String, String, Long)].collect().toSeq
    // basket 9 (10 items -> 45 pairs) is gone entirely; basket 1 remains
    assert(capped == Seq(("a", "b", 1L)))
  }

  test("trending: smoothed ratio ranks rising over big-but-flat, new items finite") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val split = "2024-01-16 00:00:00"
    val rows =
      (1 to 1).map(_ => ("rising", ts(5))) ++ (1 to 9).map(i => ("rising", ts(20))) ++
      (1 to 5).map(_ => ("flat", ts(5))) ++ (1 to 5).map(_ => ("flat", ts(20))) ++
      (1 to 9).map(_ => ("falling", ts(5))) ++ (1 to 1).map(_ => ("falling", ts(20))) ++
      (1 to 3).map(_ => ("new", ts(20)))
    val got = EventAnalytics.trending(rows.toDF("item", "ts"), "ts", "item",
      split, k = 4).as[(String, Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq("rising", "new", "flat", "falling"))
    assert(got(0)._4 == 10.0 / 2.0 && got(1)._4 == 4.0 / 1.0)
    assert(got(3)._4 == 2.0 / 10.0)
    // k truncates after the deterministic (score, item) order
    val top2 = EventAnalytics.trending(rows.toDF("item", "ts"), "ts", "item",
      split, k = 2).as[(String, Long, Long, Double)].collect()
    assert(top2.map(_._1).toSeq == Seq("rising", "new"))
  }

  test("timeToConvert: first-from to first-to-after, pre-signup purchases ignored") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: signup 10:00, purchases 09:00 (before! ignored) and 12:00
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 09:00:00"), "purchase"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: two signups (first counts), purchase 30 min after
      (2L, ts("2024-01-01 08:00:00"), "signup"),
      (2L, ts("2024-01-01 11:00:00"), "signup"),
      (2L, ts("2024-01-01 08:30:00"), "purchase"),
      // user 3: signup, never purchases -> excluded
      (3L, ts("2024-01-01 00:00:00"), "signup")
    ).toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.timeToConvert(ev, "user_id", "ts",
      "event_type", "signup", "purchase").head()
    assert(r.getLong(0) == 2L)
    // latencies: 2h and 30min in micros -> median interpolates the two
    val us = Seq(2L * 3600, 30L * 60).map(_ * 1000000L).sorted
    assert(r.getDouble(1) == (us(0) + us(1)) / 2.0)
  }
}
