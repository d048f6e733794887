package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("chiSquare: independent columns score ~0, dependent score high") {
    // perfectly independent 2x2: every cell = 25
    val ind = (for { x <- Seq("a", "b"); y <- Seq("u", "v");
      _ <- 1 to 25 } yield (x, y)).toDF("x", "y")
    val ri = Stats.chiSquare(ind, "x", "y").head()
    assert(math.abs(ri.getDouble(0)) < 1e-6)            // chi2
    assert(ri.getLong(1) == 1L && ri.getLong(2) == 100L) // dof, n
    // perfectly dependent: x determines y -> chi2 = n, V = 1
    val dep = (for { x <- Seq("a", "b"); _ <- 1 to 30 }
      yield (x, if (x == "a") "u" else "v")).toDF("x", "y")
    val rd = Stats.chiSquare(dep, "x", "y").head()
    assert(math.abs(rd.getDouble(0) - 60.0) < 1e-6)
    assert(math.abs(rd.getDouble(3) - 1.0) < 1e-6)       // cramers_v
  }

  test("concentration: uniform vs single-unit monopolies") {
    val df = (
      (1 to 10).map(i => ("uniform", s"u$i")) ++           // 10 units x1
      (1 to 10).map(_ => ("mono", "only"))                 // 1 unit x10
    ).toDF("g", "u")
    val m = Stats.concentration(df, "g", "u").collect()
      .map(r => r.getString(0) -> r).toMap
    val uni = m("uniform")
    assert(uni.getLong(1) == 10L && uni.getLong(2) == 10L)
    assert(math.abs(uni.getDouble(3) - 0.1) < 1e-12)      // hhi = 1/10
    assert(math.abs(uni.getDouble(4) - 0.1) < 1e-12)      // top share
    val mono = m("mono")
    assert(mono.getLong(1) == 1L)
    assert(mono.getDouble(3) == 1.0 && mono.getDouble(4) == 1.0)
  }

  test("seasonalAnomaly flags the spiked day only") {
    // nine Mondays at 10 rows, one at 100 -> only the spike flags.
    // (>=6 same-weekday days required: sigma includes the day under
    // test, so a lone outlier's z is bounded by (n-1)/sqrt(n).)
    val days = (0 until 10).map(i =>
      java.time.LocalDate.parse("2024-01-01").plusWeeks(i).toString)
    val rows = days.zipWithIndex.flatMap { case (d, i) =>
      val n = if (i == 9) 100 else 10
      (1 to n).map(_ => Tuple1(java.sql.Timestamp.valueOf(s"$d 12:00:00")))
    }
    val out = Stats.seasonalAnomaly(rows.toDF("ts"), "ts")
      .orderBy(col("day")).collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(1) == 1L))                 // all ISO Monday
    assert(out.map(_.getBoolean(3)).toSeq ==
      (Seq.fill(9)(false) :+ true))
  }

  test("abTest: counts split by md5 parity; degenerate designs give NULL z") {
    val ev = (1 to 40).flatMap { u =>
      val purchases = if (u % 2 == 0) 5 else 1 // half convert at minCount=3
      (1 to purchases).map(_ => (s"user$u", "purchase")) :+ ((s"user$u", "view"))
    }.toDF("user_id", "event_type")
    val r = Stats.abTest(ev, "user_id", "event_type", "purchase",
      minCount = 3L).head()
    assert(r.getLong(0) + r.getLong(2) == 40L)             // all users split
    assert(r.getLong(1) + r.getLong(3) == 20L)             // half converted
    assert(!r.isNullAt(4) && math.abs(r.getDouble(4)) < 10.0)
    // every user converts -> pooled variance 0 -> NULL z, not an error
    val sat = Stats.abTest(ev, "user_id", "event_type", "purchase",
      minCount = 1L).head()
    assert(sat.isNullAt(4))
  }

  test("ksTest: hand-computed D, identical samples score 0, disjoint score 1") {
    import spark.implicits._
    // a = {1,2,3}, b = {2,3,4}: ECDFs differ by exactly 1/3 everywhere
    // they differ -> d_num = max |3*cum_a - 3*cum_b| = 3, D = 3/9
    val a = Seq(1.0, 2.0, 3.0).toDF("o_totalprice")
    val b = Seq(2.0, 3.0, 4.0).toDF("o_totalprice")
    val r = Stats.ksTest(a, b, "o_totalprice").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 3L)
    assert(math.abs(r.getDouble(3) - 1.0 / 3.0) < 1e-15)
    // identical distributions -> D = 0
    val same = Stats.ksTest(a, a, "o_totalprice").head()
    assert(same.getLong(2) == 0L && same.getDouble(3) == 0.0)
    // fully separated supports -> D = 1 (at the crossover every a is
    // counted, no b is)
    val lo = Seq(1.0, 2.0).toDF("o_totalprice")
    val hi = Seq(10.0, 20.0).toDF("o_totalprice")
    val sep = Stats.ksTest(lo, hi, "o_totalprice").head()
    assert(sep.getLong(2) == 4L && sep.getDouble(3) == 1.0)
  }

  test("ksTestBinned: matches exact D when bins separate the values; lower-bounds it when they don't") {
    import spark.implicits._
    // combined range [1,4], 6 bins of width 0.5: every distinct value
    // gets its own bin -> binned D == exact D = 1/3
    val a = Seq(1.0, 2.0, 3.0).toDF("o_totalprice")
    val b = Seq(2.0, 3.0, 4.0).toDF("o_totalprice")
    val fine = Stats.ksTestBinned(a, b, "o_totalprice", bins = 6).head()
    assert(fine.getLong(0) == 3L && fine.getLong(1) == 3L)
    assert(fine.getLong(2) == 3L)
    assert(math.abs(fine.getDouble(3) - 1.0 / 3.0) < 1e-15)
    // 2 bins merge {1,2} vs {2,3}... into shared buckets: the binned D
    // can only drop below the exact 1/3, never exceed it
    val coarse = Stats.ksTestBinned(a, b, "o_totalprice", bins = 2).head()
    assert(coarse.getDouble(3) <= 1.0 / 3.0 + 1e-15)
    // identical distributions -> 0 regardless of binning
    val same = Stats.ksTestBinned(a, a, "o_totalprice", bins = 4).head()
    assert(same.getLong(2) == 0L && same.getDouble(3) == 0.0)
    // constant column (hi == lo): everything lands in bin 0, D = 0
    val const = Stats.ksTestBinned(
      Seq(5.0, 5.0).toDF("o_totalprice"),
      Seq(5.0).toDF("o_totalprice"), "o_totalprice", bins = 8).head()
    assert(const.getLong(2) == 0L && const.getDouble(3) == 0.0)
    // disjoint supports split by the bin edge separate fully: range
    // [1,20], 2 bins -> edge at 10.5, lo-side all below, hi-side above
    val lo = Seq(1.0, 2.0).toDF("o_totalprice")
    val hi = Seq(15.0, 20.0).toDF("o_totalprice")
    val sep = Stats.ksTestBinned(lo, hi, "o_totalprice", bins = 2).head()
    assert(sep.getDouble(3) == 1.0)
  }

  test("paretoFront: exact 80% boundary, concentrated vs uniform") {
    import spark.implicits._
    // "conc": one unit holds exactly 80 of 100 -> the front is that unit
    // alone (the NEXT unit's cum_before is exactly 80%, excluded by <)
    val rows =
      Seq(("conc", 1L, 80.0), ("conc", 2L, 10.0), ("conc", 3L, 5.0),
        ("conc", 4L, 5.0)) ++
      (1L to 5L).map(u => ("unif", u, 20.0))
    val r = Stats.paretoFront(rows.toDF("g", "u", "v"), "g", "u", "v")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r("conc") == ((4L, 1L, 0.8)))
    // uniform: 4 of 5 equal units are needed before cum reaches 80%
    assert(r("unif") == ((5L, 4L, 0.8)))
  }

  test("mode: frequency wins, ties break to the smallest value") {
    import spark.implicits._
    val df = (Seq.fill(3)(("g", 7L)) ++ Seq.fill(5)(("g", 2L)) ++
      Seq.fill(4)(("h", 9L)) ++ Seq.fill(4)(("h", 1L))).toDF("grp", "v")
    val m = Stats.mode(df, "grp", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("g") == ((2L, 5L)))  // 5 beats 3
    assert(m("h") == ((1L, 4L)))  // 4-4 tie -> smaller value
  }

  test("changepoint finds the planted level shift; flat series ties to day one") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.parse("2024-01-01").plusDays(d).atTime(12, 0))
    // "shift": 5/day for 10 days then 50/day for 10 days -> split at the
    // 10th day (nl = 10); "flat": constant 7/day -> all t_stat 0, tie to
    // the earliest split
    val rows =
      (0 until 10).flatMap(d => (1 to 5).map(_ => ("shift", ts(d)))) ++
      (10 until 20).flatMap(d => (1 to 50).map(_ => ("shift", ts(d)))) ++
      (0 until 20).flatMap(d => (1 to 7).map(_ => ("flat", ts(d))))
    val got = Stats.changepoint(rows.toDF("event_type", "ts"), "ts", "event_type")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val epoch = java.time.LocalDate.parse("2024-01-01").toEpochDay
    assert(got("shift")._1 == epoch + 9) // last low day is the best split
    assert(got("shift")._3 == 10L && got("shift")._4 == 10L)
    // hand value: diff = 10*50 - 10*500 = -4500; t = 4500^2/(10*10)
    assert(got("shift")._2 == 4500L * 4500L / 100L)
    assert(got("flat")._1 == epoch && got("flat")._2 == 0L)
  }
}
