package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Profile / TimeSeries.resample / Diff — the batch data-quality and CDC
  * operators around the warehouse. */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("profile: nulls, exact cardinality, native-order min/max") {
    val df = Seq((1L, Some("b"), 2.5), (2L, None, 10.0), (2L, Some("a"), 2.5))
      .toDF("k", "s", "v")
    val p = Profile.columns(df, Seq("k", "s", "v")).orderBy("column")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(p == Seq(
      ("k", 3L, 0L, 2L, "1", "2"),
      ("s", 3L, 1L, 2L, "a", "b"),
      // numeric min/max (2.5 < 10.0), not lexicographic ("10.0" < "2.5")
      ("v", 3L, 0L, 2L, "2.5", "10.0")))
    // approx mode keeps the same shape
    val a = Profile.columns(df, Seq("k"), approxDistinct = true).collect()(0)
    assert(a.getLong(3) == 2L)
  }

  test("resample fills empty buckets with zeros") {
    val df = Seq(
      ("2024-01-01 10:05:00", 1.0), ("2024-01-01 10:55:00", 2.0),
      // hour 11 empty
      ("2024-01-01 12:30:00", 4.0))
      .toDF("ts_s", "value").select(to_timestamp($"ts_s").as("ts"), $"value")
    val r = TimeSeries.resample(df, "ts", "hour", "1 hour",
      Seq(count(lit(1)).as("n"), sum($"value").as("v")))
      .orderBy("bucket")
      .select(date_format($"bucket", "HH").as("h"), $"n", $"v")
      .as[(String, Long, Double)].collect().toSeq
    assert(r == Seq(("10", 2L, 3.0), ("11", 0L, 0.0), ("12", 1L, 4.0)))
  }

  test("winsorize clamps per-group tails and leaves the body untouched") {
    // group a: 1..100 -> p10/p90 cutoffs interpolate to 10.9 / 90.1
    val df = ((1 to 100).map(i => ("a", i.toDouble)) :+ ("b", 5.0))
      .toDF("g", "v")
    val w = Profile.winsorize(df, "g", "v", lo = 0.10, hi = 0.90)
    val va = w.filter(col("g") === "a").select("v").as[Double].collect()
    // IEEE interpolation: compare within ulps, not decimal literals
    assert(math.abs(va.min - 10.9) < 1e-9 && math.abs(va.max - 90.1) < 1e-9)
    assert(va.count(x => x > va.min && x < va.max) == 80, "body untouched")
    // singleton group: both quantiles equal the value -> unchanged
    val vb = w.filter(col("g") === "b").select("v").as[Double].collect()
    assert(vb.toSeq == Seq(5.0))
  }

  test("histogram: shared edges, right-closed last bin, constant column") {
    // values 0..10 over 5 bins of width 2: 10 lands IN bin 4, not bin 5
    val df = ((0 to 10).map(i => ("a", i.toDouble)) :+ ("b", 4.0))
      .toDF("g", "v")
    val h = Profile.histogram(df, "g", "v", bins = 5)
      .orderBy("g", "bin")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(h == Seq(
      ("a", 0L, 0.0, 2L), ("a", 1L, 2.0, 2L), ("a", 2L, 4.0, 2L),
      ("a", 3L, 6.0, 2L), ("a", 4L, 8.0, 3L), // 8, 9 AND the max 10
      // group b bins against the GLOBAL edges — 4.0 -> bin 2, not bin 0
      ("b", 2L, 4.0, 1L)))
    // constant column: every row in bin 0, no divide-by-zero NaN
    val c = Profile.histogram(Seq(("a", 7.0), ("a", 7.0)).toDF("g", "v"),
      "g", "v", bins = 4).collect()
    assert(c.map(r => (r.getLong(1), r.getLong(3))).toSeq == Seq((0L, 2L)))
  }

  test("ewmaTrailing halves each step back and truncates at depth") {
    val df = Seq(
      ("u", 1L, 8.0), ("u", 2L, 0.0), ("u", 3L, 0.0), ("u", 4L, 4.0))
      .toDF("k", "seq", "v")
    val got = TimeSeries.ewmaTrailing(df, "k", Seq(col("seq")), "v",
        depth = 2, scaleBits = 4)
      .orderBy("seq").select("ewma").as[Double].collect().toSeq
    // decay 1/2: [8, 8/2, 8/4, 4 + 0 + 0 (8 fell off the depth-2 tail)]
    assert(got == Seq(8.0, 4.0, 2.0, 4.0))
  }

  test("linearFit recovers a planted line exactly per group") {
    // group a: y = 2x + 3 exactly (2-decimal-safe values); group b flat
    val df = ((1 to 50).map(i => ("a", i.toLong, 2.0 * i + 3.0)) ++
      (1 to 20).map(i => ("b", i.toLong, 7.5)))
      .toDF("g", "x", "y")
    val f = Profile.linearFit(df, "g", "x", "y").orderBy("g")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(f.size == 2)
    val (_, na, sa, ia) = f(0)
    assert(na == 50L && math.abs(sa - 2.0) < 1e-12 && math.abs(ia - 3.0) < 1e-9)
    val (_, nb, sb, ib) = f(1)
    assert(nb == 20L && math.abs(sb) < 1e-12 && math.abs(ib - 7.5) < 1e-9)
  }

  test("boxplot: hand-checked quartiles, fences, and outlier counts") {
    // 1..100 plus two gross outliers at ±1000
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      Seq(("a", 1000.0), ("a", -1000.0))).toDF("g", "v")
    val r = Profile.boxplot(df, "g", "v").collect()(0)
    val (q1, med, q3) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(med > 49 && med < 53)
    val iqr = q3 - q1
    assert(r.getDouble(5) == q1 - 1.5 * iqr && r.getDouble(6) == q3 + 1.5 * iqr)
    assert(r.getLong(7) == 2L, s"exactly the two planted outliers, got ${r.getLong(7)}")
  }

  test("madOutliers: fences immune to the outlier itself; constant group clean") {
    // 1..9 around median 5 with MAD 2, plus a gross outlier the
    // median/MAD barely notice (a mean/stddev fence would be dragged
    // out past it — the robustness point)
    val df = ((1 to 9).map(i => ("a", i.toDouble)) :+ ("a", 1000.0)) ++
      (1 to 10).map(_ => ("c", 7.0))
    val r = Profile.madOutliers(df.toDF("g", "v"), "g", "v")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getLong(4))).toMap
    val (na, medA, madA, outA) = r("a")
    assert(na == 10L && medA == 5.5 && madA == 2.5,
      s"median/MAD shifted by the outlier: med=$medA mad=$madA")
    assert(outA == 1L, "exactly the planted outlier flagged")
    val (nc, medC, madC, outC) = r("c")
    assert(nc == 10L && medC == 7.0 && madC == 0.0 && outC == 0L,
      "constant group: MAD 0, nothing beyond the fence")
  }

  test("correlation: +1 on a line, sign flips with slope, ~0 when flat-ish") {
    val df = ((1 to 40).map(i => ("up", i.toLong, 3.0 * i + 1.0)) ++
      (1 to 40).map(i => ("down", i.toLong, 100.0 - 2.0 * i)) ++
      // alternating around a constant: near-zero correlation with x
      (1 to 40).map(i => ("flat", i.toLong, if (i % 2 == 0) 5.0 else 7.0)))
      .toDF("g", "x", "y")
    val r = Profile.correlation(df, "g", "x", "y")
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(math.abs(r("up") - 1.0) < 1e-12)
    assert(math.abs(r("down") + 1.0) < 1e-12)
    assert(math.abs(r("flat")) < 0.1)
  }

  test("rollingByTime: boundary-inclusive RANGE frame, per-key isolation") {
    val base = 1700000000000000L // epoch micros
    def ts(sec: Long) = new java.sql.Timestamp(base / 1000 + sec * 1000)
    val ev = Seq(
      (1L, ts(0), 10.0), (1L, ts(50), 20.0),
      (1L, ts(100), 30.0),   // window 100s: includes ts(0) EXACTLY at bound
      (1L, ts(101), 40.0),   // ts(0) now out, ts(50)/ts(100) in
      (2L, ts(100), 5.0)     // other key: own frame only
    ).toDF("k", "ts", "v")
    val got = TimeSeries.rollingByTime(ev, "k", "ts", "v",
        windowSeconds = 100)
      .select(col("k"), col("ts"), col("n_win"), col("sum_win"))
      .orderBy("k", "ts")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._3, r._4)) == Seq(
      (1L, 1L, 10.0), (1L, 2L, 30.0), (1L, 3L, 60.0), (1L, 3L, 90.0),
      (2L, 1L, 5.0)))
  }

  test("diff classifies added / removed / changed; unchanged drop out") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val after = Seq((1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val d = Diff.rows(before, after, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // null-safe compare: null == null is NOT a change
    val b2 = Seq((1L, Option.empty[String])).toDF("k", "s")
    val a2 = Seq((1L, Option.empty[String])).toDF("k", "s")
    assert(Diff.rows(b2, a2, Seq("k")).isEmpty)
  }

  test("seasonalNaiveEval: hand MAE over the lag-7 join, flat series scores 0") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.parse("2024-03-01").plusDays(d).atTime(9, 0))
    val rows =
      (0 until 7).flatMap(d => (1 to 2).map(_ => ("step", ts(d)))) ++
      (7 until 14).flatMap(d => (1 to 5).map(_ => ("step", ts(d)))) ++
      (0 until 14).flatMap(d => (1 to 3).map(_ => ("flat", ts(d))))
    val got = TimeSeries.seasonalNaiveEval(
      rows.toDF("event_type", "ts"), "ts", "event_type", season = 7)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // step: 7 eval days, each |5 - 2| = 3 -> sum 21, mae 3.0
    assert(got("step") == ((7L, 21L, 3.0)))
    assert(got("flat") == ((7L, 0L, 0.0)))
    // fewer than `season` days of history -> no eval rows, type absent
    val short = (0 until 5).map(d => ("tiny", ts(d))).toDF("event_type", "ts")
    assert(TimeSeries.seasonalNaiveEval(short, "ts", "event_type").isEmpty)
  }

  test("interpolate: exact linear fill, truncation contract, edges stay null") {
    import spark.implicits._
    def grid(vals: Seq[(Long, Option[Long])]) =
      vals.map { case (t, v) => ("k", t, v) }.toDF("key", "slot", "v")
    // rising 100 -> 300 over 4 steps: 150, 200, 250 exactly
    val up = TimeSeries.interpolate(grid(Seq(0L -> Some(100L), 1L -> None,
      2L -> None, 3L -> None, 4L -> Some(300L))), "key", "slot", "v")
      .orderBy("slot").select("filled").as[Long].collect().toSeq
    assert(up == Seq(100L, 150L, 200L, 250L, 300L))
    // falling 10 -> 0 over 3 steps: truncation toward zero (both
    // engines' integral division): 10 + (-10/3) = 7, 10 + (-20/3) = 4
    val down = TimeSeries.interpolate(grid(Seq(0L -> Some(10L), 1L -> None,
      2L -> None, 3L -> Some(0L))), "key", "slot", "v")
      .orderBy("slot").select("filled").as[Long].collect().toSeq
    assert(down == Seq(10L, 7L, 4L, 0L))
    // no extrapolation: slots before first / after last stay NULL
    val edge = TimeSeries.interpolate(grid(Seq(0L -> None, 1L -> Some(5L),
      2L -> None)), "key", "slot", "v")
      .orderBy("slot").collect()
    assert(edge(0).isNullAt(3) && !edge(1).isNullAt(3) && edge(2).isNullAt(3))
    assert(edge(0).getBoolean(4) && !edge(1).getBoolean(4))
  }

  test("imputeMedian: nulls fill with the group median, flag audits, others untouched") {
    import spark.implicits._
    val df = Seq(("g", Some(1.0)), ("g", Some(5.0)), ("g", Some(9.0)),
      ("g", None), ("h", Some(2.0)), ("h", None)).toDF("grp", "v")
    val got = Profile.imputeMedian(df, "grp", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.count(_._3) == 2)
    // g's non-null median is 5.0; h's is 2.0
    assert(got.filter(r => r._1 == "g" && r._3).forall(_._2 == 5.0))
    assert(got.filter(r => r._1 == "h" && r._3).forall(_._2 == 2.0))
    // non-null rows keep their exact values
    assert(got.filter(r => r._1 == "g" && !r._3).map(_._2).sorted.toSeq ==
      Seq(1.0, 5.0, 9.0))
  }

  test("histogram2d: grid occupancy sums to n, corners land in edge bins") {
    import spark.implicits._
    val pts = Seq((0.0, 0.0), (10.0, 20.0), (5.0, 10.0), (9.9, 0.1))
      .toDF("x", "y")
    val cells = Profile.histogram2d(pts, "x", "y", 4, 4)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(cells.values.sum == 4L)
    assert(cells((0L, 0L)) == 1L)    // (0,0) in the low corner
    assert(cells((3L, 3L)) == 1L)    // max point right-closed into last bin
    assert(cells((2L, 2L)) == 1L)    // (5,10) at the midpoint
    assert(cells((3L, 0L)) == 1L)    // (9.9, 0.1)
  }

  test("exactWeightedQuantile: weighted rank pick, unit weights reduce to exactQuantile") {
    import spark.implicits._
    // values 1..4 with weights 1,1,6,2 (W=10): t = floor(0.5*9) = 4 ->
    // cumulative spans 1:[0], 2:[1], 3:[2..7], 4:[8,9] -> value 3
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 6L),
      ("g", 4.0, 2L)).toDF("grp", "v", "w")
    val r = Profile.exactWeightedQuantile(df, "grp", "v", "w", 0.5,
      bucketBits = 4).head()
    assert(r.getLong(1) == 10L, s"w_total: ${r.getLong(1)}")
    assert(r.getDouble(2) == 3.0, s"value: ${r.getDouble(2)}")
    // unit weights == plain exactQuantile on a bigger frame
    val big = (1 to 997).map(i => ("h", (i * 13 % 997).toDouble, 1L))
      .toDF("grp", "v", "w")
    val wq = Profile.exactWeightedQuantile(big, "grp", "v", "w", 0.25)
      .head().getDouble(2)
    val pq = Profile.exactQuantile(big.drop("w"), "grp", "v", 0.25)
      .head().getDouble(2)
    assert(wq == pq, s"weighted $wq vs plain $pq")
  }

  test("exactQuantile: the true order statistic, negatives included, q edges") {
    import spark.implicits._
    val vals = Seq(-3.5, -1.0, 0.0, 2.25, 7.0, 7.0, 9.5, 100.0)
    val df = vals.map(("g", _)).toDF("grp", "v")
    def at(q: Double) = Profile.exactQuantile(df, "grp", "v", q, bucketBits = 4)
      .head()
    // n=8: rank floor(q*7) of the ascending list
    assert(at(0.5).getDouble(2) == 2.25)  // rank 3
    assert(at(0.0).getDouble(2) == -3.5)  // rank 0
    assert(at(1.0).getDouble(2) == 100.0) // rank 7
    assert(at(0.5).getLong(1) == 8L)
    // ties at the picked rank: value is the tied value, deterministically
    assert(at(0.6).getDouble(2) == 7.0 && at(0.75).getDouble(2) == 7.0)
    // cross-check against Spark's exact percentile on a bigger frame
    // (percentile_disc-style lower rank: floor((n-1)*q))
    val big = (1 to 997).map(i => ("h", (i * 13 % 997).toDouble)).toDF("grp", "v")
    val got = Profile.exactQuantile(big, "grp", "v", 0.25).head().getDouble(2)
    val sorted = (1 to 997).map(i => (i * 13 % 997).toDouble).sorted
    assert(got == sorted(math.floor(0.25 * 996).toInt))
  }

  test("quantileSketch: estimates within half a bin of exact; clamping; mergeable") {
    import spark.implicits._
    val vals = (1 to 1000).map(i => ("g", i.toDouble))
    val df = vals.toDF("grp", "v")
    val halfBin = (1000.0 - 0.0) / 64.0 / 2.0
    val est = Profile.quantileSketch(df, "grp", "v", 0.0, 1000.0, 64,
        Seq(0.5, 0.9)).collect()
      .map(r => r.getDouble(1) -> r.getDouble(4)).toMap
    assert(math.abs(est(0.5) - 500.0) <= halfBin + 1.0)
    assert(math.abs(est(0.9) - 900.0) <= halfBin + 1.0)
    // out-of-range values clamp into the edge bins, never vanish
    val dirty = (vals ++ Seq(("g", -50.0), ("g", 5000.0))).toDF("grp", "v")
    val n = Profile.quantileSketch(dirty, "grp", "v", 0.0, 1000.0, 64, Seq(0.5))
      .head().getLong(2)
    assert(n == 1002L)
    // mergeability: summing two halves' bin counts == one-shot counts
    val (a, b) = vals.splitAt(500)
    val merged = Profile.quantileBinCounts(a.toDF("grp", "v"), "grp", "v", 0.0, 1000.0, 64)
      .unionAll(Profile.quantileBinCounts(b.toDF("grp", "v"), "grp", "v", 0.0, 1000.0, 64))
      .groupBy("grp", "bin").agg(sum("cnt").as("cnt"))
      .orderBy("bin").as[(String, Long, Long)].collect().toSeq
    val oneShot = Profile.quantileBinCounts(df, "grp", "v", 0.0, 1000.0, 64)
      .orderBy("bin").as[(String, Long, Long)].collect().toSeq
    assert(merged == oneShot)
  }

  test("gini: 0 on equal values, (n-1)/n on a monopoly, hand case 0.25") {
    import spark.implicits._
    val df = (
      (1 to 8).map(_ => ("equal", 5.0)) ++
      (Seq(0.0, 0.0, 0.0, 10.0).map(v => ("mono", v))) ++
      (Seq(1.0, 2.0, 3.0, 4.0).map(v => ("hand", v)))
    ).toDF("g", "v")
    val m = Profile.gini(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("equal").getLong(1) == 8L)
    assert(math.abs(m("equal").getDouble(2)) < 1e-15)
    // one holder of everything among n=4: G = (n-1)/n = 0.75
    assert(math.abs(m("mono").getDouble(2) - 0.75) < 1e-15)
    // {1,2,3,4}: sum=10, sum(i*x)=30 -> (60-50)/40 = 0.25
    assert(math.abs(m("hand").getDouble(2) - 0.25) < 1e-15)
  }

  test("equalFreqBins: n/k±1 occupancy, ordered edges, deterministic ties") {
    import spark.implicits._
    // 17 rows into 4 bins -> occupancies 4,4,4,5 (floor formula)
    val df = (1 to 17).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val bins = Profile.equalFreqBins(df, "g", "v", "id", k = 4)
      .orderBy("bin").as[(String, Long, Long, Double, Double)].collect()
    assert(bins.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(bins.map(_._3).sum == 17L)
    assert(bins.forall(b => b._3 >= 4L && b._3 <= 5L))
    // bins tile the value range in order, no overlap
    assert(bins.sliding(2).forall { case Array(a, b) => a._5 < b._4 })
    // all-equal values: ties split deterministically by id, occupancy holds
    val flat = (1 to 8).map(i => ("g", 1.0, i.toLong)).toDF("g", "v", "id")
    val fb = Profile.equalFreqBins(flat, "g", "v", "id", k = 2)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(fb.map(_._3).toSeq.sorted == Seq(4L, 4L))
  }

  test("zscore: hand mean/sigma, group independence") {
    import spark.implicits._
    // g: {1, 2, 3} -> mu = 2, sigma_pop = sqrt(2/3); h constant 5
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0),
      ("h", 4L, 5.0), ("h", 5L, 5.0)).toDF("grp", "id", "v")
    val z = Profile.zscore(df, "grp", "id", "v")
      .filter(col("grp") === "g")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._2 -> r._4).toMap
    // cents: {100, 200, 300}; var = (3*140000 - 600^2)/9 = 60000/9
    val sig = math.sqrt(60000.0 / 9.0)
    assert(math.abs(z(1L) - (100.0 - 200.0) / sig) < 1e-12)
    assert(z(2L) == 0.0)
    assert(math.abs(z(3L) + z(1L)) < 1e-12) // symmetric around the mean
    // constant group: variance 0 -> z is NULL by contract
    val rows = Profile.zscore(df, "grp", "id", "v").collect()
    assert(rows.filter(_.getString(0) == "h").forall(_.isNullAt(3)))
  }

  test("robustZscore: hand median/MAD, outlier immune to itself, MAD=0 contract") {
    import spark.implicits._
    // g: [10,10,11,12,13,100] -> median 11, deviations sorted
    // [0,100,100,100,200,8900] cents -> MAD 100 cents
    val df = Seq(("g", 1L, 10.0), ("g", 2L, 10.0), ("g", 3L, 11.0),
      ("g", 4L, 12.0), ("g", 5L, 13.0), ("g", 6L, 100.0),
      ("h", 7L, 5.0), ("h", 8L, 5.0), ("h", 9L, 5.0), ("h", 10L, 9.0))
      .toDF("grp", "id", "v")
    val got = Profile.robustZscore(df, "grp", "id", "v")
      .collect().map(r => r.getLong(1) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3))), r.getBoolean(4)))
      .toMap
    def zm(diffCents: Long, madCents: Long): Long =
      math.floor(0.6745 * diffCents.toDouble / madCents.toDouble * 1e6).toLong
    assert(got(6L) == ((Some(zm(8900L, 100L)), true)))  // the spike flags
    assert(got(1L) == ((Some(zm(-100L, 100L)), false))) // ordinary rows don't
    assert(got(3L) == ((Some(0L), false)))              // the median itself
    // a mean/sigma z-score would be dragged by the 100: robust is not —
    // only ONE outlier in g
    assert(got.filterKeys(_ <= 6L).values.count(_._2) == 1)
    // h: median 5, MAD 0 -> z NULL, any deviation flags
    assert(got(7L) == ((None, false)) && got(10L) == ((None, true)))
  }

  test("gini is invariant to input order and row duplication scales sanely") {
    import spark.implicits._
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val fwd = vals.map(("g", _)).toDF("g", "v")
    val rev = vals.reverse.map(("g", _)).toDF("g", "v")
    val g1 = Profile.gini(fwd, "g", "v").head().getDouble(2)
    val g2 = Profile.gini(rev, "g", "v").head().getDouble(2)
    assert(g1 == g2) // bit-identical: ties and order cannot move the sum
    assert(g1 > 0.0 && g1 < 1.0)
  }
}
