package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Privacy operators: keyed pseudonymization (deterministic, null-safe,
  * join-preserving, reference-implementation-exact) and k-anonymity
  * (counts + suppression guarantee). */
class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  private def refToken(secret: String, v: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest((secret + "\u0001" + v).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("pseudonymize: deterministic, null-preserving, reference sha-256 exact") {
    val df = Seq((1L, "alice"), (2L, null.asInstanceOf[String]), (3L, "alice"))
      .toDF("id", "name")
    val out = Privacy.pseudonymize(df, Seq("name"), "sec").orderBy("id").collect()
    assert(out(0).getString(1) == refToken("sec", "alice"))
    assert(out(1).isNullAt(1)) // NULL stays NULL, never a token of ""
    assert(out(2).getString(1) == out(0).getString(1)) // deterministic
    // rotating the secret re-keys every token
    val rot = Privacy.pseudonymize(df, Seq("name"), "sec2").orderBy("id").collect()
    assert(rot(0).getString(1) == refToken("sec2", "alice"))
    assert(rot(0).getString(1) != out(0).getString(1))
    // non-string columns tokenize via their stable stringification
    val num = Privacy.pseudonymize(Seq(Tuple1(42L)).toDF("k"), Seq("k"), "s")
      .collect()(0).getString(0)
    assert(num == refToken("s", "42"))
    // unknown column fails loudly
    val e = intercept[IllegalArgumentException] {
      Privacy.pseudonymize(df, Seq("nope"), "s")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("pseudonymize: same secret preserves joins across tables") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "va")
    val b = Seq((1L, "p"), (3L, "q")).toDF("k", "vb")
    val j = Privacy.pseudonymize(a, Seq("k"), "s")
      .join(Privacy.pseudonymize(b, Seq("k"), "s"), Seq("k"))
      .collect()
    assert(j.length == 1)
    assert(j(0).getAs[String]("va") == "x" && j(0).getAs[String]("vb") == "p")
    // different secrets break linkability by construction
    assert(Privacy.pseudonymize(a, Seq("k"), "s1")
      .join(Privacy.pseudonymize(b, Seq("k"), "s2"), Seq("k")).isEmpty)
  }

  test("kAnonymity: counts match brute force; suppression keeps only k-sized combos") {
    val df = (1 to 10).map(i =>
      (i.toLong, if (i <= 7) "a" else "b", (i % 2).toLong)).toDF("id", "seg", "p")
    val counts = Privacy.kAnonymityCounts(df, Seq("seg"))
      .select(col("seg"), col("k_count")).distinct().as[(String, Long)]
      .collect().toMap
    assert(counts == Map("a" -> 7L, "b" -> 3L))
    val kept4 = Privacy.kAnonymize(df, Seq("seg"), k = 4)
    assert(kept4.count() == 7 &&
      kept4.select("seg").distinct().as[String].collect().toSeq == Seq("a"))
    assert(kept4.columns.toSeq == df.columns.toSeq) // helper column dropped
    // the released set is k-anonymous: every remaining combo >= k strong
    val recheck = Privacy.kAnonymityCounts(kept4, Seq("seg"))
      .agg(min(col("k_count"))).as[Long].collect()(0)
    assert(recheck >= 4)
    // two-column quasi set
    val kept2 = Privacy.kAnonymize(df, Seq("seg", "p"), k = 3)
    // combos: (a,1)x4 {1,3,5,7}, (a,0)x3 {2,4,6}, (b,0)x2, (b,1)x1
    assert(kept2.count() == 7)
    assert(Privacy.kAnonymize(df, Seq("seg", "p"), k = 5).isEmpty)
  }

  test("kAnonymity: NULL quasi values form their own group, like GROUP BY") {
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String]), (4L, "a"), (5L, "b")).toDF("id", "seg")
    val counts = Privacy.kAnonymityCounts(df, Seq("seg"))
      .select(col("id"), col("k_count")).as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
    // no rows lost or duplicated through the null-safe join-back
    assert(Privacy.kAnonymityCounts(df, Seq("seg")).count() == 5)
    assert(Privacy.kAnonymize(df, Seq("seg"), 2).count() == 4)
  }

  test("lDiversity: uniform-sensitive groups drop, diverse groups keep") {
    // group a: 3 rows, sensitive {x, y, x} -> 2 distinct -> keeps at l=2
    // group b: 3 rows, sensitive {x, x, x} -> 1 distinct -> drops at l=2
    val df = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "a", "x"),
      (4L, "b", "x"), (5L, "b", "x"), (6L, "b", "x"))
      .toDF("id", "seg", "diag")
    val counts = Privacy.lDiversityCounts(df, Seq("seg"), "diag")
      .select(col("id"), col("l_count")).as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 2L, 2L -> 2L, 3L -> 2L,
      4L -> 1L, 5L -> 1L, 6L -> 1L))
    assert(Privacy.lDiversify(df, Seq("seg"), "diag", l = 2)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // k-anonymity alone waves group b through — the orthogonal leak
    assert(Privacy.kAnonymize(df, Seq("seg"), k = 3).count() == 6)
  }

  test("lDiversity: NULL sensitive adds no diversity; sens==quasi rejected") {
    val df = Seq((1L, "a", null.asInstanceOf[String]),
      (2L, "a", null.asInstanceOf[String]), (3L, "b", "x"))
      .toDF("id", "seg", "diag")
    // the all-NULL group counts 0 distinct: suppressed even at l = 1
    assert(Privacy.lDiversify(df, Seq("seg"), "diag", l = 1)
      .select("id").as[Long].collect().toSeq == Seq(3L))
    intercept[IllegalArgumentException] {
      Privacy.lDiversityCounts(df, Seq("seg", "diag"), "diag")
    }
  }

  test("tCloseness: hand TVD, absent-value mass, rational threshold") {
    // group a: {x, x, y}; group b: {z}; global: x:2, y:1, z:1 over n=4
    // TVD(a) = 1/2(|2/3-1/2| + |1/3-1/4| + |0-1/4|) = 1/2(1/6+1/12+1/4) = 1/4
    // TVD(b) = 1/2(|0-1/2| + |0-1/4| + |1-1/4|) = 3/4
    val df = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "a", "y"),
      (4L, "b", "z")).toDF("id", "seg", "diag")
    val d = Privacy.tClosenessDistances(df, Seq("seg"), "diag")
      .orderBy("seg").collect()
    // a: denom = 2*3*4 = 24, tvd_scaled = |2*4-2*3|+|1*4-1*3|+|0-1*3| = 6
    assert(d(0).getAs[Long]("tvd_scaled") == 6L)
    assert(d(0).getAs[Long]("denom") == 24L)
    assert(d(0).getAs[Double]("tvd") == 0.25)
    // b: denom = 2*1*4 = 8, tvd_scaled = |0-2|+|0-1|+|4-1| = 6
    assert(d(1).getAs[Long]("tvd_scaled") == 6L)
    assert(d(1).getAs[Double]("tvd") == 0.75)
    // threshold 1/2 keeps a (1/4 <= 1/2), drops b (3/4 > 1/2); the
    // boundary ITSELF keeps: t = 1/4 still keeps a (<=, exact integers)
    assert(Privacy.tCloseness(df, Seq("seg"), "diag", 1L, 2L)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(Privacy.tCloseness(df, Seq("seg"), "diag", 1L, 4L)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(Privacy.tCloseness(df, Seq("seg"), "diag", 0L, 1L).isEmpty)
  }

  test("tCloseness: NULL sensitive is distribution mass; uniform corpus is distance 0") {
    val withNull = Seq((1L, "a", null.asInstanceOf[String]),
      (2L, "a", "x"), (3L, "b", null.asInstanceOf[String]),
      (4L, "b", "x")).toDF("id", "seg", "diag")
    // both groups carry {null:1, x:1} == the global 50/50: TVD = 0
    val d = Privacy.tClosenessDistances(withNull, Seq("seg"), "diag")
      .collect()
    assert(d.length == 2 && d.forall(_.getAs[Long]("tvd_scaled") == 0L))
    // skew-free but uniform: l-diversity and t-closeness see DIFFERENT
    // leaks — a group of all-"x" passes l=1 closeness-wise iff global is
    // all-"x" too
    val uni = Seq((1L, "a", "x"), (2L, "b", "x")).toDF("id", "seg", "diag")
    assert(Privacy.tCloseness(uni, Seq("seg"), "diag", 0L, 1L).count() == 2)
  }

  test("kAnonymity plan: combo counts broadcast back, fact never shuffles by combo") {
    val df = (1 to 100).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "seg")
    val plan = Privacy.kAnonymityCounts(df, Seq("seg"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("Window"), "must not count via a window over the fact")
  }
}
