package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private def skew = (Seq.fill(500)(1L) ++ Seq.fill(50)(2L) ++
    (100L until 2100L)).toDF("k")

  test("estimates never undercount and nail heavy hitters") {
    val sk = CountMin.sketch(skew, "k", width = 2048, depth = 4)
    val probes = Seq(1L, 2L, 100L, 999999L).toDF("k")
    val est = CountMin.estimate(sk, probes, "k", width = 2048, depth = 4)
      .as[(Long, Long)].collect().toMap
    assert(est(1L) >= 500L && est(1L) <= 510L, s"heavy hitter: ${est(1L)}")
    assert(est(2L) >= 50L && est(2L) <= 60L)
    assert(est(100L) >= 1L)
    // absent key: min over its cells can only be collision noise
    assert(est(999999L) <= 10L)
  }

  test("sketch size is bounded by depth*width, not key count") {
    val sk = CountMin.sketch(spark.range(100000).toDF("k"), "k",
      width = 256, depth = 2)
    assert(sk.count() <= 512)
  }

  test("sketches merge by cell-wise addition") {
    val a = CountMin.sketch(Seq(1L, 1L, 2L).toDF("k"), "k", 512, 4)
    val b = CountMin.sketch(Seq(1L, 3L).toDF("k"), "k", 512, 4)
    val merged = a.unionByName(b)
      .groupBy("row", "pos").agg(sum("cnt").as("cnt"))
    val whole = CountMin.sketch(Seq(1L, 1L, 2L, 1L, 3L).toDF("k"), "k", 512, 4)
    val m = merged.orderBy("row", "pos").as[(Int, Long, Long)].collect().toSeq
    val w = whole.orderBy("row", "pos").as[(Int, Long, Long)].collect().toSeq
    assert(m == w)
  }

  test("depth past the one-md5 budget fails loudly") {
    intercept[IllegalArgumentException] {
      CountMin.sketch(Seq(1L).toDF("k"), "k", width = 64, depth = 5)
    }
  }

  test("heavyHitters: exact output even under forced collisions") {
    // 3 hot keys (200/150/120 copies) over 500 light keys; width=16
    // forces every cell to collide, so the estimate-prune admits false
    // positives — the exact recount must still emit exactly the hitters
    val rows = (1L to 500L) ++
      Seq.fill(200)(9001L) ++ Seq.fill(150)(9002L) ++ Seq.fill(120)(9003L)
    val df = rows.toDF("k")
    val expected = Seq((9001L, 200L), (9002L, 150L), (9003L, 120L))
    for (w <- Seq(16, 1024)) {
      val got = CountMin.heavyHitters(df, "k", minCount = 120L, width = w)
        .orderBy($"cnt".desc).as[(Long, Long)].collect().toSeq
      assert(got == expected, s"width=$w")
    }
    assert(CountMin.heavyHitters(df, "k", minCount = 201L).isEmpty,
      "bar above the max count: no hitters")
  }
}
