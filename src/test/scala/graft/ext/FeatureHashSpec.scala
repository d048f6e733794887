package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FeatureHashSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (Some("gold"), Some(1L)), (Some("gold"), Some(2L)),
    (Some("silver"), None), (None, Some(1L))
  ).toDF("tier", "nk")

  test("buckets stay in range and nulls contribute nothing") {
    val t = FeatureHash.hashTokens(df, Seq("tier", "nk"), buckets = 8)
      .as[(Long, Long)].collect().toSeq
    assert(t.length == 6) // 8 cells minus 2 null features
    assert(t.forall { case (b, s) =>
      b >= 0 && b < 8 && (s == 1L || s == -1L) })
  }

  test("same value always lands in the same signed bucket") {
    val t = FeatureHash.hashTokens(df, Seq("tier"), buckets = 16)
      .as[(Long, Long)].collect().toSeq
    assert(t.count(_ == t.head) >= 2) // the two "gold" rows collide exactly
  }

  test("hashedProfile aggregates weight and count per bucket") {
    val p = FeatureHash.hashedProfile(df, Seq("tier", "nk"), buckets = 4)
      .orderBy(col("bucket")).collect()
    assert(p.map(_.getLong(2)).sum == 6L)            // token conservation
    assert(p.forall(r => math.abs(r.getLong(1)) <= r.getLong(2)))
    // feature name is part of the token: same raw value, different column
    val a = FeatureHash.hashedProfile(
      Seq(Tuple1("x")).toDF("f1"), Seq("f1"), buckets = 1024).head()
    val b = FeatureHash.hashedProfile(
      Seq(Tuple1("x")).toDF("f2"), Seq("f2"), buckets = 1024).head()
    assert(a.getLong(0) != b.getLong(0) || a.getLong(1) != b.getLong(1))
  }
}
