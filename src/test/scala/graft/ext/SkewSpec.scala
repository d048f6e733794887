package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 10k rows, 95% on one hot key
  private lazy val skewed = (1 to 10000).map { i =>
    (if (i % 20 == 0) i.toLong % 7 else 42L, i.toLong)
  }.toDF("k", "v")
  private lazy val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
    (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "name")

  test("saltedJoin preserves equi-join semantics exactly") {
    val plain = skewed.join(dim, Seq("k")).groupBy("name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8).groupBy("name")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
  }

  test("saltedJoin left semantics keep unmatched rows") {
    val noMatch = skewed.withColumn("k", col("k") + 1000)
    val left = Skew.saltedJoin(noMatch, dim, "k", salts = 4, joinType = "left")
    assert(left.count() == 10000)
    assert(left.filter(col("name").isNull).count() == 10000)
  }

  test("saltedAgg equals direct aggregation") {
    val direct = skewed.groupBy("k").agg(sum("v").as("v"))
      .as[(Long, Long)].collect().toSet
    val salted = Skew.saltedAgg(skewed, "k", "v", salts = 8, sum, sum)
      .as[(Long, Long)].collect().toSet
    assert(direct == salted)
  }

  test("HLL sketch (approx_count_distinct) within 5% on the hot column") {
    val exact = skewed.select(countDistinct($"v")).as[Long].collect()(0)
    val approx = skewed.select(approx_count_distinct($"v", 0.02))
      .as[Long].collect()(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
