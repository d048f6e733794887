package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  test("hub node accumulates rank; mass conserves; deterministic") {
    val pr = PageRank.run(Fixtures.plantedEdges(spark, n = 200), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr.size == 200)
    // node 0 receives the hub edges (every 10th node) -> top rank
    assert(pr(0L) == pr.values.max)
    // total mass ~1 (quantization loses < 1e-9 * |E| per iteration)
    assert(math.abs(pr.values.sum - 1.0) < 1e-5)
    val pr2 = PageRank.run(Fixtures.plantedEdges(spark, n = 200), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr == pr2)
  }

  test("dangling mass redistributes instead of vanishing") {
    // 1 -> 2, 2 is dangling: its rank must flow back uniformly
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val pr = PageRank.run(e, iters = 2).as[(Long, Double)].collect().toMap
    assert(pr.size == 2)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6,
      s"mass lost: ${pr.values.sum}")
    assert(pr(2L) > pr(1L)) // 2 receives 1's full contribution
  }

  test("eager mode leaves no cache entries behind") {
    spark.catalog.clearCache()
    PageRank.run(Fixtures.plantedEdges(spark, n = 50), iters = 2,
      eager = true).count()
    assert(org.apache.spark.sql.graftbridge.Bridge.cacheEmpty(spark))
  }
}
