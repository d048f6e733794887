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

  test("personalized: hand-checked two-node walk, dangling mass returns to roots") {
    import spark.implicits._
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val roots = Seq(0L).toDF("id")
    val p1 = PageRank.personalized(edges, roots, "id", iters = 1)
      .as[(Long, Double)].collect().toMap
    // p1(0) = teleport only (node 1 contributes nothing yet, dangling 0)
    assert(p1(0L) == (1.0 - 0.85) / 1L + 0.85 * (0.0 / 1e12 / 1L))
    assert(p1(1L) == 0.85 * (1e12.toLong / 1e12)) // 0's full rank flows in
    // iteration 2: node 1 is DANGLING — its rank returns to the root,
    // not to the whole graph
    val p2 = PageRank.personalized(edges, roots, "id", iters = 2)
      .as[(Long, Double)].collect().toMap
    val dang = math.floor(p1(1L) * 1e12) / 1e12
    assert(p2(0L) == 0.85 * (0.0 / 1e12) + ((1.0 - 0.85) / 1L + 0.85 * (dang / 1L)))
    assert(p2(1L) == 0.85 * (math.floor(p1(0L) * 1e12).toLong / 1e12))
  }

  test("personalized: rank localizes around the seed set") {
    val pr = PageRank.personalized(Fixtures.plantedEdges(spark),
      spark.range(400L).filter(org.apache.spark.sql.functions.col("id") % 50 === 0)
        .toDF("id"), "id", iters = 3)
      .as[(Long, Double)].collect().toMap
    // roots keep the teleport floor; a generic non-root sits below it
    val rootMin = (0L until 400L by 50).map(pr).min
    assert(rootMin > 0.15 / 8.0 * 0.99)
    // total mass stays <= 1 (quantization only shrinks)
    assert(pr.values.sum <= 1.0 + 1e-9)
    // non-roots hold SOME mass (walk spreads) but less than the seeds' floor
    val nonRoot = pr.filterKeys(_ % 50 != 0)
    assert(nonRoot.values.exists(_ > 0.0))
  }
}
