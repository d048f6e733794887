package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ShortestPathSpec extends SparkTestBase {
  import spark.implicits._

  test("relaxation beats the direct edge; unreachable nodes absent") {
    val edges = Seq((1L, 2L, 5L), (1L, 3L, 1L), (3L, 2L, 1L),
      (7L, 8L, 1L)).toDF("src", "dst", "w")
    val roots = Seq(1L).toDF("id")
    val d = ShortestPath.run(edges, "src", "dst", "w", roots, "id")
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 3L -> 1L, 2L -> 2L)) // 1->3->2 beats 1->2
    assert(!d.contains(7L) && !d.contains(8L))
  }

  test("multi-root takes the nearest root; zero-weight edges fine") {
    val edges = Seq((1L, 5L, 10L), (2L, 5L, 3L), (2L, 6L, 0L))
      .toDF("src", "dst", "w")
    val roots = Seq(1L, 2L).toDF("id")
    val d = ShortestPath.run(edges, "src", "dst", "w", roots, "id")
      .as[(Long, Long)].collect().toMap
    assert(d(5L) == 3L && d(6L) == 0L)
  }

  test("planted DAG: layer-0 roots settle and distances are layer-monotone") {
    val dag = Fixtures.plantedDag(spark)
    val d = ShortestPath.run(dag, "src", "dst", "w",
      spark.range(20L).toDF("id"), "id")
      .as[(Long, Long)].collect().toMap
    assert(d.size == 240)
    assert((0L until 20L).forall(d(_) == 0L))
    // layered graph: min edge weight is 1, so dist >= layer index
    assert(d.forall { case (n, dist) => dist >= n / 20 })
  }

  test("loud failure when the iteration cap is too small") {
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      ShortestPath.run(chain, "src", "dst", "w",
        Seq(1L).toDF("id"), "id", maxIter = 1)
    }
  }
}
