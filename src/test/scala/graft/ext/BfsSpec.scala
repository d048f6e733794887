package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BfsSpec extends SparkTestBase {
  import spark.implicits._

  test("hand tree: depths, roots, and an unreachable node stays out") {
    // 1 -> {2, 3}, 2 -> 4; node 99 disconnected (no root, no edge path)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (98L, 99L)).toDF("p", "c")
    val roots = Seq(1L).toDF("r")
    val got = Bfs.levels(edges, "p", "c", roots, "r")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 2L)))
  }

  test("forest: each tree's nodes resolve to their own root") {
    val got = Bfs.levels(Fixtures.plantedForest(spark, trees = 3, size = 7),
      "parent", "child",
      spark.range(21).filter(col("id") % 7 === 0).toDF("id"), "id")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 21)
    assert(got.forall { case (n, r, _) => n - n % 7 == r })
    // complete binary tree of 7: depths 0,1,1,2,2,2,2
    assert(got.filter(_._2 == 0L).map(_._3).sorted.toSeq ==
      Seq(0L, 1L, 1L, 2L, 2L, 2L, 2L))
  }

  test("a cycle fails loudly instead of spinning forever") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("p", "c")
    intercept[IllegalArgumentException] {
      Bfs.levels(edges, "p", "c", Seq(1L).toDF("r"), "r", maxDepth = 10)
    }
  }
}
