package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("two chains and an isolated pair resolve to min-id components") {
    // 1-2-3-4 chain, 10-11 pair, 20-21-22 triangle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("direction, duplicates and self-loops do not matter") {
    val messy = Seq((5L, 4L), (4L, 5L), (4L, 5L), (5L, 5L), (4L, 3L))
      .toDF("src", "dst")
    val got = ConnectedComponents.run(messy, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("planted ring graph: 24 components of the designed sizes") {
    val got = ConnectedComponents.run(
      Fixtures.plantedComponents(spark), "src", "dst")
      .groupBy(col("comp")).count()
      .as[(Long, Long)].collect().toSeq
    assert(got.size == 24)
    assert(got.count(_._2 == 16L) == 6 && got.count(_._2 == 8L) == 18)
  }

  test("a long path needs diameter rounds and still converges") {
    val path = (0L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = ConnectedComponents.run(path, "src", "dst")
      .as[(Long, Long)].collect()
    assert(got.length == 41 && got.forall(_._2 == 0L))
    // and a too-small iteration cap fails loudly instead of lying
    intercept[IllegalArgumentException] {
      ConnectedComponents.run(path, "src", "dst", maxIter = 3)
    }
  }
}
