package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LinkPredictSpec extends SparkTestBase {
  import spark.implicits._

  test("path and square: hand-checked candidates and scores") {
    // path 1-2-3: only candidate is (1,3) through center 2
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val p = LinkPredict.run(path, "src", "dst")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(p.toSeq == Seq((1L, 3L, 1L, 1L, 1L, 1.0)))
    // square 1-2-3-4-1: diagonals (1,3) and (2,4), two shared neighbors,
    // every degree 2 -> jaccard 2/(2+2-2) = 1
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val s = LinkPredict.run(sq, "src", "dst")
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(s.toSeq == Seq((1L, 3L, 2L, 2L, 2L, 1.0), (2L, 4L, 2L, 2L, 2L, 1.0)))
  }

  test("existing edges are never candidates; minCommon filters") {
    // triangle plus a pendant: (1,2),(2,3),(1,3) all exist -> no
    // candidate among them even though each pair shares a neighbor
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val c = LinkPredict.run(tri, "src", "dst")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // candidates: (1,4) and (2,4) through 3, common=1
    assert(c.map(r => (r._1, r._2)).toSet == Set((1L, 4L), (2L, 4L)))
    assert(LinkPredict.run(tri, "src", "dst", minCommon = 2L).isEmpty)
  }

  test("maxDegree drops hub-centered wedges but degrees stay exact") {
    // star center 0 with 5 leaves: every leaf pair is a candidate
    // through the hub; capping below 5 kills all wedges
    val star = (1L to 5L).map((0L, _)).toDF("src", "dst")
    assert(LinkPredict.run(star, "src", "dst").count() == 10L)
    assert(LinkPredict.run(star, "src", "dst", maxDegree = 4L).isEmpty)
    // cap at 5 keeps them, and leaf degrees are still 1
    val kept = LinkPredict.run(star, "src", "dst", maxDegree = 5L)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(kept.length == 10 && kept.forall(r => r._4 == 1L && r._5 == 1L))
  }
}
