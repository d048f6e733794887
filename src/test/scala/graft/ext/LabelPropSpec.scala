package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LabelPropSpec extends SparkTestBase {
  import spark.implicits._

  test("disjoint triangles each converge to their min label") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val got = LabelProp.run(edges, "src", "dst", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(Seq(0L, 1L, 2L).forall(got(_) == 0L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
  }

  test("synchronous 2-cycle on a lone edge is deterministic per round count") {
    val edge = Seq((5L, 6L)).toDF("src", "dst")
    // each round the two endpoints swap labels; even round counts land
    // back on the start — the documented determinism contract (fixed
    // rounds, not convergence, for plain sync LP)
    val even = LabelProp.run(edge, "src", "dst", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(even == Map(5L -> 5L, 6L -> 6L))
    val odd = LabelProp.run(edge, "src", "dst", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(odd == Map(5L -> 6L, 6L -> 5L))
  }

  test("self-loops and duplicate edges are scrubbed; majority beats min") {
    // node 9's neighbors: three carriers of label 1, one of label 0 —
    // frequency wins over the smaller label
    val start = Seq((1L, 2L), (1L, 3L), (1L, 4L), (0L, 5L))
    val spokes = Seq((9L, 2L), (9L, 3L), (9L, 4L), (9L, 5L))
    val edges = (start ++ spokes ++ Seq((9L, 9L), (9L, 2L)))
      .toDF("src", "dst")
    val r2 = LabelProp.run(edges, "src", "dst", rounds = 2)
      .as[(Long, Long)].collect().toMap
    // round 1: 2,3,4 adopt 1 (their only non-9 neighbor is 1... plus 9);
    // actually 2's neighbors {1, 9} -> tie cnt 1 each -> min 1. 5's
    // neighbors {0, 9} -> 0. round 2: 9 sees labels {1, 1, 1, 0} -> 1
    assert(r2(9L) == 1L)
  }

  test("planted ring graph: labels land inside the component") {
    val comps = ConnectedComponents.run(
      Fixtures.plantedComponents(spark), "src", "dst")
      .as[(Long, Long)].collect().toMap
    val labels = LabelProp.run(
      Fixtures.plantedComponents(spark), "src", "dst", rounds = 4)
      .as[(Long, Long)].collect()
    // a label is always a node id from the SAME connected component —
    // propagation cannot cross components
    assert(labels.forall { case (n, l) => comps(n) == comps(l) })
  }

  test("runWeighted: weight sums outvote edge counts") {
    import spark.implicits._
    // node 9's votes: label 1 via two w=1 edges (sum 2) vs label 2 via
    // one w=5 edge — weighted LP picks 2 where unweighted picks 1
    val edges = Seq((1L, 9L, 1L), (8L, 9L, 1L), (2L, 9L, 5L), (1L, 8L, 9L))
      .toDF("src", "dst", "w")
    val wl = LabelProp.runWeighted(edges, "src", "dst", "w", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(wl(9L) == 2L)
    val ul = LabelProp.run(edges, "src", "dst", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(ul(9L) == 1L)
  }

  test("contract: communities become nodes, inter-edge counts become weights") {
    import spark.implicits._
    // two triangles {0,1,2} {10,11,12} + two bridges and one duplicate
    // (reversed) bridge that must fold into the same undirected edge
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (10L, 11L), (11L, 12L),
      (12L, 10L), (0L, 10L), (1L, 11L), (11L, 1L))
      .toDF("src", "dst")
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L),
      (12L, 10L)).toDF("node", "label")
    val got = LabelProp.contract(edges, "src", "dst", labels)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 10L, 2L))) // two distinct bridges
  }

  test("multilevel merges bridge-joined communities one LP pass cannot") {
    import spark.implicits._
    // three K4 cliques pairwise joined by single bridges: inside a K4
    // the intra majority (3 votes) beats the bridge vote, so level-1 LP
    // keeps the cliques apart; the coarse triangle then collapses
    def k4(b: Long) = for {
      i <- 0 to 3; j <- (i + 1) to 3
    } yield (b + i, b + j)
    val edges = (k4(0) ++ k4(10) ++ k4(20) ++
      Seq((0L, 10L), (10L, 20L), (20L, 0L))).toDF("src", "dst")
    val l1 = LabelProp.run(edges, "src", "dst", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(Set(l1(1L), l1(11L), l1(21L)).size == 3) // still 3 communities
    val ml = LabelProp.multilevel(edges, "src", "dst",
      rounds1 = 4, rounds2 = 2).as[(Long, Long)].collect().toMap
    assert(ml.values.toSet.size == 1) // one merged community
  }

  test("multilevel: a community with no external edges keeps its level-1 label") {
    import spark.implicits._
    val edges = (Seq((0L, 1L), (1L, 2L), (2L, 0L)) ++ // isolated triangle
      Seq((10L, 20L), (20L, 30L), (30L, 10L))) // triangle of singletons
      .toDF("src", "dst")
    val ml = LabelProp.multilevel(edges, "src", "dst",
      rounds1 = 2, rounds2 = 2).as[(Long, Long)].collect().toMap
    assert(Set(ml(0L), ml(1L), ml(2L)).size == 1) // intact, level-1 label
    assert(ml(0L) == 0L)
  }
}
