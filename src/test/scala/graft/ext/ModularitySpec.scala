package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ModularitySpec extends SparkTestBase {
  import spark.implicits._

  /** Two 4-cliques joined by one bridge edge (0..3, 4..7, bridge 3-4). */
  private def cliqueEdges: DataFrame = {
    val c1 = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val c2 = for (i <- 4 to 7; j <- (i + 1) to 7) yield (i.toLong, j.toLong)
    (c1 ++ c2).toDF("src", "dst")
  }

  private def assign(f: Long => Long): DataFrame =
    (0L to 7L).map(n => (n, f(n))).toDF("node", "comm")

  test("two clean cliques under the true assignment score exactly 0.5") {
    val q = Modularity.total(cliqueEdges, "src", "dst",
      assign(n => n / 4), "node", "comm").as[Double].head()
    assert(q == 0.5, s"got $q")
  }

  test("the all-one-community assignment scores exactly 0") {
    val q = Modularity.total(cliqueEdges, "src", "dst",
      assign(_ => 0L), "node", "comm").as[Double].head()
    assert(q == 0.0, s"got $q")
  }

  test("per-community terms carry exact counts") {
    val rows = Modularity.score(cliqueEdges, "src", "dst",
      assign(n => n / 4), "node", "comm")
      .orderBy("comm")
      .select("comm", "n_nodes", "deg_sum", "internal_edges")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((0L, 4L, 12L, 6L), (1L, 4L, 12L, 6L)))
  }

  test("duplicate, reversed, and self-loop edges do not change the score") {
    val noisy = cliqueEdges
      .unionAll(cliqueEdges.select(col("dst").as("src"), col("src").as("dst")))
      .unionAll(Seq((2L, 2L), (5L, 5L)).toDF("src", "dst"))
      .unionAll(cliqueEdges.limit(3))
    val q = Modularity.total(noisy, "src", "dst",
      assign(n => n / 4), "node", "comm").as[Double].head()
    assert(q == 0.5, s"got $q")
  }

  test("an isolated assigned node contributes a zero term, not a crash") {
    val a = assign(n => n / 4)
      .unionAll(Seq((99L, 7L)).toDF("node", "comm"))
    val rows = Modularity.score(cliqueEdges, "src", "dst", a, "node", "comm")
      .orderBy("comm").collect()
    assert(rows.length == 3)
    val iso = rows.last
    assert(iso.getLong(1) == 1L && iso.getLong(2) == 0L &&
      iso.getLong(3) == 0L && iso.getDouble(4) == 0.0)
  }

  test("labelprop communities on a bridged clique pair beat a parity split") {
    val edges = cliqueEdges.unionAll(Seq((3L, 4L)).toDF("src", "dst"))
    val lp = LabelProp.run(edges, "src", "dst", rounds = 5)
      .select(col("node"), col("label").as("comm"))
    val qLp = Modularity.total(edges, "src", "dst", lp, "node", "comm")
      .as[Double].head()
    val qParity = Modularity.total(edges, "src", "dst",
      assign(n => n % 2), "node", "comm").as[Double].head()
    assert(qLp > qParity,
      s"labelprop Q=$qLp should beat the parity split Q=$qParity")
    assert(qLp > 0.3, s"clique communities should score well, got $qLp")
  }

  test("a graph with only self-loops is rejected") {
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Modularity.score(loops, "src", "dst", assign(_ => 0L), "node", "comm")
    }
  }
}
