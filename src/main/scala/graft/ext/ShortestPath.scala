package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source (multi-root) shortest paths over a weighted directed
  * edge list — distributed Bellman-Ford, the weighted companion of
  * [[Bfs]]'s hop levels: dependency-cost rollups, minimum-latency
  * routing over service graphs, cheapest-transform chains in a
  * lineage/build graph.
  *
  * Frontier-free relaxation to a fixed point: distances start at 0 on
  * the root set; each round every edge offers `dist(src) + w` to its
  * destination and the label table keeps the per-node minimum. A round
  * is one node-keyed equi-join + one min hash-aggregation — O(|E|)
  * shuffle, all partitioned by node id, no driver materialization
  * (same per-iteration shape and localCheckpoint lineage discipline as
  * [[ConnectedComponents]]). Rounds needed equal the longest shortest
  * path in EDGES (≤ diameter); convergence is a one-scalar changed-count
  * per round with a loud failure at the cap — negative-weight cycles
  * cannot sneak in because weights are required nonnegative.
  *
  * Reference scope: §2.5 beyond-parity — the reference's MySQL engine
  * has no recursive/iterative query surface at all.
  */
object ShortestPath {

  /** (node, dist) for every node reachable from `roots`; `dist` is the
    * exact minimum path weight (LONG — integer weights keep every
    * relaxation engine-exact). Unreachable nodes are absent. */
  def run(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
      roots: DataFrame, rootCol: String, maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"), col(wCol).cast("long").as("w"))
      .filter(col("w") >= 0)
      .localCheckpoint(true)
    var dist = roots.select(col(rootCol).cast("long").as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val offers = e.join(dist, e("a") === dist("node"))
        .select(col("b").as("node"), (col("dist") + col("w")).as("dist"),
          lit(false).as("__old"))
      // one aggregation serves BOTH the min-merge and the convergence
      // check: a node moved iff the overall min beats the old-rows-only
      // min (or the node is new — no old row at all)
      val next = dist.withColumn("__old", lit(true)).unionAll(offers)
        .groupBy(col("node"))
        .agg(min(col("dist")).as("dist"),
          min(when(col("__old"), col("dist"))).as("__od"))
        .localCheckpoint(true)
      changed = next.filter(col("__od").isNull || col("dist") < col("__od"))
        .count()
      dist = next.drop("__od")
      iter += 1
    }
    require(changed == 0, s"did not converge within $maxIter iterations")
    dist
  }
}
