package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative hierarchy traversal (BFS levels) — Spark's answer to the
  * recursive CTE it lacks: org charts, bill-of-materials, category
  * trees, reply threads. From a root set, each round expands one level
  * through a parent-keyed equi-join, so the whole traversal is
  * `depth` hash joins of frontier-sized frames against the edge table —
  * no driver-side recursion, no row ever leaves the cluster.
  *
  * Semantics: `edges` is a FOREST/tree (each child one parent); on a
  * DAG a node is emitted once per distinct path, like the SQL recursive
  * CTE it mirrors. A cycle would never drain the frontier, so the
  * `maxDepth` cap fails loudly instead of looping forever. Frontiers
  * are localCheckpointed per round (the iterative-lineage discipline,
  * see [[ConnectedComponents]], [[PageRank]]).
  */
object Bfs {

  /** (node, root, depth) for every node reachable from `roots` —
    * roots themselves at depth 0. */
  def levels(edges: DataFrame, parentCol: String, childCol: String,
      roots: DataFrame, rootCol: String, maxDepth: Int = 100): DataFrame = {
    val e = edges
      .select(col(parentCol).cast("long").as("p"),
        col(childCol).cast("long").as("c"))
      .localCheckpoint(true)
    var frontier = roots
      .select(col(rootCol).cast("long").as("node"),
        col(rootCol).cast("long").as("root"), lit(0L).as("depth"))
      .localCheckpoint(true)
    var out = frontier
    var depth = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0 && depth < maxDepth) {
      frontier = e.join(frontier, e("p") === frontier("node"))
        .select(col("c").as("node"), col("root"),
          (col("depth") + 1).as("depth"))
        .localCheckpoint(true)
      frontierSize = frontier.count()
      if (frontierSize > 0) out = out.unionByName(frontier)
      depth += 1
    }
    require(frontierSize == 0,
      s"frontier still alive after $maxDepth levels — cycle or maxDepth too small")
    out
  }
}
