package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an edge list — the standard graph-health /
  * community-density statistic (clustering coefficients, spam-graph
  * detection) next to [[PageRank]]'s centrality.
  *
  * Algorithm: compact-forward with DEGREE orientation (Latapy, TCS 2008
  * — public). Edges canonicalize to undirected distinct pairs, then
  * orient from the (degree, id)-smaller endpoint to the larger. Every
  * triangle has exactly one node with two out-edges in this orientation,
  * so it is found exactly once by: wedge = two out-edges of u, confirmed
  * by the oriented edge (v, w).
  *
  * Scale shape: two equi-joins and a hash aggregation — and the degree
  * orientation is what makes the wedge join survive skew: a hub of
  * degree d contributes wedges only for its LOWER-degree out-neighbors,
  * bounding wedge count by O(Σ out_deg²) with out-degrees ≤ √(2·E) on
  * any graph, instead of the O(d²) a naive id-orientation pays on the
  * hub (the star-graph worst case: id-oriented = (d choose 2) wedges on
  * node 0, degree-oriented = 0). Self-loops and duplicate/reverse edges
  * are removed up front, so multigraph inputs count each triangle once.
  */
object Triangles {

  /** Oriented edge frame (u → v by (degree, id) order) from a possibly
    * directed multigraph edge list. */
  private def orient(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    und
      .join(deg.select(col("node").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("dg").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("v"))
  }

  /** Per-node triangle participation: (node, triangles), nodes in no
    * triangle absent. Sum of `triangles` = 3 × total triangle count. */
  def perNode(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val o = orient(edges, srcCol, dstCol)
    val tri = o.select(col("u"), col("v").as("x"))
      .join(o.select(col("u"), col("v").as("y")), "u")
      .filter(col("x") =!= col("y"))
      .join(o.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"),
        "left_semi")
    tri.select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }
}
