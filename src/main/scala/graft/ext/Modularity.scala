package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a community assignment over an undirected
  * graph: Q = Σ_c (L_c/m − (d_c/2m)²), the standard quality score for
  * community structure (Newman & Girvan 2004) — the number every
  * community-detection run (e.g. [[LabelProp]]'s output) should be
  * judged by before anyone trusts its clusters.
  *
  * Edge contract: edges are UNDIRECTED — opposite directions and exact
  * duplicates collapse to one canonical (min,max) edge, self-loops are
  * dropped. Every assigned node contributes (isolated nodes carry
  * degree 0 and a zero q term); nodes appearing in edges but missing
  * from the assignment are ignored, matching the join semantics a
  * partial clustering implies.
  *
  * Scale: two hash aggregations (canonical-edge distinct, degree
  * count) and two node-keyed equi-joins — everything shuffles on node
  * or community keys, nothing is ever all-pairs; the only driver
  * scalar is the edge count m. Per-community arithmetic uses exact
  * long counts, then a fixed-shape double derivation (L/m and the
  * squared degree ratio) that replays bit-identically in SQL.
  */
object Modularity {

  /** Per-community modularity terms: (comm, n_nodes, deg_sum,
    * internal_edges, q). Total modularity = SUM(q). */
  def score(edges: DataFrame, srcCol: String, dstCol: String,
      assign: DataFrame, nodeCol: String, commCol: String): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val m = und.count()
    require(m > 0, "modularity needs at least one non-loop edge")
    val nodeComm = assign.select(col(nodeCol).as("node"), col(commCol).as("comm"))
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val degC = nodeComm.join(deg, Seq("node"), "left")
      .groupBy(col("comm"))
      .agg(count(lit(1)).as("n_nodes"),
        coalesce(sum(col("dg")), lit(0L)).as("deg_sum"))
    val internal = und
      .join(nodeComm.select(col("node").as("a"), col("comm").as("ca")), "a")
      .join(nodeComm.select(col("node").as("b"), col("comm").as("cb")), "b")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("comm")).agg(count(lit(1)).as("internal"))
    val md = lit(m.toDouble)
    val ratio = col("deg_sum").cast("double") / (lit(2.0) * md)
    degC.join(internal, Seq("comm"), "left")
      .select(col("comm"), col("n_nodes"), col("deg_sum"),
        coalesce(col("internal"), lit(0L)).as("internal_edges"),
        (coalesce(col("internal"), lit(0L)).cast("double") / md -
          ratio * ratio).as("q"))
  }

  /** Total modularity Q as a 1-row frame (column `q_total`). */
  def total(edges: DataFrame, srcCol: String, dstCol: String,
      assign: DataFrame, nodeCol: String, commCol: String): DataFrame =
    score(edges, srcCol, dstCol, assign, nodeCol, commCol)
      .agg(sum(col("q")).as("q_total"))
}
