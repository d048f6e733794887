package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan et al.
  * 2007) over an undirected edge list — the cheap modularity-free
  * community pass for near-dup neighborhoods, user-interaction groups,
  * and domain-link clusters, where [[ConnectedComponents]] is too coarse
  * (one giant component) and modularity solvers are too expensive.
  *
  * Every node starts with its own id as label; each round every node
  * adopts the most frequent label among its NEIGHBORS (not itself),
  * ties broken by the smaller label — a fully deterministic, engine-
  * replayable rule (the classic randomized async variant converges
  * faster but is unreproducible by construction; a FIXED round count
  * with deterministic ties is the portable contract, and sidesteps the
  * known 2-cycle oscillation of synchronous LP).
  *
  * Per-round shape at scale: one node-keyed equi-join of labels onto the
  * symmetrized edges, one (node, label) count hash-aggregation, one
  * per-node argmax window (partitioned by node — never global), one left
  * join back: O(|E|) shuffle per round, labels localCheckpointed to cut
  * lineage (the [[ConnectedComponents]]/[[PageRank]] discipline).
  */
object LabelProp {

  /** (node, label) after exactly `rounds` synchronous updates. Isolated
    * self-loops and duplicate edges are scrubbed; a node with no
    * neighbors keeps its own label. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionAll(edges
        .select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    val w = Window.partitionBy(col("node2"))
      .orderBy(col("cnt").desc, col("label2"))
    for (_ <- 1 to rounds) {
      val counts = sym.join(labels, sym("a") === labels("node"))
        .groupBy(col("b").as("node2"), col("label").as("label2"))
        .agg(count(lit(1)).as("cnt"))
      val pick = counts
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("node2"), col("label2"))
      labels = labels.join(pick, labels("node") === col("node2"), "left")
        .select(col("node"), coalesce(col("label2"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    labels
  }

  /** [[run]] over a WEIGHTED edge list: neighbor votes sum edge weight
    * instead of counting edges (ties still to the smaller label). The
    * voter a coarse/contracted graph needs — same per-round O(|E|)
    * shuffle shape, same neighbor-only semantics (including the
    * documented isolated-PAIR oscillation: two nodes joined only to
    * each other swap labels each round; even round counts return them
    * to themselves — [[multilevel]] callers wanting pair merges add a
    * third party or accept singleton communities there). Parallel
    * edges fold by weight sum during symmetrization. */
  def runWeighted(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, rounds: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val pick3 = (s: String, d: String) => Seq(
      col(s).cast("long").as("a"), col(d).cast("long").as("b"),
      col(weightCol).cast("long").as("w"))
    val sym = edges.select(pick3(srcCol, dstCol): _*)
      .unionAll(edges.select(pick3(dstCol, srcCol): _*))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    val w = Window.partitionBy(col("node2"))
      .orderBy(col("ws").desc, col("label2"))
    for (_ <- 1 to rounds) {
      val votes = sym.join(labels, sym("a") === labels("node"))
        .groupBy(col("b").as("node2"), col("label").as("label2"))
        .agg(sum(col("w")).as("ws"))
      val pick = votes
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("node2"), col("label2"))
      labels = labels.join(pick, labels("node") === col("node2"), "left")
        .select(col("node"), coalesce(col("label2"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Contract a graph by a community assignment (the Louvain phase-2
    * coarsening, Blondel et al. 2008 §2): communities become nodes,
    * and each coarse edge carries the COUNT of original undirected
    * edges between its two communities as `weight` (canonical
    * `src < dst`; intra-community edges drop). Two node-keyed joins +
    * one hash-agg — O(|E|), nothing all-pairs. */
  def contract(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, nodeCol: String = "node",
      labelCol: String = "label"): DataFrame = {
    val und = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val la = labels.select(col(nodeCol).cast("long").as("a"),
      col(labelCol).cast("long").as("__ca"))
    val lb = labels.select(col(nodeCol).cast("long").as("b"),
      col(labelCol).cast("long").as("__cb"))
    und.join(la, "a").join(lb, "b")
      .filter(col("__ca") =!= col("__cb"))
      .groupBy(least(col("__ca"), col("__cb")).as("src"),
        greatest(col("__ca"), col("__cb")).as("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Two-level community detection — the Louvain multilevel skeleton
    * with label propagation as the local mover: [[run]] finds level-1
    * communities, [[contract]] coarsens the graph to weighted
    * community-to-community edges, [[runWeighted]] groups the
    * communities, and every node inherits its community's level-2
    * label (communities with no external edges never reach the coarse
    * graph and keep their level-1 label). Picks up structure one LP
    * pass misses — groups of small communities joined by bridge
    * edges — at the cost of one contraction (O(|E|)) plus LP over the
    * (much smaller) coarse graph. */
  def multilevel(edges: DataFrame, srcCol: String, dstCol: String,
      rounds1: Int = 4, rounds2: Int = 2): DataFrame = {
    val l1 = run(edges, srcCol, dstCol, rounds1)
    val coarse = contract(edges, srcCol, dstCol, l1)
    val l2 = runWeighted(coarse, "src", "dst", "weight", rounds2)
    l1.join(l2.select(col("node").as("__cn"), col("label").as("__cl")),
        l1("label") === col("__cn"), "left")
      .select(col("node"), coalesce(col("__cl"), col("label")).as("label"))
  }
}
