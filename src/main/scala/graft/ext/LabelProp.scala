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
}
