package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the generic graph
  * clustering primitive behind dedup-cluster resolution, entity linkage,
  * and near-dup graph analysis ([[Dedup]] carries a specialized copy of
  * this policy for its pair graphs; this is the standalone operator for
  * arbitrary edges).
  *
  * Min-label propagation to convergence: every node starts labeled with
  * its own id; each round replaces the label by the minimum over itself
  * and its neighbors; a fixed point assigns every node the minimum node
  * id reachable from it — a canonical, engine-replayable component id.
  *
  * Per-iteration shape at scale: one node-keyed equi-join of labels onto
  * the symmetrized edges, one min-aggregate by the other endpoint, one
  * left join back — all hash joins/aggs partitioned by node id, O(|E|)
  * shuffle per round, no driver materialization. Rounds needed equal
  * the largest component's diameter; the convergence check is a 1-row
  * count of changed labels per round (the driver sees one scalar, never
  * data). Labels are localCheckpointed each round to cut the growing
  * lineage — the standard iterative-algorithm discipline on Spark
  * (see also [[PageRank]], [[KMeans]]).
  */
object ConnectedComponents {

  /** (node, comp) for every node appearing as an edge endpoint; `comp`
    * is the minimum reachable node id. Edges are treated as undirected;
    * self-loops and duplicates are scrubbed before iterating. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionAll(edges
        .select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val neighborMin = sym.join(labels, sym("a") === labels("node"))
        .groupBy(col("b").as("node2"))
        .agg(min(col("comp")).as("nmin"))
      val next = labels.join(neighborMin, labels("node") === col("node2"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          (col("nmin") < col("comp")).as("__moved"))
      val mat = next.localCheckpoint(true)
      changed = mat.filter(col("__moved")).count()
      labels = mat.drop("__moved")
      iter += 1
    }
    require(changed == 0, s"did not converge within $maxIter iterations")
    labels
  }
}
