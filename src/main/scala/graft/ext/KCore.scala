package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (the maximal subgraph where every node keeps
  * degree >= k) by iterative peeling — the graph-curation screen that
  * separates a structurally dense community from the tendrils hanging
  * off it (spam follower chains, single-link citation tails, scraped
  * link farms all peel away; genuinely interlinked cores survive).
  *
  * Peeling is the textbook fixpoint: drop every node whose current
  * degree is below k, recompute degrees, repeat until nothing drops.
  * Each round is one node-keyed degree hash-aggregation plus two
  * semi-joins restricting the edge list to surviving endpoints — O(|E|)
  * shuffle per round, all partitioned by node id, nothing ever
  * materializes on the driver (the convergence check is the scalar
  * surviving-node count). Rounds needed equal the peel depth (bounded
  * by the graph's degeneracy ordering depth — shallow for social/link
  * graphs); the edge list is localCheckpointed each round to cut the
  * growing lineage, the same iterative discipline as
  * [[ConnectedComponents]] / [[PageRank]] / [[KMeans]].
  *
  * Engine-portability: degrees are exact integer counts and the peel
  * predicate an integer compare, so every engine peels the identical
  * node set every round — the whole decomposition replays with no
  * tolerance anywhere.
  */
object KCore {

  /** Nodes of the k-core with their degree INSIDE the core subgraph.
    * Edges are undirected; self-loops and duplicate edges are scrubbed
    * first. Empty result when no k-core exists. Fails loudly if the
    * peel hasn't converged within `maxIter` rounds (each round removes
    * at least one node, so maxIter bounds only pathological chains). */
  def run(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIter: Int = 100): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    var sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionAll(edges
        .select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var prevNodes = sym.select(col("a")).distinct().count()
    var removed = if (prevNodes == 0) 0L else 1L
    var iter = 0
    while (removed > 0 && iter < maxIter) {
      val keep = sym.groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("a"))
      val next = sym.join(keep, Seq("a"), "left_semi")
        .join(keep.select(col("a").as("b")), Seq("b"), "left_semi")
        .localCheckpoint(true)
      val keptNodes = next.select(col("a")).distinct().count()
      removed = prevNodes - keptNodes
      prevNodes = keptNodes
      sym = next
      iter += 1
    }
    require(removed == 0, s"peel did not converge within $maxIter rounds")
    sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
  }
}
