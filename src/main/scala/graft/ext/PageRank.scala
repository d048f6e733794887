package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank over an edge list — graph centrality for corpus
  * curation (domain/link authority as a quality prior, hub detection in
  * citation or near-dup graphs). Standard power iteration
  * (Brin & Page 1998), expressed entirely as joins + aggregations:
  *
  *   pr'(v) = (1-d)/N + d * ( Σ_{u→v} pr(u)/outdeg(u) + dangling/N )
  *
  * Per-iteration shape at scale: one node-keyed join attaching
  * (pr, outdeg), one edge join shuffling contributions by dst, one
  * hash-aggregate per dst, and a 1-row dangling-mass aggregate that
  * broadcasts — per-iteration cost is O(|E|) shuffle with no driver
  * materialization (N rides as a broadcast 1-row count, never a
  * collect).
  *
  * Determinism (the property that lets the gate replay training in SQL):
  * per-edge contributions pr/outdeg are IEEE quotients of identical
  * operands on any engine; the per-dst sum — the one order-dependent
  * step — TRUNCATES each contribution to integer units of 10^-`quantize`
  * (`floor(c * scale)` as LONG) and sums exact integers, so the sum is
  * partition-order-independent. floor, not round: rounding a double to
  * decimals diverges across engines when the value's shortest decimal
  * repr sits exactly on a .5 boundary its binary value is just below
  * (observed 20/400 nodes here) — floor of the same double is the same
  * everywhere, no decimal interpretation involved. Multi-edges
  * contribute once per edge row (multigraph semantics); self-loops feed
  * their own rank back; truncation shrinks total mass by < |E| * 10^-12
  * per iteration. */
object PageRank {

  /** (node, pr) after `iters` power iterations from the uniform start.
    * `edges` needs (src, dst) columns; isolated nodes must appear as
    * some edge endpoint to exist at all (an edge list has no other
    * witness of them).
    *
    * Each iteration's rank frame is localCheckpointed (the
    * [[ConnectedComponents]]/[[LabelProp]] iterative-lineage
    * discipline): the next round references it THREE times (edge
    * contributions, the dangling-mass aggregate, and the rank join),
    * so an unmaterialized chain re-plans and re-executes a subtree
    * that triples per round — 3^iters leaf copies by the final action
    * (measured locally: 6.0 s -> 1.0 s at sf0.1 for iters = 3; the
    * blowup is exponential in `iters`, so at production depths the
    * unmaterialized form is not merely slow but unrunnable). The
    * numerics are untouched: quantized integer sums are partition-
    * order-independent, so checkpointed and chained plans produce
    * bit-identical ranks. */
  def run(edges: DataFrame, iters: Int = 3, damping: Double = 0.85,
      quantize: Int = 12, eager: Boolean = false): DataFrame = {
    require(iters > 0 && damping > 0 && damping < 1, "bad pagerank params")
    require(quantize >= 6 && quantize <= 15,
      "quantize in [6, 15]: units must resolve 1/N rank yet stay inside long/double exactness")
    val scale = math.pow(10.0, quantize) // exact powers of ten up to 1e15
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // outdeg rides ON the rank table (NULL = dangling): the per-round
    // outdeg join and the dangling anti-join both become free — the
    // numerics are untouched (same quotients, same floor sums)
    val pr0 = nodes.crossJoin(nRow)
      .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), (lit(1.0) / col("n")).as("pr"), col("n"), col("od"))
      .localCheckpoint(true)
    val prFinal = (1 to iters).foldLeft(pr0) { (pr, _) =>
      // per-edge contributions, summed per dst in exact integer units
      val contribs = pr.filter(col("od").isNotNull)
        .select(col("node").as("src"), (col("pr") / col("od")).as("c"))
        .join(e, "src")
        .groupBy(col("dst"))
        .agg(sum(floor(col("c") * lit(scale)).cast("long")).as("s"))
      // dangling mass: rank parked on nodes with no out-edges, spread
      // uniformly — a 1-row aggregate that broadcasts
      val dangling = broadcast(
        pr.filter(col("od").isNull)
          .agg(coalesce(sum(floor(col("pr") * lit(scale)).cast("long")),
            lit(0L)).as("dang")))
      pr.select(col("node"), col("n"), col("od"))
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          ((lit(1.0) - lit(damping)) / col("n") +
            lit(damping) * (coalesce(col("s"), lit(0L)).cast("double") / lit(scale) +
              col("dang").cast("double") / lit(scale) / col("n"))).as("pr"),
          col("n"), col("od"))
        .localCheckpoint(true)
    }
    val out = prFinal.select(col("node"), col("pr"))
    Dedup.finishEager(out, eager, Seq(e, nodes, outdeg))
  }

  /** Personalized PageRank (random walk with restart to a ROOT set):
    * teleport and dangling mass return uniformly to `roots` instead of
    * all nodes, so rank measures proximity to the roots — "related
    * pages/domains/entities from these seeds", the graph-side
    * recommender that complements embedding neighbors. Same
    * per-iteration shape, quantization discipline, and determinism
    * contract as [[run]]; the only new state is a boolean root flag
    * carried on the rank table (roots with no edges still anchor
    * teleport — they enter the node set explicitly).
    *
    *   pr'(v) = d·Σ_{u→v} pr(u)/outdeg(u)
    *          + [v∈R]·( (1−d)/|R| + d·dangling/|R| )
    */
  def personalized(edges: DataFrame, roots: DataFrame, rootCol: String,
      iters: Int = 3, damping: Double = 0.85, quantize: Int = 12,
      eager: Boolean = false): DataFrame = {
    require(iters > 0 && damping > 0 && damping < 1, "bad pagerank params")
    require(quantize >= 6 && quantize <= 15, "quantize in [6, 15]")
    val scale = math.pow(10.0, quantize)
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val r = roots.select(col(rootCol).cast("long").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .unionAll(r.select(col("node"))).distinct()
      .join(r.withColumn("__isr", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__isr"), lit(false)).as("in_r"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rRow = broadcast(r.agg(count(lit(1)).as("r")))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val pr0 = nodes.crossJoin(rRow)
      .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), col("in_r"),
        when(col("in_r"), lit(1.0) / col("r")).otherwise(lit(0.0)).as("pr"),
        col("r"), col("od"))
      .localCheckpoint(true)
    val prFinal = (1 to iters).foldLeft(pr0) { (pr, _) =>
      val contribs = pr.filter(col("od").isNotNull)
        .select(col("node").as("src"), (col("pr") / col("od")).as("c"))
        .join(e, "src")
        .groupBy(col("dst"))
        .agg(sum(floor(col("c") * lit(scale)).cast("long")).as("s"))
      val dangling = broadcast(
        pr.filter(col("od").isNull)
          .agg(coalesce(sum(floor(col("pr") * lit(scale)).cast("long")),
            lit(0L)).as("dang")))
      pr.select(col("node"), col("in_r"), col("r"), col("od"))
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(dangling)
        .select(col("node"), col("in_r"),
          (lit(damping) *
            (coalesce(col("s"), lit(0L)).cast("double") / lit(scale)) +
            when(col("in_r"),
              (lit(1.0) - lit(damping)) / col("r") +
                lit(damping) * (col("dang").cast("double") / lit(scale) / col("r")))
              .otherwise(lit(0.0))).as("pr"),
          col("r"), col("od"))
        .localCheckpoint(true)
    }
    val out = prFinal.select(col("node"), col("pr"))
    Dedup.finishEager(out, eager, Seq(e, r, nodes, outdeg))
  }
}
