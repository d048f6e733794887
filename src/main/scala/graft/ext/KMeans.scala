package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed Lloyd k-means over an embedding column — the semantic-
  * clustering step of a training-data curation pipeline (cluster-balanced
  * sampling, topic discovery, coverage audits), and the scale path past
  * `Ivf.trainCentroids`' bounded driver-side sample: every phase here is
  * a DataFrame transform, so the full 100 TB corpus participates in
  * training.
  *
  * Per-iteration shape (the part that must survive 1000 executors):
  *  - **Assignment is shuffle-free.** Centroids are collapsed to ONE row
  *    (a sorted array of (cid, vec) structs, at most k*dim doubles) and
  *    cross-joined broadcast onto the corpus — row count multiplies by 1,
  *    not k. The per-row argmin runs inside whole-stage codegen as nested
  *    higher-order functions: `transform` over the k centroids computing
  *    a squared-L2 `aggregate` fold, then `array_min` on (dist, cid)
  *    structs — lowest distance, ties to the lowest cid, no UDF.
  *  - **Update is one hash-aggregate** keyed by (cid, dim): at most
  *    k*dim groups regardless of corpus size, map-side partials do the
  *    heavy lifting (same shape as [[Similarity.centroids]], which it
  *    reuses — including the quantized-decimal sum that makes centroid
  *    components bit-reproducible across partitionings and engines).
  *
  * Determinism (what lets a SQL engine replay training exactly):
  * seeds are the k rows with the smallest `md5(id)` — a deterministic
  * pseudo-random draw any engine reproduces; distance folds run in
  * array-index order; centroid means are exact decimal sums divided
  * unrounded (see centroids()); argmin ties break on cid. A cluster that
  * loses all members simply drops out of later iterations (both here and
  * in a GROUP BY replay — no special casing).
  *
  * The input is persisted (scanned `iters`+1 times) and released before
  * returning; pass `eager = true` for the materialize-then-unpersist
  * service contract (see [[Dedup.finishEager]] — localCheckpoint caveat
  * applies).
  *
  * Reference scope: the reference has no clustering (its engine is
  * MySQL); this is a §2.5 beyond-parity operator for the 100 TB
  * north star.
  */
object KMeans {

  private[ext] def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** One row: `cents` = array of (cid, cvec) structs sorted by cid. */
  private def packed(cents: DataFrame): DataFrame =
    cents.agg(array_sort(collect_list(struct(col("cid"), col("cvec"))))
      .as("cents"))

  /** Nearest-centroid id for `vec` against the packed `cents` column. */
  private def nearest(vec: Column): Column =
    array_min(transform(col("cents"), c =>
      struct(sqDist(vec, c.getField("cvec")).as("d"),
        c.getField("cid").as("cid")))).getField("cid")

  /** Corpus with a `cid` column: broadcast the packed centroids, argmin
    * per row — no shuffle, no row multiplication. */
  private def assign(points: DataFrame, cents: DataFrame): DataFrame =
    points.crossJoin(broadcast(packed(cents)))
      .withColumn("cid", nearest(col("v"))).drop("cents")

  /** (cid, cvec) rows from per-(cid, dim) quantized-decimal means. */
  private def update(assigned: DataFrame): DataFrame =
    Similarity.centroids(assigned, "cid", "v")
      .groupBy(col("grp").as("cid"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("cvec"))
      .select(col("cid"), col("cvec"))

  /** Persisted (id, v) points plus the post-training assignment frame:
    * the shared core of [[fit]] and [[fitAssign]]. */
  private def trainedAssignment(df: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(k > 0 && iters > 0, s"k=$k iters=$iters must be positive")
    val points = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // deterministic pseudo-random seed draw: k smallest md5(id) —
    // orderBy+limit compiles to TakeOrderedAndProject (never a global
    // sort); cid = seed rank, assigned on the k-row result
    val seeds = points
      .withColumn("h", md5(col("id").cast("string")))
      .orderBy(col("h"), col("id")).limit(k)
    val c0 = seeds.select(
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("h"), col("id"))) - 1).cast("long").as("cid"),
      transform(col("v"), x => x.cast("double")).as("cvec"))
    // iters-1 full rounds, then one final assignment that feeds BOTH the
    // last centroid update and the cluster sizes — one pass, not two
    val cPre = (1 until iters).foldLeft(c0) { (c, _) =>
      update(assign(points, c))
    }
    (points, assign(points, cPre))
  }

  /** Run `iters` Lloyd iterations from md5-seeded centroids.
    * Output: one row per (cid, dim) with the final centroid component
    * `c` and the final cluster size `n` — row form keeps the result
    * columnar for downstream joins (and hashable by the oracle). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 2, eager: Boolean = false): DataFrame = {
    val (points, aFinal) = trainedAssignment(df, idCol, vecCol, k, iters)
    val cFinal = update(aFinal)
    val sizes = aFinal.groupBy(col("cid")).agg(count(lit(1)).as("n"))
    val out = cFinal
      .select(col("cid"), posexplode(col("cvec")).as(Seq("dim", "c")))
      .join(broadcast(sizes), "cid")
      .select(col("cid"), col("dim").cast("long").as("dim"), col("c"),
        col("n"))
    Dedup.finishEager(out, eager, Seq(points))
  }

  /** The per-point view of the same training run: (id, v, cid) after
    * `iters` iterations — what cluster-scoped downstream passes (e.g.
    * [[Dedup.semanticDedup]], cluster-balanced sampling) consume. Same
    * seeds, same argmin, same arithmetic as [[fit]], so a SQL engine
    * that replays training replays this assignment too. */
  def fitAssign(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 2, eager: Boolean = false): DataFrame = {
    val (points, aFinal) = trainedAssignment(df, idCol, vecCol, k, iters)
    val out = aFinal.select(col("id"), col("v"), col("cid"))
    Dedup.finishEager(out, eager, Seq(points))
  }

  /** Cluster-quality scorecard for a training run: per final cluster,
    * its size, EXACT inertia (micro-quantized sum of squared point-to-
    * own-centroid distances — the k-selection elbow statistic), and the
    * simplified silhouette (Hruschka '04: b = distance to the SECOND-
    * nearest centroid instead of the O(n²) mean-to-other-cluster form —
    * the only silhouette that is computable at corpus scale, O(n·k)).
    * This is the measurement the clustering consumers ([[Dedup.semanticDedup]]'s
    * cluster scoping, [[Ivf]]/[[Pq]] list balance, cluster-balanced
    * sampling) were shipped without: a k nobody scored is a guess.
    *
    * Same training, same arithmetic as [[fit]] (md5 seeds, argmin ties
    * to the lower cid), then ONE extra broadcast pass: each point's
    * distances to all k FINAL centroids (the [[fit]] output book),
    * sorted (d, cid) — element 1 is the own assignment, element 2 the
    * second-nearest. Per point, silhouette s = (b−a)/max(a,b) over
    * EUCLIDEAN (sqrt'd) distances, floor-quantized to micro units;
    * per-cluster sums are exact longs, the mean a display double of
    * identical operands on any engine. A point sitting exactly on two
    * identical centroids (max(a,b) = 0) scores s = 0 — the documented
    * convention, not a divide crash. Requires k ≥ 2 (no second
    * centroid exists otherwise); if training itself COLLAPSES to one
    * surviving cluster, no second centroid exists at scoring time
    * either — a point at positive distance then scores a NULL
    * silhouette term (skipped by the sum), one sitting exactly on the
    * centroid scores 0 via the max(a,b)=0 convention, and n/inertia
    * stay exact throughout (try_element_at, never an ANSI index
    * crash).
    *
    * Output: (cid, n, inertia_micro, sil_sum_micro, sil_mean),
    * one row per surviving cluster. */
  def clusterQuality(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 2, eager: Boolean = false): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2, got $k")
    val (points, aFinal) = trainedAssignment(df, idCol, vecCol, k, iters)
    val cFinal = update(aFinal)
    val ds = array_sort(transform(col("cents"), c =>
      struct(sqDist(col("v"), c.getField("cvec")).as("d"),
        c.getField("cid").as("cid"))))
    val perPoint = points.crossJoin(broadcast(packed(cFinal)))
      .select(col("id"), ds.as("ds"))
      .select(col("id"),
        element_at(col("ds"), 1).getField("cid").as("cid"),
        element_at(col("ds"), 1).getField("d").as("down"),
        sqrt(element_at(col("ds"), 1).getField("d")).as("a"),
        // try_: a collapsed single-cluster book has no second entry —
        // NULL silhouette per the scaladoc, not an ANSI index crash
        sqrt(try_element_at(col("ds"), lit(2)).getField("d")).as("b"))
      .select(col("cid"),
        floor(col("down") * lit(1e6)).cast("long").as("im"),
        when(greatest(col("a"), col("b")) > 0.0,
          floor((col("b") - col("a")) / greatest(col("a"), col("b"))
            * lit(1e6)).cast("long"))
          .otherwise(0L).as("sm"))
    val out = perPoint.groupBy(col("cid"))
      .agg(count(lit(1)).as("n"),
        sum(col("im")).as("inertia_micro"),
        sum(col("sm")).as("sil_sum_micro"))
      .withColumn("sil_mean",
        col("sil_sum_micro").cast("double") /
          (col("n").cast("double") * lit(1e6)))
    Dedup.finishEager(out, eager, Seq(points))
  }

  // ----- grouped training: G independent k-means in ONE job DAG -----

  /** Per-group packed centroids: (g, cents) with cents sorted by cid —
    * G×k rows total, broadcastable. */
  private def packedG(cents: DataFrame): DataFrame =
    cents.groupBy(col("g"))
      .agg(array_sort(collect_list(struct(col("cid"), col("cvec"))))
        .as("cents"))

  /** Assignment for grouped training: broadcast-join each point to ITS
    * group's packed centroids, then the same codegen argmin as
    * [[assign]] — still no row multiplication, one broadcast for all
    * groups. */
  private def assignG(points: DataFrame, cents: DataFrame): DataFrame =
    points.join(broadcast(packedG(cents)), "g")
      .withColumn("cid", nearest(col("v"))).drop("cents")

  /** Update for grouped training: one hash-aggregate keyed by
    * (g, cid, dim) — the [[Similarity.centroids]] decimal-sum machinery
    * with a struct group key, so each (g, cid) group's arithmetic is
    * bit-identical to the single-group [[update]] over the same rows. */
  private def updateG(assigned: DataFrame): DataFrame =
    Similarity.centroids(
        assigned.withColumn("__gc", struct(col("g"), col("cid"))),
        "__gc", "v")
      .groupBy(col("grp").getField("g").as("g"),
        col("grp").getField("cid").as("cid"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("cvec"))

  /** G independent Lloyd trainings — one per distinct value of `grpCol`
    * — executed as ONE job DAG: every phase (seed draw, broadcast
    * argmin, centroid update) keys on the group column instead of
    * running G separate [[fit]] DAGs. The at-scale win is at the
    * training front: G per-fit persists each scan the source once (G
    * corpus scans), the grouped form scans once and persists one frame
    * of the same total bytes; per-iteration bytes and shuffle key
    * counts are otherwise equal, and wall-clock measures within host
    * noise locally (AQE runs unioned fits' stages concurrently).
    * The seed draw is a per-group rank window with a literal bound, so
    * WindowGroupLimit prunes it map-side — never a full per-group sort.
    *
    * Bit-equivalence contract: for each group, seeds are the k rows
    * with the smallest md5(id) WITHIN the group (a per-group window —
    * identical to [[fit]]'s orderBy+limit draw on the group's rows),
    * the argmin scans the same centroid set in the same order, and the
    * decimal centroid sums aggregate the same row sets — so the output
    * for group g equals `fit(df.filter(g), …)` exactly, and a SQL
    * engine replaying per-group training reproduces it.
    *
    * Vector lengths may differ across groups (e.g. PQ subspace slices
    * of uneven width plus a full-width coarse group) — nothing here
    * assumes a shared dimension. Output: (g, cid, dim, c, n). */
  def fitGrouped(df: DataFrame, grpCol: String, idCol: String,
      vecCol: String, k: Int, iters: Int = 2, eager: Boolean = false)
      : DataFrame = {
    require(k > 0 && iters > 0, s"k=$k iters=$iters must be positive")
    val points = df.select(col(grpCol).as("g"),
        col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"), col("id"))
    val c0 = points
      .withColumn("h", md5(col("id").cast("string")))
      .withColumn("r", row_number().over(sw))
      .filter(col("r") <= k)
      .select(col("g"), (col("r") - 1).cast("long").as("cid"),
        transform(col("v"), x => x.cast("double")).as("cvec"))
    val cPre = (1 until iters).foldLeft(c0) { (c, _) =>
      updateG(assignG(points, c))
    }
    val aFinal = assignG(points, cPre)
    val cFinal = updateG(aFinal)
    val sizes = aFinal.groupBy(col("g"), col("cid"))
      .agg(count(lit(1)).as("n"))
    val out = cFinal
      .select(col("g"), col("cid"),
        posexplode(col("cvec")).as(Seq("dim", "c")))
      .join(broadcast(sizes), Seq("g", "cid"))
      .select(col("g"), col("cid"), col("dim").cast("long").as("dim"),
        col("c"), col("n"))
    Dedup.finishEager(out, eager, Seq(points))
  }
}
