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
  *  - **Assignment is shuffle-free.** The centroid book (at most k*dim
  *    doubles — the MODEL) rides as a literal in the task closure; the
  *    per-row argmin runs as nested higher-order functions: `transform`
  *    over the k centroids computing a squared-L2 `aggregate` fold,
  *    then `array_min` on (dist, cid) structs — lowest distance, ties
  *    to the lowest cid, no UDF, no exchange of any kind.
  *  - **Update is one hash-aggregate** keyed by (cid, dim): at most
  *    k*dim groups regardless of corpus size, map-side partials do the
  *    heavy lifting (same shape as [[Similarity.centroids]], which it
  *    reuses — including the quantized-decimal sum that makes centroid
  *    components bit-reproducible across partitionings and engines).
  *    The aggregate COLLECTS to the driver as the next round's book —
  *    k*dim bounded rows per iteration, the Spark-MLlib discipline
  *    (the data itself never funnels anywhere). The previous
  *    all-DataFrame round (per-cid collect_list, a 1-row pack
  *    aggregate, a broadcast exchange) moved the same k*dim doubles
  *    but paid three extra sequential stage round-trips per iteration
  *    and grew the query plan with every round.
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

  /** A collected centroid book: (cid, components) sorted by cid — the
    * bounded k×dim MODEL, the only thing that ever reaches the driver. */
  private type Book = Array[(Long, Array[Double])]

  /** The book as an array-of-(cid, cvec)-structs LITERAL, ordered by
    * cid — the same rows, in the same order, as the old
    * `array_sort(collect_list(struct(cid, cvec)))` broadcast frame, so
    * the argmin scan below is expression-for-expression unchanged. */
  private def bookLit(book: Book): Column =
    array(book.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), typedlit(cv.toSeq).as("cvec")) }: _*)

  /** Nearest-centroid id for `vec` against a centroid-book column. */
  private def nearest(vec: Column, cents: Column): Column =
    array_min(transform(cents, c =>
      struct(sqDist(vec, c.getField("cvec")).as("d"),
        c.getField("cid").as("cid")))).getField("cid")

  /** Corpus with a `cid` column: centroids ride as a literal, argmin
    * per row — no shuffle, no row multiplication, no exchange at all. */
  private def assign(points: DataFrame, book: Book): DataFrame =
    points.withColumn("cid", nearest(col("v"), bookLit(book)))

  /** Collect the flat (grp, dim, c) centroid frame into a [[Book]]:
    * one bounded k×dim driver round-trip per Lloyd iteration — the
    * shape Spark's own MLlib KMeans uses. vs the previous
    * all-DataFrame chain (per-cid collect_list + 1-row pack + broadcast
    * exchange per iteration, three exchanges each round): the model is
    * k×dim doubles either way, but the chained form paid 3 extra
    * sequential stage round-trips per iteration and grew the plan with
    * every round. Same decimal sums, same values, same cid order —
    * training is bit-identical (the replay oracles pin it). */
  private def collectBook(flat: DataFrame): Book = {
    val rows = flat.select(col("grp").cast("long"), col("dim").cast("long"),
      col("c")).collect()
    rows.groupBy(_.getLong(0)).toArray.sortBy(_._1).map { case (cid, rs) =>
      val dim = rs.map(_.getLong(1)).max.toInt + 1
      val v = new Array[Double](dim)
      rs.foreach(r => v(r.getLong(1).toInt) = r.getDouble(2))
      (cid, v)
    }
  }

  /** One Lloyd update: per-(cid, dim) quantized-decimal means of the
    * assigned points, collected as the next book. */
  private def update(assigned: DataFrame): Book =
    collectBook(Similarity.centroids(assigned, "cid", "v"))

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
    // sort) and returns rows IN (h, id) ORDER; cid = seed rank
    val seedRows = points
      .withColumn("h", md5(col("id").cast("string")))
      .orderBy(col("h"), col("id")).limit(k)
      .select(transform(col("v"), x => x.cast("double")).as("cvec"))
      .collect()
    val c0: Book = seedRows.zipWithIndex.map { case (r, i) =>
      (i.toLong, r.getSeq[Double](0).toArray) }
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
    // one aggregation serves centroid components AND cluster sizes
    // (the per-(cid, dim) row count IS the cluster size): the final
    // assignment evaluates once, and the old second aggregate + its
    // broadcast join disappear — same decimal sums, identical output
    val out = Similarity.centroidsWithN(aFinal, "cid", "v")
      .select(col("grp").as("cid"), col("dim"), col("c"), col("n"))
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
    val ds = array_sort(transform(bookLit(cFinal), c =>
      struct(sqDist(col("v"), c.getField("cvec")).as("d"),
        c.getField("cid").as("cid"))))
    val perPoint = points
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

  /** Per-group centroid books, collected: the G×k×dim MODEL (books
    * keyed by the group value, each sorted by cid). */
  private type BookG = Seq[(Any, Book)]

  /** The grouped seed draw as a frame — the k smallest md5(id) per
    * group as (g, cid, cvec) rows. A per-group rank window with a
    * LITERAL bound, so WindowGroupLimit prunes it map-side (never a
    * full per-group sort — KMeansSpec pins the plan shape on exactly
    * this frame). */
  private[ext] def groupedSeedFrame(points: DataFrame, k: Int): DataFrame = {
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"), col("id"))
    points
      .withColumn("h", md5(col("id").cast("string")))
      .withColumn("r", row_number().over(sw))
      .filter(col("r") <= k)
      .select(col("g"), (col("r") - 1).cast("long").as("cid"),
        transform(col("v"), x => x.cast("double")).as("cvec"))
  }

  /** Assignment for grouped training: the per-group books ride as ONE
    * map literal keyed by the group value; each row looks up its
    * group's book and runs the same argmin as [[assign]] — no join, no
    * broadcast exchange, no row multiplication. (The old inner
    * broadcast-join dropped rows whose group had no book; a group with
    * points always keeps at least one populated cluster, so the lookup
    * never misses and the result sets are identical.) */
  private def assignG(points: DataFrame, books: BookG): DataFrame = {
    val entries = books.flatMap { case (g, b) => Seq(lit(g), bookLit(b)) }
    points.withColumn("cid",
      nearest(col("v"), element_at(map(entries: _*), col("g"))))
  }

  /** Update for grouped training: one hash-aggregate keyed by
    * (g, cid, dim) — the [[Similarity.centroids]] decimal-sum machinery
    * with a struct group key, so each (g, cid) group's arithmetic is
    * bit-identical to the single-group [[update]] over the same rows —
    * collected as the next round's books (G×k×dim rows, bounded). */
  private def updateG(assigned: DataFrame): BookG = {
    val rows = Similarity.centroids(
        assigned.withColumn("__gc", struct(col("g"), col("cid"))),
        "__gc", "v")
      .select(col("grp").getField("g").as("g"),
        col("grp").getField("cid").cast("long").as("cid"),
        col("dim").cast("long").as("dim"), col("c"))
      .collect()
    rows.groupBy(_.get(0)).toSeq.sortBy(_._1.toString).map { case (g, rs) =>
      val byCid = rs.groupBy(_.getLong(1)).toArray.sortBy(_._1)
        .map { case (cid, cs) =>
          val dim = cs.map(_.getLong(2)).max.toInt + 1
          val v = new Array[Double](dim)
          cs.foreach(r => v(r.getLong(2).toInt) = r.getDouble(3))
          (cid, v)
        }
      (g, byCid: Book)
    }
  }

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
    val c0rows = groupedSeedFrame(points, k)
      .collect() // G×k seed rows — model-scale, never the corpus
    val c0: BookG = c0rows.groupBy(_.get(0)).toSeq.sortBy(_._1.toString)
      .map { case (g, rs) =>
        (g, rs.sortBy(_.getLong(1))
          .map(r => (r.getLong(1), r.getSeq[Double](2).toArray)))
      }
    val cPre = (1 until iters).foldLeft(c0) { (c, _) =>
      updateG(assignG(points, c))
    }
    val aFinal = assignG(points, cPre)
    // same fusion as [[fit]]: centroid components and cluster sizes out
    // of ONE (g, cid, dim)-keyed aggregate over ONE final assignment
    val out = Similarity.centroidsWithN(
        aFinal.withColumn("__gc", struct(col("g"), col("cid"))), "__gc", "v")
      .select(col("grp").getField("g").as("g"),
        col("grp").getField("cid").as("cid"), col("dim"), col("c"), col("n"))
    Dedup.finishEager(out, eager, Seq(points))
  }
}
