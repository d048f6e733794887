package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  /** 3 well-separated planted clusters (offsets 0, 10, 20 on every dim)
    * with 30/40/50 members of sigma-0.1 jitter. */
  private lazy val planted = {
    val rnd = new scala.util.Random(7)
    val rows = Seq((0, 30), (1, 40), (2, 50)).flatMap { case (c, n) =>
      (0 until n).map { i =>
        val v = Array.fill(8)(c * 10.0 + rnd.nextGaussian() * 0.1)
        (c * 1000L + i, v.map(_.toFloat).toSeq)
      }
    }
    rows.toDF("vec_id", "embedding")
  }

  test("recovers planted cluster sizes and centroid locations") {
    val out = KMeans.fit(planted, "vec_id", "embedding", k = 3, iters = 3)
    val sizes = out.select("cid", "n").distinct().as[(Long, Long)]
      .collect().map(_._2).sorted
    assert(sizes.toSeq == Seq(30L, 40L, 50L))
    // every centroid component must sit within jitter of one of the
    // planted offsets (0/10/20)
    val comps = out.select("c").as[Double].collect()
    assert(comps.forall(c =>
      Seq(0.0, 10.0, 20.0).exists(o => math.abs(c - o) < 0.5)))
  }

  test("output shape: k*dim rows, one size per cluster, deterministic") {
    val a = KMeans.fit(planted, "vec_id", "embedding", k = 3, iters = 2)
      .collect().map(_.toSeq)
    val b = KMeans.fit(planted, "vec_id", "embedding", k = 3, iters = 2)
      .collect().map(_.toSeq)
    assert(a.length == 3 * 8)
    assert(a.toSet == b.toSet)
  }

  test("clusterQuality: planted separation scores high, sums reconcile") {
    val q = KMeans.clusterQuality(planted, "vec_id", "embedding",
      k = 3, iters = 3).collect()
    assert(q.length == 3)
    assert(q.map(_.getAs[Long]("n")).sum == 120L)
    // well-separated sigma-0.1 clusters at spacing 10: simplified
    // silhouette must be near 1 everywhere
    assert(q.forall(_.getAs[Double]("sil_mean") > 0.9))
    // inertia per cluster ~ n * dims * sigma^2: far under 1.0 total
    assert(q.forall(r => r.getAs[Long]("inertia_micro") <
      r.getAs[Long]("n") * 1000000L))
  }

  test("clusterQuality matches a Scala replay of the arithmetic exactly") {
    val q = KMeans.clusterQuality(planted, "vec_id", "embedding",
      k = 3, iters = 2).collect()
      .map(r => r.getAs[Long]("cid") ->
        (r.getAs[Long]("n"), r.getAs[Long]("inertia_micro"),
          r.getAs[Long]("sil_sum_micro"))).toMap
    // replay: final centroids from fit (same training), then per point
    // the same fold-order distance, sqrt, and micro floors
    val cents = KMeans.fit(planted, "vec_id", "embedding", k = 3, iters = 2)
      .collect().groupBy(_.getAs[Long]("cid"))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getAs[Long]("dim")).map(_.getAs[Double]("c"))
      }.toSeq.sortBy(_._1)
    val pts = planted.as[(Long, Seq[Float])].collect()
    val acc = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    pts.foreach { case (_, v) =>
      val ds = cents.map { case (cid, cv) =>
        var d = 0.0
        var i = 0
        while (i < cv.length) {
          val x = v(i).toDouble - cv(i); d += x * x; i += 1
        }
        (d, cid)
      }.sortBy(identity)
      val (down, cid) = ds.head
      val a = math.sqrt(down); val b = math.sqrt(ds(1)._1)
      val im = math.floor(down * 1e6).toLong
      val sm = if (math.max(a, b) > 0.0)
        math.floor((b - a) / math.max(a, b) * 1e6).toLong else 0L
      val (n0, i0, s0) = acc.getOrElse(cid, (0L, 0L, 0L))
      acc(cid) = (n0 + 1L, i0 + im, s0 + sm)
    }
    assert(q == acc.toMap)
  }

  test("clusterQuality: coincident centroids score silhouette 0, k<2 rejected") {
    // every point identical -> both surviving... all points land in one
    // cluster; the empty seeds drop out, leaving ONE cluster and no
    // second centroid -> that's the k<2 runtime shape, so plant TWO
    // distinct duplicated points: centroids coincide with both points,
    // a = 0, b > 0 -> s floors to (b-0)/b = 1e6? No: a=0 exactly, the
    // point sits ON its centroid; s = (b-a)/max = 1 -> 1e6 micro.
    val dup = (0 until 8).map(i =>
      (i.toLong, Seq.fill(4)(if (i % 2 == 0) 0.0f else 8.0f)))
      .toDF("vec_id", "embedding")
    val q = KMeans.clusterQuality(dup, "vec_id", "embedding",
      k = 2, iters = 2).collect()
    assert(q.map(_.getAs[Long]("n")).sum == 8L)
    assert(q.forall(_.getAs[Long]("inertia_micro") == 0L))
    assert(q.forall(_.getAs[Long]("sil_sum_micro") ==
      q.head.getAs[Long]("n") * 1000000L))
    intercept[IllegalArgumentException] {
      KMeans.clusterQuality(dup, "vec_id", "embedding", k = 1)
    }
  }

  test("clusterQuality: training collapse to one cluster never crashes") {
    // every point identical: both seeds coincide, argmin ties to cid 0,
    // cluster 1 empties out — one surviving centroid, no second distance.
    // On-centroid points score 0 via the max(a,b)=0 convention; the
    // single-entry book must route through try_element_at, not an ANSI
    // index crash
    val same = (0 until 6).map(i => (i.toLong, Seq.fill(4)(1.0f)))
      .toDF("vec_id", "embedding")
    val q = KMeans.clusterQuality(same, "vec_id", "embedding",
      k = 2, iters = 2).collect()
    assert(q.length == 1 && q.head.getAs[Long]("n") == 6L)
    assert(q.head.getAs[Long]("inertia_micro") == 0L)
    assert(q.head.getAs[Long]("sil_sum_micro") == 0L)
  }

  test("eager mode leaves no cache entries behind") {
    spark.catalog.clearCache()
    val out = KMeans.fit(planted, "vec_id", "embedding", k = 3, iters = 2,
      eager = true)
    out.count()
    assert(org.apache.spark.sql.graftbridge.Bridge.cacheEmpty(spark))
  }

  test("fitAssign: same training run as fit — sizes agree, planted clusters coherent") {
    val assigned = KMeans.fitAssign(planted, "vec_id", "embedding",
      k = 3, iters = 3)
    val byCid = assigned.groupBy("cid").count().as[(Long, Long)]
      .collect().toMap
    val fitSizes = KMeans.fit(planted, "vec_id", "embedding", k = 3, iters = 3)
      .select("cid", "n").distinct().as[(Long, Long)].collect().toMap
    assert(byCid == fitSizes)
    // every planted cluster lands wholly in one learned cluster
    val purity = assigned.withColumn("truth", (col("id") / 1000).cast("long"))
      .groupBy("truth").agg(countDistinct(col("cid")).as("k"))
      .select("k").as[Long].collect()
    assert(purity.forall(_ == 1L))
    spark.catalog.clearCache()
  }

  test("fitGrouped: bit-identical to per-group fit, uneven dims allowed") {
    // two groups with DIFFERENT vector widths: group 0 = first 4 dims,
    // group 1 = full 8 — nothing in grouped training may assume a
    // shared dimension, and each group must reproduce its independent
    // fit EXACTLY (same seeds, argmin, decimal sums)
    val g0 = planted.select(lit(0L).as("g"), col("vec_id"),
      slice(col("embedding"), 1, 4).as("v"))
    val g1 = planted.select(lit(1L).as("g"), col("vec_id"),
      col("embedding").as("v"))
    val grouped = KMeans.fitGrouped(g0.unionByName(g1), "g", "vec_id", "v",
      k = 3, iters = 2).collect().map(_.toSeq).toSet
    val solo = Seq(0L -> g0, 1L -> g1).flatMap { case (g, df) =>
      KMeans.fit(df, "vec_id", "v", k = 3, iters = 2)
        .select(lit(g).as("g"), col("cid"), col("dim"), col("c"), col("n"))
        .collect().map(_.toSeq)
    }.toSet
    assert(grouped == solo)
  }

  test("fitGrouped seed draw is WindowGroupLimit-pruned, never a full per-group sort") {
    // the seed draw runs (and collects) at fitGrouped call time now, so
    // the plan contract is pinned on the seed frame itself — the same
    // expression fitGrouped executes
    val g = planted.select((col("vec_id") % 2).as("g"),
      col("vec_id").cast("long").as("id"), col("embedding").as("v"))
    val plan = KMeans.groupedSeedFrame(g, k = 3)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      "seed rank window must prune map-side via WindowGroupLimit")
  }

  test("assignment stage is shuffle-free: exchanges only in seed draw and updates") {
    // the full 2-iteration plan must contain NO exchange keyed by point
    // id — only the k-row seed window, the (cid,dim) hash-agg updates,
    // and the cvec reassembly shuffle on cid
    val plan = KMeans.fit(planted, "vec_id", "embedding", k = 3, iters = 2)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("hashpartitioning(id"), "points must never shuffle by id")
  }
}
