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
    val g = planted.select((col("vec_id") % 2).as("g"), col("vec_id"),
      col("embedding").as("v"))
    val plan = KMeans.fitGrouped(g, "g", "vec_id", "v", k = 3, iters = 2)
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
