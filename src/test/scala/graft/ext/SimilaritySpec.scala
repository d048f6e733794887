package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  /** 200 random vectors + for each of 5 queries a planted cluster of 5
    * close neighbors (cosine ~0.99). */
  private lazy val (corpus, queries) = {
    val rnd = new scala.util.Random(13)
    def vec() = Array.fill(64)(rnd.nextGaussian())
    val qs = (0 until 5).map(i => (i.toLong, vec()))
    val planted = qs.flatMap { case (qid, v) =>
      (0 until 5).map { j =>
        val w = v.clone()
        w(j) += 0.05
        (1000L + qid * 10 + j, w)
      }
    }
    val noise = (0 until 200).map(i => (100L + i, vec()))
    val all = (qs ++ planted ++ noise).map { case (id, v) =>
      (id, v.map(_.toFloat).toSeq)
    }
    (all.toDF("vec_id", "embedding"),
      qs.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
        .toDF("vec_id", "embedding"))
  }

  test("randomProject: shuffle-free, deterministic, roughly isometric") {
    val proj = Similarity.randomProject(corpus, "vec_id", "embedding",
      dIn = 64, outDim = 16)
    assert(!proj.queryExecution.executedPlan.toString().contains("Exchange"))
    val a = proj.orderBy("vec_id").collect().map(_.toSeq)
    val b = Similarity.randomProject(corpus, "vec_id", "embedding", 64, 16)
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // JL sanity on the 64-dim gaussian corpus: projected norms stay
    // within a loose multiplicative band of the originals
    val norms = corpus.limit(50).select(col("vec_id"),
        Similarity.norm(col("embedding")).as("n0"))
      .join(Similarity.randomProject(corpus.limit(50), "vec_id", "embedding", 64, 16)
        .select(col("vec_id"), Similarity.norm(col("proj")).as("n1")), "vec_id")
      .select("n0", "n1").as[(Double, Double)].collect()
    norms.foreach { case (n0, n1) =>
      assert(n1 > n0 * 0.3 && n1 < n0 * 2.5, s"norm drift: $n0 -> $n1")
    }
  }

  test("outliers: planted far vector flagged, tight cluster clean") {
    val rnd = new scala.util.Random(5)
    val tight = (0 until 40).map { i =>
      (i.toLong, 0L, Array.fill(8)(1.0 + rnd.nextGaussian() * 0.01)
        .map(_.toFloat).toSeq)
    }
    val far = Seq((99L, 0L, Array.fill(8)(5.0f).toSeq))
    val df = (tight ++ far).toDF("vec_id", "label", "embedding")
    val out = Similarity.outliers(df, "vec_id", "label", "embedding")
      .select("vec_id", "outlier").as[(Long, Boolean)].collect().toMap
    assert(out(99L))
    assert(tight.forall { case (id, _, _) => !out(id) })
  }

  test("brute-force top-k returns the planted neighbors in order") {
    val got = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    (0 until 5).foreach { q =>
      val expected = (0 until 5).map(j => 1000L + q * 10 + j).toSet
      assert(got(q.toLong) == expected, s"query $q")
    }
  }

  test("hardNegatives: nearest DIFFERENT-label rows, same-label planted twins excluded") {
    // give each query's planted cluster the query's own label: the
    // nearest neighbors are then all POSITIVES and must not be mined
    val lbl = when(col("vec_id") < 100, (col("vec_id") % 5).cast("int"))
      .when(col("vec_id") >= 1000, ((col("vec_id") - 1000) / 10).cast("int"))
      .otherwise(lit(99))
    val lc = corpus.withColumn("label", lbl)
    val lq = queries.withColumn("label", lbl)
    val got = Similarity.hardNegatives(lc, lq, "vec_id", "embedding",
      "label", k = 5)
      .select("qid", "nid", "rank", "cos")
      .as[(Long, Long, Int, Double)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet)
    byQ.foreach { case (q, rows) =>
      // no mined negative shares the query's label — in particular none
      // of the planted same-label twins (1000+q*10..) appear
      assert(rows.forall { case (_, nid, _, _) =>
        !(nid >= 1000L + q * 10 && nid < 1000L + q * 10 + 5) && nid != q },
        s"query $q mined a positive")
      assert(rows.sortBy(_._3).map(_._3).toSeq == (1 to 5), s"query $q ranks")
      // exactness: the mined set IS the label-filtered brute-force top-5
      val want = Similarity.bruteForceTopK(
        lc.filter(col("label") =!= lit((q % 5).toInt)), lq.filter(col("vec_id") === q),
        "vec_id", "embedding", 5)
        .select("nid").as[Long].collect().toSet
      assert(rows.map(_._2).toSet == want, s"query $q set")
    }
  }

  test("LSH top-k recall >= 0.9 on planted clusters, and rerank is exact") {
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("IVF top-k recall >= 0.9 on planted clusters, and rerank is exact") {
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = Ivf.topK(corpus, queries, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("IVF distributed trainer: parity with the sample trainer on " +
      "planted clusters; pre-trained centroids served verbatim") {
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // sampleSize below the corpus routes through trainCentroidsDistributed
    val dist = Ivf.topK(corpus, queries, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4, sampleSize = 8)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (bf intersect dist).size.toDouble / bf.size
    assert(recall >= 0.9, s"distributed-trainer recall $recall")
    // a pre-trained coarse book is served as-is: same result on reuse
    val cents = Ivf.trainCentroidsDistributed(corpus, "vec_id",
      "embedding", nlist = 16)
    val served = Ivf.topK(corpus, queries, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4, centroids = Some(cents))
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(served == dist)
    // the model is the contracted shape: ≤ nlist unit-norm centroids
    // (emptied lists drop out of KMeans.fit), at least one per planted
    // cluster's region
    assert(cents.length <= 16 && cents.length >= 8, s"${cents.length}")
    cents.foreach { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"centroid norm $n")
    }
  }

  test("centroids: quantized aggregation is exact and partition-shape-proof") {
    // values chosen representable after round(,6): expected means are hand-
    // computable; repartition proves order-independence of the decimal sum
    val df = Seq(
      (0, Seq(1.0f, -2.0f)), (0, Seq(3.0f, 4.0f)),
      (1, Seq(0.5f, 0.25f))).toDF("label", "embedding")
    val got = Similarity.centroids(df.repartition(7), "label", "embedding")
      .orderBy("grp", "dim")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got == Seq((0, 0L, 2.0), (0, 1L, 1.0), (1, 0L, 0.5), (1, 1L, 0.25)))
    // unquantized path: plain double mean
    val raw = Similarity.centroids(df, "label", "embedding", quantize = None)
      .orderBy("grp", "dim").as[(Int, Long, Double)].collect().toSeq
    assert(raw.map(_._3) == Seq(2.0, 1.0, 0.5, 0.25))
  }

  test("dropEmbeddingMatches: probe near-copies drop, rest survive, probe broadcasts") {
    // probes = the 5 query vectors; contaminated = queries themselves +
    // their planted ~0.99 neighbors; noise survives
    val cleaned = Similarity.dropEmbeddingMatches(corpus, "vec_id",
      "embedding", queries.select((col("vec_id") + 5000L).as("vec_id"),
        col("embedding")), threshold = 0.95)
    val ids = cleaned.select("vec_id").as[Long].collect().toSet
    assert((0L until 5L).forall(!ids.contains(_)), "query copies must drop")
    assert((0 until 5).flatMap(q => (0 until 5).map(j => 1000L + q * 10 + j))
      .forall(!ids.contains(_)), "planted near-copies must drop")
    assert((0 until 200).map(100L + _).forall(ids.contains), "noise survives")
    val plan = cleaned.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      "the probe signature table must broadcast:\n" + plan.take(400))
    spark.catalog.clearCache()
  }

  test("mmrSelect: lambda=1 is pure relevance; copies penalized; shape") {
    // pool: query 0's planted cluster (5 near-copies) + noise; at
    // lambda=1 MMR degenerates to relevance order, so the picks are the
    // brute-force top-k exactly
    val q = queries.filter($"vec_id" === 0L).select($"embedding")
    val pool = corpus.filter($"vec_id" >= 100L)
    val rel = Similarity.mmrSelect(pool, "vec_id", "embedding", q,
      k = 4, lambda = 1.0)
    val bf = Similarity.bruteForceTopK(pool,
        queries.filter($"vec_id" === 0L), "vec_id", "embedding", k = 4)
      .orderBy($"rank").select("nid").as[Long].collect().toSeq
    assert(rel.orderBy($"rank").select("vec_id").as[Long].collect().toSeq
      == bf, "lambda=1 must reproduce the relevance order")
    // ranks are 1..k, ids distinct
    val rows = rel.orderBy($"rank").collect()
    assert(rows.map(_.getLong(1)).toSeq == (1L to 4L))
    assert(rows.map(_.getLong(0)).distinct.length == 4)
  }

  test("mmrSelect: an exact copy of the top pick never goes second") {
    // clone the whole planted cluster of query 0: without the diversity
    // term the second pick would be the copy of the first (identical
    // relevance, higher id); with lambda=0.5 the copy's cosine-1.0
    // penalty forces a different item
    val q = queries.filter($"vec_id" === 0L).select($"embedding")
    val cluster = corpus.filter($"vec_id" >= 1000L && $"vec_id" < 1010L)
    val pool = cluster.unionByName(
      cluster.select(($"vec_id" + 5000L).as("vec_id"), $"embedding"))
    val relOnly = Similarity.mmrSelect(pool, "vec_id", "embedding", q,
      k = 2, lambda = 1.0).orderBy($"rank").collect()
    assert(relOnly(1).getLong(0) == relOnly(0).getLong(0) + 5000L,
      "sanity: at lambda=1 the copy IS the second pick")
    val div = Similarity.mmrSelect(pool, "vec_id", "embedding", q,
      k = 2, lambda = 0.5).orderBy($"rank").collect()
    assert(div(0).getLong(0) == relOnly(0).getLong(0),
      "round 1 is pure relevance either way")
    assert(div(1).getLong(0) != div(0).getLong(0) + 5000L,
      "the exact copy must be penalized out of the second slot")
    spark.catalog.clearCache()
  }

  test("cosine column matches a driver-side computation") {
    val a = Seq((1L, Seq(1.0f, 2.0f, 2.0f)), (2L, Seq(0.0f, 3.0f, 4.0f)))
      .toDF("vec_id", "v")
    val c = a.as("x").join(a.as("y"), $"x.vec_id" < $"y.vec_id")
      .select(Similarity.cosine($"x.v", $"y.v")).as[Double].collect()(0)
    val expected = (1 * 0 + 2 * 3 + 2 * 4) / (3.0 * 5.0)
    assert(math.abs(c - expected) < 1e-12)
  }
}
