package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest neighbor search — the classic
  * coarse-quantizer scale path alongside sign-LSH:
  *
  *  1. TRAIN: Lloyd's k-means on L2-normalized vectors (so Euclidean
  *     assignment == angular / cosine clustering). Two trainers: a
  *     bounded deterministic driver-side sample (small corpora the
  *     sample fully covers — the seed-reproducible gate path) and
  *     [[trainCentroidsDistributed]], full-corpus [[KMeans.fit]] with
  *     only the nlist×dim model collected (the 100 TB path — training
  *     never funnels the data through the driver). [[topK]] routes by
  *     corpus size and accepts pre-trained centroids.
  *  2. ASSIGN: every corpus vector maps to its nearest centroid — one
  *     `mapPartitions` pass against the broadcast centroid matrix
  *     (primitive float loops; the same batched execution shape a real
  *     vector codec needs).
  *  3. SEARCH: each query probes its `nprobe` nearest centroid lists; the
  *     candidate join is an equi-join on centroid id; exact cosine rerank
  *     orders the final top-k.
  *
  * Recall/cost dial: nprobe/nlist is the fraction of the corpus scanned
  * per query (nprobe=8 of nlist=64 -> ~12.5%); candidates per query are
  * ~n*nprobe/nlist instead of n.
  */
object Ivf {

  private def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0) return v.clone()
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
    out
  }

  private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }

  /** Nearest-centroid ids of `v`, best first (ties by centroid id). */
  private def nearest(v: Array[Float], centroids: Array[Array[Float]],
      n: Int): Array[Int] = {
    val nv = normalize(v)
    centroids.indices.map(c => (sqDist(nv, centroids(c)), c))
      .sorted.take(n).map(_._2).toArray
  }

  /** Deterministic driver-side Lloyd's k-means on a bounded sample
    * (ordered by `idCol`, normalized). Empty clusters keep their previous
    * centroid. */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 10, sampleSize: Int = 10000,
      seed: Long = 42L): Array[Array[Float]] = {
    val sample = df.orderBy(col(idCol)).limit(sampleSize)
      .select(col(vecCol)).collect()
      .map(r => normalize(r.getSeq[Float](0).toArray))
    require(sample.length >= nlist,
      s"need >= $nlist sample vectors, got ${sample.length}")
    val rnd = new scala.util.Random(seed)
    val centroids = rnd.shuffle(sample.indices.toList).take(nlist)
      .map(sample(_).clone()).toArray
    val dim = sample.head.length
    (0 until iters).foreach { _ =>
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        val c = nearest(v, centroids, 1)(0)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      (0 until nlist).foreach { c =>
        if (counts(c) > 0) {
          val m = new Array[Float](dim)
          var i = 0
          while (i < dim) { m(i) = (sums(c)(i) / counts(c)).toFloat; i += 1 }
          centroids(c) = normalize(m)
        }
      }
    }
    centroids
  }

  /** Distributed coarse training: [[KMeans.fit]] over the FULL corpus
    * (L2-normalized in SQL first, so Euclidean Lloyd's == angular
    * clustering, matching [[trainCentroids]]' sphere semantics), then
    * collect only the nlist×dim centroid table — the model, never the
    * data. This is the 100 TB path: the driver-sample trainer caps what
    * the quantizer ever sees at `sampleSize` vectors, which mis-places
    * centroids once the corpus outgrows the sample's coverage; here
    * every vector votes. Final centroids are re-normalized (the sample
    * trainer's per-iteration convention, applied at the end). May
    * return FEWER than nlist centroids: lists emptied during training
    * drop out of [[KMeans.fit]]'s output — fewer, fuller lists, same
    * search contract (nlist is a cap, not a promise). */
  def trainCentroidsDistributed(df: DataFrame, idCol: String,
      vecCol: String, nlist: Int, iters: Int = 10): Array[Array[Float]] = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    val nrm = sqrt(aggregate(vd, lit(0.0d), (a, x) => a + x * x))
    val pts = df.select(col(idCol).cast("long").as(idCol),
      when(nrm > 0, transform(vd, x => x / nrm)).otherwise(vd).as("__nv"))
    val rows = KMeans.fit(pts, idCol, "__nv", nlist, iters)
      .select(col("cid").cast("int"), col("dim").cast("int"),
        col("c").cast("double"))
      .collect() // nlist×dim model rows — bounded, data never moves
    val dim = rows.map(_.getInt(1)).max + 1
    val byCid = rows.groupBy(_.getInt(0))
    byCid.keys.toArray.sorted.map { cid =>
      val v = new Array[Float](dim)
      byCid(cid).foreach(r => v(r.getInt(1)) = r.getDouble(2).toFloat)
      normalize(v)
    }
  }

  /** (cid, id, vec) assignment of every row to its `nprobe` nearest
    * centroid lists — one partition-batched pass, no shuffle. */
  private def assign(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], nprobe: Int,
      outId: String, outVec: String): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    val schema = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField(outId, LongType, nullable = false),
      StructField(outVec, ArrayType(FloatType, containsNull = false))))
    val rows = df.select(col(idCol).cast("long"), col(vecCol)).rdd
      .mapPartitions { it =>
        val cents = bc.value
        it.flatMap { r =>
          val id = r.getLong(0)
          val v = r.getSeq[Float](1).toArray
          nearest(v, cents, nprobe).iterator.map(c => Row(c, id, v.toSeq))
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Approximate top-k cosine neighbors via IVF: corpus in single-probe
    * lists, queries probe `nprobe` lists, exact rerank. Output shape
    * matches Similarity.bruteForceTopK (qid, nid, rank, cos).
    *
    * Trainer routing: pass `centroids` to serve a pre-trained coarse
    * book; otherwise a corpus LARGER than `sampleSize` trains with
    * [[trainCentroidsDistributed]] (full-corpus KMeans — the scale
    * path), and only a corpus the sample fully covers uses the
    * driver-side sample trainer (whose determinism-by-seed the small
    * planted gates rely on). The existence check is `limit(n+1).count`
    * — bounded, never a full count. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 64, nprobe: Int = 8,
      iters: Int = 10, sampleSize: Int = 10000, seed: Long = 42L,
      centroids: Option[Array[Array[Float]]] = None): DataFrame = {
    val cents = centroids.getOrElse {
      if (corpus.limit(sampleSize + 1).count() > sampleSize)
        trainCentroidsDistributed(corpus, idCol, vecCol, nlist, iters)
      else trainCentroids(corpus, idCol, vecCol, nlist, iters,
        sampleSize, seed)
    }
    val cs = assign(corpus, idCol, vecCol, cents, 1, "nid", "nv")
    val qs = broadcast(assign(queries, idCol, vecCol, cents, nprobe,
      "qid", "qv"))
    // id-keyed candidate dedup (see Similarity.lshTopK): 16-byte grouping
    // keys, vectors ride as first() buffers — same result as distinct(),
    // far cheaper hashing
    val cands = cs.join(qs, "cid")
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(first(col("qv")).as("qv"), first(col("nv")).as("nv"))
    val scored = cands.withColumn("cos", Similarity.cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos"))
  }
}
