package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * - Brute-force cosine top-k: broadcast the (small) query set, map-side
  *   score everything, per-query top-k. Exact; the baseline.
  * - Sign-LSH (random hyperplanes, Charikar 2002): per-table bit signature
  *   buckets; candidates = bucket collisions; exact rerank. The scale path:
  *   candidate generation is an equi-join on (table, signature), no O(n^2).
  *
  * All vector math is double-precision HOFs (`zip_with`/`aggregate`) —
  * per-row, shuffle-free, deterministic (sequential array-order sums).
  */
object Similarity {

  /** Dot product of two array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query row. `queries` should be
    * small (it is broadcast); corpus scans once. Ties broken by neighbor
    * id for determinism. Output: qid, nid, rank, cos. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val scored = c.crossJoin(q)
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos"))
  }

  /** Exact top-k SQUARED-L2 neighbors — the ground-truth side of an
    * ANN recall measurement ([[Eval.recallAtK]]): [[Ivf.topK]] and
    * [[Pq.ivfAdcTopK]] rank by squared L2, so their scorecard must be
    * judged against the exact answer in the SAME metric (cosine truth
    * would charge the index for the metric gap, not its pruning loss).
    * Unlike [[bruteForceTopK]] the query row itself stays in the
    * candidate set (dist 0, rank 1) — matching the index candidates,
    * which never exclude self. Same scale shape: broadcast queries,
    * one corpus scan, per-query top-k window. Output: qid, nid, rank,
    * dist. */
  def bruteForceTopKL2(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"),
      transform(col(vecCol), x => x.cast("double")).as("qv")))
    val c = corpus.select(col(idCol).as("nid"),
      transform(col(vecCol), x => x.cast("double")).as("nv"))
    val scored = c.crossJoin(q)
      .withColumn("dist", KMeans.sqDist(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("dist"))
  }

  /** Hard-negative mining for contrastive training (the in-batch /
    * cross-corpus negatives step of dense-retriever and embedding-model
    * training): for each query, the `k` MOST similar corpus rows whose
    * label DIFFERS — near the query in embedding space yet semantically
    * wrong, exactly the examples a contrastive loss learns most from.
    * Exact variant: queries are a training batch (bounded, broadcast),
    * corpus scans once — the [[bruteForceTopK]] contract with the label
    * exclusion pushed into the same scan. When the query side is itself
    * corpus-scale, compose an ANN front end instead ([[lshTopK]] /
    * [[Ivf.topK]] / [[Pq.ivfAdcTopK]]) and apply the label filter to its
    * candidates before the rerank. Output: qid, nid, rank, cos. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"),
      col(vecCol).as("qv"), col(labelCol).as("__ql")))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      col(labelCol).as("__nl"))
    val scored = c.crossJoin(q)
      .filter(not(col("__ql") <=> col("__nl")))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos"))
  }

  /** All per-table sign-LSH signatures of a vector column, exploded to
    * (t, sig) rows — native one-pass expression (SignLshSignatures). */
  private def withSigs(df: DataFrame, id: String, vec: String,
      tables: Int, bits: Int, dim: Int, seed: Long): DataFrame =
    df.select(col(id), col(vec),
      posexplode(SignLshSignatures(col(vec), tables, bits, dim, seed)))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "sig")

  /** Approximate top-k: candidates from any-table signature collision with
    * the query, exact cosine rerank. Recall rises with `tables`, bucket
    * selectivity with `bits`. Output shape matches bruteForceTopK. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, tables: Int = 8, bits: Int = 12,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val cs = withSigs(corpus.select(col(idCol).as("nid"), col(vecCol).as("nv")),
      "nid", "nv", tables, bits, dim, seed)
    val qs = broadcast(withSigs(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qv")),
      "qid", "qv", tables, bits, dim, seed))
    // dedup candidates on the ID pair, not the full rows: grouping keys are
    // 16 bytes instead of two 64-float vectors, so the map-side combine
    // hashes/compares cheaply and the vectors ride as first() buffers
    // (identical per pair — first() is deterministic), collapsing before
    // the shuffle write exactly like distinct() but ~16x cheaper per row
    val cands = cs.join(qs, Seq("t", "sig"))
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(first(col("qv")).as("qv"), first(col("nv")).as("nv"))
    val scored = cands.withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos"))
  }

  /** Per-group embedding centroids — the vector aggregate behind cluster
    * profiling and IVF/k-means training steps. Explode to (group, dim, v)
    * and hash-aggregate: one shuffle whose key count is |groups| * dim,
    * independent of corpus size — map-side partial sums do the heavy
    * lifting, so the shape holds at 100 TB.
    *
    * `quantize = Some(p)` rounds each component to p decimals and sums as
    * DECIMAL (exact, partition-order-independent) — bit-reproducible
    * centroids across runs, partitionings, and engines (a float's value is
    * never exactly on a decimal rounding boundary — 5·10^-(p+1) is not a
    * dyadic rational — so the per-element rounding is unambiguous). The
    * mean itself is the UNROUNDED double `sum / count`: identical IEEE
    * operands -> identical quotient everywhere, whereas re-rounding the
    * quotient to p decimals can land exactly on a x.5 boundary where
    * engines' double-rounding rules diverge (observed: one of 640
    * components at sf0.1 differing in the 6th decimal). `None` sums raw
    * doubles: no quantization error, but the last ulp depends on
    * partition order. Output: one row per (group, dim) with the centroid
    * component `c` — rows, not arrays, so downstream aggregates/joins
    * stay columnar; collect_list over dim re-assembles vectors if needed. */
  def centroids(df: DataFrame, groupCol: String, vecCol: String,
      quantize: Option[Int] = Some(6)): DataFrame = {
    val exploded = df.select(col(groupCol).as("grp"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("grp"), col("dim").cast("long").as("dim"),
        col("v").cast("double").as("v"))
    quantize match {
      case Some(p) =>
        val dec = org.apache.spark.sql.types.DecimalType(28, p)
        exploded.groupBy(col("grp"), col("dim"))
          .agg((sum(round(col("v"), p).cast(dec)).cast("double") /
            count(lit(1))).as("c"))
      case None =>
        exploded.groupBy(col("grp"), col("dim"))
          .agg(avg(col("v")).as("c"))
    }
  }

  /** [[centroids]] (quantized form) extended with the group size `n` —
    * the per-(grp, dim) row count, which IS the vector count of the
    * group (every vector contributes exactly one row per dim). Lets
    * [[KMeans.fit]]-style consumers read centroid components AND
    * cluster sizes out of the ONE hash-aggregate the mean already
    * pays for, instead of a second aggregation pass over a second
    * evaluation of the assignment. Same decimal-sum arithmetic, same
    * `c` values bit-for-bit. */
  def centroidsWithN(df: DataFrame, groupCol: String, vecCol: String,
      quantize: Int = 6): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, quantize)
    df.select(col(groupCol).as("grp"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("grp"), col("dim").cast("long").as("dim"),
        col("v").cast("double").as("v"))
      .groupBy(col("grp"), col("dim"))
      .agg((sum(round(col("v"), quantize).cast(dec)).cast("double") /
        count(lit(1))).as("c"), count(lit(1)).as("n"))
  }

  /** Deterministic ±1 Johnson-Lindenstrauss sign matrix, derived from
    * md5("i:j") high bits — any engine reconstructs it bit-identically
    * (the same engine-portable-draw trick as the md5 samplers). */
  private[ext] def jlSigns(dIn: Int, dOut: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dOut, dIn) { (j, i) =>
      val h = md.digest(s"$i:$j".getBytes("UTF-8"))
      if ((h(0) & 0x80) == 0) 1.0 else -1.0
    }
  }

  /** Random projection (Johnson-Lindenstrauss, Achlioptas-style ±1
    * signs) of the embedding column to `outDim` dimensions — the cheap
    * dimensionality squeeze before brute-force rerank or coarse
    * clustering (pairwise distances preserved within 1±eps at
    * outDim = O(log n / eps^2)). The sign matrix is a broadcast LITERAL
    * (outDim x dIn doubles — bytes, not a join), the projection runs
    * per-row inside codegen as nested HOFs (no shuffle, no UDF), and
    * the index-ordered fold + IEEE-exact sqrt scaling make the output
    * bit-reproducible across engines and partitionings. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      dIn: Int, outDim: Int): DataFrame = {
    require(dIn > 0 && outDim > 0 && outDim <= dIn, "need 0 < outDim <= dIn")
    val signs = typedlit(jlSigns(dIn, outDim).map(_.toSeq).toSeq)
    val scale = lit(math.sqrt(outDim.toDouble)) // IEEE sqrt: exact-rounded
    df.select(col(idCol),
      transform(sequence(lit(0), lit(outDim - 1)), j =>
        aggregate(
          zip_with(col(vecCol), element_at(signs, (j + lit(1)).cast("int")),
            (x, sgn) => x.cast("double") * sgn),
          lit(0.0), (acc, v) => acc + v) / scale).as("proj"))
  }

  /** Per-group embedding outliers: each vector's squared L2 distance to
    * its group centroid, flagged when it exceeds `factor` times the
    * group mean distance — the curation filter that drops corrupt or
    * mislabeled embeddings before ANN indexing / clustering trusts them.
    *
    * Two corpus passes (centroid, then distance), both hash-aggregates
    * with group-bounded key counts; centroids come back as a broadcast
    * (group, cvec) frame via the same quantized-decimal means the
    * centroid gate proves bit-reproducible, distances are index-ordered
    * folds, and the per-group mean distance sums in floor-quantized
    * LONG units (see PageRank — never round(), never raw double sums).
    * Output: (id, group, d2, mean_d2, outlier). */
  def outliers(df: DataFrame, idCol: String, groupCol: String,
      vecCol: String, factor: Double = 4.0): DataFrame = {
    val cents = centroids(df, groupCol, vecCol)
      .groupBy(col("grp"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("cvec"))
    val d2 = df.select(col(idCol), col(groupCol).as("grp"), col(vecCol).as("v"))
      .join(broadcast(cents), "grp")
      .withColumn("d2", aggregate(
        zip_with(col("v"), col("cvec"), (x, c) => {
          val d = x.cast("double") - c; d * d
        }), lit(0.0), (acc, v) => acc + v))
    val meanD2 = d2.groupBy(col("grp"))
      .agg((sum(floor(col("d2") * lit(1e9)).cast("long")).cast("double") /
        lit(1e9) / count(lit(1))).as("mean_d2"))
    d2.join(broadcast(meanD2), "grp")
      .select(col(idCol), col("grp"), col("d2"), col("mean_d2"),
        (col("d2") > col("mean_d2") * lit(factor)).as("outlier"))
  }

  /** All pairs with cosine >= threshold, sign-LSH bucketed: docs sharing a
    * signature in any table are candidates; exact rerank filters. */
  def cosinePairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 8, bits: Int = 12, dim: Int = 64,
      seed: Long = 42L, eager: Boolean = false): DataFrame = {
    // persisted: the self-join below would otherwise recompute signatures
    // for both sides (signatures are tiny relative to the corpus)
    val sigs = withSigs(df.select(col(idCol).as("id"), col(vecCol).as("v")),
      "id", "v", tables, bits, dim, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = sigs.as("a").join(sigs.as("b"),
        col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("a.v").as("vi"),
        col("b.id").as("j"), col("b.v").as("vj"))
      // id-keyed dedup (see lshTopK): same collapse as distinct(), without
      // hashing the vectors as grouping keys
      .groupBy(col("i"), col("j"))
      .agg(first(col("vi")).as("vi"), first(col("vj")).as("vj"))
      .withColumn("cos", cosine(col("vi"), col("vj")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
    Dedup.finishEager(out, eager, Seq(sigs))
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein,
    * SIGIR'98): greedily pick `k` items from a candidate pool, each round
    * taking argmax of `lambda * rel - (1-lambda) * max cos(v, selected)`
    * (round 1 is pure relevance — the set term is empty). The diversity
    * rerank behind retrieval-augmented prompting and few-shot example
    * selection: near-copies of an already-picked item are penalized by
    * their cosine to it, so the output covers the pool instead of
    * repeating its densest cluster.
    *
    * MMR is a RERANKER: the pool contract is a bounded candidate set
    * (the top-N of [[bruteForceTopK]]/[[lshTopK]]/IVF — thousands, not
    * the corpus), because selection is inherently sequential — k rounds,
    * each a scan of the pool. Within that contract the rounds stay
    * distributed and bounded: the pool is persisted once, each round is
    * a broadcast-literal map (selected vectors ride as a packed literal,
    * the max-cosine fold runs per-row in codegen) topped by
    * TakeOrderedAndProject(1), and the driver sees exactly one row per
    * round — never the pool.
    *
    * Portability: rel and the diversity term are index-ordered cosine
    * folds (exact-rounded mul/div/sqrt), max is rounding-free, and the
    * score combines them with two exact-rounded ops (`1-lambda` computed
    * once in IEEE), so any engine replays every round's argmax
    * bit-identically; ties break on id. `query` must be a single row
    * carrying `vecCol`. Output: (idCol, rank, score) — round-1 score is
    * the pure relevance, later rounds the penalized score. */
  def mmrSelect(candidates: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, k: Int, lambda: Double = 0.7): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda=$lambda not in [0,1]")
    val mu = 1.0 - lambda // one IEEE subtraction, reused every round
    val qv = broadcast(query.select(col(vecCol).as("__qv")))
    val scored = candidates.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(qv)
      .select(col(idCol), col("__v"),
        cosine(col("__v"), col("__qv")).as("__rel"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Any, Double, Seq[Double])]
    try {
      while (picked.size < k) {
        val base =
          if (picked.isEmpty) scored.withColumn("__score", col("__rel"))
          else {
            val sel = typedlit(picked.map(_._3).toSeq)
            scored.filter(!col(idCol).isin(picked.map(_._1).toSeq: _*))
              .withColumn("__div", aggregate(sel,
                lit(Double.NegativeInfinity),
                (acc, sv) => greatest(acc, cosine(col("__v"), sv))))
              .withColumn("__score",
                lit(lambda) * col("__rel") - lit(mu) * col("__div"))
          }
        // TakeOrderedAndProject(1): the only row that reaches the driver
        val r = base.orderBy(col("__score").desc, col(idCol)).limit(1)
          .select(col(idCol), col("__score"),
            col("__v").cast("array<double>"))
          .head()
        picked += ((r.get(0), r.getDouble(1), r.getSeq[Double](2)))
      }
    } finally scored.unpersist()
    val spark = candidates.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      candidates.schema(idCol),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val rows = picked.zipWithIndex.map { case ((id, sc, _), ix) =>
      org.apache.spark.sql.Row(id, (ix + 1).toLong, sc)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.toList.asJava, schema)
  }

  /** Cross-corpus embedding decontamination — the semantic complement of
    * [[TextAnalysis.decontaminate]]'s exact n-gram overlap: drop every
    * corpus vector whose cosine to ANY probe vector (the benchmark /
    * eval set) reaches `threshold`. Same sign-LSH candidate generation
    * as [[cosinePairsLsh]], crossed instead of self-joined; the probe
    * side is the benchmark, always small, so its signature table
    * broadcasts and the corpus never shuffles — candidates are the rare
    * (corpus, probe) bucket collisions, exact-reranked, then one
    * anti-join removes the contaminated ids.
    *
    * Recall is the sign-LSH guarantee (near-identical vectors share
    * every band): benchmark leakage is near-copies by construction —
    * the paraphrased-leak regime wants a lower threshold, not another
    * index. */
  def dropEmbeddingMatches(corpus: DataFrame, idCol: String,
      vecCol: String, probe: DataFrame, threshold: Double,
      tables: Int = 8, bits: Int = 12, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val cs = withSigs(corpus.select(col(idCol).as("id"), col(vecCol).as("v")),
      "id", "v", tables, bits, dim, seed)
    val ps = broadcast(withSigs(
      probe.select(col(idCol).as("pid"), col(vecCol).as("pv")),
      "pid", "pv", tables, bits, dim, seed))
    val hit = cs.join(ps, Seq("t", "sig"))
      .groupBy(col("id"), col("pid"))
      .agg(first(col("v")).as("v"), first(col("pv")).as("pv"))
      .filter(cosine(col("v"), col("pv")) >= threshold)
      .select(col("id")).distinct()
    corpus.join(hit.select(col("id").as(idCol)), Seq(idCol), "left_anti")
  }
}
