package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column, factored the
  * way the scales actually are: the data is corpus-sized (rows), the
  * covariance matrix is d×d (64 dims → 2,080 upper-triangle entries) —
  * so the MOMENTS are computed distributed in one pass and the
  * eigensolve runs on the driver against a matrix that costs less than
  * a task's serialized closure. The classic preprocessing step before
  * ANN indexing (decorrelate + truncate dims ahead of PQ's subspace
  * split, Jégou '11 §VI experiments do exactly this) and the honest
  * "embedding drift" lens (project onto a frozen basis, PSI the
  * coordinates).
  *
  * Cross-engine parity: second moments and dim sums are quantized with
  * the repo-wide floor(x·1e6) long-unit fold (floor of an identical
  * double is identical on every engine; long sums are exact and
  * order-independent), then the covariance entry is derived in pure
  * double arithmetic from those exact integers — bit-identical however
  * Spark partitions the corpus, and replayable in DuckDB SQL.
  *
  * At 100 TB: one corpus scan producing d(d+1)/2-key partial aggregates
  * (map-side combined — the shuffle carries #partitions × 2,080 rows,
  * not the corpus), a 64-row broadcast join, and an O(d³) driver
  * eigensolve that is microseconds at d=64. Nothing corpus-sized ever
  * reaches the driver; [[project]] is a per-row map with the basis
  * broadcast as literals.
  */
object Pca {

  /** Frozen PCA basis: per-dim mean of the training corpus, eigenvalues
    * (descending) and the matching unit-norm components (row k =
    * component k, length d). Deterministic: the eigensolve is cyclic
    * Jacobi (no randomness) and each component's largest-|coordinate|
    * entry is normalized positive. */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]])

  private def quant(c: org.apache.spark.sql.Column) = floor(c * lit(1e6))

  /** Quantized moment sums of a batch, encoded as one persistable
    * matrix-scale frame (i, j, q):
    *   - (i, j, q), 0 <= i <= j : Σ floor(xᵢxⱼ·1e6) pair products
    *   - (i, −1, q), i >= 0     : Σ floor(xᵢ·1e6) dim sums
    *   - (−1, −1, q)            : row count
    * Long sums are associative, so moments of corpus slices MERGE
    * EXACTLY ([[mergeMoments]]) — the daily-append cadence scans only
    * the new batch and folds its moments into the persisted frame, and
    * the covariance derived from merged moments is bit-identical to a
    * full-corpus recompute (the refreshStats story, for PCA). One
    * corpus scan: each row explodes to its d(d+1)/2 pair products,
    * map-side combine collapses them to 2,080 running sums per
    * partition. Fully lazy — nothing touches the driver. */
  def moments(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .select(col("__id"), col("__v"),
        posexplode(col("__v")).as(Seq("i", "xi")))
    val sxy = e.select(col("i"), col("xi").cast("double").as("xi"),
        posexplode(slice(col("__v"), col("i") + 1, size(col("__v")) - col("i")))
          .as(Seq("joff", "xj")))
      .select(col("i").cast("long").as("i"),
        (col("i") + col("joff")).cast("long").as("j"),
        quant(col("xi") * col("xj").cast("double")).as("q"))
      .groupBy(col("i"), col("j")).agg(sum(col("q")).as("q"))
    val sx = e.groupBy(col("i").cast("long").as("i"))
      .agg(sum(quant(col("xi").cast("double"))).as("q"))
      .select(col("i"), lit(-1L).as("j"), col("q"))
    val n = df.agg(count(lit(1)).as("q"))
      .select(lit(-1L).as("i"), lit(-1L).as("j"), col("q"))
    sxy.unionByName(sx).unionByName(n)
  }

  /** Fold moment frames from disjoint corpus slices into one: exact by
    * associativity of the long sums. */
  def mergeMoments(ms: DataFrame*): DataFrame = {
    require(ms.nonEmpty, "mergeMoments needs at least one moments frame")
    ms.reduce(_ unionByName _).groupBy(col("i"), col("j"))
      .agg(sum(col("q")).as("q"))
  }

  /** Covariance entries (i, j, cov) for i <= j from a moments frame —
    * the derivation half of [[covariance]], reusable against merged or
    * persisted moments. The frame is materialized once up front
    * (matrix-scale: d(d+1)/2 + d + 1 rows) so the three slices below
    * never re-run a corpus-sized moments plan. */
  def covarianceFromMoments(m: DataFrame): DataFrame = {
    val cached = m.localCheckpoint(true)
    val n = cached.filter(col("i") === -1L && col("j") === -1L)
      .select(col("q")).head().getLong(0)
    require(n > 0, "covariance needs a non-empty corpus")
    val mean = cached.filter(col("i") >= 0L && col("j") === -1L)
      .select(col("i"), col("q").as("sx_q"))
    val sxy = cached.filter(col("i") >= 0L && col("j") >= 0L)
      .select(col("i"), col("j"), col("q").as("sxy_q"))
    val scale = lit(1e6) * lit(n.toDouble)
    sxy
      .join(broadcast(mean.select(col("i"), col("sx_q").as("sx_i"))), "i")
      .join(broadcast(mean.select(col("i").as("j"), col("sx_q").as("sx_j"))), "j")
      .select(col("i"), col("j"),
        (col("sxy_q").cast("double") / scale -
          (col("sx_i").cast("double") / scale) *
          (col("sx_j").cast("double") / scale)).as("cov"))
  }

  /** Upper-triangle covariance matrix of `vecCol`: one row per dim pair
    * i <= j with cov = E[xy] − E[x]E[y] over the quantized moment sums
    * — literally [[moments]] + [[covarianceFromMoments]], so the
    * incremental path can never drift from the one-shot path. */
  def covariance(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    covarianceFromMoments(moments(df, idCol, vecCol))

  /** Train a PCA basis: distributed moments (one scan + one 64-row
    * collect), driver Jacobi eigensolve, top-`topK` eigenpairs. */
  def fit(df: DataFrame, idCol: String, vecCol: String, topK: Int): PcaModel = {
    require(topK > 0, s"need topK > 0 components, got $topK")
    val covRows = covariance(df, idCol, vecCol).collect()
    val d = covRows.iterator.map(_.getLong(1)).max.toInt + 1
    require(topK <= d, s"topK=$topK exceeds dimensionality $d")
    val c = Array.ofDim[Double](d, d)
    covRows.foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      c(i)(j) = v; c(j)(i) = v
    }
    val n = df.count().toDouble
    val meanRows = df
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(col("i")).agg(sum(quant(col("x").cast("double"))).as("sx_q"))
      .collect()
    val mean = new Array[Double](d)
    meanRows.foreach(r => mean(r.getInt(0)) = r.getLong(1).toDouble / (1e6 * n))
    val (values, vectors) = jacobiEigen(c)
    val order = values.indices.sortBy(i => -values(i)).take(topK)
    val comps = order.map { k =>
      val v = Array.tabulate(d)(i => vectors(i)(k))
      // deterministic sign: largest-|entry| coordinate positive
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(mean, order.map(values).toArray, comps)
  }

  /** Project each vector onto the model's basis: output `outCol` is an
    * array of k doubles, coordinate c = (v − mean) · component_c. With
    * `whiten = true` each coordinate additionally divides by √λ_c (unit
    * variance per axis — the standard decorrelate-and-equalize step
    * before PQ's subspace split; axes with λ ≈ 0 emit 0 rather than
    * explode). Pure per-row map — basis and mean travel as literals
    * (whitening is folded into them on the driver), d·k multiplies per
    * row (each zip_with lambda touches only its own element; no
    * quadratic re-evaluation). */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "proj", whiten: Boolean = false): DataFrame = {
    val meanLit = typedLit(model.mean.toSeq)
    val centered = zip_with(col(vecCol), meanLit,
      (x, m) => x.cast("double") - m)
    val basis = model.components.zip(model.eigenvalues).map { case (comp, ev) =>
      if (!whiten) comp
      else if (ev > 1e-12) comp.map(_ / math.sqrt(ev))
      else comp.map(_ => 0.0)
    }
    val coords = basis.map { comp =>
      aggregate(zip_with(centered, typedLit(comp.toSeq), (x, w) => x * w),
        lit(0.0), (acc, y) => acc + y)
    }
    df.withColumn(outCol, array(coords.toSeq: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvector k in COLUMN k).
    * Deterministic sweep order, converges quadratically; d=64 is
    * sub-millisecond. Driver-side by design — the matrix is d×d, never
    * corpus-sized. */
  private[graft] def jacobiEigen(c: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = c.length
    val a = c.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 100 && offNorm() > 1e-20) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val tau = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (tau >= 0) 1.0 / (tau + math.sqrt(1.0 + tau * tau))
              else 1.0 / (tau - math.sqrt(1.0 + tau * tau))
            val cs = 1.0 / math.sqrt(1.0 + t * t)
            val sn = t * cs
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = cs * akp - sn * akq
              a(k)(q) = sn * akp + cs * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = cs * apk - sn * aqk
              a(q)(k) = sn * apk + cs * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = cs * vkp - sn * vkq
              v(k)(q) = sn * vkp + cs * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
