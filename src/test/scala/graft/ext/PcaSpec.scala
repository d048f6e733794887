package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  /** Rank-1 fixture: every vector is t·u for a fixed unit direction u
    * and deterministic spread t — the covariance is Var(t)·uuᵀ, so the
    * top eigenpair is known exactly (up to quantization). */
  private val u = {
    val raw = Array(3.0, -1.0, 2.0, 0.5)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }

  private def rank1Df = {
    val rows = (0 until 400).map { id =>
      val t = (id % 20).toDouble // mean 9.5, var 33.25
      (id.toLong, u.map(x => (t * x).toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  /** Mixed 3-dim fixture with genuinely coupled dims. */
  private def mixedDf = {
    val rows = (0 until 300).map { id =>
      val a = (id % 11).toDouble
      val b = (id % 7).toDouble
      (id.toLong, Seq((2 * a + b).toFloat, (a - b).toFloat, (b * 0.5).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("covariance is symmetric-complete, order-stable, and matches brute force") {
    val df = mixedDf
    val got = Pca.covariance(df, "vec_id", "embedding")
      .orderBy("i", "j").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.size == 6) // d=3 upper triangle
    // brute force with the SAME quantization
    val data = df.select("embedding").as[Seq[Float]].collect().map(_.toArray)
    val n = data.length.toDouble
    def q(x: Double) = math.floor(x * 1e6)
    for (i <- 0 until 3; j <- i until 3) {
      val sxy = data.map(v => q(v(i).toDouble * v(j).toDouble)).sum
      val sx = data.map(v => q(v(i).toDouble)).sum
      val sy = data.map(v => q(v(j).toDouble)).sum
      val want = sxy / (1e6 * n) - (sx / (1e6 * n)) * (sy / (1e6 * n))
      assert(got((i.toLong, j.toLong)) == want, s"cov($i,$j)")
    }
  }

  test("fit recovers the planted rank-1 direction and its variance") {
    val m = Pca.fit(rank1Df, "vec_id", "embedding", topK = 4)
    val c0 = m.components(0)
    val cos = c0.zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999999, s"top component misses u: cos=$cos")
    assert(math.abs(m.eigenvalues(0) - 33.25) < 1e-3,
      s"lambda0=${m.eigenvalues(0)}, want Var(t)=33.25")
    assert(m.eigenvalues.drop(1).forall(math.abs(_) < 1e-3),
      s"rank-1 data must have ~zero trailing eigenvalues: ${m.eigenvalues.toSeq}")
    // mean vector = E[t]·u = 9.5·u
    c0.indices.foreach(i =>
      assert(math.abs(m.mean(i) - 9.5 * u(i)) < 1e-4, s"mean($i)"))
  }

  test("eigenpairs satisfy C v = lambda v and components are orthonormal") {
    val df = mixedDf
    val m = Pca.fit(df, "vec_id", "embedding", topK = 3)
    val d = 3
    val c = Array.ofDim[Double](d, d)
    Pca.covariance(df, "vec_id", "embedding").collect().foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      c(i)(j) = v; c(j)(i) = v
    }
    for (k <- 0 until d) {
      val v = m.components(k)
      val cv = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val resid = cv.zip(v).map { case (a, b) =>
        math.abs(a - m.eigenvalues(k) * b) }.max
      assert(resid < 1e-8, s"residual $resid on eigenpair $k")
    }
    for (a <- 0 until d; b <- a until d) {
      val dot = m.components(a).zip(m.components(b)).map(t => t._1 * t._2).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-10, s"orthonormality ($a,$b): $dot")
    }
    // descending order
    assert(m.eigenvalues.sliding(2).forall(w => w(0) >= w(1) - 1e-12))
  }

  test("fit is deterministic across runs and repartitionings") {
    val m1 = Pca.fit(mixedDf, "vec_id", "embedding", topK = 2)
    val m2 = Pca.fit(mixedDf.repartition(7), "vec_id", "embedding", topK = 2)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
    assert(m1.mean.toSeq == m2.mean.toSeq)
  }

  test("project: coordinates carry the eigen-variances, cross-coordinates decorrelate") {
    val df = mixedDf
    val m = Pca.fit(df, "vec_id", "embedding", topK = 2)
    val proj = Pca.project(df, "embedding", m)
      .select(element_at(col("proj"), 1).as("p0"),
        element_at(col("proj"), 2).as("p1"))
    val n = df.count().toDouble
    val Seq(v0, v1, c01) = proj
      .agg((sum(col("p0") * col("p0")) / n).as("v0"),
        (sum(col("p1") * col("p1")) / n).as("v1"),
        (sum(col("p0") * col("p1")) / n).as("c01"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toSeq
    // projected onto the centered basis: E[p]=0, Var(p_k)=lambda_k
    assert(math.abs(v0 - m.eigenvalues(0)) < 1e-4 * math.max(1.0, v0))
    assert(math.abs(v1 - m.eigenvalues(1)) < 1e-4 * math.max(1.0, v1))
    assert(math.abs(c01) < 1e-4, s"projected coords correlate: $c01")
  }

  test("whitened projection has unit variance per axis, zero-variance axes emit 0") {
    val df = rank1Df // rank 1: lambda_0 = 33.25, the rest ~ 0
    val m = Pca.fit(df, "vec_id", "embedding", topK = 4)
    val proj = Pca.project(df, "embedding", m, whiten = true)
    val n = df.count().toDouble
    val r = proj.select(
        sum(element_at(col("proj"), 1) * element_at(col("proj"), 1)).as("v0"),
        sum(abs(element_at(col("proj"), 4))).as("a3"))
      .head()
    assert(math.abs(r.getDouble(0) / n - 1.0) < 1e-3,
      s"whitened axis 0 variance ${r.getDouble(0) / n}")
    assert(r.getDouble(1) == 0.0, "near-zero-eigenvalue axis must emit 0")
  }

  test("moments merge exactly: slice-merged covariance == one-shot, persisted round-trip identical") {
    val df = mixedDf
    def covOf(c: org.apache.spark.sql.DataFrame) =
      c.orderBy("i", "j").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val full = covOf(Pca.covariance(df, "vec_id", "embedding"))
    val merged = Pca.mergeMoments(
      Pca.moments(df.filter($"vec_id" % 3 === 0), "vec_id", "embedding"),
      Pca.moments(df.filter($"vec_id" % 3 === 1), "vec_id", "embedding"),
      Pca.moments(df.filter($"vec_id" % 3 === 2), "vec_id", "embedding"))
    assert(covOf(Pca.covarianceFromMoments(merged)) == full,
      "slice-merged moments must reproduce the one-shot covariance exactly")
    // the persisted-artifact cadence: write moments, read back, derive
    val dir = graft.TempDirs.scratchDir("pca_moments").toString
    Pca.moments(df, "vec_id", "embedding").write.mode("overwrite").parquet(dir)
    assert(covOf(Pca.covarianceFromMoments(spark.read.parquet(dir))) == full,
      "persisted moments must round-trip bit-identically")
  }

  test("empty corpus and bad topK are rejected") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pca.covariance(empty, "vec_id", "embedding")
    }
    intercept[IllegalArgumentException] {
      Pca.fit(mixedDf, "vec_id", "embedding", topK = 0)
    }
    intercept[IllegalArgumentException] {
      Pca.fit(mixedDf, "vec_id", "embedding", topK = 4)
    }
  }
}
