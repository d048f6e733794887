package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

class EvalSpec extends SparkTestBase {
  import spark.implicits._

  private def scored(rows: (Long, Long)*): DataFrame =
    rows.toDF("score", "y")

  private def auc(df: DataFrame, buckets: Int = 1024): Option[Double] = {
    val r = Eval.rocAuc(df, "score", "y", buckets).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("tied ranks use the Mann-Whitney average-rank form exactly") {
    // scores 10,20,20,30 / labels 0,0,1,1 -> ranks 1, 2.5, 2.5, 4;
    // R+ = 2.5 + 4 = 6.5; AUC = (6.5 - 3) / (2*2) = 0.875
    val df = scored((10L, 0L), (20L, 0L), (20L, 1L), (30L, 1L))
    assert(auc(df).contains(0.875))
  }

  test("perfect, inverted, and all-tied rankings score 1, 0, 0.5") {
    val perfect = scored((1L, 0L), (2L, 0L), (8L, 1L), (9L, 1L))
    val inverted = scored((9L, 0L), (8L, 0L), (1L, 1L), (2L, 1L))
    val tied = scored((5L, 0L), (5L, 0L), (5L, 1L), (5L, 1L))
    assert(auc(perfect).contains(1.0))
    assert(auc(inverted).contains(0.0))
    assert(auc(tied).contains(0.5))
  }

  test("single-class and empty inputs yield NULL auc with honest counts") {
    val onlyPos = Eval.rocAuc(scored((1L, 1L), (2L, 1L)), "score", "y").head()
    assert(onlyPos.isNullAt(0) && onlyPos.getLong(1) == 2L && onlyPos.getLong(2) == 0L)
    val empty = Eval.rocAuc(scored(), "score", "y").head()
    assert(empty.isNullAt(0) && empty.getLong(1) == 0L && empty.getLong(2) == 0L)
  }

  test("bucket count never changes the result (the prefix is exact)") {
    val df = scored((0 until 500).map(i =>
      (((i * 7919) % 97).toLong, (i % 3 == 0, i % 97 < 40) match {
        case (true, _) => 1L
        case (_, hi) => if (hi) 1L else 0L
      })): _*)
    val reference = auc(df, buckets = 1)
    assert(reference.isDefined)
    Seq(2, 7, 64, 1024, 100000).foreach { b =>
      assert(auc(df, b) == reference, s"buckets=$b diverged")
    }
    assert(auc(df.repartition(13), 64) == reference, "repartition diverged")
  }

  test("auc matches brute-force concordant-pair counting") {
    val rows = (0 until 300).map { i =>
      val s = ((i * 31) % 50).toLong
      val y = if ((i * 17) % 7 < 3 && s > 20) 1L else if ((i * 13) % 11 == 0) 1L else 0L
      (s, y)
    }
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val pairs = for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    val brute = pairs.sum / (pos.size.toDouble * neg.size.toDouble)
    val got = auc(rows.toDF("score", "y")).get
    assert(math.abs(got - brute) < 1e-12, s"got $got want $brute")
  }

  test("confusion matrix and rates at a threshold") {
    // threshold 50: pred+ = {60y1, 70y0, 50y1}, pred- = {40y1, 10y0, 20y0}
    val df = scored((60L, 1L), (70L, 0L), (50L, 1L), (40L, 1L), (10L, 0L), (20L, 0L))
    val r = Eval.binaryConfusion(df, "score", "y", 50L).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 1L, 1L, 2L)))
    assert(r.getDouble(4) == 2.0 / 3.0) // prec
    assert(r.getDouble(5) == 2.0 / 3.0) // rec
    val p = 2.0 / 3.0
    assert(r.getDouble(6) == (2.0 * p * p) / (p + p)) // f1
    assert(r.getDouble(7) == 4.0 / 6.0) // acc
  }

  test("calibration bins: clamped binning, exact per-bin rates") {
    // micro-unit probabilities; 1e6 and out-of-range clamp to edge bins
    val df = scored((50000L, 0L), (60000L, 1L), (150000L, 0L),
      (999999L, 1L), (1000000L, 1L), (1200000L, 1L), (-5L, 0L))
    val rows = Eval.calibrationBins(df, "score", "y", bins = 10)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(rows.map(_._1) == Seq(0L, 1L, 9L))
    val b0 = rows(0)
    assert(b0._2 == 3L && b0._3 == 109995.0 / (1e6 * 3.0) && b0._4 == 1.0 / 3.0)
    assert(rows(1) == ((1L, 1L, 0.15, 0.0)))
    val b9 = rows(2)
    assert(b9._2 == 3L && b9._4 == 1.0)
    // a perfectly calibrated synthetic screen has mean_pred ~ frac_pos
    val calib = (0 until 1000).map { i =>
      val p = (i % 100) * 10000L + 5000L // 0.005 .. 0.995
      (p, if ((i * 37) % 1000 < p / 1000) 1L else 0L)
    }
    val ece = Eval.calibrationBins(calib.toDF("score", "y"), "score", "y", 10)
      .collect().map(r => r.getLong(1).toDouble *
        math.abs(r.getDouble(2) - r.getDouble(3))).sum / 1000.0
    assert(ece < 0.05, s"synthetic calibrated screen has ECE $ece")
  }

  test("empty denominators yield NULL rates, not a crash") {
    // nothing predicted positive -> prec NULL; no positives -> rec NULL
    val noPos = scored((10L, 0L), (20L, 0L))
    val r = Eval.binaryConfusion(noPos, "score", "y", 100L).head()
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    assert(r.getDouble(7) == 1.0) // all correctly negative
    val emptyR = Eval.binaryConfusion(scored(), "score", "y", 0L).head()
    assert(emptyR.isNullAt(7))
  }

  private def ap(df: DataFrame, buckets: Int = 1024): Option[Double] = {
    val r = Eval.averagePrecision(df, "score", "y", buckets).head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("averagePrecision: hand-computed step-wise PR area with a tie step") {
    // desc thresholds: t=3 TP=1 PP=1 (prec 1); t=2 TP=2 PP=3
    // (prec_micro = 666666); t=1 adds no positives ->
    // AP = (1e6 + 666666) / (2 * 1e6)
    val df = scored((3L, 1L), (2L, 0L), (2L, 1L), (1L, 0L))
    assert(ap(df).contains(1666666.0 / 2e6))
  }

  test("averagePrecision: perfect ranking is exactly 1.0, inverted is the prior-heavy floor") {
    val perfect = scored((9L, 1L), (8L, 1L), (2L, 0L), (1L, 0L))
    assert(ap(perfect).contains(1.0))
    // inverted: positives at the bottom; t=2: TP=1 PP=3, t=1: TP=2 PP=4
    // -> (333333 + 500000) / 2e6
    val inverted = scored((9L, 0L), (8L, 0L), (2L, 1L), (1L, 1L))
    assert(ap(inverted).contains(833333.0 / 2e6))
  }

  test("averagePrecision: no positives or empty input yields NULL with honest counts") {
    val r = Eval.averagePrecision(scored((5L, 0L), (3L, 0L)), "score", "y").head()
    assert(r.isNullAt(0) && r.getLong(1) == 0L && r.getLong(2) == 2L)
    val e = Eval.averagePrecision(scored(), "score", "y").head()
    assert(e.isNullAt(0) && e.getLong(1) == 0L && e.getLong(2) == 0L)
  }

  test("averagePrecision: bucket count never changes the result") {
    val df = scored((0 until 200).map(i =>
      ((i * 37 % 101).toLong, (i % 3 == 0).compare(false).toLong)): _*)
    val reference = ap(df, buckets = 1)
    assert(reference == ap(df, buckets = 7))
    assert(reference == ap(df, buckets = 1024))
  }

  test("binaryMutualInfo: perfect dependence, independence, hand cells") {
    import org.apache.spark.sql.functions.col
    // b == y exactly, balanced: MI = ln 2 (each half-cell floors alone)
    val dep = (0 until 40).map(i =>
      (if (i % 2 == 0) 1.0 else -1.0, (1 - i % 2).toLong)).toDF("f0", "y")
    val d = Eval.binaryMutualInfo(dep, Seq("f0"), "y").head()
    assert(d.getAs[Long]("mi_nano") ==
      2 * math.floor(0.5 * math.log(2.0) * 1e9).toLong)
    // independent balanced: every cell n/4, every ln term exactly 0
    val ind = (0 until 40).map(i =>
      (if (i % 2 == 0) 1.0 else -1.0, (i / 2 % 2).toLong)).toDF("f0", "y")
    assert(Eval.binaryMutualInfo(ind, Seq("f0"), "y")
      .head().getAs[Long]("mi_nano") == 0L)
    // hand 2x2: n=10, nb1=4, ny1=5, n11=3
    val rows = Seq((1.0, 1L), (1.0, 1L), (1.0, 1L), (1.0, 0L),
      (-1.0, 1L), (-1.0, 1L), (-1.0, 0L), (-1.0, 0L), (-1.0, 0L),
      (-1.0, 0L)).toDF("f0", "y")
    def t(nby: Long, nb: Long, ny: Long): Long =
      if (nby == 0) 0L
      else math.floor(nby.toDouble / 10 *
        math.log(nby.toDouble * 10 / (nb.toDouble * ny)) * 1e9).toLong
    val want = t(3, 4, 5) + t(1, 4, 5) + t(2, 6, 5) + t(4, 6, 5)
    assert(Eval.binaryMutualInfo(rows, Seq("f0"), "y")
      .head().getAs[Long]("mi_nano") == want)
    // multi-feature: one pass, one row per feature, order preserved
    val multi = Eval.binaryMutualInfo(
      dep.withColumn("f1", col("f0") * -1.0), Seq("f0", "f1"), "y")
      .orderBy("feature").collect()
    assert(multi.map(_.getString(0)).toSeq == Seq("f0", "f1"))
    // the anti-correlated feature carries the SAME information
    assert(multi(0).getAs[Long]("mi_nano") == multi(1).getAs[Long]("mi_nano"))
  }

  test("recallAtK: per-query overlap, missing queries score zero") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (2L, 21L), (3L, 30L), (3L, 31L)).toDF("qid", "nid")
    // q1: 2 of 4 hit; q2: both hit; q3: the index returned nothing
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L),
      (2L, 21L), (2L, 20L)).toDF("qid", "nid")
    val r = Eval.recallAtK(approx, exact, "qid", "nid")
      .orderBy("q").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      x.getLong(3))).toSeq ==
      Seq((1L, 4L, 2L, 500000L), (2L, 2L, 2L, 1000000L),
        (3L, 2L, 0L, 0L)))
    assert(r.map(_.getDouble(4)).toSeq == Seq(0.5, 1.0, 0.0))
  }

  test("recallAtK: duplicate approx pairs don't inflate hits or the base") {
    val exact = Seq((1L, 10L), (1L, 11L)).toDF("qid", "nid")
    // (1,10) repeated 3x: a naive join would turn q1 into n_exact=4 n_hit=3
    val approx = Seq((1L, 10L), (1L, 10L), (1L, 10L)).toDF("qid", "nid")
    val r = Eval.recallAtK(approx, exact, "qid", "nid").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSeq == Seq((1L, 2L, 1L)))
    assert(r.head.getDouble(4) == 0.5)
  }

  test("binaryMutualInfo: NULL feature/label rows are out of n and cells") {
    val rows = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 1.0), (1.0, 1.0), (-1.0, 0.0), (-1.0, 0.0),
      (null, 1.0), (1.0, null)).toDF("f0", "y")
    val r = Eval.binaryMutualInfo(rows, Seq("f0"), "y").head()
    // only the 4 fully-observed rows count: perfect dependence, n=4
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("mi_nano") == math.floor(math.log(2.0) * 1e9).toLong)
  }

  test("recallAtK: approx rows outside the truth set never score") {
    val exact = Seq((1L, 10L)).toDF("qid", "nid")
    val approx = Seq((1L, 77L), (1L, 78L), (9L, 10L)).toDF("qid", "nid")
    val r = Eval.recallAtK(approx, exact, "qid", "nid").collect()
    // qid 9 isn't a ground-truth query: no row for it, and q1 scores 0
    assert(r.map(x => (x.getLong(0), x.getLong(2))).toSeq == Seq((1L, 0L)))
  }

  test("recallAtK on the real index pair: brute-force L2 vs itself is 1") {
    val emb = graft.ext.Fixtures.plantedVectors(spark)
    val ex = Similarity.bruteForceTopKL2(emb,
      emb.filter($"vec_id" < 3), "vec_id", "embedding", k = 5)
    val r = Eval.recallAtK(ex, ex, "qid", "nid").collect()
    assert(r.length == 3 && r.forall(_.getLong(3) == 1000000L))
    // and self sits at rank 1 with distance 0
    assert(ex.filter($"rank" === 1).collect()
      .forall(x => x.getAs[Long]("qid") == x.getAs[Long]("nid") &&
        x.getAs[Double]("dist") == 0.0))
  }

  test("averagePrecision matches a brute-force replay of the formula") {
    val rows = (0 until 300).map(i =>
      ((i * 53 % 97).toLong, if (i % 4 == 0) 1L else 0L))
    val got = ap(rows.toDF("score", "y")).get
    // brute force: per distinct threshold desc, np * ((TP*1e6) / PP)
    val byScore = rows.groupBy(_._1).map { case (s, g) =>
      (s, g.count(_._2 == 1L).toLong, g.size.toLong)
    }.toSeq.sortBy(-_._1)
    val p = byScore.map(_._2).sum
    var tp = 0L; var pp = 0L; var num = 0L
    byScore.foreach { case (_, np, na) =>
      tp += np; pp += na; num += np * (tp * 1000000L / pp)
    }
    assert(got == num.toDouble / (p.toDouble * 1e6))
  }
}
