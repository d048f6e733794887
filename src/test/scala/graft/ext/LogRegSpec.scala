package graft.ext

import graft.SparkTestBase

class LogRegSpec extends SparkTestBase {
  import spark.implicits._

  // the operator's exact arithmetic, replayed sequentially: same
  // left-associated dot product, same floor nano-quantization, same
  // update expression — training parity must be EXACT, not approximate
  private def brute(rows: Seq[(Double, Seq[Double])], iters: Int,
      lr: Double): Array[Double] = {
    val d = rows.head._2.size
    val n = rows.size
    var w = Array.fill(d + 1)(0.0)
    for (_ <- 0 until iters) {
      val g = Array.fill(d + 1)(0L)
      rows.foreach { case (y, fs) =>
        val z = fs.zip(w.toSeq.tail).foldLeft(w(0)) {
          case (acc, (f, wj)) => acc + wj * f
        }
        val s = 1.0 / (1.0 + math.exp(-z))
        val err = s - y
        (1.0 +: fs).zipWithIndex.foreach { case (f, j) =>
          g(j) += math.floor(err * f * 1e9).toLong
        }
      }
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * (g(j).toDouble / 1e9 / n)
      }
    }
    w
  }

  private val rows: Seq[(Double, Seq[Double])] =
    (1 to 40).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      // separable-ish: feature 1 tracks the label with noise-free offset
      (y, Seq(y * 0.6 + 0.2 + (i % 5) * 0.01, (i % 7) * 0.1))
    }

  private def df = rows.zipWithIndex
    .map { case ((y, fs), i) => (i.toLong, y, fs(0), fs(1)) }
    .toDF("id", "y", "f1", "f2")

  test("train matches the sequential replay exactly, per iteration") {
    for (iters <- Seq(1, 3, 8)) {
      val w = LogReg.train(df, Seq("f1", "f2"), "y", iters = iters)
      val exp = brute(rows, iters, 1.0)
      assert(w.toSeq == exp.toSeq, s"iters=$iters")
    }
  }

  test("training separates the classes") {
    val w = LogReg.train(df, Seq("f1", "f2"), "y", iters = 20, lr = 2.0)
    val scored = LogReg.predict(df, Seq("f1", "f2"), w)
      .select("y", "score").collect()
    val pos = scored.filter(_.getDouble(0) == 1.0).map(_.getDouble(1))
    val neg = scored.filter(_.getDouble(0) == 0.0).map(_.getDouble(1))
    assert(pos.min > neg.max, s"pos ${pos.min} vs neg ${neg.max}")
  }

  test("predict: score_micro is the floor of score in micro-units") {
    val w = Array(0.1, -0.2, 0.3)
    val out = LogReg.predict(df, Seq("f1", "f2"), w)
      .select("score", "score_micro").collect()
    out.foreach { r =>
      assert(r.getLong(1) == math.floor(r.getDouble(0) * 1e6).toLong)
    }
  }

  test("weight arity is validated") {
    intercept[IllegalArgumentException] {
      LogReg.predict(df, Seq("f1", "f2"), Array(0.0, 0.0))
    }
  }
}
