package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression quality classifier — the
  * "trusted-reference vs web" filter the GPT-3 / LLaMA data pipelines
  * run after heuristic screens (Brown et al. 2020 App. A;
  * Touvron et al. 2023 §2): train a linear model to recognize the
  * trusted slice, score every document by σ(w·x), keep by threshold or
  * importance-sample by score.
  *
  * Training is full-batch gradient descent with a FIXED iteration
  * count, engineered to replay bit-identically on any engine:
  *
  *   - per-row gradient terms (σ(w·x) − y)·x_j floor-quantize to LONG
  *     nano-units before the sum — the only order-sensitive float
  *     reduction becomes an exact integer sum;
  *   - the weight update w_j ← w_j − lr·(Σ/1e9/n) is a fixed
  *     left-associated expression over those exact integers, so the
  *     weight vector entering every iteration is the same double on
  *     every engine (same scheme as PageRank's quantized carry).
  *
  * Scale shape: one hash-aggregate over the feature table per
  * iteration (map-side partial sums of d+1 longs), d+1 doubles on the
  * driver — no per-row state, no driver-side data. iters is a small
  * constant; the feature table is persisted across iterations. */
object LogReg {

  /** σ(w·x) for the fixed left-associated dot product: bias first, then
    * each feature in declaration order. */
  private def sigmoid(feats: Seq[Column], w: Seq[Double]): Column = {
    val z = feats.zip(w.tail).foldLeft(lit(w.head): Column) {
      case (acc, (f, wj)) => acc + lit(wj) * f
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Train on `df`: `featureCols` numeric columns, `labelCol` a 0/1
    * (or boolean) label. Returns bias-first weights after `iters`
    * full-batch steps at rate `lr` from w = 0. */
  def train(df: DataFrame, featureCols: Seq[String], labelCol: String,
      iters: Int = 8, lr: Double = 1.0): Array[Double] = {
    require(featureCols.nonEmpty && iters > 0)
    val feats = df.select((col(labelCol).cast("double").as("__y") +:
      featureCols.map(c => col(c).cast("double"))): _*).persist()
    try {
      val n = feats.count()
      require(n > 0, "empty training set")
      val d = featureCols.size
      var w = Array.fill(d + 1)(0.0)
      for (_ <- 0 until iters) {
        val s = sigmoid(featureCols.map(col), w.toSeq)
        val err = s - col("__y")
        val gs = (lit(1.0) +: featureCols.map(col)).zipWithIndex.map {
          case (f, j) => sum(floor(err * f * lit(1e9)).cast("long")).as(s"g$j")
        }
        val row = feats.agg(gs.head, gs.tail: _*).collect()(0)
        w = w.zipWithIndex.map { case (wj, j) =>
          wj - lr * (row.getLong(j).toDouble / 1e9 / n)
        }
      }
      w
    } finally feats.unpersist()
  }

  /** Score `df` with trained weights: adds `score` = σ(w·x) and
    * `score_micro` = floor(score·1e6) (the exact engine-independent
    * value to gate on). */
  def predict(df: DataFrame, featureCols: Seq[String],
      weights: Array[Double]): DataFrame = {
    require(weights.length == featureCols.size + 1,
      s"${weights.length} weights for ${featureCols.size} features + bias")
    val s = sigmoid(featureCols.map(c => col(c).cast("double")), weights.toSeq)
    df.withColumn("score", s)
      .withColumn("score_micro", floor(col("score") * lit(1e6)).cast("long"))
  }
}
