package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The hashing trick: project unbounded categorical features into a
  * FIXED-width signed bucket space (Weinberger et al., ICML'09) — the
  * feature-engineering step that lets a 100 TB corpus with billions of
  * distinct feature values feed a fixed-dimension model without ever
  * materializing (or shipping to the driver) a vocabulary.
  *
  * Portability: bucket and sign come from md5 over "name=value" (the
  * repo-wide engine-portable draw, same as [[BloomJoin]] /
  * [[Sampling]]): bucket = first 32 hash bits mod `buckets`, sign = the
  * next hex digit's parity. Deterministic across engines, runs, and
  * partitionings; the signed draw makes collision noise zero-mean
  * (E[colliding contribution] = 0), which is the point of the trick.
  *
  * Scale shape: per-row map-only arithmetic inside codegen (one md5 per
  * feature per row, no vocabulary state, no shuffle) until the caller
  * aggregates; the aggregated profile is `buckets` rows however large
  * the corpus.
  */
object FeatureHash {

  private def token(f: String): Column =
    concat(lit(f + "="), col(f).cast("string"))

  /** Per-row exploded (bucket, sign) pairs over `features`; NULL feature
    * values contribute nothing (the row simply lacks that token). */
  def hashTokens(df: DataFrame, features: Seq[String],
      buckets: Int): DataFrame = {
    require(features.nonEmpty, "hashTokens needs at least one feature")
    require(buckets > 0, s"buckets=$buckets must be positive")
    val pairs = features.map { f =>
      val h = md5(token(f))
      when(col(f).isNotNull, struct(
        (conv(substring(h, 1, 8), 16, 10).cast("long") % buckets)
          .as("bucket"),
        (conv(substring(h, 9, 1), 16, 10).cast("long") % 2 * 2 - 1)
          .as("sign")))
    }
    df.select(explode(array(pairs: _*)).as("p"))
      .filter(col("p").isNotNull)
      .select(col("p.bucket").as("bucket"), col("p.sign").as("sign"))
  }

  /** Per-DOCUMENT dense hashed text features — the fastText-style
    * featurizer (Joulin et al. '16): every padded word bigram hashes to
    * a signed bucket (same md5 draw as [[hashTokens]]), and a document's
    * feature vector is the per-bucket signed count NORMALIZED by its
    * bigram count (bounding features to [−1, 1] keeps full-batch GD
    * conditioned regardless of document length). This is the CONTENT
    * feature map the quality-classifier family was missing: the
    * [[LogReg]] screen trains on 3 shape features (stopword/TTR/length);
    * hashed bigrams let the same replayable trainer learn from what the
    * text actually says, with a fixed width B however large the corpus
    * vocabulary. One native bigram pass + one explode + one map-side-
    * combinable hash-agg; output is |docs| × (id, f0..f{B−1}), every
    * document present — NULL text behaves as empty, and the `<s>` pad
    * guarantees even the empty document one bigram.
    * Sums are exact longs; each feature is one long/long double
    * division — engine-replayable like everything upstream. */
  def textBigramFeatures(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    val h = md5(concat(lit("g="), col("g.g1"), lit(" "), col("g.g2")))
    val ex = df
      .select(col(idCol),
        explode(PaddedNgrams(coalesce(col(textCol), lit("")), 2, 1)).as("g"))
      .select(col(idCol),
        (conv(substring(h, 1, 8), 16, 10).cast("long") % buckets)
          .as("bucket"),
        (conv(substring(h, 9, 1), 16, 10).cast("long") % 2 * 2 - 1)
          .as("sign"))
    val aggs = (0 until buckets).map(b =>
      (coalesce(sum(when(col("bucket") === b, col("sign"))), lit(0L))
        .cast("double") / count(lit(1)).cast("double")).as(s"f$b"))
    ex.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Aggregated hashed profile of the whole frame: per bucket, the
    * signed token sum (the bucket's coordinate in the hashed feature
    * vector) and the unsigned token count. Missing buckets are absent
    * (join against a spine upstream if a dense vector is needed).
    * Output: (bucket, weight, n_tokens), one row per populated bucket. */
  def hashedProfile(df: DataFrame, features: Seq[String],
      buckets: Int): DataFrame =
    hashTokens(df, features, buckets)
      .groupBy(col("bucket"))
      .agg(sum(col("sign")).as("weight"), count(lit(1)).as("n_tokens"))
}
