package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed n-gram language model with Stupid Backoff (Brants et al.
  * 2007, "Large Language Models in Machine Translation" — the smoothing
  * designed FOR sharded count tables: no discount normalization, so
  * training is three count aggregations and scoring is pure joins).
  * This is the CCNet-style quality signal (Wenzek et al. 2020): train on
  * a trusted slice, score every document by mean token log-probability,
  * keep/bucket by the score.
  *
  * Contract (deterministic on any engine):
  *   - tokens are the plain space split; two `<s>` pads open each doc so
  *     every real token is scored with a full trigram context;
  *   - S(w|u,v) = c(uvw)/c(uv)                          if c(uvw) > 0
  *                α·c(vw)/c(v)                          else if c(vw) > 0
  *                α²·(c(w)+1)/(N+V)                     otherwise
  *     with α = 0.4 (the paper's constant); the final level is the
  *     add-one unigram so unseen words score finite, never −∞;
  *   - per-token log10 scores quantize as floor(log10(S)·1e6) into LONG
  *     micro-units (floor of an identical double is identical on every
  *     engine — the same scheme as PageRank's carry), summed exactly;
  *     the mean is one double quotient of those exact integers.
  *
  * Scale shape: the three count tables are ordinary hash-aggregates of
  * the training corpus (linear, map-side partial); scoring explodes the
  * scored corpus once into (doc, u, v, w) rows and resolves the backoff
  * ladder with five key joins whose strategies are AQE's choice — a
  * 100 TB corpus's trigram table does not broadcast, and nothing here
  * assumes it does. N and V are two bounded driver scalars. */
object NgramLm {

  /** Count tables + totals. `uni` (w, c), `bi` (w1, w2, c) over the
    * padded stream, `tri` (w1, w2, w3, c); `n` real tokens, `v` distinct
    * real words. */
  case class Model(uni: DataFrame, bi: DataFrame, tri: DataFrame,
      n: Long, v: Long)

  /** Train the backoff model on `df`'s `textCol`.
    *
    * (r15 optimization note: persisting `uni` and deriving n/v from the
    * cached table — saving two corpus scans on paper — was tried and
    * REVERTED: x_lm_score measured 2.3 s -> 5.1 s with the persist in
    * place, same host, back-to-back. The uni table is cheap to
    * recompute and small to join; materializing it as an
    * InMemoryRelation cost more than the scan it saved and perturbed
    * the score-join planning. Left as-is deliberately.) */
  def train(df: DataFrame, textCol: String): Model = {
    val t = col(textCol)
    val p = df.select(t.as("__t"), split(t, " ").as("ws"))
    def counts(k: Int, names: Seq[String]): DataFrame =
      p.select(explode(PaddedNgrams(col("__t"), k, 2)).as("g"))
        .select((1 to k).map(j => col(s"g.g$j").as(names(j - 1))): _*)
        .groupBy(names.map(col): _*).agg(count(lit(1)).as("c"))
    val uni = p.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val r0 = p.agg(sum(size(col("ws"))).as("n")).collect()(0)
    val n = r0.getLong(0)
    val v = uni.count()
    Model(uni, counts(2, Seq("w1", "w2")), counts(3, Seq("w1", "w2", "w3")),
      n, v)
  }

  /** Score every document of `df`: (id, n_scored, logprob_micro,
    * lm_score). `n_scored` = real token count (every token has a padded
    * trigram context), `logprob_micro` the exact summed micro-units,
    * `lm_score` their mean in log10 per token. */
  def score(model: Model, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val id = col(idCol)
    val toks = df.select(id, explode(PaddedNgrams(col(textCol), 3, 2)).as("g"))
      .select(id, col("g.g1").as("u"), col("g.g2").as("v"), col("g.g3").as("w"))
    // the bigram table feeds three probes: pair (u,v), pair (v,w) and the
    // context total c(v) — persist it for the pipeline's lifetime
    val bi = model.bi.persist()
    val cv = bi.groupBy(col("w1").as("v")).agg(sum(col("c")).as("c_v"))
    val joined = toks
      .join(model.tri.select(col("w1").as("u"), col("w2").as("v"),
        col("w3").as("w"), col("c").as("c_uvw")), Seq("u", "v", "w"), "left")
      .join(bi.select(col("w1").as("u"), col("w2").as("v"),
        col("c").as("c_uv")), Seq("u", "v"), "left")
      .join(bi.select(col("w1").as("v"), col("w2").as("w"),
        col("c").as("c_vw")), Seq("v", "w"), "left")
      .join(cv, Seq("v"), "left")
      .join(model.uni.select(col("w"), col("c").as("c_w")), Seq("w"), "left")
    val alpha = lit(0.4)
    val s = when(col("c_uvw").isNotNull,
      col("c_uvw").cast("double") / col("c_uv"))
      .otherwise(alpha * when(col("c_vw").isNotNull,
        col("c_vw").cast("double") / col("c_v"))
        .otherwise(alpha * ((coalesce(col("c_w"), lit(0L)) + lit(1L))
          .cast("double") / lit(model.n + model.v))))
    joined
      .select(id, floor(log10(s) * lit(1e6)).cast("long").as("lp"))
      .groupBy(id)
      .agg(count(lit(1)).as("n_scored"), sum(col("lp")).as("logprob_micro"))
      .select(id, col("n_scored"), col("logprob_micro"),
        (col("logprob_micro").cast("double") / lit(1e6) / col("n_scored"))
          .as("lm_score"))
  }

  /** CCNet head/middle/tail split: per-`byCol` k-tiles of `scoreCol`
    * descending (ties to the smaller id — fully deterministic). Returns
    * the input plus `tile` (1 = best) and `bucket` (head/middle/tail for
    * k = 3, "t<i>" otherwise). One window shuffle keyed by the group. */
  def buckets(scored: DataFrame, idCol: String, byCol: String,
      scoreCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(byCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val tile = ntile(k).over(w)
    val bucket =
      if (k == 3) when(tile === 1, "head").when(tile === 2, "middle")
        .otherwise("tail")
      else concat(lit("t"), tile)
    scored.withColumn("tile", tile.cast("long")).withColumn("bucket", bucket)
  }
}

/** Native positional padded n-grams: `pads` `<s>` sentinels then the
  * space-split tokens, emitted as (g1..gn) structs for every window with
  * a full left context — one linear pass per row. (The HOF formulation
  * — transform over a sequence with element_at probes — re-evaluated the
  * padded array once per element under interpreted higher-order
  * functions: O(len²) per document, the [[TextKernel]] trap.) Null or
  * too-short input yields an empty array, so explode drops the row —
  * the HOF contract. */
case class PaddedNgrams(child: org.apache.spark.sql.catalyst.expressions.Expression,
    n: Int, pads: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  require(n >= 1 && pads >= 0 && pads >= n - 1,
    s"need pads >= n-1 so every real token has a full context (n=$n pads=$pads)")

  override def dataType: DataType = ArrayType(StructType(
    (1 to n).map(j => StructField(s"g$j", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"padded_ngrams requires string, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => new GenericArrayData(Array.empty[Any])
      case s =>
        val toks = s.asInstanceOf[UTF8String].toString.split(" ", -1)
        val p = new Array[UTF8String](pads + toks.length)
        val bos = UTF8String.fromString("<s>")
        var i = 0
        while (i < pads) { p(i) = bos; i += 1 }
        var j = 0
        while (j < toks.length) {
          p(pads + j) = UTF8String.fromString(toks(j)); j += 1
        }
        val m = p.length - n + 1
        if (m <= 0) new GenericArrayData(Array.empty[Any])
        else {
          val out = new Array[Any](m)
          var k = 0
          while (k < m) {
            val fields = new Array[Any](n)
            var f = 0
            while (f < n) { fields(f) = p(k + f); f += 1 }
            out(k) =
              new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields)
            k += 1
          }
          new GenericArrayData(out)
        }
    }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): PaddedNgrams =
    copy(child = newChild)

  override def prettyName: String = "padded_ngrams"
}

object PaddedNgrams {
  def apply(c: Column, n: Int, pads: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new PaddedNgrams(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), n, pads))
}
