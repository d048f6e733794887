package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** int8 scalar quantization: code range, reconstruction error bound,
  * determinism across partitionings, eager lifecycle. */
class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(0.0f, -1.0f, 10.0f, 5.0f)),
    (1L, Array(1.0f, 1.0f, 10.0f, 5.0f)),
    (2L, Array(0.5f, 0.0f, 30.0f, 5.0f)),
    (3L, Array(0.25f, -0.5f, 20.0f, 5.0f))).toDF("vec_id", "embedding")

  test("codes span [0, 255] per dim; constant dim maps to 0") {
    val codes = Quantize.int8Codes(vecs, "vec_id", "embedding")
    val byDim = codes.groupBy("dim")
      .agg(min("code").as("lo"), max("code").as("hi"))
      .orderBy("dim").as[(Long, Int, Int)].collect().toSeq
    // every non-constant dim hits both extremes (its min -> 0, max -> 255);
    // dim 3 is constant -> all codes 0
    assert(byDim == Seq((0L, 0, 255), (1L, 0, 255), (2L, 0, 255), (3L, 0, 0)))
  }

  test("dequantization error bounded by half a step: (hi-lo)/510") {
    val cb = Quantize.codebook(vecs, "embedding")
    val codes = Quantize.int8Codes(vecs, "vec_id", "embedding")
    val truth = vecs.select(col("vec_id").as("id"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("id"), col("dim").cast("long").as("dim"),
        col("v").cast("double").as("v"))
    val err = Quantize.dequantize(codes, cb)
      .join(truth, Seq("id", "dim"))
      .join(broadcast(cb), "dim")
      .select((abs(col("deq") - col("v")) -
        (col("hi") - col("lo")) / lit(510.0)).as("excess"))
      .agg(max(col("excess"))).as[Double].collect()(0)
    assert(err <= 1e-12, s"reconstruction error exceeds half a step by $err")
  }

  test("codes identical across partitionings (deterministic affine map)") {
    val a = Quantize.int8Codes(vecs.repartition(1), "vec_id", "embedding")
      .orderBy("id", "dim").as[(Long, Long, Int)].collect().toSeq
    val b = Quantize.int8Codes(vecs.repartition(7), "vec_id", "embedding")
      .orderBy("id", "dim").as[(Long, Long, Int)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("eager lifecycle: no cache entry outlives the call") {
    spark.catalog.clearCache()
    val out = Quantize.int8Codes(vecs, "vec_id", "embedding", eager = true)
    assert(org.apache.spark.sql.graftbridge.Bridge.cacheEmpty(spark))
    assert(out.count() == 16)
    spark.catalog.clearCache()
  }
}
