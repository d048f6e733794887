package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of an embedding column — the 8x memory/IO
  * compression an ANN index at 100 TB applies before anything else (a
  * 64-float vector is 256 bytes; its codes are 64).
  *
  * Per-DIMENSION affine codes: one aggregation pass computes the global
  * per-dim min/max (posexplode -> hash-agg keyed on dim — the shuffle key
  * count equals the dimensionality, independent of corpus size), the tiny
  * codebook broadcasts back, and
  *
  *   code = round(255 * (v - lo) / (hi - lo))
  *
  * in double precision — every operand is bit-identical across engines
  * and partitionings, so codes are deterministic. Dequantize with
  * lo + code * (hi - lo) / 255; per-element error is bounded by
  * (hi - lo) / 510 (half a quantization step).
  *
  * Output stays columnar as (id, dim, code) rows — joins/aggregates
  * downstream remain narrow; reassemble arrays via sort_array over
  * collect_list(struct(dim, code)) only at the consumer that needs them.
  * Constant dimensions (hi == lo) map to code 0.
  */
object Quantize {

  /** Per-dimension codebook: (dim, lo, hi) in double precision. */
  def codebook(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"), col("v").cast("double").as("v"))
      .groupBy(col("dim"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))

  /** int8 codes per (id, dim). The exploded corpus feeds both the
    * codebook aggregation and the code computation, so it is persisted;
    * `eager = true` materializes the codes and releases the persist
    * (see Dedup.finishEager — the long-lived-service lifecycle). */
  def int8Codes(df: DataFrame, idCol: String, vecCol: String,
      eager: Boolean = false): DataFrame = {
    val ex = df.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("id"), col("dim").cast("long").as("dim"),
        col("v").cast("double").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = ex.groupBy(col("dim"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val out = ex.join(broadcast(cb), "dim")
      .select(col("id"), col("dim"),
        when(col("hi") === col("lo"), lit(0))
          .otherwise(round(lit(255.0) * (col("v") - col("lo")) /
            (col("hi") - col("lo"))).cast("int")).as("code"))
    Dedup.finishEager(out, eager, Seq(ex))
  }

  /** Dequantized values from codes + codebook: (id, dim, deq). */
  def dequantize(codes: DataFrame, codebook: DataFrame): DataFrame =
    codes.join(broadcast(codebook), "dim")
      .select(col("id"), col("dim"),
        (col("lo") + col("code").cast("double") * (col("hi") - col("lo")) /
          lit(255.0)).as("deq"))
}
