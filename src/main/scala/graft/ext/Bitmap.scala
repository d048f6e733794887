package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bitmap-index set algebra over integer keys — EXACT audience
  * intersections/unions at warehouse scale ("users who did A and B"),
  * the precise counterpart of [[Hll.setAlgebra]]'s estimates: a segment's
  * member set packs into 64-bit words ((key div 64) → word index,
  * 1 << (key mod 64) → bit), `bit_or` folds the words per segment, and
  * every set operation becomes word-aligned bitwise arithmetic + a
  * popcount sum. n keys cost n/64 words of state per segment REGARDLESS
  * of how many segments a key belongs to — the roaring-bitmap idea with
  * the run/array compression left to parquet's own encodings.
  *
  * Scale shape: building is one (segment, word) hash aggregation with
  * map-side combine; set ops join two word tables on word id (each
  * |keyspace|/64 rows, dense) and fold to one row. Everything is integer
  * bit arithmetic — identical on every engine, nothing to quantize.
  * Bitmaps persist as plain tables and fold incrementally by `bit_or`
  * (idempotent — unlike counter folds, replaying a batch is harmless).
  */
object Bitmap {

  /** (segment, word, bits) for every segment in `segCol`; keys must be
    * nonnegative integers. */
  def build(df: DataFrame, segCol: String, keyCol: String): DataFrame =
    df.select(col(segCol).as("segment"), col(keyCol).cast("long").as("__k"))
      .filter(col("__k") >= 0)
      .select(col("segment"), expr("__k div 64").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__k % 64 AS INT))").as("__bit"))
      .groupBy(col("segment"), col("word"))
      .agg(bit_or(col("__bit")).as("bits"))

  /** Exact |A|, |B|, |A ∩ B|, |A ∪ B| between two segments of a bitmap
    * table built by [[build]]. */
  def setOps(bitmaps: DataFrame, segA: String, segB: String): DataFrame = {
    val a = bitmaps.filter(col("segment") === segA)
      .select(col("word"), col("bits").as("__a"))
    val b = bitmaps.filter(col("segment") === segB)
      .select(col("word"), col("bits").as("__b"))
    a.join(b, Seq("word"), "full")
      .select(coalesce(col("__a"), lit(0L)).as("__a"),
        coalesce(col("__b"), lit(0L)).as("__b"))
      .agg(sum(bit_count(col("__a")).cast("long")).as("n_a"),
        sum(bit_count(col("__b")).cast("long")).as("n_b"),
        sum(bit_count(col("__a").bitwiseAND(col("__b"))).cast("long")).as("n_and"),
        sum(bit_count(col("__a").bitwiseOR(col("__b"))).cast("long")).as("n_or"))
  }
}
