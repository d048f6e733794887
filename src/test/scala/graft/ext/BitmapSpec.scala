package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BitmapSpec extends SparkTestBase {
  import spark.implicits._

  test("setOps: hand-checked overlap across word boundaries") {
    // A = {0, 63, 64, 200}, B = {63, 64, 65} — members straddle words
    val rows = Seq(0L, 63L, 64L, 200L).map(("A", _)) ++
      Seq(63L, 64L, 65L).map(("B", _))
    val bm = Bitmap.build(rows.toDF("seg", "k"), "seg", "k")
    val r = Bitmap.setOps(bm, "A", "B").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 3L, 2L, 5L)))
    // inclusion-exclusion holds exactly
    assert(r.getLong(0) + r.getLong(1) - r.getLong(2) == r.getLong(3))
  }

  test("duplicates collapse; bit_or re-fold is idempotent") {
    val dup = (Seq.fill(5)(("A", 7L)) ++ Seq(("A", 8L), ("B", 7L)))
      .toDF("seg", "k")
    val bm = Bitmap.build(dup, "seg", "k")
    val r = Bitmap.setOps(bm, "A", "B").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L && r.getLong(2) == 1L)
    // folding the bitmap with itself changes nothing (replay-safe,
    // unlike counter folds)
    val refolded = bm.unionAll(bm).groupBy("segment", "word")
      .agg(bit_or(col("bits")).as("bits"))
    val r2 = Bitmap.setOps(refolded, "A", "B").head()
    assert(r2.getLong(3) == r.getLong(3))
  }

  test("disjoint segments and negative-key scrub") {
    val rows = Seq(("A", 1L), ("A", -5L), ("B", 1000000L)).toDF("seg", "k")
    val r = Bitmap.setOps(Bitmap.build(rows, "seg", "k"), "A", "B").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 1L, 0L, 2L)))
  }
}
