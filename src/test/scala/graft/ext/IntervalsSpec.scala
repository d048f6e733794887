package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkTestBase {
  import spark.implicits._

  private val spans = Seq(
    // key a: [0,10] overlaps [5,20], [20,25] touches -> one island [0,25];
    // [40,50] separate
    ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 25L), ("a", 40L, 50L),
    // key b: nested span must not extend the island
    ("b", 0L, 100L), ("b", 10L, 20L),
    // key c: single span
    ("c", 7L, 9L)
  ).toDF("k", "s0", "e0")

  test("mergeIntervals coalesces overlapping and touching spans per key") {
    val m = Intervals.mergeIntervals(spans, "k", "s0", "e0")
      .orderBy(col("k"), col("island_start"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(m == Seq(
      ("a", 0L, 25L, 3L), ("a", 40L, 50L, 1L),
      ("b", 0L, 100L, 2L), ("c", 7L, 9L, 1L)))
  }

  test("coverage counts overlap once; naive sum would double-count") {
    val c = Intervals.coverage(spans, "k", "s0", "e0")
      .orderBy(col("k")).as[(String, Long, Long, Long)].collect().toSeq
    assert(c == Seq(
      ("a", 2L, 35L, 4L),   // (25-0) + (50-40); naive sum = 40
      ("b", 1L, 100L, 2L),  // nested: union is the outer span
      ("c", 1L, 2L, 1L)))
  }

  test("result is partition- and input-order independent") {
    val shuffled = Intervals.coverage(
      spans.orderBy(rand(11)).repartition(7), "k", "s0", "e0")
      .orderBy(col("k")).as[(String, Long, Long, Long)].collect().toSeq
    val base = Intervals.coverage(spans, "k", "s0", "e0")
      .orderBy(col("k")).as[(String, Long, Long, Long)].collect().toSeq
    assert(shuffled == base)
  }
}
