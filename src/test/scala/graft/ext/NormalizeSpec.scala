package graft.ext

import graft.SparkTestBase

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  test("quantileNormalize: hand-checked rank means, distributions identical after") {
    // A sorted: 2,3,5; B sorted: 1,4,4 (tie broken by id) ->
    // rank means 1.5, 3.5, 4.5
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("b", 4L, 4.0), ("b", 5L, 1.0), ("b", 6L, 4.0))
      .toDF("g", "id", "v")
    val r = Normalize.quantileNormalize(df, "g", "v", "id")
      .orderBy($"g", $"rank").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(3), x.getDouble(4)))
    assert(r.toSeq == Seq(
      ("a", 2L, 1L, 1.5), ("a", 3L, 2L, 3.5), ("a", 1L, 3L, 4.5),
      ("b", 5L, 1L, 1.5), ("b", 4L, 2L, 3.5), ("b", 6L, 3L, 4.5)))
    // the point of the transform: every group now holds the same multiset
    val perGroup = Normalize.quantileNormalize(df, "g", "v", "id")
      .groupBy($"g").agg(org.apache.spark.sql.functions
        .sort_array(org.apache.spark.sql.functions.collect_list($"nv"))
        .as("d"))
      .select("d").as[Seq[Double]].collect()
    assert(perGroup.distinct.length == 1, "post-transform distributions differ")
  }

  test("quantileNormalize: unequal group sizes fail loudly; tie order deterministic") {
    val bad = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0))
      .toDF("g", "id", "v")
    val e = intercept[IllegalArgumentException] {
      Normalize.quantileNormalize(bad, "g", "v", "id")
    }
    assert(e.getMessage.contains("equal group sizes"))
    // all-tied values: rank order falls back to the tie column alone
    val tied = Seq(("a", 2L, 7.0), ("a", 1L, 7.0), ("b", 4L, 1.0), ("b", 3L, 2.0))
      .toDF("g", "id", "v")
    val out = Normalize.quantileNormalize(tied, "g", "v", "id")
      .orderBy($"g", $"rank").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 1L), ("a", 2L), ("b", 4L), ("b", 3L)),
      "within-group order must be (v, tie)")
  }
}
