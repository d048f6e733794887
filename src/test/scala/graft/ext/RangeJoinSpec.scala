package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(df: org.apache.spark.sql.DataFrame, cols: String*) =
    cols.foldLeft(df)((d, c) => d.withColumn(c, timestamp_millis(col(c))))

  test("inclusive bounds, multi-bucket intervals, key separation, overlaps") {
    val points = ts(Seq((1L, 1000L, "p1"), (1L, 5000L, "p2"), (1L, 5001L, "p3"),
      (2L, 2000L, "p4"), (1L, 999L, "p5"))
      .toDF("k", "t", "pid"), "t")
    // interval A [1000, 5000] spans many 1s buckets; B overlaps A
    val intervals = ts(Seq((1L, 1000L, 5000L, "A"), (1L, 4000L, 9000L, "B"))
      .toDF("k", "s", "e", "iid"), "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "s", "e", bucketMs = 1000L)
      .select("pid", "iid").as[(String, String)].collect().toSet
    assert(got == Set(
      ("p1", "A"), // start boundary inclusive
      ("p2", "A"), // end boundary inclusive
      ("p2", "B"), // overlapping intervals both match
      ("p3", "B")))
    // p4: key 2 has no intervals; p5: before every interval
  }
}
