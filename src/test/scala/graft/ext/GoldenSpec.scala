package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GoldenSpec extends SparkTestBase {
  import spark.implicits._

  private val feed = Seq(
    // key 1: v2 partial update (name only) must not erase v1's city
    (1L, 1L, Some("alice"), Some("rome")),
    (1L, 2L, Some("alicia"), None),
    // key 2: field null in EVERY version stays null
    (2L, 1L, None, Some("milan")),
    (2L, 2L, None, None),
    // key 3: single version passes through
    (3L, 5L, Some("carol"), Some("bari"))
  ).toDF("id", "v", "name", "city")

  test("each field takes its latest non-null version independently") {
    val out = Golden.survivorship(feed, "id", "v", Seq("name", "city"))
      .orderBy(col("id"))
      .as[(Long, Option[String], Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, Some("alicia"), Some("rome")),
      (2L, None, Some("milan")),
      (3L, Some("carol"), Some("bari"))))
  }

  test("one row per key regardless of version depth; order independent") {
    val deep = (1 to 200).map(v =>
      (9L, v.toLong, if (v == 137) Some("winner") else None,
        Option(s"c$v"))).toDF("id", "v", "name", "city")
    val out = Golden.survivorship(deep.orderBy(rand(3)).repartition(5),
      "id", "v", Seq("name", "city"))
      .as[(Long, Option[String], Option[String])].collect().toSeq
    assert(out == Seq((9L, Some("winner"), Some("c200"))))
  }
}
