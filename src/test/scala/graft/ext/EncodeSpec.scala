package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EncodeSpec extends SparkTestBase {
  import spark.implicits._

  test("targetEncode: exact blend, shrinkage toward the global mean") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0)).toDF("cat", "y")
    val got = Encode.targetEncode(df, "cat", "y", m = 10L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // cents: a -> (2, 3000), b -> (1, 10000); mu = 13000/3 cents
    val mu = 13000.0 / 3.0
    assert(got("a") == ((2L, (3000.0 + 10.0 * mu) / 12.0 / 100.0)))
    assert(got("b") == ((1L, (10000.0 + 10.0 * mu) / 11.0 / 100.0)))
    // the singleton lands between its own value and the global mean,
    // and much nearer the global mean at m = 10
    val gm = mu / 100.0
    assert(got("b")._2 > gm && got("b")._2 < 100.0)
    assert(got("b")._2 - gm < (100.0 - gm) * 0.2)
  }

  test("m = 0 reduces to the plain category mean") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0)).toDF("cat", "y")
    val got = Encode.targetEncode(df, "cat", "y", m = 0L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("a") == 15.0 && got("b") == 100.0)
  }

  test("collapseRare: tail folds to OTHER, frequent categories untouched") {
    import spark.implicits._
    val df = (Seq.fill(5)("big") ++ Seq("rare1", "rare2", "rare2"))
      .map((_, 1.0)).toDF("cat", "v")
    val got = Encode.collapseRare(df, "cat", minCount = 3L)
      .groupBy("cat").count().as[(String, Long)].collect().toMap
    assert(got == Map("big" -> 5L, "OTHER" -> 3L))
    // threshold is inclusive: exactly minCount occurrences survive
    val edge = Encode.collapseRare(df, "cat", minCount = 5L)
      .groupBy("cat").count().as[(String, Long)].collect().toMap
    assert(edge == Map("big" -> 5L, "OTHER" -> 3L))
    val all = Encode.collapseRare(df, "cat", minCount = 6L)
      .groupBy("cat").count().as[(String, Long)].collect().toMap
    assert(all == Map("OTHER" -> 8L))
  }

  test("denseIds: a bijection onto [0, n), stable, bucket-count invariant") {
    import spark.implicits._
    val keys = (1 to 500).map(i => s"k$i") ++ (1 to 100).map(i => s"k$i") // dups
    val df = keys.toDF("key")
    val ids = Encode.denseIds(df, "key", buckets = 16)
      .as[(String, Long)].collect().toMap
    assert(ids.size == 500)
    assert(ids.values.toSeq.sorted == (0L until 500L))
    // the id is a pure function of the key set, not of bucketing or
    // input order: 1 bucket (one global rank) must agree exactly
    val one = Encode.denseIds(df.orderBy(rand(7)), "key", buckets = 1)
      .as[(String, Long)].collect().toMap
    assert(one == ids)
  }
}
