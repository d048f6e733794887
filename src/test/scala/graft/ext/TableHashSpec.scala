package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TableHashSpec extends SparkTestBase {
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val cols = df.columns.toSeq.map(col)
    TableHash.fingerprint(df, cols).as[(Long, String)].collect()(0)
  }

  test("fingerprint is row-order and partition independent") {
    val df = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    assert(fp(df) == fp(df.orderBy(rand(7)).repartition(13)))
  }

  test("any cell change, added row, or duplicated row moves the sum") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val variants = Seq(
      Seq((1L, "a"), (2L, "c")).toDF("k", "s"),            // cell edit
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"), // extra row
      Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("k", "s")) // dup (xor-blind)
    val b = fp(base)
    variants.foreach(v => assert(fp(v) != b))
  }

  test("null is distinct from empty string and column split is unambiguous") {
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("k", "s")
    val withEmpty = Seq((1L, "")).toDF("k", "s")
    assert(fp(withNull) != fp(withEmpty))
    // ("ab","") must not collide with ("a","b") — the chr(31) separator
    assert(fp(Seq(("ab", "")).toDF("a", "b")) != fp(Seq(("a", "b")).toDF("a", "b")))
  }
}
