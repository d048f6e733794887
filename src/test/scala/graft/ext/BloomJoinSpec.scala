package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def probe = (1L to 2000L).map(i => (i, s"p$i")).toDF("k", "payload")

  test("bloom join equals the plain join row for row") {
    val build = (1L to 2000L by 7).map(i => (i, s"b$i")).toDF("bk", "tag")
    val got = BloomJoin.join(probe, "k", build, "bk", bits = 1 << 12, k = 4)
      .select("k", "payload", "tag").orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    val want = probe.join(build, col("k") === col("bk"))
      .select("k", "payload", "tag").orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    assert(got == want && want.size == 286)
  }

  test("disjoint build prunes nearly the whole probe before the join") {
    val build = (100001L to 100500L).map(i => Tuple1(i)).toDF("bk")
    val words = BloomJoin.buildFilter(build, "bk", bits = 1 << 14, k = 4)
    val survivors = BloomJoin.pruneProbe(probe, "k", words, 1 << 14, 4).count()
    // 500 keys x 4 bits in 16384 -> ~12% fill; fp rate ~ 0.12^4 ~ 2e-4
    assert(survivors < 40, s"bloom let $survivors of 2000 non-matching rows through")
    // and whatever leaks is removed by the exact join
    assert(BloomJoin.join(probe, "k", build, "bk", 1 << 14, 4).count() == 0)
  }

  test("filter size is fixed by bits, not by build cardinality") {
    val big = spark.range(50000).select(col("id").as("bk"))
    val words = BloomJoin.buildFilter(big, "bk", bits = 1 << 10, k = 2)
    assert(words.length == (1 << 10) / 64)
  }

  test("string keys hash like their stringified numeric twins") {
    // the filter is built over CAST(key AS STRING): a long build side
    // must prune a string probe side consistently
    val build = Seq(1L, 2L, 3L).toDF("bk")
    val words = BloomJoin.buildFilter(build, "bk", bits = 1 << 10, k = 3)
    val sProbe = Seq("1", "2", "3", "4", "9999").toDF("k")
    val kept = BloomJoin.pruneProbe(sProbe, "k", words, 1 << 10, 3)
      .as[String].collect().toSet
    assert(Set("1", "2", "3").subsetOf(kept))
  }
}
