package graft.snapshot

import graft.{SparkTestBase, TempDirs}
import org.apache.spark.sql.functions._

class BloomSkipSpec extends SparkTestBase {
  import spark.implicits._

  /** Fact with 8 files clustered on k, bloom manifest on k: each key
    * lives in exactly one file, so a point probe should skip most of
    * the layout (md5 positions are deterministic — these asserts are
    * stable, not flaky). */
  private def freshFact(): (Warehouse, String) = {
    val wh = new Warehouse(spark, TempDirs.scratchDir("graft_bl").toString)
    val df = spark.range(10000).select(col("id").as("k"),
      (col("id") % 100).as("v"),
      (lit(2020L) + col("id") % 2).as("year"))
    wh.append("f", df)
    wh.optimize("f", Seq("k"), targetFiles = 8)
    wh.collectBloom("f", "k")
    (wh, "f")
  }

  test("point probe skips files and returns exactly the matching rows") {
    val (wh, f) = freshFact()
    val all = wh.filesForEquals(f, "k", -1L)
    // -1 absent: listing still bounded by the full file set
    val everything = wh.filesForRange(f, "k", Long.MinValue, Long.MaxValue)
    assert(everything.size >= 8, s"expected >=8 files, got ${everything.size}")
    val hit = wh.filesForEquals(f, "k", 123L)
    assert(hit.size < everything.size,
      s"no pruning: ${hit.size} of ${everything.size}")
    assert(hit.nonEmpty, "the containing file must survive")
    val got = wh.readEquals(f, "k", 123L).get
      .select("k", "v").as[(Long, Long)].collect().toSeq
    assert(got == Seq((123L, 23L)))
    assert(all.size <= everything.size)
  }

  test("absent value prunes to (near) nothing and reads zero rows") {
    val (wh, f) = freshFact()
    val everything = wh.filesForRange(f, "k", Long.MinValue, Long.MaxValue)
    val miss = wh.filesForEquals(f, "k", 999999999L)
    assert(miss.size < everything.size,
      s"no pruning on an absent key: ${miss.size}/${everything.size}")
    assert(wh.readEquals(f, "k", 999999999L).get.count() == 0L)
  }

  test("stale manifest stays exact: files appended after collectBloom are read") {
    val (wh, f) = freshFact()
    wh.append("f", Seq((20000L, 0L, 2021L)).toDF("k", "v", "year"))
    val got = wh.readEquals(f, "k", 20000L).get
      .select("k").as[Long].collect()
    assert(got.toSeq == Seq(20000L))
  }

  test("refreshBloom covers appended files without rescanning old ones") {
    val (wh, f) = freshFact()
    wh.append("f", (0 until 50).map(i => (50000L + i, 0L, 2022L))
      .toDF("k", "v", "year"))
    // appended files unknown to the manifest -> survive every probe
    assert(wh.filesForEquals(f, "k", -77L).nonEmpty)
    wh.refreshBloom("f", "k")
    val everything = wh.filesForRange(f, "k", Long.MinValue, Long.MaxValue)
    // now mapped: a key absent everywhere prunes the appended files too
    assert(wh.filesForEquals(f, "k", -77L).size < everything.size)
    assert(wh.readEquals(f, "k", 50025L).get.count() == 1L)
    // idempotent: nothing new -> manifest unchanged, reads still exact
    wh.refreshBloom("f", "k")
    assert(wh.readEquals(f, "k", 123L).get.count() == 1L)
  }

  test("IN-list probe unions the survivor sets and reads exactly") {
    val (wh, f) = freshFact()
    val everything = wh.filesForRange(f, "k", Long.MinValue, Long.MaxValue)
    val files = wh.filesForIn(f, "k", Seq(123L, 9123L, 999999999L))
    assert(files.size < everything.size, s"no pruning: ${files.size}")
    // must cover both single-value survivor sets
    val f1 = wh.filesForEquals(f, "k", 123L).toSet
    val f2 = wh.filesForEquals(f, "k", 9123L).toSet
    assert((f1 ++ f2).subsetOf(files.toSet))
    val got = wh.readIn(f, "k", Seq(123L, 9123L, 999999999L)).get
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(123L, 9123L))
    // stale-manifest exactness holds for IN too
    wh.append("f", Seq((70000L, 0L, 2023L)).toDF("k", "v", "year"))
    assert(wh.readIn(f, "k", Seq(70000L, 123L)).get.count() == 2L)
  }

  test("the sharper sidecar wins: zone map prunes where a saturated bloom can't") {
    val wh = new Warehouse(spark, TempDirs.scratchDir("graft_bl4").toString)
    val df = spark.range(10000).select(col("id").as("k"),
      lit(2020L).as("year"))
    wh.append("f", df)
    wh.optimize("f", Seq("k"), targetFiles = 8)
    // 64-bit filters saturate at 1250 keys/file -> bloom prunes nothing
    wh.collectBloom("f", "k", bits = 64, k = 2)
    wh.collectStats("f", Seq("k"))
    val everything = wh.filesForRange("f", "k", Long.MinValue, Long.MaxValue)
    // beyond-max probe: the range side prunes every file despite the
    // useless bloom — and the read stays exact
    assert(wh.filesForEquals("f", "k", 999999L).isEmpty)
    assert(wh.readEquals("f", "k", 999999L).get.count() == 0L)
    // in-range probe: clustered layout confines the value to one file's
    // range; intersection keeps at most that neighborhood
    assert(wh.filesForEquals("f", "k", 5000L).size < everything.size)
    assert(wh.readEquals("f", "k", 5000L).get.count() == 1L)
  }

  test("zone map alone prunes equality probes (no bloom manifest at all)") {
    val wh = new Warehouse(spark, TempDirs.scratchDir("graft_bl5").toString)
    val df = spark.range(4000).select(col("id").as("k"), lit(2020L).as("year"))
    wh.append("f", df)
    wh.optimize("f", Seq("k"), targetFiles = 4)
    wh.collectStats("f", Seq("k"))
    val everything = wh.filesForRange("f", "k", Long.MinValue, Long.MaxValue)
    assert(wh.filesForEquals("f", "k", 100L).size < everything.size)
    assert(wh.readEquals("f", "k", 100L).get.count() == 1L)
    assert(wh.readIn("f", "k", Seq(100L, 3900L)).get.count() == 2L)
  }

  test("no manifest falls back to a plain filtered read") {
    val wh = new Warehouse(spark, TempDirs.scratchDir("graft_bl2").toString)
    wh.append("g", Seq((1L, 2020L), (9L, 2020L)).toDF("k", "year"))
    assert(wh.readEquals("g", "k", 9L).get
      .select("k").as[Long].collect().toSeq == Seq(9L))
  }

  test("manifest for another column prunes nothing, crashes nothing") {
    val (wh, f) = freshFact()
    val everything = wh.filesForRange(f, "k", Long.MinValue, Long.MaxValue)
    assert(wh.filesForEquals(f, "v", 3L).size == everything.size)
    assert(wh.readEquals(f, "v", 3L).get.count() == 100L)
  }

  test("string keys prune and read exactly") {
    val wh = new Warehouse(spark, TempDirs.scratchDir("graft_bl3").toString)
    val df = spark.range(2000).select(
      concat(lit("u"), lpad(col("id").cast("string"), 6, "0")).as("name"),
      lit(2020L).as("year"))
    wh.append("h", df)
    wh.optimize("h", Seq("name"), targetFiles = 6)
    wh.collectBloom("h", "name")
    val everything = wh.filesForRange("h", "name", "u000000", "u999999")
    val hit = wh.filesForEquals("h", "name", "u000100")
    assert(hit.size < everything.size)
    assert(wh.readEquals("h", "name", "u000100").get.count() == 1L)
    assert(wh.readEquals("h", "name", "nosuch").get.count() == 0L)
  }

  test("floating-point probe keys are rejected (string forms differ)") {
    val (wh, f) = freshFact()
    intercept[IllegalArgumentException] {
      wh.filesForEquals(f, "v", 3.5d)
    }
  }

  test("incompatible parameters trigger a full rebuild, reads stay exact") {
    val (wh, f) = freshFact()
    wh.refreshBloom(f, "k", bits = 1 << 10, k = 2)
    assert(wh.readEquals(f, "k", 123L).get.count() == 1L)
    val everything = wh.filesForRange(f, "k", Long.MinValue, Long.MaxValue)
    assert(wh.filesForEquals(f, "k", 999999999L).size < everything.size)
  }
}
