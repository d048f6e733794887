package graft.streaming

import graft.{SparkTestBase, TempDirs}
import graft.ext.Dedup
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class NovelIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("year", LongType)))

  private def docsDf(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("doc_id", "text", "year")

  test("stream of batches builds a continuously-deduped fact") {
    val srcDir = TempDirs.scratchDir("ni_src")
    val whDir = TempDirs.scratchDir("ni_wh").toString
    val idxDir = TempDirs.scratchDir("ni_idx").toString
    val ckDir = TempDirs.scratchDir("ni_ck").toString
    val wh = new Warehouse(spark, whDir)

    val corpus = docsDf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", 2020L),
      (2L, "completely different content with no overlap whatsoever here now", 2020L)))
    NovelIngest.seedIndex(corpus.select($"doc_id", $"text"), "doc_id", "text",
      idxDir)
    wh.append("docs", corpus)

    val q = NovelIngest.run(
      spark.readStream.schema(schema).parquet(srcDir.toString),
      "doc_id", "text", wh, "docs", idxDir, ckDir)

    // batch 1: 10 dups corpus doc 1 (near-dup), 11 novel, 12+13 an
    // in-batch near-dup cluster (root 12 kept)
    docsDf(Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again", 2021L),
      (11L, "entirely fresh material about catalyst plans and shuffles here", 2021L),
      (12L, "twelve and thirteen share almost all of their words right here", 2021L),
      (13L, "twelve and thirteen share almost all of their words right now", 2021L)))
      .coalesce(1).write.mode("append").parquet(srcDir.toString)
    q.processAllAvailable()

    // batch 2: 20 dups batch-1's accepted 11; 21 novel
    docsDf(Seq(
      (20L, "entirely fresh material about catalyst plans and shuffles here", 2021L),
      (21L, "yet another genuinely new document with its own words entirely", 2021L)))
      .coalesce(1).write.mode("append").parquet(srcDir.toString)
    q.processAllAvailable()
    q.stop()

    val ids = wh.read("docs").get.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 11L, 12L, 21L),
      s"expected corpus + novel roots, got $ids")

    // index covers exactly the fact's documents
    val idxIds = spark.read.parquet(s"$idxDir/shingles")
      .select("id").as[Long].collect().toSet
    assert(idxIds == ids)

    // and matches the batch-sequential application of filterNovel
    val idx0 = Dedup.minhashIndex(corpus.select($"doc_id", $"text"),
      "doc_id", "text")
    val b1 = docsDf(Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again", 2021L),
      (11L, "entirely fresh material about catalyst plans and shuffles here", 2021L),
      (12L, "twelve and thirteen share almost all of their words right here", 2021L),
      (13L, "twelve and thirteen share almost all of their words right now", 2021L)))
    val n1 = Dedup.filterNovel(b1, "doc_id", "text", idx0)
    assert(n1.select("doc_id").as[Long].collect().toSet == Set(11L, 12L))
  }

  test("crash between fact and index appends: replay anti-joins, fact never doubles") {
    val srcDir = TempDirs.scratchDir("ni2_src")
    val whDir = TempDirs.scratchDir("ni2_wh").toString
    val idxDir = TempDirs.scratchDir("ni2_idx").toString
    val ckDir = TempDirs.scratchDir("ni2_ck").toString
    val wh = new Warehouse(spark, whDir)

    val corpus = docsDf(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", 2020L)))
    NovelIngest.seedIndex(corpus.select($"doc_id", $"text"), "doc_id", "text",
      idxDir)
    wh.append("docs", corpus)

    // the crashed first attempt of micro-batch 0: fact APPENDED, index
    // NOT reached, intent dangling — the window the marker-only
    // protocol would have doubled
    val b0 = Seq(
      (30L, "genuinely new material on partition pruning and zone maps here", 2021L),
      (31L, "another novel document about watermark state and micro batches", 2021L))
    wh.append("docs", docsDf(b0))
    assert(new java.io.File(idxDir, "_intent_0").createNewFile())

    val q = NovelIngest.run(
      spark.readStream.schema(schema).parquet(srcDir.toString),
      "doc_id", "text", wh, "docs", idxDir, ckDir)
    docsDf(b0).coalesce(1).write.mode("append").parquet(srcDir.toString)
    q.processAllAvailable()
    q.stop()

    // exactly one copy of each id in the fact
    val counts = wh.read("docs").get.groupBy($"doc_id")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 1L, 30L -> 1L, 31L -> 1L), counts)
    // the index leg still received the accepted docs
    val idxIds = spark.read.parquet(s"$idxDir/shingles")
      .select("id").as[Long].collect().toSet
    assert(Set(30L, 31L).subsetOf(idxIds), idxIds)
    // protocol files settled: marker written, intent cleaned
    assert(new java.io.File(idxDir, "_batch_0").exists())
    assert(!new java.io.File(idxDir, "_intent_0").exists())
  }

  test("crash after both appends: replay self-collides into a no-op") {
    val srcDir = TempDirs.scratchDir("ni3_src")
    val whDir = TempDirs.scratchDir("ni3_wh").toString
    val idxDir = TempDirs.scratchDir("ni3_idx").toString
    val ckDir = TempDirs.scratchDir("ni3_ck").toString
    val wh = new Warehouse(spark, whDir)

    // the crashed attempt finished BOTH appends but not the marker
    val b0 = Seq(
      (40L, "forty is a fully ingested document that must not come back twice", 2021L))
    wh.append("docs", docsDf(b0))
    NovelIngest.seedIndex(docsDf(b0).select($"doc_id", $"text"), "doc_id",
      "text", idxDir)
    assert(new java.io.File(idxDir, "_intent_0").createNewFile())

    val q = NovelIngest.run(
      spark.readStream.schema(schema).parquet(srcDir.toString),
      "doc_id", "text", wh, "docs", idxDir, ckDir)
    docsDf(b0).coalesce(1).write.mode("append").parquet(srcDir.toString)
    q.processAllAvailable()
    q.stop()

    val counts = wh.read("docs").get.groupBy($"doc_id")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    assert(counts == Map(40L -> 1L), counts)
    assert(new java.io.File(idxDir, "_batch_0").exists())
    assert(!new java.io.File(idxDir, "_intent_0").exists())
  }
}
