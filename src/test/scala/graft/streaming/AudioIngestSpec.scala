package graft.streaming

import graft.SparkTestBase
import graft.ext.Multimodal
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AudioIngest rides the shared [[FpIngest]]/[[ScrubEngine]] protocol
  * ImageIngestSpec and TileScrubSpec exercise; here the focus is the
  * audio family's own semantics: SPECTRAL near-dup (not just exact)
  * collisions drop across batches, min-id dominates within a batch,
  * undecodable/too-short clips always pass. Class separation of the
  * band-profile fixture is pinned in AudioSpectralSpec. */
class AudioIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = graft.TempDirs.scratchDir(p).toString

  /** Band-profile WAVs: classes are >= 10 apart in Hamming, bumps
    * within a class are near-duplicates (Hamming <= 2). */
  private def media(rows: Seq[(Long, Long, Long)]): DataFrame =
    Multimodal.syntheticToneCorpus(
        rows.toDF("doc_id", "cls", "bump"), "doc_id",
        col("cls"), col("bump"), lit(320), lit(16000))
      .withColumn("year", lit(2021L))

  test("spectral near-dup collisions drop across batches; novel " +
      "classes keep; undecodable and too-short clips ride along") {
    val wh = new Warehouse(spark, tmp("ai_wh1"))
    val idx = tmp("ai_idx1")
    AudioIngest.ingestBatch(media(Seq((1L, 3L, 0L), (2L, 7L, 0L))),
      "media_id", "content", wh, "f", idx, 0L)
    // 10 is class 3 with a BUMP (near-dup, not byte-identical), 11 is
    // novel, 12 is undecodable, 13 is a 64-sample clip (hash-less)
    val b1 = media(Seq((10L, 3L, 2L), (11L, 9L, 0L)))
      .unionByName(Seq((12L, "not a wav".getBytes, 2021L))
        .toDF("media_id", "content", "year"))
      .unionByName(Multimodal.syntheticToneCorpus(
          Seq((13L, 4L, 0L)).toDF("doc_id", "cls", "bump"), "doc_id",
          col("cls"), col("bump"), lit(64), lit(16000))
        .withColumn("year", lit(2021L)))
    AudioIngest.ingestBatch(b1, "media_id", "content", wh, "f", idx, 1L)
    val got = wh.read("f").get.select("media_id", "audio_fp")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 11L, 12L, 13L))
    assert(got(3)._2.isEmpty && got(4)._2.isEmpty) // hash-less, NULL fp
    // the near-dup really was near, not exact: different content bytes
    val cs = media(Seq((1L, 3L, 0L), (10L, 3L, 2L)))
      .select(sha2(col("content"), 256)).as[String].collect()
    assert(cs(0) != cs(1))
  }

  test("min id dominates within a batch; replay appends nothing") {
    val wh = new Warehouse(spark, tmp("ai_wh2"))
    val idx = tmp("ai_idx2")
    val b0 = media(Seq((9L, 5L, 0L), (4L, 5L, 1L), (7L, 8L, 0L)))
    AudioIngest.ingestBatch(b0, "media_id", "content", wh, "f", idx, 0L)
    assert(wh.read("f").get.select("media_id").as[Long].collect().toSet ==
      Set(4L, 7L)) // 9 dominated by 4 (same class, near-dup, 4 < 9)
    val n1 = wh.read("f").get.count()
    AudioIngest.ingestBatch(b0, "media_id", "content", wh, "f", idx, 0L,
      dedupFact = true)
    assert(wh.read("f").get.count() == n1)
  }

  test("probe plan: stored band keys are joined, never re-derived — no " +
      "explode above the index scan") {
    val idx = tmp("ai_idx_plan")
    AudioIngest.seedIndex(media(Seq((1L, 2L, 0L), (2L, 7L, 0L))),
      "media_id", "content", idx)
    val index = spark.read.parquet(s"$idx/audfps/batch=-1")
    assert(Set("audio_fp", "n_refs", "t", "v")
      .subsetOf(index.columns.toSet))
    val out = AudioIngest.novelAgainst(media(Seq((10L, 2L, 1L))),
      "media_id", "content", index)
    val plan = out.queryExecution.optimizedPlan
    val gens = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty) // the batch side still derives its keys
    gens.foreach { g =>
      val leaves = g.collectLeaves().map(_.getClass.getSimpleName)
      assert(!leaves.exists(_.contains("LogicalRelation")),
        s"index scan under a Generate: ${g.treeString.take(400)}")
    }
    assert(out.filter(col("media_id") === 10L).count() == 0)
  }

  test("run(): a seeded corpus index blocks a streamed near-duplicate") {
    val wh = new Warehouse(spark, tmp("ai_wh3"))
    val idx = tmp("ai_idx3")
    val ck = tmp("ai_ck3")
    val src = tmp("ai_src3")
    AudioIngest.seedIndex(media(Seq((1L, 2L, 0L))), "media_id", "content",
      idx)
    media(Seq((20L, 2L, 3L), (21L, 6L, 0L)))
      .write.mode("overwrite").parquet(src)
    val q = AudioIngest.run(
      spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src),
      "media_id", "content", wh, "f", idx, ck)
    q.processAllAvailable(); q.stop()
    assert(wh.read("f").get.select("media_id").as[Long].collect().toSet ==
      Set(21L))
  }
}
