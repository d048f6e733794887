package graft.streaming

import graft.{SparkTestBase, TempDirs}
import graft.ext.{NgramLm, Repetition}
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class QualityGateSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("year", LongType)))

  private def docsDf(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("doc_id", "text", "year")

  // Gopher's top-n-gram thresholds assume page-length text: a 9-word
  // sentence can't pass them (one 3-gram is >18% of its chars). Build
  // 40-word documents over a 30-word vocabulary with deterministic
  // mixing, so the top screens sit far under their thresholds.
  private val vocab = Vector(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "river", "forest",
    "meadow", "valley", "stone", "cloud", "ember", "frost", "grove",
    "haven", "ridge", "shore", "trail", "vista")

  // a PERMUTATION of the 40-word vocabulary (11 is coprime to 40): no
  // word repeats, so every n-gram is unique and the dup screens read 0
  private def mixDoc(seed: Int): String =
    (0 until 40).map(j => vocab((seed * 7 + j * 11) % 40)).mkString(" ")

  private val trusted = Seq(mixDoc(1), mixDoc(2), mixDoc(3))

  // in-domain and diverse: passes both screens
  private val good = mixDoc(4)
  // out-of-domain: every trigram falls through to the unseen-word floor
  private val gibberish = (0 until 40).map(j => s"zzq$j").mkString(" ")
  // in-domain words but blown repetition screens
  private val repetitive = Seq.fill(20)("alpha bravo").mkString(" ")

  private def trainAndSave(dir: String): Double = {
    val m = NgramLm.train(trusted.toDF("text"), "text")
    QualityGate.saveModel(m, dir)
    // threshold halfway between the good and gibberish batch scores
    val s = NgramLm.score(m,
      Seq(1L -> good, 2L -> gibberish).toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(s(1L) > s(2L))
    (s(1L) + s(2L)) / 2
  }

  test("saveModel/loadModel: scores replay exactly from the persisted counts") {
    val dir = TempDirs.scratchDir("qg_model").toString
    val m = NgramLm.train(trusted.toDF("text"), "text")
    QualityGate.saveModel(m, dir)
    val loaded = QualityGate.loadModel(spark, dir)
    assert(loaded.n == m.n && loaded.v == m.v)
    val df = Seq(1L -> good, 2L -> gibberish, 3L -> repetitive)
      .toDF("doc_id", "text")
    val a = NgramLm.score(m, df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = NgramLm.score(loaded, df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("stream screens batches against the frozen model and appends survivors") {
    val srcDir = TempDirs.scratchDir("qg_src")
    val whDir = TempDirs.scratchDir("qg_wh").toString
    val modelDir = TempDirs.scratchDir("qg_m").toString
    val ckDir = TempDirs.scratchDir("qg_ck").toString
    val wh = new Warehouse(spark, whDir)
    val minScore = trainAndSave(modelDir)

    val q = QualityGate.run(
      spark.readStream.schema(schema).parquet(srcDir.toString),
      "doc_id", "text", modelDir, wh, "curated", ckDir, minScore)

    docsDf(Seq((10L, good, 2021L), (11L, gibberish, 2021L)))
      .coalesce(1).write.mode("append").parquet(srcDir.toString)
    q.processAllAvailable()
    docsDf(Seq((20L, repetitive, 2022L), (21L, mixDoc(5), 2022L)))
      .coalesce(1).write.mode("append").parquet(srcDir.toString)
    q.processAllAvailable()
    q.stop()

    val rows = wh.read("curated").get
      .select("doc_id", "year").as[(Long, Long)].collect().toSet
    assert(rows == Set((10L, 2021L), (21L, 2022L)), rows.toString)

    // the repetitive doc was killed by the Gopher vote, not the LM
    val rep = Repetition.gopherFilter(
      Seq(20L -> repetitive).toDF("doc_id", "text"), "doc_id", "text")
      .select("keep").collect()(0).getBoolean(0)
    assert(!rep)
  }

  test("dangling-intent replay anti-joins: the fact never doubles") {
    val srcDir = TempDirs.scratchDir("qg2_src")
    val whDir = TempDirs.scratchDir("qg2_wh").toString
    val modelDir = TempDirs.scratchDir("qg2_m").toString
    val ckDir = TempDirs.scratchDir("qg2_ck").toString
    val wh = new Warehouse(spark, whDir)
    val minScore = trainAndSave(modelDir)

    // crashed first attempt of micro-batch 0: append landed, marker not.
    // Markers are keyed to THIS stream's checkpoint dir (not the shared
    // read-only model), so the fixture plants the intent there.
    val markerDir = new java.io.File(ckDir, "_graft_markers")
    assert(markerDir.mkdirs())
    wh.append("curated", Seq((10L, 2021L, -1.0))
      .toDF("doc_id", "year", "lm_score"))
    assert(new java.io.File(markerDir, "_intent_0").createNewFile())

    val q = QualityGate.run(
      spark.readStream.schema(schema).parquet(srcDir.toString),
      "doc_id", "text", modelDir, wh, "curated", ckDir, minScore)
    docsDf(Seq((10L, good, 2021L), (12L, good, 2021L)))
      .coalesce(1).write.mode("append").parquet(srcDir.toString)
    q.processAllAvailable()
    q.stop()

    val counts = wh.read("curated").get.groupBy($"doc_id")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    assert(counts == Map(10L -> 1L, 12L -> 1L), counts.toString)
    assert(new java.io.File(markerDir, "_batch_0").exists())
    assert(!new java.io.File(markerDir, "_intent_0").exists())
    // the shared model dir stays pristine — no stream-state files leak in
    assert(!new java.io.File(modelDir, "_batch_0").exists())
    assert(!new java.io.File(modelDir, "_intent_0").exists())
  }

  test("two streams sharing one frozen model don't collide on markers") {
    val modelDir = TempDirs.scratchDir("qg3_m").toString
    val minScore = trainAndSave(modelDir)
    def runStream(tag: String): Set[(Long, Long)] = {
      val srcDir = TempDirs.scratchDir(s"qg3_src_$tag")
      val whDir = TempDirs.scratchDir(s"qg3_wh_$tag").toString
      val ckDir = TempDirs.scratchDir(s"qg3_ck_$tag").toString
      val wh = new Warehouse(spark, whDir)
      val q = QualityGate.run(
        spark.readStream.schema(schema).parquet(srcDir.toString),
        "doc_id", "text", modelDir, wh, "curated", ckDir, minScore)
      docsDf(Seq((30L, good, 2023L))).coalesce(1)
        .write.mode("append").parquet(srcDir.toString)
      q.processAllAvailable()
      q.stop()
      wh.read("curated").get.select("doc_id", "year")
        .as[(Long, Long)].collect().toSet
    }
    // under modelDir-keyed markers, stream B's batch 0 would see stream
    // A's _batch_0 marker and silently skip its append
    assert(runStream("a") == Set((30L, 2023L)))
    assert(runStream("b") == Set((30L, 2023L)))
  }
}
