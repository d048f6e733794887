package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline-scoped cache lifecycle (`eager = true`) for the pair-level
  * entry points: results must be value-identical to the default lazy
  * call, and NO cache entry may outlive the call — the long-lived-service
  * contract (the lazy default plants session-scoped persists by design).
  */
class CacheLifecycleSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox leaps over the lazy dog again and again"),
    (4L, "completely different content with no overlap whatsoever here now"),
    (5L, "another unrelated document about spark catalyst plans and joins")
  ).toDF("doc_id", "text")

  private def vectors: DataFrame = Fixtures.plantedVectors(spark, nClusters = 3,
    members = 4, dim = 8, eps = 0.01).withColumnRenamed("vec_id", "id")

  private def cacheEmpty: Boolean =
    org.apache.spark.sql.graftbridge.Bridge.cacheEmpty(spark)

  private def checkEager(name: String)(run: Boolean => DataFrame): Unit = {
    spark.catalog.clearCache()
    val lazyRows = run(false).collect().toSet
    spark.catalog.clearCache()
    val eagerDf = run(true)
    assert(cacheEmpty, s"$name(eager) left cache entries behind")
    assert(eagerDf.collect().toSet == lazyRows, s"$name eager != lazy result")
    spark.catalog.clearCache()
  }

  test("ngramJaccardPairs eager: no residual cache, same pairs") {
    checkEager("ngramJaccardPairs")(e =>
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", threshold = 0.5, eager = e))
  }

  test("ngramJaccardPairs eager with df-cap hot split: no residual cache") {
    checkEager("ngramJaccardPairs(maxDf=1)")(e =>
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", threshold = 0.5,
        maxDf = Some(1L), eager = e))
  }

  test("minhashPairs eager: no residual cache, same pairs") {
    checkEager("minhashPairs")(e =>
      Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.8, eager = e))
  }

  test("simhashPairs eager: no residual cache, same pairs") {
    checkEager("simhashPairs")(e =>
      Dedup.simhashPairs(corpus, "doc_id", "text", threshold = 0.9, eager = e))
  }

  test("containmentPairs eager: no residual cache, same pairs") {
    checkEager("containmentPairs")(e =>
      TextAnalysis.containmentPairs(corpus, "doc_id", "text", threshold = 0.5,
        eager = e))
  }

  test("tfidfTopK eager: no residual cache, same keywords") {
    checkEager("tfidfTopK")(e =>
      TextAnalysis.tfidfTopK(corpus, "doc_id", "text", k = 2, eager = e))
  }

  test("cosinePairsLsh / embeddingPairs eager: no residual cache") {
    checkEager("embeddingPairs")(e =>
      Dedup.embeddingPairs(vectors, "id", "embedding", threshold = 0.9,
        eager = e))
  }

  // registration order matters: SparkContext has no unsetCheckpointDir, so
  // the no-dir guard must run BEFORE the durable test sets one
  test("reliable eager checkpoint without a checkpoint dir fails loudly") {
    // only run the guard when no dir leaked from another suite
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set("spark.graft.eagerCheckpoint.reliable", "true")
      try {
        val e = intercept[IllegalArgumentException] {
          Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.8,
            eager = true)
        }
        assert(e.getMessage.contains("setCheckpointDir"))
      } finally spark.conf.unset("spark.graft.eagerCheckpoint.reliable")
    }
  }

  test("reliable eager checkpoint: durable files, same rows, no residual cache") {
    val dir = graft.TempDirs.scratchDir("graft_reliable_ckpt")
    spark.conf.set("spark.graft.eagerCheckpoint.reliable", "true")
    val prevCkpt = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      spark.catalog.clearCache()
      val lazyRows = Dedup.minhashPairs(corpus, "doc_id", "text",
        threshold = 0.8).collect().toSet
      spark.catalog.clearCache()
      val eagerDf = Dedup.minhashPairs(corpus, "doc_id", "text",
        threshold = 0.8, eager = true)
      assert(cacheEmpty, "reliable eager left cache entries behind")
      assert(eagerDf.collect().toSet == lazyRows)
      // the materialization is ON DISK in the checkpoint dir (executor-loss
      // safe), not in executor block managers
      def files(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).toSeq.flatten.flatMap(c =>
          if (c.isDirectory) files(c) else Seq(c))
      assert(files(dir.toFile).nonEmpty, "no checkpoint files written")
    } finally {
      spark.conf.unset("spark.graft.eagerCheckpoint.reliable")
      prevCkpt.foreach(spark.sparkContext.setCheckpointDir)
    }
  }
}
