package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  // 40-word permutations (11 coprime to 40) — diverse enough to pass
  // the Gopher top-n-gram screens; same generator as QualityGateSpec
  private val vocab = (1 to 40).map(i => s"word$i").toVector
  private def mixDoc(seed: Int): String =
    (0 until 40).map(j => vocab((seed * 7 + j * 11) % 40)).mkString(" ")

  private val trusted = Seq(mixDoc(1), mixDoc(2), mixDoc(3))

  test("funnel: each stage drops exactly its own casualties") {
    val docs = Seq(
      1L -> mixDoc(4),                       // survives everything
      2L -> mixDoc(4),                       // exact dup of 1 -> dropped at dedup
      3L -> Seq.fill(20)("a b").mkString(" "), // repetitive -> dropped at gopher
      4L -> (0 until 40).map(j => s"zzq$j").mkString(" "), // OOV -> dropped at LM
      5L -> mixDoc(5)                        // survives everything
    ).toDF("doc_id", "text")
    val m = NgramLm.train(trusted.toDF("text"), "text")
    // threshold between in-domain and OOV scores
    val s = NgramLm.score(m, docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val minScore = (s(1L) + s(4L)) / 2

    val r = Curation.curate(docs, "doc_id", "text", m, minScore)
    val funnel = r.funnel.collect()
      .map(x => x.getString(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(funnel("input") == ((5L, 15L)))
    assert(funnel("exact_dedup") == ((4L, 13L)))  // id 2 gone (min id kept)
    assert(funnel("gopher") == ((3L, 10L)))       // id 3 gone
    assert(funnel("lm_quality") == ((2L, 6L)))    // id 4 gone
    val ids = r.curated.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 5L))
  }

  test("curated carries the lm_score of each survivor") {
    val docs = Seq(1L -> mixDoc(4)).toDF("doc_id", "text")
    val m = NgramLm.train(trusted.toDF("text"), "text")
    val r = Curation.curate(docs, "doc_id", "text", m, minScore = -99.0)
    val row = r.curated.select("doc_id", "lm_score").collect()(0)
    assert(row.getLong(0) == 1L && row.getDouble(1) > -99.0)
  }

  test("empty input yields a zero funnel, not an error") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val m = NgramLm.train(trusted.toDF("text"), "text")
    val r = Curation.curate(docs, "doc_id", "text", m, minScore = 0.0)
    val funnel = r.funnel.collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(funnel.values.forall(_ == 0L))
    assert(r.curated.count() == 0L)
  }
}
