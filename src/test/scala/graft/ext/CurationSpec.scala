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

  test("curateFull: each stage drops exactly its own casualty") {
    // " of the" rides on every doc so the lexical stopword rule has
    // something to count; mixDoc permutations pass the repetition screens
    val sfx = " of the"
    val good1 = mixDoc(4) + sfx
    val good2 = mixDoc(7) + sfx
    val nearT = mixDoc(6)
    val docs = Seq(
      (1L, good1, "https://ok1.org/p", "src0"),        // survives all
      (2L, good2, "https://bad.example.com/x", "src0"), // url-blocked
      (3L, "tiny" + sfx, "https://ok3.org/p", "src0"),  // < 10 words
      (4L, Seq.fill(8)("alpha beta gamma the of").mkString(" "),
        "https://ok4.org/p", "src0"),                   // repetitive
      (5L, (0 until 40).map(j => s"zzq$j").mkString(" ") + sfx,
        "https://ok5.org/p", "src0"),                   // OOV -> LM drop
      (6L, good1, "https://ok6.org/p", "src0"),         // exact dup of 1
      (7L, nearT + sfx, "https://ok7.org/p", "src0"),   // shares all full
      (8L, nearT + sfx + " tailword", "https://ok8.org/p", "src0"), // tiles
      (9L, mixDoc(8) + sfx + " konta mina ted",
        "https://ok9.org/p", "src0"),                   // contaminated
      (10L, mixDoc(9) + sfx, "https://ok10.org/p", "src0"), // survives
      (11L, mixDoc(11) + sfx, "https://ok11.org/p", "src0") // survives
    ).toDF("doc_id", "text", "url", "source")
    val m = NgramLm.train(
      (trusted.map(_ + sfx) :+ (nearT + sfx)).toDF("text"), "text")
    val s = NgramLm.score(m,
        docs.filter(col("doc_id").isin(1L, 5L)), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val minScore = (s(1L) + s(5L)) / 2
    val bench = Seq("konta mina ted plus filler").toDF("text")
    val bl = Seq("example.com").toDF("domain")
    val r = Curation.curateFull(docs, "doc_id", "text", "url", "source",
      bl, m, minScore, bench, "text", benchN = 3,
      mixtureWeights = Seq("src0" -> 0.5), mixtureTotal = 4,
      packBudget = 64, packBuckets = 16, numShards = 4,
      hashOf = c => pmod(c.cast("long") * 2654435761L, lit(4294967296L)),
      lexMinWords = 10L, minCleanWords = 10L)
    val funnel = r.funnel.collect()
      .map(x => x.getString(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(funnel("input") == ((11L, 66L)))
    assert(funnel("url_filter") == ((10L, 64L)))        // 2 blocked
    assert(funnel("gopher_lexical") == ((9L, 61L)))     // 3 too short
    assert(funnel("gopher_repetition") == ((8L, 57L)))  // 4 repetitive
    assert(funnel("lm_quality") == ((7L, 52L)))         // 5 OOV
    assert(funnel("exact_dedup") == ((6L, 46L)))        // 6 dup of 1
    assert(funnel("substr_dedup") == ((4L, 31L)))       // 7+8 shared tiles
    assert(funnel("decontam") == ((3L, 22L)))           // 9 bench 3-gram
    assert(funnel("mixture")._1 == 2L)                  // quota floor(.5*4)
    val ids = r.curated.select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(Set(1L, 10L, 11L)) && ids.size == 2)
    assert(funnel("mixture")._2 == ids.sum)
    assert(funnel("pack")._1 >= 1L && funnel("shard")._1 >= 1L)
    // the curated frame carries both export assignments
    val cols = r.curated.columns.toSet
    assert(Set("seq_id", "seq_off", "shard", "seq").subsetOf(cols))
  }

  test("curateFull: empty input yields an 11-row zero funnel, not an error") {
    val docs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "url", "source")
    val m = NgramLm.train(trusted.toDF("text"), "text")
    val r = Curation.curateFull(docs, "doc_id", "text", "url", "source",
      Seq("x.example.org").toDF("domain"), m, minScore = 0.0,
      Seq("bench text here").toDF("text"), "text", benchN = 3,
      mixtureWeights = Seq("src0" -> 0.5), mixtureTotal = 4,
      packBudget = 64, packBuckets = 16, numShards = 4,
      hashOf = c => pmod(c.cast("long") * 2654435761L, lit(4294967296L)))
    val funnel = r.funnel.collect()
      .map(x => x.getString(0) -> (x.getLong(2), x.getLong(3)))
    assert(funnel.length == 11)
    assert(funnel.forall { case (_, (n, ck)) => n == 0L && ck == 0L })
    assert(r.curated.count() == 0L)
  }
}
