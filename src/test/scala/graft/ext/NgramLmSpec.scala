package graft.ext

import graft.SparkTestBase

class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  private def model = NgramLm.train(
    Seq("a b a", "a b c").toDF("text"), "text")

  test("train: count tables and totals match the hand count") {
    val m = model
    assert(m.n == 6 && m.v == 3)
    val uni = m.uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    val tri = m.tri.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(tri(("<s>", "<s>", "a")) == 2L)
    assert(tri(("a", "b", "a")) == 1L)
    assert(m.bi.count() == 5L)
  }

  // the exact ladder the operator computes, in the same double op order
  private def lvl1(cUvw: Long, cUv: Long) = cUvw.toDouble / cUv
  private def lvl2(cVw: Long, cV: Long) = 0.4 * (cVw.toDouble / cV)
  private def lvl3(cW: Long, nv: Long) = 0.4 * (0.4 * ((cW + 1).toDouble / nv))
  private def micro(s: Double) = math.floor(math.log10(s) * 1e6).toLong

  test("score: backoff ladder per level, micro-quantized") {
    val m = model
    val out = NgramLm.score(m, Seq(1L -> "a b a", 2L -> "b c d")
      .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: two exact trigram hits (log 0) + c(aba)/c(ab) = 1/2
    assert(out(1L) == ((3L, micro(lvl1(1, 2)))))
    // doc 2: (<s>,<s>,b) backs off to unigram b; (<s>,b,c) hits the
    // bigram level c(bc)/c(b); (b,c,d) falls through to unseen-word
    val exp2 = micro(lvl3(2, 9)) + micro(lvl2(1, 2)) + micro(lvl3(0, 9))
    assert(out(2L) == ((3L, exp2)))
  }

  test("lm_score orders in-domain text above gibberish") {
    val docs = (1L to 20L).map(i => i -> "a b a b c a b").toVector ++
      Vector(99L -> "zz qq rr ww")
    val m = NgramLm.train(docs.filter(_._1 <= 20).map(_._2).toDF("text"), "text")
    val scored = NgramLm.score(m, docs.toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(1L) > scored(99L))
  }

  test("buckets: per-group terciles, deterministic tie-break") {
    val scored = Seq(
      (1L, "en", -0.1), (2L, "en", -0.2), (3L, "en", -0.3),
      (4L, "en", -0.4), (5L, "en", -0.5), (6L, "en", -0.6),
      (7L, "de", -0.1), (8L, "de", -0.1), (9L, "de", -0.9))
      .toDF("doc_id", "lang", "lm_score")
    val b = NgramLm.buckets(scored, "doc_id", "lang", "lm_score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("tile")), r.getString(r.fieldIndex("bucket"))))
      .toMap
    assert(b(1L) == ((1L, "head")) && b(2L) == ((1L, "head")))
    assert(b(3L) == ((2L, "middle")) && b(6L) == ((3L, "tail")))
    // de ties at -0.1: the smaller doc_id takes the head slot
    assert(b(7L) == ((1L, "head")) && b(8L) == ((2L, "middle")))
  }

  test("scoring is rerun-stable (pure function of the count tables)") {
    val m = model
    val df = Seq(1L -> "a b c", 2L -> "c b a").toDF("doc_id", "text")
    val a = NgramLm.score(m, df, "doc_id", "text").collect().toSeq
    val b = NgramLm.score(m, df, "doc_id", "text").collect().toSeq
    assert(a.sortBy(_.getLong(0)).toString == b.sortBy(_.getLong(0)).toString)
  }
}
