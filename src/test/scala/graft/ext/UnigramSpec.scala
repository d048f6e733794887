package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def seg(w: String, vocab: Seq[(String, Long)]): Seq[String] =
    Seq(w).toDF("w")
      .select(Unigram.segment(col("w"), vocab).as("p"))
      .as[Seq[String]].head()

  test("segment picks the max-score path") {
    val v = Seq("ab" -> -1L, "a" -> -10L, "b" -> -10L, "c" -> -10L)
    assert(seg("abc", v) == Seq("ab", "c"))
    assert(seg("cab", v) == Seq("c", "ab"))
    // without the bigram the only path is singles
    assert(seg("abc", v.drop(1)) == Seq("a", "b", "c"))
  }

  test("segment tie-break prefers the longest final piece (smallest j)") {
    val v = Seq("ab" -> -10L, "a" -> -5L, "b" -> -5L)
    // [ab] = -10 ties [a b] = -10 -> the j=0 candidate (piece 'ab') wins
    assert(seg("ab", v) == Seq("ab"))
  }

  test("segment: unknown single chars fall back, empty word -> empty array") {
    val v = Seq("a" -> -1L)
    assert(seg("axa", v) == Seq("a", "x", "a"))
    assert(seg("", v) == Seq.empty[String])
    // fully off-vocabulary word still segments (per char)
    assert(seg("xyz", Seq.empty) == Seq("x", "y", "z"))
  }

  test("seedVocab: singles always kept, weights are occurrence-weighted, scores are micro log10") {
    // corpus: "aa ab" x3, "ab" x2  => types: "aa"->3, "ab"->5
    val df = Seq.fill(3)("aa ab").zipWithIndex.map(_.swap) ++
      Seq.fill(2)("ab").zipWithIndex.map { case (t, i) => (10 + i, t) }
    val m = Unigram.seedVocab(df.toDF("id", "text"), "text",
      maxPieceLen = 2, maxVocab = 4)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // substrings: "aa": a,a,aa (w3) ; "ab": a,b,ab (w5)
    // weights: a = 3+3+5 = 11, b = 5, aa = 3, ab = 5
    assert(m("a")._1 == 11L && m("b")._1 == 5L)
    // maxVocab 4 - 2 singles = 2 multis: ab (5) then aa (3)
    assert(m.contains("ab") && m.contains("aa") && m.size == 4)
    val total = 11L + 5L + 5L + 3L
    assert(m("a")._2 ==
      math.floor(math.log10(11.0 / total) * 1e6).toLong)
  }

  test("emRound recounts over one-best segmentations with add-one smoothing") {
    val df = Seq((1, "ab ab ab b")).toDF("id", "text")
    val t = Unigram.types(df, "text")
    val v0 = Unigram.seedVocab(df, "text", maxPieceLen = 2, maxVocab = 4)
    val v1 = Unigram.emRound(t, v0)
    val m = v1.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // 'ab' segments as [ab] (one piece beats two); counts: ab=3, b=1
    // add-one: ab=4, b=2, a=1, (aa absent from this corpus)
    assert(m("ab") == 4L && m("b") == 2L && m("a") == 1L)
    // piece set unchanged by EM
    assert(v1.count() == v0.count())
  }

  test("train: the dominant word becomes a whole piece with the best score") {
    val corpus = (0 until 50).map(i => (i, "gamma beta"))
      .toDF("id", "text")
    val v = Unigram.train(corpus, "text", maxPieceLen = 5, maxVocab = 20,
      rounds = 2)
    val top = v.orderBy(col("score_micro").desc, col("piece"))
      .select("piece").as[String].head(2).toSet
    assert(top.contains("gamma") && top.contains("beta"))
  }

  test("encodeDocs: per-doc piece counts and exact micro sums; repeated docs equal") {
    val corpus = Seq((1L, "ab ab"), (2L, "ab ab"), (3L, "b")).toDF("id", "text")
    val v = Unigram.train(corpus, "text", maxPieceLen = 2, maxVocab = 6,
      rounds = 1)
    val out = Unigram.encodeDocs(corpus, "id", "text", v)
      .orderBy(col("id")).collect()
    assert(out(0).getAs[Long]("n_words") == 2L)
    assert(out(0).getAs[Long]("n_pieces") == 2L) // 'ab' is one piece
    assert(out(0).getAs[Long]("logprob_micro") ==
      out(1).getAs[Long]("logprob_micro"))
    assert(out(2).getAs[Long]("n_words") == 1L)
  }

  test("prune keeps singles and the top multis, rescored") {
    val df = Seq((1, "ab ab cd")).toDF("id", "text")
    val v = Unigram.seedVocab(df, "text", maxPieceLen = 2, maxVocab = 10)
    val p = Unigram.prune(v, keep = 1)
    val pieces = p.select("piece").as[String].collect().toSet
    // singles a,b,c,d survive; only the best multi ('ab', weight 2) stays
    assert(pieces == Set("a", "b", "c", "d", "ab"))
  }
}
