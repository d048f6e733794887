package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.Row

class QualityRulesSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], minWords: Long = 50L) =
    QualityRules.gopherLexical(rows.toDF("doc_id", "text"), "doc_id", "text",
      minWords = minWords)
      .collect().map(r => r.getLong(0) -> r).toMap

  private def d(r: Row, c: String) = r.getDouble(r.fieldIndex(c))
  private def l(r: Row, c: String) = r.getLong(r.fieldIndex(c))

  test("metrics: hand-computed surface statistics") {
    val m = run(Seq(1L -> "the cat sat ### on... the mat"))
    val r = m(1L)
    assert(l(r, "word_count") == 7L)
    // words: the(3) cat(3) sat(3) ###(3) on...(5) the(3) mat(3) = 23/7
    assert(math.abs(d(r, "mean_word_len") - 23.0 / 7) < 1e-6)
    // 3 hashes + 1 ellipsis over 7 words
    assert(math.abs(d(r, "symbol_word_ratio") - 4.0 / 7) < 1e-6)
    // ### has no letter
    assert(math.abs(d(r, "alpha_word_frac") - 6.0 / 7) < 1e-6)
    // "the" appears twice but is ONE distinct stopword — Gopher's rule
    // counts different function words, not occurrences
    assert(l(r, "stopword_hits") == 1L)
  }

  test("stopword_hits counts distinct stopwords, case-insensitively") {
    val m = run(Seq(
      1L -> "the the the the",        // one distinct stopword
      2L -> "The cat of THE house"))  // the + of = two, despite case
    assert(l(m(1L), "stopword_hits") == 1L)
    assert(l(m(2L), "stopword_hits") == 2L)
  }

  test("keep vote: each rule kills on its own") {
    val okWords = (1 to 60)
      .map(i => if (i % 20 == 0) "of" else if (i % 10 == 0) "the"
        else s"word$i").mkString(" ")
    val m = run(Seq(
      10L -> okWords,                                    // passes all
      11L -> (1 to 10).map(i => s"word$i").mkString(" "), // too short
      12L -> ((1 to 60).map(_ => "############").mkString(" ") + " the of"),
      13L -> (1 to 62).map(i => if (i % 2 == 0) "and" else "the")
        .mkString(" ")                                   // mean len 3, ok
    ))
    assert(m(10L).getBoolean(m(10L).fieldIndex("keep")))
    assert(!m(11L).getBoolean(m(11L).fieldIndex("keep")))
    // 12: symbol ratio and alpha frac both blown
    assert(!m(12L).getBoolean(m(12L).fieldIndex("keep")))
    assert(d(m(12L), "alpha_word_frac") < 0.8)
    assert(m(13L).getBoolean(m(13L).fieldIndex("keep")))
  }

  test("minWords dial moves the short-doc verdict") {
    val doc = (1 to 20)
      .map(i => if (i == 1) "the" else if (i == 2) "of" else s"word$i")
      .mkString(" ")
    assert(!run(Seq(1L -> doc)).apply(1L).getBoolean(6))
    assert(run(Seq(1L -> doc), minWords = 10L).apply(1L).getBoolean(6))
  }

  test("lexicalKeep: flag matches gopherLexical's keep row-for-row, " +
      "input columns preserved, scratch columns gone") {
    val rows = ((1L to 30L).map(i =>
      i -> (("the a an of and to in word" + i + " ") * (2 + (i % 6).toInt))
        .trim) ++ Seq(100L -> "### ... ###", 101L -> "")).toSeq
    val df = rows.toDF("doc_id", "text").withColumn("tag",
      org.apache.spark.sql.functions.lit("x"))
    val viaScreen = QualityRules.gopherLexical(df, "doc_id", "text",
        minWords = 5L)
      .select($"doc_id", $"keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val annotated = QualityRules.lexicalKeep(df, "text", "__lk",
      minWords = 5L)
    assert(annotated.columns.toSeq == Seq("doc_id", "text", "tag", "__lk"))
    val viaKeep = annotated.select($"doc_id", $"__lk").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaKeep == viaScreen)
  }
}
