package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TokenizeSpec extends SparkTestBase {
  import spark.implicits._

  private def respace(texts: Seq[String], n: Int): Seq[String] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), Tokenize.charGramsAsWords(col("t"), n).as("m"))
      .collect().sortBy(_.getLong(0)).map(_.getString(1)).toSeq

  test("charGramsAsWords: chunking, short tail, empty and null text") {
    assert(respace(Seq("语言模型训练数据"), 2) == Seq("语言 模型 训练 数据"))
    assert(respace(Seq("语言模型训练数据去"), 2) == Seq("语言 模型 训练 数据 去"))
    assert(respace(Seq("abc"), 1) == Seq("a b c"))
    assert(respace(Seq(""), 2) == Seq(""))
    val n = Seq((1L, null: String)).toDF("id", "t")
      .select(Tokenize.charGramsAsWords(col("t"), 2)).collect()(0)
    assert(n.getString(0) == "")
  }

  test("composition: the unchanged word tiler dedups re-spaced CJK text") {
    // two documents sharing a verbatim 8-char run, written without
    // spaces; word-based tiling sees ONE token per doc and finds
    // nothing — after the n=1 pre-map it sees 8-char tiles and strips
    // the shared run from both
    val run = "数据去重训练语料"
    val docs = Seq((1L, s"$run 前文内容齐全八字"), (2L, s"$run 后文内容齐全八字"))
      .toDF("doc_id", "raw")
      .select(col("doc_id"),
        Tokenize.charGramsAsWords(translate(col("raw"), " ", ""), 1).as("text"))
    val got = Dedup.tileDuplication(docs, "doc_id", "text", tileWords = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_tiles", "dup_tiles", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(got(0) == ((1L, 2L, 1L, "前 文 内 容 齐 全 八 字")))
    assert(got(1) == ((2L, 2L, 1L, "后 文 内 容 齐 全 八 字")))
    // without the pre-map the same corpus is invisible to the tiler
    val blind = Dedup.tileDuplication(
      Seq((1L, s"$run 前文内容齐全八字"), (2L, s"$run 后文内容齐全八字"))
        .toDF("doc_id", "text").select(col("doc_id"),
          translate(col("text"), " ", "").as("text")),
      "doc_id", "text", tileWords = 8)
      .select("n_tiles").as[Long].collect()
    assert(blind.forall(_ == 0L))
  }

  test("composition: Gopher word_count and the LM see chunk tokens, not one mega-word") {
    val doc = "语言模型需要大量高质量训练数据"  // 15 chars
    val lex = QualityRules.gopherLexical(
      Seq((1L, doc)).toDF("doc_id", "raw")
        .select(col("doc_id"),
          Tokenize.charGramsAsWords(col("raw"), 3).as("text")),
      "doc_id", "text", minWords = 2L)
    val r = lex.collect()(0)
    assert(r.getLong(r.fieldIndex("word_count")) == 5L) // 5 chunks of 3
    // an LM trained on re-spaced text scores re-spaced text: in-domain
    // beats out-of-domain, which is impossible on one-token documents
    val corpus = Seq("数据质量决定模型质量", "训练数据需要去重清洗", "模型需要高质量数据")
      .toDF("raw").select(Tokenize.charGramsAsWords(col("raw"), 1).as("text"))
    val m = NgramLm.train(corpus, "text")
    val probe = Seq((1L, "模型需要数据"), (2L, "完全无关文本乱入"))
      .toDF("doc_id", "raw")
      .select(col("doc_id"), Tokenize.charGramsAsWords(col("raw"), 1).as("text"))
    val s = NgramLm.score(m, probe, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(s(1L) > s(2L), s.toString)
  }

  test("composition: the repetition screens fire on re-spaced text, blind without") {
    // a phrase repeated 12x, written unspaced; a 48-distinct-char doc
    // beside it (long enough that a single-occurrence 4-gram's mass
    // stays under Gopher's 0.16 top-gram threshold)
    val rep = "数据去重" * 12
    val div = (0x4E00 until 0x4E30).map(_.toChar).mkString
    def screen(preMap: Boolean) = Repetition.gopherFilter(
      Seq((1L, rep), (2L, div)).toDF("doc_id", "raw")
        .select(col("doc_id"),
          (if (preMap) Tokenize.charGramsAsWords(col("raw"), 2)
           else col("raw")).as("text")),
      "doc_id", "text")
      .orderBy("doc_id").select("keep").as[Boolean].collect().toSeq
    // pre-mapped: the dup-gram mass of the repeated chunk pair kills
    // doc 1; the diverse doc survives
    assert(screen(preMap = true) == Seq(false, true))
    // without the pre-map both docs are ONE token: every gram fraction
    // reads 0 and the screen waves the repetitive doc through
    assert(screen(preMap = false) == Seq(true, true))
  }
}
