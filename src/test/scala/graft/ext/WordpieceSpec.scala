package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WordpieceSpec extends SparkTestBase {
  import spark.implicits._

  test("initialSyms marks every non-initial char with ##") {
    val got = Seq("abc").toDF("w")
      .select(Wordpiece.initialSyms(col("w")).as("s"))
      .as[Seq[String]].collect()(0)
    assert(got == Seq("a", "##b", "##c"))
  }

  test("train picks the LIKELIHOOD argmax, not the count argmax") {
    // c(a,##b)=10 but a is diluted by 20 lone 'a' words -> score 10/(30*10)
    // c(x,##q)=3 with no dilution -> score 3/(3*3); WordPiece merges (x,##q)
    // first where BPE would merge (a,##b)
    val words = Seq.fill(10)("ab") ++ Seq.fill(3)("xq") ++
      Seq.fill(20)("a") ++ Seq.fill(20)("b")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val wp = Wordpiece.train(docs, "text", merges = 1).collect()(0)
    assert((wp.getAs[String]("sym_a"), wp.getAs[String]("sym_b")) ==
      ("x", "##q"))
    assert(wp.getAs[Long]("cnt") == 3L)
    val bpe = Bpe.train(docs, "text", merges = 1).collect()(0)
    assert((bpe.getAs[String]("sym_a"), bpe.getAs[String]("sym_b")) ==
      ("a", "##b") == false) // BPE has no ## marking; its argmax is (a,b)
    assert((bpe.getAs[String]("sym_a"), bpe.getAs[String]("sym_b")) ==
      ("a", "b"))
  }

  test("applyMerge strips the right side's continuation marker") {
    val got = Seq(Seq("x", "##q", "##x", "##q")).toDF("s")
      .select(Wordpiece.applyMerge(col("s"), "x", "##q").as("m"))
      .as[Seq[String]].collect()(0)
    assert(got == Seq("xq", "##x", "##q")) // only the word-initial pair
    val got2 = Seq(Seq("a", "##b", "##a", "##b")).toDF("s")
      .select(Wordpiece.applyMerge(col("s"), "##a", "##b").as("m"))
      .as[Seq[String]].collect()(0)
    assert(got2 == Seq("a", "##b", "##ab")) // continuation product keeps ##
  }

  test("vocab = corpus alphabet + merge products") {
    val docs = Seq("ab xq ab").toDF("text")
    val mt = Seq((1, "a", "##b", 2L, 0L))
      .toDF("step", "sym_a", "sym_b", "cnt", "score_micro")
    val v = Wordpiece.vocab(docs, "text", mt).as[String].collect().toSet
    assert(v == Set("a", "##b", "x", "##q", "ab"))
  }

  private val pieces =
    Seq("un", "u", "n", "a", "##n", "##able", "##a", "##z")

  test("segment: greedy longest match, position-aware ## matching") {
    val got = Seq("unable", "una", "uz", "nun").toDF("w")
      .select(col("w"), Wordpiece.segment(col("w"), pieces).as("p"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("unable") == Seq("un", "##able"))
    assert(got("una") == Seq("un", "##a"))
    // 'u' matches at pos 0 but no ##-piece covers 'z'? ##z exists -> ok
    assert(got("uz") == Seq("u", "##z"))
    // plain 'n' at start, then ##... 'nun': n, ##? no ##u -> whole word UNK
    assert(got("nun") == Seq("[UNK]"))
  }

  test("segment: unmatched start or middle collapses to [UNK]; empty word empty") {
    val got = Seq("zebra", "").toDF("w")
      .select(col("w"), Wordpiece.segment(col("w"), pieces).as("p"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("zebra") == Seq("[UNK]")) // no plain piece starts with z
    assert(got("") == Seq.empty)
  }

  test("encodeDocs: per-doc word/piece/unk accounting, types segment once") {
    val docs = Seq(
      (1L, "unable una unable"),
      (2L, "nun uz")).toDF("id", "text")
    val got = Wordpiece.encodeDocs(docs, "id", "text", pieces)
      .orderBy("id").collect()
    assert(got(0).getAs[Long]("n_words") == 3L)
    assert(got(0).getAs[Long]("n_pieces") == 6L) // 2 + 2 + 2
    assert(got(0).getAs[Long]("n_unk_words") == 0L)
    assert(got(1).getAs[Long]("n_words") == 2L)
    assert(got(1).getAs[Long]("n_pieces") == 3L) // [UNK] costs 1, uz costs 2
    assert(got(1).getAs[Long]("n_unk_words") == 1L)
  }

  test("train then encode with the trained vocab round-trips the corpus") {
    val docs = Seq("abab abab ab cd cd").toDF("text")
    val mt = Wordpiece.train(docs, "text", merges = 3)
    val v = Wordpiece.vocab(docs, "text", mt).as[String].collect().toSeq
    val enc = Wordpiece.encodeDocs(docs.withColumn("id", lit(1L)),
      "id", "text", v).collect()(0)
    assert(enc.getAs[Long]("n_unk_words") == 0L) // alphabet closure
    assert(enc.getAs[Long]("n_pieces") <= 10L)   // merges compress
  }
}
