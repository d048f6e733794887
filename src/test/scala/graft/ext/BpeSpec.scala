package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("train learns the textbook merges on a hand corpus") {
    // classic example: "low" x5, "lower" x2, "newest" x6, "widest" x3
    val docs = Seq(
      (1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lower").mkString(" ")),
      (3L, Seq.fill(6)("newest").mkString(" ")),
      (4L, Seq.fill(3)("widest").mkString(" ")))
      .toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", merges = 3)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    // es(9) -> est(9) -> lo(7): counts weight by word frequency
    assert(m == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("greedy application: aaa -> [aa, a], aaaa -> [aa, aa]") {
    val words = Seq("aaa", "aaaa", "aba").toDF("w")
    val got = words.select(col("w"),
        Bpe.encode(col("w"), Seq(("a", "a"))).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("aaa") == Seq("aa", "a"))
    assert(got("aaaa") == Seq("aa", "aa"))
    assert(got("aba") == Seq("a", "b", "a"))
  }

  test("encode folds merges in rank order (second-order merges land)") {
    val words = Seq("lower", "low", "slow").toDF("w")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val got = words.select(col("w"), Bpe.encode(col("w"), merges).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("lower") == Seq("low", "e", "r"))
    assert(got("low") == Seq("low"))
    assert(got("slow") == Seq("s", "low"))
  }

  test("encode takes deep merge lists (the HOF fold blew the analyzer past ~8)") {
    // 12 chained merges collapsing "abcdefghijklm" one pair at a time;
    // the nested-lambda formulation died with "Max iterations reached"
    val chain = (0 until 12).map { i =>
      val merged = ('a' to ('a' + i + 1).toChar).mkString
      (merged.dropRight(1), merged.last.toString)
    }
    val got = Seq("abcdefghijklm").toDF("w")
      .select(Bpe.encode(col("w"), chain).as("s"))
      .as[Seq[String]].collect()(0)
    assert(got == Seq("abcdefghijklm"))
  }

  test("ties break on (count desc, left, right) deterministically") {
    // "ab" and "cd" both occur 3 times; (a,b) < (c,d) lexically
    val docs = Seq((1L, "ab cd ab cd ab cd")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", merges = 1)
      .as[(Int, String, String, Long)].collect()(0)
    assert(m == ((1, "a", "b", 3L)))
  }

  test("training stops early when the corpus runs out of pairs") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", merges = 5)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    // merge 1 fuses ab; single-symbol words have no pairs left
    assert(m == Seq((1, "a", "b", 2L)))
  }
}
