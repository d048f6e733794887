package graft.ext

import graft.SparkTestBase

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(a: Seq[String], b: Seq[String]): Map[String, Long] = {
    val ta = a.flatMap(_.split(" ", -1))
    val tb = b.flatMap(_.split(" ", -1))
    val vocab = (ta ++ tb).distinct
    val (na, nb, v) = (ta.size.toLong, tb.size.toLong, vocab.size.toLong)
    vocab.map { w =>
      val pa = (ta.count(_ == w) + 1).toDouble / (na + v)
      val pb = (tb.count(_ == w) + 1).toDouble / (nb + v)
      w -> math.floor((pa - pb) * math.log(pa / pb) * 1e12).toLong
    }.toMap
  }

  test("psi terms match the sequential replay exactly; identical corpora drift 0") {
    val a = Seq("x x y z", "x y")
    val b = Seq("x z z q", "z q")
    val exp = brute(a, b)
    val got = Drift.wordPsi(a.toDF("text"), b.toDF("text"), "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == exp)
    // drifted words dominate the ranking; shared-rate word near zero
    assert(got("q") > got("x") || got("z") > got("x"))
    val same = Drift.wordPsi(a.toDF("text"), a.toDF("text"), "text", k = 10)
      .collect().map(_.getLong(3))
    assert(same.forall(c => c == 0L || c == -1L)) // floor of -0.0-ish terms
  }

  test("one-sided words get finite smoothed terms, ordered deterministically") {
    val got = Drift.wordPsi(Seq("only here").toDF("text"),
      Seq("other side").toDF("text"), "text", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 4)
    // all four words are one-sided: counts (1,0) or (0,1)
    assert(got.forall { case (_, ca, cb) => ca + cb == 1L })
  }
}
