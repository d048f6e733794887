package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions.{col, sum}

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

  test("numericPsi: shared edges, closed top bucket, exact replay") {
    val a = (1 to 100).map(_.toDouble)
    val b = (51 to 150).map(_.toDouble)
    val got = Drift.numericPsi(a.toDF("v"), b.toDF("v"), "v", bins = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // combined range [1, 150], width 29.8: A fills low bins, B high
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(got(0L)._1 > 0 && got(0L)._2 == 0)     // only A at the bottom
    assert(got(4L)._2 > 0 && got(4L)._1 == 0)     // only B at the top
    // the max value lands in the last (closed) bucket, not bins
    assert(got.values.map(v => v._1 + v._2).sum == 200L)
    // identical sides: every term floors to 0 or -1 (negative-zero-ish)
    val same = Drift.numericPsi(a.toDF("v"), a.toDF("v"), "v", bins = 5)
      .collect().map(_.getLong(3))
    assert(same.forall(c => c == 0L || c == -1L))
  }

  test("one-sided words get finite smoothed terms, ordered deterministically") {
    val got = Drift.wordPsi(Seq("only here").toDF("text"),
      Seq("other side").toDF("text"), "text", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 4)
    // all four words are one-sided: counts (1,0) or (0,1)
    assert(got.forall { case (_, ca, cb) => ca + cb == 1L })
  }

  test("wordPsiByPeriod: in-distribution periods sit far under drifted ones") {
    val ref = Seq.fill(20)("alpha beta gamma delta").toDF("text")
    val cur = (
      Seq.fill(10)((0L, "alpha beta gamma delta")) ++   // identical mix
      Seq.fill(10)((1L, "alpha beta gamma epsilon")) ++ // one word swapped
      Seq.fill(10)((2L, "zeta eta theta iota"))         // disjoint vocab
    ).toDF("period", "text")
    val got = Drift.wordPsiByPeriod(ref, cur, "text", "period")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    got.values.foreach { case (n, _, _) => assert(n == 40L) }
    assert(got(0L)._2 == 4L && got(2L)._2 == 8L) // union vocab per period
    // monotone drift series: identical < one-swap < disjoint
    assert(got(0L)._3 < got(1L)._3 && got(1L)._3 < got(2L)._3, got.toString)
    // a single period's total equals the two-corpus wordPsiAll sum
    val single = Drift.wordPsiAll(ref,
      cur.filter(col("period") === 1L), "text")
      .agg(sum(col("contrib_pico"))).collect()(0).getLong(0)
    assert(got(1L)._3 == single)
  }

  private def bruteJsd(a: Seq[String], b: Seq[String]): Map[String, Long] = {
    val ta = a.flatMap(_.split(" ", -1))
    val tb = b.flatMap(_.split(" ", -1))
    val vocab = (ta ++ tb).distinct
    val (na, nb, v) = (ta.size.toLong, tb.size.toLong, vocab.size.toLong)
    vocab.map { w =>
      val pa = (ta.count(_ == w) + 1).toDouble / (na + v)
      val pb = (tb.count(_ == w) + 1).toDouble / (nb + v)
      val m = (pa + pb) / 2
      w -> math.floor((pa * math.log(pa / m) + pb * math.log(pb / m))
        * 0.5 * 1e12).toLong
    }.toMap
  }

  test("wordJsd: exact sequential replay, nonnegative terms, ln-2 bound") {
    val a = Seq("x x y z", "x y")
    val b = Seq("x z z q", "z q")
    val exp = bruteJsd(a, b)
    val got = Drift.wordJsd(a.toDF("text"), b.toDF("text"), "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == exp)
    // pointwise JS terms are >= 0 up to the floor's -1 on -0.0-ish
    assert(got.values.forall(_ >= -1L))
    // the corpus JSD is bounded by ln 2 — the property PSI lacks:
    // even fully disjoint vocabularies stay under the cap
    val disjoint = Drift.wordJsdAll(
      Seq.fill(50)("aa bb cc").toDF("text"),
      Seq.fill(50)("dd ee ff").toDF("text"), "text")
      .agg(sum(col("contrib_pico"))).collect()(0).getLong(0)
    assert(disjoint <= math.floor(math.log(2) * 1e12).toLong)
    assert(disjoint > (0.5 * math.log(2) * 1e12).toLong) // and it is LARGE drift
    val same = Drift.wordJsd(a.toDF("text"), a.toDF("text"), "text", k = 10)
      .collect().map(_.getLong(3))
    assert(same.forall(c => c == 0L || c == -1L))
  }
}
