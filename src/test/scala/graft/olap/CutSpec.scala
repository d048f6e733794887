package graft.olap

import graft.SparkTestBase
import graft.model._
import graft.olap.Cut._

/** Cut grammar (P1-P7) parse + compile; compiled predicate equivalence
  * against brute-force row filtering (SURVEY.md §5.3). */
class CutSpec extends SparkTestBase {
  import spark.implicits._

  private val meta = FactMeta("f",
    Seq(Dimension.flat("loan_type"), Dimension.flat("library_id"),
      Dimension("date",
        Seq(Level("year", "year"), Level("month", "month"), Level("day", "day")),
        Seq(Hierarchy("ymd", Seq("year", "month", "day")),
          Hierarchy("ym", Seq("year", "month"))))),
    Seq(Measure("value", "value")))

  test("parser: P1-P7 shapes") {
    assert(parse("loan_type:loan_local") ==
      Seq(DimCut("loan_type", Point(Seq("loan_local")))))
    assert(parse("a:x|b:y") == Seq(DimCut("a", Point(Seq("x"))),
      DimCut("b", Point(Seq("y")))))
    assert(parse("library_id:1-120") ==
      Seq(DimCut("library_id", Range(Some(Seq("1")), Some(Seq("120"))))))
    assert(parse("library_id:23-") ==
      Seq(DimCut("library_id", Range(Some(Seq("23")), None))))
    assert(parse("library_id:-23") ==
      Seq(DimCut("library_id", Range(None, Some(Seq("23"))))))
    assert(parse("library_id:23;50") ==
      Seq(DimCut("library_id", Members(Seq("23", "50")))))
    assert(parse("date:2016,10,3") ==
      Seq(DimCut("date", Point(Seq("2016", "10", "3")))))
    assert(parse("date:2016,10-2017,02") ==
      Seq(DimCut("date", Range(Some(Seq("2016", "10")), Some(Seq("2017", "02"))))))
  }

  test("parser + compile: named hierarchy selects the level walk") {
    assert(parse("date@ym:2016,10") ==
      Seq(DimCut("date", Point(Seq("2016", "10")), Some("ym"))))
    assert(run("date@ym:2016,10") == brute(r => r._1 == 2016 && r._2 == 10))
    // a 3-deep walk overruns the 2-level ym hierarchy
    intercept[IllegalArgumentException](run("date@ym:2016,10,3"))
    intercept[IllegalArgumentException](run("date@nope:2016"))
  }

  test("parser: malformed input rejected") {
    intercept[IllegalArgumentException](parseOne("nocolon"))
    intercept[IllegalArgumentException](parseOne("dim:"))
    intercept[IllegalArgumentException](parseOne(":member"))
  }

  private val rows = for {
    y <- 2015 to 2018; m <- 1 to 12
  } yield (y.toLong, m.toLong, (y * 31 + m * 7) % 28 + 1L,
    if (m % 2 == 0) "loan_local" else "loan_ill", (y + m) % 200L, 1L)

  private lazy val df = rows.toDF("year", "month", "day", "loan_type",
    "library_id", "value")

  private def run(cut: String): Set[(Long, Long)] =
    df.filter(compile(parse(cut), meta, df.schema))
      .select("year", "month").as[(Long, Long)].collect().toSet

  private def brute(p: ((Long, Long, Long, String, Long, Long)) => Boolean): Set[(Long, Long)] =
    rows.filter(p).map(r => (r._1, r._2)).toSet

  test("compile: point, dice, set, ranges vs brute force") {
    assert(run("loan_type:loan_local") == brute(_._4 == "loan_local"))
    assert(run("loan_type:loan_local|library_id:23-") ==
      brute(r => r._4 == "loan_local" && r._5 >= 23))
    assert(run("library_id:1-120") == brute(r => r._5 >= 1 && r._5 <= 120))
    assert(run("library_id:-23") == brute(_._5 <= 23))
    assert(run("library_id:23;50") == brute(r => r._5 == 23 || r._5 == 50))
    assert(run("date:2016,10") == brute(r => r._1 == 2016 && r._2 == 10))
  }

  test("compile: hierarchical range is lexicographic over level tuples") {
    assert(run("date:2016,10-2017,02") ==
      brute(r => (r._1 > 2016 || (r._1 == 2016 && r._2 >= 10)) &&
        (r._1 < 2017 || (r._1 == 2017 && r._2 <= 2))))
    // deeper bound on one side only
    assert(run("date:2016-2017,02") ==
      brute(r => r._1 >= 2016 && (r._1 < 2017 || (r._1 == 2017 && r._2 <= 2))))
  }

  test("property: random single-level int ranges match brute force") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val lo = rnd.nextInt(211).toLong
      val hi = lo + rnd.nextInt((211 - lo).toInt + 1)
      assert(run(s"library_id:$lo-$hi") ==
        brute(r => r._5 >= lo && r._5 <= hi), s"range $lo-$hi")
    }
  }

  test("hyphen inside a string member is a literal, not a range") {
    assert(run("loan_type:loan-ill") == Set.empty) // no such member
    val withDash = rows.map(r => if (r._4 == "loan_ill") r.copy(_4 = "loan-ill") else r)
      .toDF("year", "month", "day", "loan_type", "library_id", "value")
    val got = withDash.filter(compile(parse("loan_type:loan-ill"), meta, withDash.schema))
      .count()
    assert(got == rows.count(_._4 == "loan_ill"))
  }

  test("cut deeper than hierarchy is rejected") {
    intercept[IllegalArgumentException](
      run("date:2016,10,3,4"))
  }
}
