package graft.olap

import graft.SparkTestBase
import graft.model._

/** Level-resolution rules A4-A10 — each README example
  * (api-library-olap/README.md:54-79) locked as a case. */
class DrilldownSpec extends SparkTestBase {

  private val dateDim = Dimension("date",
    Seq(Level("year", "year"), Level("month", "month"), Level("day", "day"),
      Level("week", "week")),
    Seq(Hierarchy("ymd", Seq("year", "month", "day")),
      Hierarchy("yw", Seq("year", "week"))))
  private val orgDim = Dimension("org",
    Seq(Level("region", "region", attributes = Seq("r_name")),
      Level("nation", "nation")),
    Seq(Hierarchy("rn", Seq("region", "nation"))))
  private val meta = FactMeta("f",
    Seq(Dimension.flat("loan_type"), dateDim, orgDim),
    Seq(Measure("value", "value")))

  private def levels(drill: String, cut: String = ""): Seq[String] =
    Drilldown.resolve(Drilldown.parse(drill),
      if (cut.isEmpty) Nil else Cut.parse(cut), meta).flatMap(_.levels.map(_.name))

  test("A4: flat dimension -> its single level") {
    assert(levels("loan_type") == Seq("loan_type"))
  }

  test("A7: un-cut hierarchical dim -> top level") {
    assert(levels("date") == Seq("year"))
  }

  test("A5: cut at year -> group one level below (month)") {
    assert(levels("date", cut = "date:2016") == Seq("month"))
  }

  test("A5: cut at year,month -> day") {
    assert(levels("date", cut = "date:2016,10") == Seq("day"))
  }

  test("A5: cut at deepest level stays at deepest") {
    assert(levels("date", cut = "date:2016,10,3") == Seq("day"))
  }

  test("A6: explicit target level spans below-cut..target") {
    assert(levels("date:day", cut = "date:2016") == Seq("month", "day"))
    assert(levels("date:day") == Seq("year", "month", "day")) // no cut
  }

  test("A9: echoing the cut's own level") {
    assert(levels("date:year|date:month", cut = "date:1996") ==
      Seq("year", "month"))
  }

  test("A8: multiple dimensions keep first-appearance order") {
    assert(levels("loan_type|date") == Seq("loan_type", "year"))
  }

  test("A10: level attributes ride along in the grouping columns") {
    val r = Drilldown.resolve(Drilldown.parse("org"), Nil, meta)
    assert(r.flatMap(_.columns(meta)) == Seq("region", "r_name"))
  }

  test("named hierarchy: date@yw walks year -> week") {
    assert(levels("date@yw") == Seq("year")) // un-cut -> top level
    assert(levels("date@yw", cut = "date:2016") == Seq("week")) // below cut
    assert(levels("date@yw:week") == Seq("year", "week")) // explicit target
  }

  test("conflicting hierarchies for one dimension rejected") {
    intercept[IllegalArgumentException](levels("date@yw|date@ymd"))
  }

  test("a cut's named hierarchy carries over to the drilldown") {
    // cut pins (year, week) along yw: "one level below the cut" must
    // resolve inside yw (-> week, the deepest), NOT day of the default ymd
    assert(levels("date", cut = "date@yw:2016,40") == Seq("week"))
    // cut and drilldown naming different hierarchies is an error
    intercept[IllegalArgumentException](
      levels("date@ymd", cut = "date@yw:2016"))
  }

  test("unknown hierarchy rejected") {
    intercept[IllegalArgumentException](levels("date@nope"))
  }

  test("unknown level rejected") {
    intercept[IllegalArgumentException](levels("date:hour"))
  }
}
