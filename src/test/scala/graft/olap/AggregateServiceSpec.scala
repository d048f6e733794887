package graft.olap

import graft.SparkTestBase
import graft.model._

import org.apache.spark.sql.functions._

/** The §3.2 API lifecycle: request -> DataFrame -> rendered output,
  * including the `output=table` and `empty_dataset` wire conventions. */
class AggregateServiceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fact = Seq(
    (2024L, 1L, "BUILDING", 10L), (2024L, 1L, "AUTOMOBILE", 5L),
    (2024L, 2L, "BUILDING", 7L), (2023L, 12L, "BUILDING", 3L))
    .toDF("year", "month", "segment", "value")

  private val meta = FactMeta("enabled_users",
    Seq(Dimension.flat("segment"),
      Dimension("date", Seq(Level("year", "year"), Level("month", "month")),
        Seq(Hierarchy("ym", Seq("year", "month"))))),
    Seq(Measure("value", "value", AggregateFn.Sum)))

  private def req(cut: String = null, drill: String = null, measure: String = null) =
    AggregateService.Request.fromParams(Option(cut), Option(drill), Option(measure))

  test("global aggregate (A1) with default measure") {
    val r = AggregateService.aggregate(fact, meta, req())
    assert(r.columns.toSeq == Seq("value"))
    assert(r.as[Long].collect()(0) == 25L)
  }

  test("cut + drilldown + deterministic ordering") {
    val r = AggregateService.aggregate(fact, meta,
      req(cut = "date:2024", drill = "segment"))
    assert(r.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("AUTOMOBILE", 5L), ("BUILDING", 17L)))
  }

  test("aggregate override: count instead of the declared sum") {
    val r = AggregateService.aggregate(fact, meta,
      req(drill = "segment").copy(aggregates = Map("value" -> "count")))
    assert(r.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("AUTOMOBILE", 1L), ("BUILDING", 3L)))
  }

  test("order + limit: top-N by measure, group key breaks ties") {
    val r = AggregateService.aggregate(fact, meta,
      AggregateService.Request.fromParams(None, Some("segment"), None,
        order = Some("value:desc"), limit = Some(1)))
    assert(r.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("BUILDING", 20L)))
    // ascending tie-break on the key: both segments summed to 5 -> the
    // lexicographically first wins the single slot
    val tied = Seq(("a", 5L), ("b", 5L)).toDF("segment", "value")
    val r2 = AggregateService.aggregate(tied,
      FactMeta("t", Seq(Dimension.flat("segment")),
        Seq(Measure("value", "value", AggregateFn.Sum))),
      AggregateService.Request.fromParams(None, Some("segment"), None,
        order = Some("value:desc"), limit = Some(1)))
    assert(r2.collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("median aggregate from the catalog (override by name)") {
    val r = AggregateService.aggregate(fact, meta,
      req(drill = "segment").copy(aggregates = Map("value" -> "median")))
    // BUILDING values 10, 7, 3 -> median 7; AUTOMOBILE single 5
    assert(r.collect().map(x => (x.getString(0), x.getDouble(1))).toSeq ==
      Seq(("AUTOMOBILE", 5.0), ("BUILDING", 7.0)))
  }

  test("output=table: header row first (Codice.gs:155-183)") {
    val r = AggregateService.aggregate(fact, meta, req(drill = "segment"))
    val t = Renderer.toTable(r)
    assert(t.startsWith("[[\"segment\", \"value\"],"))
    assert(t.contains("[\"AUTOMOBILE\", 5]"))
  }

  test("json output nests measures") {
    val r = AggregateService.aggregate(fact, meta, req(drill = "segment"))
    val j = Renderer.toJson(r, Set("value"))
    assert(j.contains("\"segment\": \"BUILDING\""))
    assert(j.contains("\"measures\": {\"value\": 20}"))
  }

  test("empty cut -> empty_dataset (S14)") {
    val r = AggregateService.aggregate(fact, meta,
      req(cut = "segment:NOPE", drill = "segment"))
    assert(Renderer.toTable(r) == Renderer.emptyDataset)
    assert(Renderer.toJson(r, Set("value")) == Renderer.emptyDataset)
  }

  test("measure mappings resolve logical -> physical columns (P8)") {
    val mapped = FactMeta("f", Seq(Dimension.flat("segment")),
      Seq(Measure("loans", "loans", AggregateFn.Sum)),
      mappings = Map("loans" -> "enabled_users.value"))
    val r = AggregateService.aggregate(fact, mapped, req(drill = "segment"))
    assert(r.columns.toSeq == Seq("segment", "loans"))
    assert(r.agg(sum($"loans")).as[Long].collect()(0) == 25L)
  }

  test("explicit fn override beats a baked-in expr measure") {
    import org.apache.spark.sql.functions.{sum => fsum}
    val m = meta.copy(measures = Seq(Measure("value", "value", AggregateFn.Sum,
      expr = Some(fsum($"value" * 2).as("value"))))) // custom default expr
    val dflt = AggregateService.aggregate(fact, m, req())
    assert(dflt.as[Long].collect()(0) == 50L) // expr used for default fn
    val cnt = AggregateService.aggregate(fact, m,
      req().copy(aggregates = Map("value" -> "count")))
    assert(cnt.as[Long].collect()(0) == 4L) // override computes count, not expr
  }

  test("measure selection by name (P9)") {
    val m2 = meta.copy(measures = meta.measures :+
      Measure("ct", "value", AggregateFn.Count))
    val r = AggregateService.aggregate(fact, m2, req(measure = "ct"))
    assert(r.columns.toSeq == Seq("ct"))
  }

  test("shareOfParent: shares sum to 1 per parent, rank follows size") {
    val r = AggregateService.shareOfParent(fact, meta,
      req(drill = "date:year|date:month"),
      parentLevels = Seq("year"), measureName = "value")
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getDouble(3), x.getDouble(4), x.getLong(5))).toMap
    // 2024: months 1 (15) and 2 (7) of 22; 2023: month 12 alone
    assert(r((2024L, 1L))._1 == 22.0 && r((2024L, 1L))._2 == 15.0 / 22.0)
    assert(r((2024L, 2L))._2 == 7.0 / 22.0)
    assert(r((2023L, 12L))._2 == 1.0 && r((2023L, 12L))._3 == 1L)
    assert(r((2024L, 1L))._3 == 1L && r((2024L, 2L))._3 == 2L)
    // shares within each parent sum to exactly 1 (exact decimal total)
    val by2024 = Seq(r((2024L, 1L))._2, r((2024L, 2L))._2).sum
    assert(math.abs(by2024 - 1.0) < 1e-15)
  }

  test("periodChange: first period NULL, growth exact, period order respected") {
    val r = AggregateService.periodChange(fact, meta,
      req(drill = "date:year|date:month"),
      orderLevels = Seq("year", "month"), measureName = "value")
      .orderBy(col("year"), col("month")).collect()
    // sequence: 2023-12 (3), 2024-01 (15), 2024-02 (7)
    assert(r(0).isNullAt(3) && r(0).isNullAt(4)) // no previous period
    assert(r(1).getLong(3) == 3L)
    assert(r(1).getDouble(4) == (15.0 - 3.0) / 3.0)
    assert(r(2).getLong(3) == 15L)
    assert(r(2).getDouble(4) == (7.0 - 15.0) / 15.0)
  }
}
