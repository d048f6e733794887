package graft.olap

import java.time.LocalDate

import graft.SparkTestBase
import graft.config.OlapConfig
import graft.snapshot.{SnapshotJob, Warehouse}

/** Golden end-to-end (SURVEY.md §5.4): config JSON in -> snapshot ->
  * aggregate API -> `output=table` JSON out, covering the §3.1 + §3.2
  * lifecycles including empty_dataset and table-format header order. */
class OlapApiSpec extends SparkTestBase {

  private val settingsJson =
    """{ "fact_tables": [ {
      |  "name": "enabled_users", "label": "utenti attivi", "cron": "daily",
      |  "fact_queries": [
      |    { "query_id": 1, "enable": 1, "info": "active users",
      |      "query": { "type": "sql", "value":
      |        "SELECT c_mktsegment AS segment, CASE WHEN c_acctbal >= 5000 THEN 'hi' WHEN c_acctbal >= 0 THEN 'mid' ELSE 'neg' END AS bucket, COUNT(*) AS value FROM api_customer GROUP BY c_mktsegment, bucket" } },
      |    { "query_id": 2, "enable": 0, "info": "disabled - must not run",
      |      "query": { "type": "sql", "value": "SELECT 1 AS one" } } ] } ] }"""
      .stripMargin

  private val factMetaJson =
    """{ "label": "utenti attivi",
      |  "dimensions": [
      |    { "name": "segment", "label": "segmento" },
      |    { "name": "bucket" },
      |    { "name": "date",
      |      "levels": [ { "name": "year" }, { "name": "month" }, { "name": "day" } ],
      |      "hierarchies": [ { "name": "ymd", "order": ["year", "month", "day"] } ] } ],
      |  "measures": [ { "name": "value", "label": "valore", "aggregate": "sum" } ],
      |  "aggregates": [ { "name": "sum", "function": "sum" },
      |                  { "name": "average", "function": "avg" },
      |                  { "name": "count", "function": "count" } ] }""".stripMargin

  private lazy val api: OlapApi = {
    graft.Tables.load(spark, sf("sf0.001"), "customer")
      .createOrReplaceTempView("api_customer")
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("api_wh").toString)
    val settings = OlapConfig.parseSettings(settingsJson)
    assert(settings.facts.head.queries.map(_.enabled) == Seq(true, false))
    SnapshotJob.run(spark, settings, wh, LocalDate.parse("2024-01-15"))
    new OlapApi(spark, wh,
      Map("enabled_users" -> OlapConfig.parseFactMeta("enabled_users", factMetaJson)))
  }

  test("catalog endpoints carry name+label (connector shape, Codice.gs:45-47)") {
    assert(api.factTables ==
      """[{"name": "enabled_users", "label": "utenti attivi"}]""")
    val dims = api.dimensions("enabled_users")
    // declared label passes through; undeclared defaults to the name
    assert(dims.contains(""""name": "segment", "label": "segmento""""))
    assert(dims.contains(
      """"name": "date", "label": "date", "info": "", "attributes": [], """ +
        """"levels": [{"name": "year", "label": "year", "attributes": []}"""))
    assert(api.measures("enabled_users") ==
      """[{"name": "value", "label": "valore", "aggregate": "sum"}]""")
    // named catalog entries (incl. "average" -> avg) + remaining built-ins
    assert(api.aggregates("enabled_users") ==
      """[{"name": "average", "function": "avg"}, {"name": "avg", "function": "avg"}, """ +
        """{"name": "count", "function": "count"}, {"name": "median", "function": "median"}, """ +
        """{"name": "sum", "function": "sum"}]""")
  }

  test("per-call aggregate override (README /aggregate, 'o quella specificata')") {
    // count override: one snapshot row per (segment, bucket) -> per-segment
    // counts must sum to the total (segment, bucket) row count
    val t = api.aggregate("enabled_users", drilldown = Some("segment"),
      aggregate = Some("value:count"), output = "table")
    val values = "\\[\"\\w+\", (\\d+)\\]".r.findAllMatchIn(t).map(_.group(1).toInt).toSeq
    val nRows = api.aggregate("enabled_users", drilldown = Some("segment|bucket"),
      output = "table").split("\n").length - 1
    assert(values.size == 5 && values.sum == nRows, s"got $t")
    // catalog-name resolution: "average" -> avg (README aggregates section)
    val a = api.aggregate("enabled_users", drilldown = Some("segment"),
      aggregate = Some("average"))
    assert(a.contains(""""measures": {"value": """), s"got $a")
  }

  test("aggregate with cut+drilldown, output=table (golden)") {
    val t = api.aggregate("enabled_users", cut = Some("date:2024"),
      drilldown = Some("segment"), output = "table")
    val lines = t.split("\n").toSeq
    assert(lines.head == """[["segment", "value"],""")
    // sf0.001 customer has 150 rows over 5 segments; values sum to 150
    val values = "\\[\"\\w+\", (\\d+)\\]".r.findAllMatchIn(t).map(_.group(1).toInt).toSeq
    assert(values.sum == 150 && values.size == 5)
  }

  test("aggregate json output nests measures") {
    val j = api.aggregate("enabled_users", drilldown = Some("bucket"))
    assert(j.contains(""""bucket": "hi""""))
    assert(j.contains(""""measures": {"value":"""))
  }

  test("drilldown on the time dimension injected by the snapshot") {
    val t = api.aggregate("enabled_users", drilldown = Some("date:month"),
      output = "table")
    assert(t.contains("""["year", "month", "value"]"""))
    assert(t.contains("[2024, 1, 150]"))
  }

  test("empty cut -> empty_dataset") {
    // with a drilldown, GROUP BY over the empty cut yields zero rows ->
    // the empty_dataset convention (a global aggregate instead yields one
    // NULL row, matching SQL semantics)
    assert(api.aggregate("enabled_users", cut = Some("segment:NOPE"),
      drilldown = Some("segment")) == Renderer.emptyDataset)
    assert(api.aggregate("enabled_users", cut = Some("segment:NOPE"),
      drilldown = Some("segment"), output = "table") == Renderer.emptyDataset)
  }

  test("unknown fact rejected") {
    intercept[IllegalArgumentException](api.aggregate("nope"))
  }

  test("API serves from the JDBC store: same aggregates as the parquet path") {
    // the reference's API reads FROM the OLAP database — run the same
    // snapshot into the JDBC sink and serve the same queries from it
    api // force the parquet-backed snapshot first (registers api_customer)
    val jw = new graft.snapshot.JdbcWarehouse(spark,
      "jdbc:derby:memory:graftdb_api;create=true")
    SnapshotJob.run(spark, OlapConfig.parseSettings(settingsJson), jw,
      LocalDate.parse("2024-01-15"))
    val japi = new OlapApi(spark, jw,
      Map("enabled_users" -> OlapConfig.parseFactMeta("enabled_users", factMetaJson)))
    val table = japi.aggregate("enabled_users", cut = Some("date:2024"),
      drilldown = Some("segment"), output = "table")
    assert(table == api.aggregate("enabled_users", cut = Some("date:2024"),
      drilldown = Some("segment"), output = "table"))
    assert(japi.factTables == api.factTables)
    // tag routes are a parquet-warehouse capability: clean client error
    val e = intercept[IllegalArgumentException](japi.tags("enabled_users"))
    assert(e.getMessage.contains("parquet warehouse"))
    intercept[IllegalArgumentException](japi.aggregate("enabled_users",
      tag = Some("t")))
  }
}
