package graft.olap

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.LocalDate

import graft.SparkTestBase
import graft.config.OlapConfig
import graft.snapshot.{SnapshotJob, Warehouse}

/** End-to-end REST front: a real socket on an ephemeral port, golden
  * responses identical to the library-call wire formats (the HTTP layer
  * must add nothing and lose nothing vs OlapApi). */
class OlapHttpSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  override def afterAll(): Unit = {
    if (started) server.stop()
    super.afterAll()
  }

  @volatile private var started = false

  private val settingsJson =
    """{ "fact_tables": [ {
      |  "name": "http_users", "label": "utenti attivi", "cron": "daily",
      |  "fact_queries": [
      |    { "query_id": 1, "enable": 1, "info": "active users",
      |      "query": { "type": "sql", "value":
      |        "SELECT c_mktsegment AS segment, COUNT(*) AS value FROM http_customer GROUP BY c_mktsegment" } } ] } ] }"""
      .stripMargin

  private val factMetaJson =
    """{ "label": "utenti attivi",
      |  "dimensions": [ { "name": "segment", "label": "segmento" } ],
      |  "measures": [ { "name": "value", "label": "valore", "aggregate": "sum" } ] }"""
      .stripMargin

  private lazy val wh: Warehouse = {
    graft.Tables.load(spark, sf("sf0.001"), "customer")
      .createOrReplaceTempView("http_customer")
    val w = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("http_wh").toString)
    SnapshotJob.run(spark, OlapConfig.parseSettings(settingsJson), w,
      LocalDate.parse("2024-01-15"))
    w
  }

  private lazy val api: OlapApi =
    new OlapApi(spark, wh,
      Map("http_users" -> OlapConfig.parseFactMeta("http_users", factMetaJson)))

  private lazy val server: OlapHttpServer = {
    val s = OlapHttpServer(api).start()
    started = true
    s
  }
  private lazy val client = HttpClient.newHttpClient()

  private def get(pathAndQuery: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.boundPort}$pathAndQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("catalog routes match the library wire formats byte-for-byte") {
    assert(get("/olap/fact_tables") == (200, api.factTables))
    assert(get("/olap/http_users/dimensions") == (200, api.dimensions("http_users")))
    assert(get("/olap/http_users/measures") == (200, api.measures("http_users")))
    assert(get("/olap/http_users/aggregates") == (200, api.aggregates("http_users")))
  }

  test("aggregate route: params decode, output=table golden") {
    val (code, body) = get(
      "/olap/http_users/aggregate?drilldown=segment&output=table")
    assert(code == 200)
    assert(body == api.aggregate("http_users", drilldown = Some("segment"),
      output = "table"))
    assert(body.startsWith("""[["segment", "value"],"""))
    // percent-encoded cut grammar (: and |) decodes to the same result
    val (c2, b2) = get("/olap/http_users/aggregate?cut=segment%3ABUILDING" +
      "&drilldown=segment&output=table")
    assert(c2 == 200)
    assert(b2 == api.aggregate("http_users", cut = Some("segment:BUILDING"),
      drilldown = Some("segment"), output = "table"))
    // top-N through the wire: order+limit
    val (c3, b3) = get(
      "/olap/http_users/aggregate?drilldown=segment&order=value%3Adesc&limit=2&output=table")
    assert(c3 == 200 && b3.split("\n").length == 3) // header + 2 rows
  }

  test("empty cut -> empty_dataset through the wire") {
    val (code, body) = get(
      "/olap/http_users/aggregate?cut=segment%3ANOPE&drilldown=segment")
    assert(code == 200 && body == Renderer.emptyDataset)
  }

  test("errors: unknown route 404, unknown fact / bad limit 400") {
    assert(get("/olap/nope_route")._1 == 404)
    assert(get("/olap/no_such_fact/aggregate")._1 == 400)
    val (code, body) = get("/olap/http_users/aggregate?limit=abc")
    assert(code == 400 && body.contains("\"error\""))
  }

  test("tags route + aggregate?tag=: time travel reachable through the API") {
    // runs last alphabetically-independent: pin, then mutate the fact
    val before = get("/olap/http_users/aggregate?drilldown=segment&output=table")._2
    wh.tag("http_users", "run-2024-01-15")
    assert(get("/olap/http_users/tags") == (200, """["run-2024-01-15"]"""))
    // a later snapshot changes the live aggregate...
    SnapshotJob.run(spark, OlapConfig.parseSettings(settingsJson), wh,
      LocalDate.parse("2024-01-16"))
    val live = get("/olap/http_users/aggregate?drilldown=segment&output=table")._2
    assert(live != before)
    // ...but the pinned read reproduces the pre-append result exactly
    val (tc, tagged) = get(
      "/olap/http_users/aggregate?drilldown=segment&output=table&tag=run-2024-01-15")
    assert(tc == 200 && tagged == before)
    // unknown tag fails as a client error, not a 500
    assert(get("/olap/http_users/aggregate?tag=nope")._1 == 400)
    assert(get("/olap/no_such_fact/tags")._1 == 400)
  }
}
