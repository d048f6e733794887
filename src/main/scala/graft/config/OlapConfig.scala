package graft.config

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model._
import graft.snapshot.SnapshotJob
import graft.time.TimeScope.Cron

/** JSON codecs for the reference's two config surfaces:
  *
  *  - `olapSettings.json` (snapshot ETL config: fact_tables ->
  *    fact_queries; reference shape at library_olap/README.md:25-36)
  *  - `<factName>.json` (API metadata: dimensions/levels/hierarchies,
  *    measures, aggregates, mappings; spec embedded at
  *    api-library-olap/README.md:96-161)
  *
  * Jackson (already on the Spark classpath) does the tree parsing; the
  * shapes are small so no databind classes are needed.
  */
object OlapConfig {

  private val mapper = new ObjectMapper()

  private def arr(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Nil)

  private def str(n: JsonNode, field: String, default: String = ""): String =
    Option(n.get(field)).map(_.asText()).getOrElse(default)

  // ------------------------- olapSettings.json -------------------------

  def parseSettings(json: String): SnapshotJob.Settings = {
    val root = mapper.readTree(json)
    SnapshotJob.Settings(arr(root, "fact_tables").map { ft =>
      SnapshotJob.FactConfig(
        name = str(ft, "name"),
        cron = Cron.byName(str(ft, "cron", "daily")),
        label = str(ft, "label"),
        info = str(ft, "info"),
        queries = arr(ft, "fact_queries").map { fq =>
          val q = fq.get("query")
          val source = str(q, "type") match {
            case "sql"    => SnapshotJob.SqlSource(str(q, "value"))
            case "script" => SnapshotJob.ScriptSource(str(q, "value"))
            case other => throw new IllegalArgumentException(
              s"unknown query type: $other")
          }
          SnapshotJob.FactQuery(
            queryId = fq.get("query_id").asLong(),
            enabled = Option(fq.get("enable")).forall(_.asInt() == 1),
            source = source,
            info = str(fq, "info"))
        })
    })
  }

  // ------------------------- <factName>.json ---------------------------

  def parseFactMeta(name: String, json: String): FactMeta = {
    val root = mapper.readTree(json)
    val mappings: Map[String, String] =
      Option(root.get("mappings")).map { m =>
        m.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }.getOrElse(Map.empty)

    val dims = arr(root, "dimensions").map { d =>
      val dimName = str(d, "name")
      val dimAttrs = arr(d, "attributes").map(_.asText())
      val levels = arr(d, "levels").map { l =>
        val ln = str(l, "name")
        Level(ln, column = ln,
          attributes = arr(l, "attributes").map(_.asText()),
          label = str(l, "label"))
      }
      if (levels.isEmpty)
        // flat: dimension-granularity attributes ride on the single level
        // so grouping carries them (connector shape, Codice.gs:88)
        Dimension(dimName, Seq(Level(dimName, dimName, attributes = dimAttrs)),
          label = str(d, "label"), info = str(d, "info"), attributes = dimAttrs)
      else Dimension(dimName, levels,
        arr(d, "hierarchies").map { h =>
          Hierarchy(str(h, "name"), arr(h, "order").map(_.asText()))
        },
        label = str(d, "label"), info = str(d, "info"), attributes = dimAttrs)
    }

    // named aggregate catalog: name -> function (defaults to identity set)
    val aggByName: Map[String, AggregateFn] =
      arr(root, "aggregates").map { a =>
        str(a, "name") -> AggregateFn.byName(str(a, "function", str(a, "name")))
      }.toMap

    val measures = arr(root, "measures").map { m =>
      val agg = Option(m.get("aggregate")).map(_.asText()) match {
        case Some(n) => aggByName.getOrElse(n, AggregateFn.byName(n))
        case None    => AggregateFn.Sum
      }
      val mn = str(m, "name")
      Measure(mn, column = mn, default = agg, label = str(m, "label"))
    }

    FactMeta(name, dims, measures, mappings,
      label = str(root, "label"), aggregates = aggByName)
  }
}
