package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OLAP metadata model, mirroring the reference's `<factName>.json` API
  * metadata (reference: api-library-olap/README.md:96-161) and
  * `olapSettings.json` (reference: library_olap/README.md:25-36).
  *
  * Dimensions/levels/hierarchies are pure metadata: levels are ordinary
  * columns of the fact DataFrame, so the compiled query is plain Catalyst
  * filters/aggregates and the optimizer sees through everything.
  */

/** Aggregate-function catalog. The reference's complete set is sum/avg/count
  * (api-library-olap/README.md:138-150). */
sealed abstract class AggregateFn(val name: String) {
  def apply(c: Column): Column
}
object AggregateFn {
  case object Sum extends AggregateFn("sum") { def apply(c: Column): Column = sum(c) }
  case object Avg extends AggregateFn("avg") { def apply(c: Column): Column = avg(c) }
  case object Count extends AggregateFn("count") { def apply(c: Column): Column = count(c) }
  /** Beyond reference parity: exact linear-interpolation median
    * (quantile_cont semantics — the same percentile the q29 conformance
    * query proved oracle-exact). */
  case object Median extends AggregateFn("median") {
    def apply(c: Column): Column = percentile(c, lit(0.5))
  }
  val all: Seq[AggregateFn] = Seq(Sum, Avg, Count, Median)
  def byName(n: String): AggregateFn =
    all.find(_.name == n.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown aggregate function: $n"))
}

/** One level of a dimension hierarchy. `column` is the physical fact-table
  * column; `attributes` are companion columns functionally dependent on the
  * level key (reference: Codice.gs:84-106,284-294), carried through grouping.
  * `label` is display metadata passed through the catalog endpoints
  * (reference: api-library-olap/README.md:100,110). */
final case class Level(name: String, column: String,
    attributes: Seq[String] = Nil, label: String = "") {
  def labelOrName: String = if (label.isEmpty) name else label
}

/** Named ordered list of level names, coarse -> fine
  * (reference: api-library-olap/README.md:112-129). */
final case class Hierarchy(name: String, order: Seq[String])

/** A dimension: flat (one implicit level) or hierarchical. `label`/`info`
  * and dimension-granularity `attributes` are catalog metadata the
  * DataStudio connector consumes (Codice.gs:47,88,96-99). */
final case class Dimension(
    name: String,
    levels: Seq[Level],
    hierarchies: Seq[Hierarchy] = Nil,
    label: String = "",
    info: String = "",
    attributes: Seq[String] = Nil) {

  def isFlat: Boolean = hierarchies.isEmpty && levels.size == 1

  def labelOrName: String = if (label.isEmpty) name else label

  private val byName: Map[String, Level] = levels.map(l => l.name -> l).toMap
  private val hierByName: Map[String, Hierarchy] =
    hierarchies.map(h => h.name -> h).toMap

  def level(n: String): Level =
    byName.getOrElse(n, throw new IllegalArgumentException(
      s"dimension $name has no level $n"))

  /** Default hierarchy = first declared, else declaration order of levels. */
  def defaultOrder: Seq[Level] =
    hierarchies.headOption.map(_.order.map(level)).getOrElse(levels)

  /** Level order under a named hierarchy ("la api può ricevere come
    * parametro il tipo di gerarchia", api-library-olap/README.md:~112);
    * None selects the default. */
  def orderFor(hier: Option[String]): Seq[Level] = hier match {
    case None => defaultOrder
    case Some(h) => hierByName.getOrElse(h, throw new IllegalArgumentException(
      s"dimension $name has no hierarchy $h")).order.map(level)
  }
}

object Dimension {
  /** Flat dimension over a single column (e.g. `loan_type`). */
  def flat(name: String, column: String = null): Dimension = {
    val col = Option(column).getOrElse(name)
    Dimension(name, Seq(Level(name, col)))
  }
}

/** A measure: dependent variable + default aggregate
  * (reference: api-library-olap/README.md:131-137). `expr` optionally
  * overrides the full aggregate expression (used where the engine needs
  * exact-arithmetic variants, e.g. decimal-cast money sums). */
final case class Measure(
    name: String,
    column: String,
    default: AggregateFn = AggregateFn.Sum,
    expr: Option[Column] = None,
    label: String = "") {

  def labelOrName: String = if (label.isEmpty) name else label

  /** The aggregate Column for this measure under function `fn` against the
    * physical column resolved through `mappings`. The `expr` override only
    * stands in for the DEFAULT function — an explicit different `fn`
    * request always computes fn(physical column). */
  def aggregate(fn: AggregateFn, physical: String => String): Column = {
    val base =
      if (fn == default) expr.getOrElse(fn(col(physical(column))))
      else fn(col(physical(column)))
    base.as(name)
  }
}

/** Complete metadata for one fact table: the rebuild's analog of the
  * `<factName>.json` file (reference: api-library-olap/README.md:90-161).
  * `mappings` translate logical API names to physical columns
  * (reference: api-library-olap/README.md:151-160). */
final case class FactMeta(
    name: String,
    dimensions: Seq[Dimension],
    measures: Seq[Measure],
    mappings: Map[String, String] = Map.empty,
    label: String = "",
    aggregates: Map[String, AggregateFn] = Map.empty) {

  def labelOrName: String = if (label.isEmpty) name else label

  private val dimByName = dimensions.map(d => d.name -> d).toMap
  private val measureByName = measures.map(m => m.name -> m).toMap

  /** Resolve a requested aggregate name through the fact's named catalog
    * (reference "aggregates" section, api-library-olap/README.md:138-150 —
    * e.g. "average" -> avg), falling back to the built-in function names. */
  def aggregateFn(n: String): AggregateFn =
    aggregates.getOrElse(n, AggregateFn.byName(n))

  def dimension(n: String): Dimension =
    dimByName.getOrElse(n, throw new IllegalArgumentException(
      s"fact $name has no dimension $n"))

  def measure(n: String): Measure =
    measureByName.getOrElse(n, throw new IllegalArgumentException(
      s"fact $name has no measure $n"))

  /** Physical column for a logical name (identity when unmapped). */
  def physical(logical: String): String =
    mappings.get(logical).map(_.split('.').last).getOrElse(logical)
}
