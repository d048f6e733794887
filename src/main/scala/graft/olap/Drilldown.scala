package graft.olap

import graft.model.{Dimension, FactMeta, Level}

/** The `drilldown` group-by language and its hierarchy-aware level
  * resolution (reference: api-library-olap/README.md:54-79, connector usage
  * Codice.gs:295-333).
  *
  * Rules implemented (SURVEY.md §2.3):
  *  - A4 plain `drilldown=<dim>` on a flat dim -> its column
  *  - A5 default level: with a cut at depth k on the same dim, group at the
  *    level below the cut's deepest level (k+1), capped at the hierarchy's
  *    finest level
  *  - A6 explicit target `drilldown=dim:level` -> all levels from below-cut
  *    down to the target
  *  - A7 no cut, no explicit level, hierarchical dim -> top level
  *  - A8 multiple dims separated by `|`
  *  - A9 repeating `dim:level` entries echoes the cut's own levels
  *  - A10 each chosen level contributes its declared attribute columns
  */
object Drilldown {

  /** One `dim`, `dim:level`, `dim@hier` or `dim@hier:level` item from the
    * `drilldown=` parameter. `hier` selects a named hierarchy of the
    * dimension ("la api può ricevere come parametro il tipo di gerarchia",
    * api-library-olap/README.md:~112); absent = the default hierarchy. */
  final case class Spec(dim: String, level: Option[String],
      hier: Option[String] = None)

  def parse(drilldown: String): Seq[Spec] =
    drilldown.split('|').toSeq.filter(_.nonEmpty).map { s =>
      val i = s.indexOf(':')
      val (head, level) =
        if (i < 0) (s, None) else (s.substring(0, i), Some(s.substring(i + 1)))
      val j = head.indexOf('@')
      if (j < 0) Spec(head, level)
      else Spec(head.substring(0, j), level, Some(head.substring(j + 1)))
    }

  /** Resolved grouping: the ordered level columns (with attributes) for one
    * dimension. */
  final case class Resolved(dim: Dimension, levels: Seq[Level]) {
    def columns(meta: FactMeta): Seq[String] =
      levels.flatMap(l => (l.column +: l.attributes.filterNot(_ == l.column)))
        .distinct.map(meta.physical)
  }

  /** Resolve all drilldown specs against the cuts in force. Specs for the
    * same dimension are merged (A9): the union of their resolved level index
    * ranges, emitted in hierarchy order. */
  def resolve(specs: Seq[Spec], cuts: Seq[Cut.DimCut], meta: FactMeta): Seq[Resolved] = {
    val byDim = specs.groupBy(_.dim)
    // preserve first-appearance order of dims
    specs.map(_.dim).distinct.map { dimName =>
      val dim = meta.dimension(dimName)
      // hierarchy choice is per-dimension and shared with the cuts in
      // force: "one level below the cut" is only meaningful inside the
      // hierarchy the cut walked, so a cut's named hierarchy carries over
      // to the drilldown, and naming two different ones is an error
      val dimCuts = cuts.filter(_.dim == dimName)
      val hiers = (byDim(dimName).flatMap(_.hier) ++ dimCuts.flatMap(_.hier)).distinct
      require(hiers.size <= 1,
        s"conflicting hierarchies for dimension $dimName: ${hiers.mkString(", ")}")
      val order = dim.orderFor(hiers.headOption)
      val cutDepth = dimCuts.map(_.depth).maxOption.getOrElse(0)
      val indices: Seq[Int] = byDim(dimName).flatMap { spec =>
        resolveOne(spec, dim, order, cutDepth)
      }.distinct.sorted
      Resolved(dim, indices.map(order))
    }
  }

  /** Level indices contributed by one spec (indices into the default
    * hierarchy order, coarse->fine). */
  private def resolveOne(spec: Spec, dim: Dimension, order: Seq[Level],
      cutDepth: Int): Seq[Int] = {
    if (dim.isFlat) return Seq(0)
    spec.level match {
      case Some(lvName) =>
        val target = order.indexWhere(_.name == lvName)
        require(target >= 0, s"dimension ${dim.name} has no level $lvName in hierarchy")
        // A6: all levels from below-cut down to target; A9: if the target is
        // at or above the cut depth (an echo of the cut's own level), emit
        // just that level.
        if (target < cutDepth) Seq(target)
        else (math.min(cutDepth, target) to target)
      case None =>
        if (cutDepth == 0) Seq(0) // A7: un-cut -> top level
        else Seq(math.min(cutDepth, order.size - 1)) // A5: one below the cut
    }
  }
}
