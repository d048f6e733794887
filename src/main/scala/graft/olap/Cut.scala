package graft.olap

import graft.model.{Dimension, FactMeta, Level}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** The `cut` slice/dice language (reference: api-library-olap/README.md:27-52).
  *
  * Grammar: `cut=<dim>:<member>|<dim>:<member>...`
  *   - `|` separates dimension cuts (conjunction)            — P2
  *   - `:` separates dimension name from member spec
  *   - `;` disjoint member set:  `library_id:23;50`          — P5
  *   - `-` range: `1-120`, open `23-` / `-23`                — P3/P4
  *   - `,` hierarchy-level walk: `date:2016,10,3`            — P6
  *   - ranges of level tuples: `date:2016,10-2017,02`        — P7
  *   - `@` named hierarchy for the walk: `date@yw:2016,40`
  *
  * Member values are untyped URL text; the compiler coerces each literal to
  * its level column's type (numeric compare for LONG levels, string
  * otherwise) — implied by `library_id:1-120` vs `loan_type:loan_local`.
  */
object Cut {

  sealed trait MemberSpec
  /** Point or hierarchical point: one value per hierarchy level, coarse
    * first (`2016,10,3`). */
  final case class Point(path: Seq[String]) extends MemberSpec
  /** Closed/open (half-bounded) range over level tuples; either bound may be
    * absent (`23-`, `-23`). */
  final case class Range(lo: Option[Seq[String]], hi: Option[Seq[String]]) extends MemberSpec
  /** Disjoint member set (`23;50`). */
  final case class Members(values: Seq[String]) extends MemberSpec

  /** `hier` selects a named hierarchy for the level walk (`date@yw:2016,40`
    * pins year then ISO week); absent = the dimension's default. */
  final case class DimCut(dim: String, spec: MemberSpec,
      hier: Option[String] = None) {
    /** Hierarchy depth this cut pins (for drilldown default-level rules). */
    def depth: Int = spec match {
      case Point(p)       => p.size
      case Range(lo, hi)  => math.max(lo.map(_.size).getOrElse(0), hi.map(_.size).getOrElse(0))
      case Members(_)     => 1
    }
  }

  /** Parse the full `cut=` parameter value. */
  def parse(cut: String): Seq[DimCut] =
    cut.split('|').toSeq.filter(_.nonEmpty).map(parseOne)

  def parseOne(s: String): DimCut = {
    val i = s.indexOf(':')
    require(i > 0, s"malformed cut (missing ':'): $s")
    val head = s.substring(0, i)
    val member = s.substring(i + 1)
    require(member.nonEmpty, s"malformed cut (empty member): $s")
    val j = head.indexOf('@')
    if (j < 0) DimCut(head, parseMember(member))
    else DimCut(head.substring(0, j), parseMember(member),
      Some(head.substring(j + 1)))
  }

  private def parseMember(m: String): MemberSpec =
    if (m.contains(';')) Members(m.split(';').toSeq.filter(_.nonEmpty))
    else {
      val parts = m.split("-", -1)
      if (parts.length == 2) {
        val lo = if (parts(0).isEmpty) None else Some(splitPath(parts(0)))
        val hi = if (parts(1).isEmpty) None else Some(splitPath(parts(1)))
        Range(lo, hi)
      } else Point(splitPath(m))
    }

  private def splitPath(p: String): Seq[String] = p.split(',').toSeq

  // ------------------------------ compiler ------------------------------

  /** Compile parsed cuts to one conjunctive Catalyst predicate. */
  def compile(cuts: Seq[DimCut], meta: FactMeta, schema: StructType): Column =
    cuts.map(compileOne(_, meta, schema)).reduceOption(_ && _).getOrElse(lit(true))

  def compileOne(c: DimCut, meta: FactMeta, schema: StructType): Column = {
    val dim = meta.dimension(c.dim)
    val order = dim.orderFor(c.hier)
    c.spec match {
      case Point(path) =>
        require(path.size <= order.size,
          s"cut ${c.dim}:${path.mkString(",")} deeper than hierarchy")
        order.zip(path).map { case (lv, v) =>
          levelCol(lv, meta, schema) === typed(v, lv, meta, schema)
        }.reduce(_ && _)
      case Members(vs) =>
        val lv = order.head
        levelCol(lv, meta, schema).isin(vs.map(v => typedLit(v, lv, meta, schema)): _*)
      case Range(Some(lo), Some(hi))
          if lo.size == 1 && hi.size == 1 && isStringLevel(order.head, meta, schema) &&
            !(numericish(lo.head) && numericish(hi.head)) =>
        // grammar ambiguity: '-' inside a STRING member (e.g.
        // `loan_type:loan-local`) is a literal, not a range separator —
        // reinterpret as a point. Numeric levels keep range semantics.
        levelCol(order.head, meta, schema) === lit(s"${lo.head}-${hi.head}")
      case Range(lo, hi) =>
        val conds =
          lo.map(boundCond(_, order, meta, schema, lower = true)).toSeq ++
          hi.map(boundCond(_, order, meta, schema, lower = false)).toSeq
        conds.reduce(_ && _)
    }
  }

  private def numericish(v: String): Boolean =
    v.nonEmpty && v.forall(c => c.isDigit || c == '.')

  private def isStringLevel(lv: Level, meta: FactMeta, schema: StructType): Boolean =
    levelType(lv, meta, schema).contains(org.apache.spark.sql.types.StringType)

  /** Lexicographic bound over level tuples, expanded to per-level
    * conjunctions/disjunctions instead of a struct comparison so that
    * Parquet min/max stats and partition pruning engage on the coarse level
    * (struct comparisons don't prune — SURVEY.md §4 item 2).
    *
    * (c1..ck) >= (a1..ak)  ==>  c1 > a1 OR (c1 = a1 AND (...recursively ck >= ak))
    */
  private def boundCond(path: Seq[String], order: Seq[Level], meta: FactMeta,
      schema: StructType, lower: Boolean): Column = {
    require(path.size <= order.size, s"range bound deeper than hierarchy")
    def rec(i: Int): Column = {
      val lv = order(i)
      val col = levelCol(lv, meta, schema)
      val v = typed(path(i), lv, meta, schema)
      if (i == path.size - 1) { if (lower) col >= v else col <= v }
      else {
        val strict = if (lower) col > v else col < v
        strict || (col === v && rec(i + 1))
      }
    }
    rec(0)
  }

  private def levelCol(lv: Level, meta: FactMeta, schema: StructType): Column =
    col(meta.physical(lv.column))

  private def levelType(lv: Level, meta: FactMeta, schema: StructType): Option[DataType] = {
    val name = meta.physical(lv.column)
    schema.fields.find(_.name.equalsIgnoreCase(name)).map(_.dataType)
  }

  /** Coerce the URL-text literal to the level column's type. */
  private def typed(v: String, lv: Level, meta: FactMeta, schema: StructType): Column =
    levelType(lv, meta, schema) match {
      case Some(t) => lit(v).cast(t)
      case None    => lit(v)
    }

  private def typedLit(v: String, lv: Level, meta: FactMeta, schema: StructType): Column =
    typed(v, lv, meta, schema)
}
