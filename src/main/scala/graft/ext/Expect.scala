package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the validation pass an ingestion
  * pipeline runs before a batch is allowed into the warehouse (the
  * dbt-test / Great-Expectations shape, as a library operator):
  * declare checks, get one (check, violations) row per declaration.
  * A non-zero row is a quarantine/alert signal; zero everywhere is the
  * green light.
  *
  * Scale shape: every SCALAR check (not-null, accepted set, range)
  * compiles into ONE conditional-sum aggregation — a single corpus scan
  * regardless of how many scalar checks are declared, all map-side
  * partials. Uniqueness is one key-grouped aggregation per declared
  * key; referential integrity is one left-anti join per reference
  * (broadcast when the dimension is small — the usual case). Nothing
  * collects rows; the report is one row per check.
  */
object Expect {

  sealed trait Check { def name: String }
  /** `col` must never be null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null:$col"
  }
  /** Non-null values of `col` must come from `values`. */
  final case class Accepted(col: String, values: Seq[String]) extends Check {
    def name = s"accepted:$col"
  }
  /** Non-null values of `col` must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range:$col"
  }
  /** `cols` must be a unique key: counts every row belonging to a
    * duplicated key group. */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique:${cols.mkString("+")}"
  }
  /** Every non-null `col` must exist in `dimCol` of `dim`. */
  final case class Ref(col: String, dim: DataFrame, dimCol: String)
      extends Check {
    def name = s"ref:$col"
  }

  private def violation(df: DataFrame, c: Check): Column = c match {
    case NotNull(col0) => col(col0).isNull
    case Accepted(col0, vs) =>
      col(col0).isNotNull && !col(col0).isin(vs: _*)
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull && (col(col0) < lo || col(col0) > hi)
    case _ => lit(false)
  }

  /** One row per declared check, in declaration order:
    * (ord, rule, violations). */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "declare at least one expectation")
    val scalar = checks.zipWithIndex.collect {
      case (c @ (_: NotNull | _: Accepted | _: InRange), i) => (c, i)
    }
    val scalarReport: Option[DataFrame] =
      if (scalar.isEmpty) None
      else {
        val aggs = scalar.map { case (c, _) =>
          sum(when(violation(df, c), 1L).otherwise(0L)).as(s"v${c.name}")
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(explode(array(scalar.map { case (c, i) =>
          struct(lit(i.toLong).as("ord"), lit(c.name).as("rule"),
            col(s"v${c.name}").as("violations"))
        }: _*)).as("r")).select(col("r.*")))
      }
    val grouped = checks.zipWithIndex.collect {
      case (c: Unique, i) =>
        df.groupBy(c.cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(coalesce(sum(col("__n")), lit(0L)).as("violations"))
          .select(lit(i.toLong).as("ord"), lit(c.name).as("rule"),
            col("violations"))
      case (c: Ref, i) =>
        df.filter(col(c.col).isNotNull)
          .join(broadcast(c.dim.select(col(c.dimCol).as(c.col)).distinct()),
            Seq(c.col), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(i.toLong).as("ord"), lit(c.name).as("rule"),
            col("violations"))
    }
    (scalarReport.toSeq ++ grouped).reduce(_ unionByName _)
      .orderBy(col("ord"))
  }
}
