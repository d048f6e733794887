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

  // ---------------- embedding-vector expectations ----------------

  /** Per-row validity flags for an embedding column — the vector leg of
    * the validation pass (the scalar [[report]] checks can't see inside
    * an array): `null_vec`, `wrong_dim`, `non_finite` (any NaN/±Inf
    * element), `zero_vec` (every element exactly 0 — a failed upstream
    * encoder's signature), `norm_out` (L2 norm outside [normLo, normHi],
    * judged only on non-null right-dimension finite vectors so a
    * truncated or NaN vector is reported once for its own defect, not
    * again for the norm its garbage implies), and the conjunction
    * `vec_ok`. Checks are independent — a zero vector with normLo > 0
    * flags both `zero_vec` and `norm_out`. All per-row HOF arithmetic,
    * no shuffle; norm bounds are double comparisons, so pick thresholds
    * away from plausible norm values (the usual screen is orders-of-
    * magnitude wide). */
  def annotateVectorChecks(df: DataFrame, vecCol: String, dim: Int,
      normLo: Double, normHi: Double): DataFrame = {
    require(dim > 0 && normLo >= 0.0 && normHi > normLo,
      s"dim=$dim normLo=$normLo normHi=$normHi")
    val v = col(vecCol)
    val inf = lit(Double.PositiveInfinity)
    val nonFinite = exists(v, x =>
      isnan(x.cast("double")) || abs(x.cast("double")) === inf)
    val nrm = sqrt(aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val eligible = v.isNotNull && size(v) === dim && !nonFinite
    df.withColumn("null_vec", v.isNull)
      .withColumn("wrong_dim", v.isNotNull && size(v) =!= dim)
      .withColumn("non_finite", v.isNotNull && nonFinite)
      .withColumn("zero_vec", v.isNotNull && size(v) > 0 &&
        forall(v, x => x.cast("double") === lit(0.0)))
      .withColumn("norm_out",
        eligible && (nrm < lit(normLo) || nrm > lit(normHi)))
      .withColumn("vec_ok", !col("null_vec") && !col("wrong_dim") &&
        !col("non_finite") && !col("zero_vec") && !col("norm_out"))
  }

  /** One (ord, rule, violations) row per vector check — the [[report]]
    * shape for the embedding column, computed in ONE conditional-sum
    * scan. */
  def vectorReport(df: DataFrame, vecCol: String, dim: Int,
      normLo: Double, normHi: Double): DataFrame = {
    val flagged = annotateVectorChecks(df, vecCol, dim, normLo, normHi)
    val rules = Seq("null_vec", "wrong_dim", "non_finite", "zero_vec",
      "norm_out")
    // coalesce: an EMPTY batch must read as 0 violations per rule (green),
    // not NULL (neither green nor red) — same convention as report()'s
    // grouped Unique path.
    val aggs = rules.map(r =>
      coalesce(sum(when(col(r), 1L).otherwise(0L)), lit(0L)).as(s"v_$r"))
    flagged.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(i.toLong).as("ord"), lit(s"vector:$r").as("rule"),
          col(s"v_$r").as("violations"))
      }: _*)).as("r")).select(col("r.*"))
  }

  /** Keep only rows whose vector passes every check. */
  def dropInvalidVectors(df: DataFrame, vecCol: String, dim: Int,
      normLo: Double, normHi: Double): DataFrame =
    annotateVectorChecks(df, vecCol, dim, normLo, normHi)
      .filter(col("vec_ok"))
      .drop("null_vec", "wrong_dim", "non_finite", "zero_vec", "norm_out",
        "vec_ok")
}
