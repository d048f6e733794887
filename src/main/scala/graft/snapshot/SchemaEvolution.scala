package graft.snapshot

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution for append-only fact tables (reference S7,
  * library_olap/OLAP.php:177-199: `CHANGE COLUMN` on type change,
  * `ADD COLUMN` on new column).
  *
  * Spark re-expression: union-by-name with null fill for new columns plus an
  * explicit type-widening lattice for changed columns. Physical column order
  * (the reference's FIRST/AFTER bookkeeping) is dropped — meaningless in a
  * columnar catalog (SURVEY.md §1.4).
  */
object SchemaEvolution {

  /** Widening lattice: the narrowest common type both sides cast to without
    * data loss. LONG -> DECIMAL -> DOUBLE -> STRING; DATE -> TIMESTAMP;
    * anything irreconcilable -> STRING (the reference collapses unknowns to
    * STRING too, OLAP.php:251-273). */
  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (n1: NumericType, n2: NumericType) => (n1, n2) match {
      case (_: DoubleType, _) | (_, _: DoubleType) => DoubleType
      case (_: FloatType, _) | (_, _: FloatType) => DoubleType
      case (d1: DecimalType, d2: DecimalType) =>
        DecimalType(math.max(d1.precision - d1.scale, d2.precision - d2.scale)
          + math.max(d1.scale, d2.scale), math.max(d1.scale, d2.scale))
      case (d: DecimalType, _) => widen(d, DecimalType(20, 0))
      case (_, d: DecimalType) => widen(DecimalType(20, 0), d)
      case _ => LongType // any pair of integral types
    }
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case _ => StringType
  }

  /** Append-union `next` onto `prior` by column name: missing columns are
    * null-filled, conflicting column types are widened via the lattice. */
  def unionEvolve(prior: DataFrame, next: DataFrame): DataFrame = {
    val pTypes = prior.schema.fields.map(f => f.name -> f.dataType).toMap
    val nTypes = next.schema.fields.map(f => f.name -> f.dataType).toMap
    // stable order: prior's columns first, then new columns in next's order
    val names = prior.schema.fieldNames ++
      next.schema.fieldNames.filterNot(pTypes.contains)
    val target = names.map { n =>
      (pTypes.get(n), nTypes.get(n)) match {
        case (Some(a), Some(b)) => n -> widen(a, b)
        case (Some(a), None)    => n -> a
        case (None, Some(b))    => n -> b
        case _                  => n -> StringType // unreachable
      }
    }
    def conform(df: DataFrame): DataFrame =
      df.select(target.map { case (n, t) =>
        if (df.columns.contains(n)) col(n).cast(t).as(n)
        else lit(null).cast(t).as(n)
      }: _*)
    conform(prior).unionByName(conform(next))
  }

  /** The authoritative struct after appending a batch with `next`'s schema
    * to a table with `prior`'s (widening, no data). */
  def evolvedSchema(prior: StructType, next: StructType): StructType = {
    val pTypes = prior.fields.map(f => f.name -> f.dataType).toMap
    val nTypes = next.fields.map(f => f.name -> f.dataType).toMap
    val names = prior.fieldNames ++ next.fieldNames.filterNot(pTypes.contains)
    StructType(names.map { n =>
      StructField(n, (pTypes.get(n), nTypes.get(n)) match {
        case (Some(a), Some(b)) => widen(a, b)
        case (Some(a), None) => a
        case (None, Some(b)) => b
        case _ => StringType
      }, nullable = true)
    })
  }
}
