package graft.olap

import org.apache.spark.sql.{DataFrame, Row}

/** API output rendering (reference: S12-S14 in SURVEY.md §2.1).
  *
  * - JSON objects: one per aggregate row, dims at top level + a `measures`
  *   sub-object (shape consumed at Codice.gs:205-231).
  * - `output=table`: array-of-arrays, row 0 = column names
  *   (Codice.gs:349,155-183).
  * - Zero rows -> `{"empty_dataset": true}` (Codice.gs:361-373).
  *
  * Rendering collects — it sits at the API boundary where results are small
  * aggregates by construction; never use on an un-aggregated fact table.
  */
object Renderer {

  /** Shared JSON string escaper (also used by OlapApi). */
  def jsonString(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def jsonScalar(v: Any): String = v match {
    case null => "null"
    case s: String => jsonString(s)
    case d: java.sql.Timestamp => jsonScalar(d.toInstant.toString)
    case d: java.time.Instant => jsonScalar(d.toString)
    case d: java.sql.Date => jsonString(d.toString) // dates must be quoted
    case d: java.time.LocalDate => jsonString(d.toString)
    case d: Double if d.isNaN || d.isInfinite => "null" // JSON has no NaN/Inf
    case f: Float if f.isNaN || f.isInfinite => "null"
    case other => other.toString
  }

  /** Thrown when a render would collect more rows than the caller's
    * bound — the guard that keeps a pathological drilldown (day × library
    * × years) from pulling millions of rows onto the API driver. The
    * reference serves whole result sets too, but behind PHP's own memory
    * limit; here the bound is explicit and the error actionable. */
  final class ResultTooLarge(val maxRows: Int) extends RuntimeException(
    s"result exceeds $maxRows rows; tighten the drilldown/cut or pass " +
      "an explicit limit")

  /** Default API result bound (rows). Aggregates are small by
    * construction; anything past this is a mis-specified drilldown. */
  val defaultMaxRows: Int = 100000

  /** Bounded collect: never materializes more than maxRows + 1 rows on
    * the driver (the +1 detects overflow without counting the frame). */
  private def boundedRows(df: DataFrame, maxRows: Int): Array[Row] = {
    require(maxRows > 0, s"maxRows=$maxRows must be positive")
    val rows = df.limit(maxRows + 1).collect()
    if (rows.length > maxRows) throw new ResultTooLarge(maxRows)
    rows
  }

  /** JSON rows: dimension columns top-level, measures nested. */
  def toJson(df: DataFrame, measureNames: Set[String],
      maxRows: Int = defaultMaxRows): String = {
    val cols = df.columns
    val rows = boundedRows(df, maxRows)
    if (rows.isEmpty) return emptyDataset
    val (ms, ds) = cols.zipWithIndex.partition { case (c, _) => measureNames(c) }
    rows.map { r =>
      val dims = ds.map { case (c, i) => s"${jsonString(c)}: ${jsonScalar(r.get(i))}" }
      val meas = ms.map { case (c, i) => s"${jsonString(c)}: ${jsonScalar(r.get(i))}" }
      (dims :+ s""""measures": {${meas.mkString(", ")}}""").mkString("{", ", ", "}")
    }.mkString("[", ",\n", "]")
  }

  /** `output=table`: header row then value rows. */
  def toTable(df: DataFrame, maxRows: Int = defaultMaxRows): String = {
    val rows = boundedRows(df, maxRows)
    if (rows.isEmpty) return emptyDataset
    val header = df.columns.map(jsonScalar(_)).mkString("[", ", ", "]")
    val body = rows.map(r => (0 until r.length).map(i => jsonScalar(r.get(i)))
      .mkString("[", ", ", "]"))
    (header +: body).mkString("[", ",\n", "]")
  }

  val emptyDataset: String = """{"empty_dataset": true}"""
}
