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

  /** JSON rows: dimension columns top-level, measures nested. */
  def toJson(df: DataFrame, measureNames: Set[String]): String = {
    val cols = df.columns
    val rows = df.collect()
    if (rows.isEmpty) return emptyDataset
    val (ms, ds) = cols.zipWithIndex.partition { case (c, _) => measureNames(c) }
    rows.map { r =>
      val dims = ds.map { case (c, i) => s"${jsonString(c)}: ${jsonScalar(r.get(i))}" }
      val meas = ms.map { case (c, i) => s"${jsonString(c)}: ${jsonScalar(r.get(i))}" }
      (dims :+ s""""measures": {${meas.mkString(", ")}}""").mkString("{", ", ", "}")
    }.mkString("[", ",\n", "]")
  }

  /** `output=table`: header row then value rows. */
  def toTable(df: DataFrame): String = {
    val rows = df.collect()
    if (rows.isEmpty) return emptyDataset
    val header = df.columns.map(jsonScalar(_)).mkString("[", ", ", "]")
    val body = rows.map(r => (0 until r.length).map(i => jsonScalar(r.get(i)))
      .mkString("[", ", ", "]"))
    (header +: body).mkString("[", ",\n", "]")
  }

  val emptyDataset: String = """{"empty_dataset": true}"""
}
