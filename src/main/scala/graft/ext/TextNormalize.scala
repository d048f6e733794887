package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization as one native pass — the step that runs
  * BEFORE exact/near dedup so that byte-different, meaning-identical
  * texts ("Café" vs "Café", stray tabs, case) collapse to one
  * fingerprint:
  *
  *   1. Unicode NFC (composed form — combining sequences join),
  *   2. Unicode lowercase (root locale),
  *   3. whitespace runs ({space, \t, \n, \r, \f, \u000B}) collapse to a
  *      single space, leading/trailing runs drop.
  *
  * The whitespace set is spelled explicitly (not Java's \s) so the
  * DuckDB oracle can replay it with the byte-identical RE2 class
  * `[ \t\n\r\f\x0b]+` — Java \s and RE2 \s disagree on \u000B.
  * NFC and lowercase delegate to `java.text.Normalizer` / ROOT-locale
  * `toLowerCase`, which agree with utf8proc (DuckDB's `nfc_normalize` /
  * `lower`) on the Unicode mappings.
  *
  * Per-row, shuffle-free, null-in -> null-out. Registered in SQL as
  * `text_normalize(s)` via [[graft.GraftExtensions]].
  */
case class TextNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_normalize requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TextNormalize.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): TextNormalize =
    copy(child = newChild)

  override def prettyName: String = "text_normalize"
}

object TextNormalize {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'

  def normalize(s: String): String = {
    val lowered = java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lowered.length)
    var i = 0
    var pendingSpace = false
    while (i < lowered.length) {
      val c = lowered.charAt(i)
      if (isWs(c)) {
        if (sb.length() > 0) pendingSpace = true // leading runs drop
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString // trailing run never flushed -> trimmed
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TextNormalize(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
