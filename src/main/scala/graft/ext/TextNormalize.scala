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
  *   2. Unicode simple lowercase (per-codepoint),
  *   3. whitespace runs ({space, \t, \n, \r, \f, \u000B}) collapse to a
  *      single space, leading/trailing runs drop.
  *
  * The whitespace set is spelled explicitly (not Java's \s) so the
  * DuckDB oracle can replay it with the byte-identical RE2 class
  * `[ \t\n\r\f\x0b]+` — Java \s and RE2 \s disagree on \u000B.
  * NFC delegates to `java.text.Normalizer`; lowercasing is the SIMPLE
  * per-codepoint mapping (`Character.toLowerCase`), the same table
  * utf8proc (DuckDB's `lower`) applies — deliberately NOT Java's
  * `String.toLowerCase`, whose full/context-sensitive mappings (Turkish
  * dotted I-with-dot -> "i"+U+0307, Greek final sigma by position)
  * diverge from utf8proc and would silently split the engine from its
  * oracle.
  *
  * Per-row, shuffle-free, null-in -> null-out. Registered in SQL as
  * `text_normalize(s)` via [[graft.GraftExtensions]].
  */
case class TextNormalize(child: Expression, compat: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_normalize requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextNormalize.normalize(
      input.asInstanceOf[UTF8String].toString, compat))

  override protected def withNewChildInternal(newChild: Expression): TextNormalize =
    copy(child = newChild)

  override def prettyName: String = "text_normalize"
}

object TextNormalize {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'

  def normalize(s: String): String = normalize(s, compat = false)

  /** `compat = true` switches step 1 to NFKC — compatibility folding
    * (fullwidth Ａ → A, ligature ﬁ → fi, ² → 2) on top of canonical
    * composition: the aggressive form LLM tokenizer pipelines usually
    * want. NFKC has NO DuckDB twin (`nfc_normalize` is canonical-only),
    * so the compat mode is spec-covered rather than oracle-gated; the
    * x_text_normalize gate replays the NFC default. */
  def normalize(s: String, compat: Boolean): String = {
    val nfc = java.text.Normalizer.normalize(s,
      if (compat) java.text.Normalizer.Form.NFKC
      else java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    var pendingSpace = false
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      if (cp < 0x80 && isWs(cp.toChar)) {
        if (sb.length() > 0) pendingSpace = true // leading runs drop
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        // SIMPLE per-codepoint lowercase (Character.toLowerCase), not
        // String.toLowerCase: the full/context-sensitive mappings (Java
        // lowers U+0130 to "i"+combining-dot, final sigma by position)
        // diverge from utf8proc's simple table, which DuckDB's lower()
        // uses — per-codepoint matches it 1:1
        sb.appendCodePoint(Character.toLowerCase(cp))
      }
      i += Character.charCount(cp)
    }
    sb.toString // trailing run never flushed -> trimmed
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TextNormalize(org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** NFKC compatibility mode (see [[normalize]]'s compat doc). */
  def compat(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TextNormalize(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        compat = true))
}
