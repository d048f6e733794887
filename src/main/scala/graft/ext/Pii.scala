package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Checksum-validated payment-card masking — the PII scrub step where a
  * bare `\d{13,19}` regex is WRONG: order ids, timestamps and EAN codes
  * are digit runs of the same shape, and masking them corrupts the
  * corpus for no privacy gain. Card numbers carry a Luhn check digit
  * (ISO/IEC 7812), so validating the checksum before masking removes
  * ~90% of those false positives while never missing a real PAN.
  *
  * [[Pii.maskCards]] masks two span shapes:
  *
  *   1. CONTIGUOUS digit runs of 13–19 digits whose Luhn checksum holds
  *      (the machine-written form: logs, URLs, serialized fields).
  *   2. With `separators = true` (the default): FORMATTED spans — digit
  *      groups joined by single spaces or dashes (`4111 1111 1111 1111`,
  *      `4111-1111-1111-1111`, mixed gaps allowed) — the dominant form
  *      real PANs take in human-written web text. When the span's total
  *      digit count is 13–19 and Luhn holds over the concatenated
  *      digits, the WHOLE span (separators included) is masked.
  *
  * Span semantics (deterministic, engine-replayable): a candidate span
  * is the MAXIMAL chain of digit runs where each gap is exactly one
  * `' '` or `'-'` followed by another digit. The span is judged
  * all-or-nothing; if it fails (wrong length or checksum), each
  * contiguous digit run inside it is re-judged under rule 1 — so a
  * contiguous PAN adjacent to a stray number (`25 4111111111111111`)
  * still masks. Documented limitation of the greedy chain: a FORMATTED
  * PAN with an adjacent space-joined number (`25 4111 1111 1111 1111`)
  * folds into one 18-digit span, fails, and its 4-digit groups don't
  * individually mask — the price of never re-trying sub-chains, which
  * would make masking decisions non-replayable in plain SQL.
  * `separators = false` keeps the original contiguous-only contract.
  * Per-row single pass, no shuffle, null-in → null-out. */
object Pii {
  def maskCards(text: Column, token: String = "<CARD>",
      separators: Boolean = true): Column =
    LuhnMask(text, token, separators)

  import org.apache.spark.sql.functions.regexp_replace

  /** RFC-5322-practical email shape: local part of word chars plus
    * `._%+-`, a domain of dot-joined labels, a >= 2-letter TLD. The
    * pattern is shared verbatim with the SQL oracle (Java regex and
    * RE2 agree on this subset — no backreferences, no lookaround). */
  private[ext] val emailRe =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Octet-validated dotted-quad IPv4 (each octet 0–255, word-bounded):
    * the bare `\d{1,3}(\.\d{1,3}){3}` form would mask version strings
    * like `999.1.2.3` — octet validation plus `\b` keeps those. */
  private[ext] val ipv4Re =
    "\\b((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}" +
    "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\b"

  /** International-prefixed phone numbers ONLY: `+` country code then
    * 2–5 groups of 2–4 digits over optional single space/dash gaps
    * (`+41 79 123 45 67`, `+390212345678`). Domestic forms
    * (`(555) 123-4567`, bare digit groups) are indistinguishable from
    * ids/amounts at corpus scale and are deliberately out of contract —
    * the same false-positive-free stance as the Luhn gate on cards. */
  private[ext] val phoneRe =
    "\\+[0-9]{1,3}([ -]?[0-9]{2,4}){2,5}\\b"

  def maskEmails(text: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(text, emailRe, token)

  def maskIps(text: Column, token: String = "<IP>"): Column =
    regexp_replace(text, ipv4Re, token)

  def maskPhones(text: Column, token: String = "<PHONE>"): Column =
    regexp_replace(text, phoneRe, token)

  /** The full web-text PII scrub, in the one order that composes
    * safely: emails first (their digits must not feed number maskers),
    * then phones (the `+` prefix claims its digits before the Luhn
    * chain scanner can judge a 13+-digit phone as a card), then
    * Luhn-validated cards, then IPv4 (dots break digit chains, so
    * card masking cannot eat an address). Every stage is a codegen'd
    * `regexp_replace` except the native Luhn scanner; per-row, no
    * shuffle, null-in → null-out. */
  def scrub(text: Column): Column =
    maskIps(maskCards(maskPhones(maskEmails(text))))

  /** Luhn checksum over a digit string (rightmost digit not doubled). */
  def luhnValid(digits: String): Boolean = {
    var sum = 0
    var dbl = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (dbl) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      dbl = !dbl
      i -= 1
    }
    sum % 10 == 0
  }
}

/** One-pass scanner: maximal digit spans (contiguous, or — with
  * `separators` — single-space/dash-joined chains) whose 13–19
  * concatenated digits pass Luhn are replaced by `token`; a failed
  * chain's contiguous runs are re-judged individually; everything else
  * is untouched. */
case class LuhnMask(child: Expression, token: String, separators: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"luhn_mask requires string, got $other")
  }

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def maskable(digits: String): Boolean =
    digits.length >= 13 && digits.length <= 19 && Pii.luhnValid(digits)

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => null
    case s =>
      val t = s.asInstanceOf[UTF8String].toString
      val out = new java.lang.StringBuilder(t.length)
      var i = 0
      while (i < t.length) {
        if (isDigit(t.charAt(i))) {
          // maximal span: digit runs chained over single ' '/'-' gaps
          var j = i
          var sawGap = false
          val digits = new java.lang.StringBuilder(19)
          var done = false
          while (!done) {
            while (j < t.length && isDigit(t.charAt(j))) {
              digits.append(t.charAt(j)); j += 1
            }
            if (separators && j + 1 < t.length &&
                (t.charAt(j) == ' ' || t.charAt(j) == '-') &&
                isDigit(t.charAt(j + 1))) {
              sawGap = true; j += 1
            } else done = true
          }
          if (maskable(digits.toString)) out.append(token)
          else if (!sawGap) out.append(t, i, j)
          else {
            // failed chain: re-judge each contiguous run on its own
            var k = i
            while (k < j) {
              if (isDigit(t.charAt(k))) {
                var e = k
                while (e < j && isDigit(t.charAt(e))) e += 1
                val run = t.substring(k, e)
                if (maskable(run)) out.append(token) else out.append(run)
                k = e
              } else { out.append(t.charAt(k)); k += 1 }
            }
          }
          i = j
        } else { out.append(t.charAt(i)); i += 1 }
      }
      UTF8String.fromString(out.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): LuhnMask =
    copy(child = newChild)

  override def prettyName: String = "luhn_mask"
}

object LuhnMask {
  def apply(c: Column, token: String, separators: Boolean): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new LuhnMask(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        token, separators))
}
