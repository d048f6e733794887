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
  * [[Pii.maskCards]] replaces every CONTIGUOUS digit run of 13–19
  * digits whose Luhn checksum holds; runs broken by spaces/dashes are
  * separate runs by contract (formatting-tolerant matching can be
  * layered with a normalization pass — kept out of the operator so its
  * decisions replay exactly on any engine). Per-row single pass, no
  * shuffle, null-in → null-out. */
object Pii {
  def maskCards(text: Column, token: String = "<CARD>"): Column =
    LuhnMask(text, token)

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

/** One-pass scanner: maximal ASCII digit runs of [13, 19] digits that
  * pass Luhn are replaced by `token`; everything else (shorter, longer,
  * checksum-failing) is untouched. */
case class LuhnMask(child: Expression, token: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"luhn_mask requires string, got $other")
  }

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => null
    case s =>
      val t = s.asInstanceOf[UTF8String].toString
      val out = new java.lang.StringBuilder(t.length)
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if (c >= '0' && c <= '9') {
          var j = i
          while (j < t.length && t.charAt(j) >= '0' && t.charAt(j) <= '9')
            j += 1
          val run = t.substring(i, j)
          if (run.length >= 13 && run.length <= 19 && Pii.luhnValid(run))
            out.append(token)
          else out.append(run)
          i = j
        } else { out.append(c); i += 1 }
      }
      UTF8String.fromString(out.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): LuhnMask =
    copy(child = newChild)

  override def prettyName: String = "luhn_mask"
}

object LuhnMask {
  def apply(c: Column, token: String): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new LuhnMask(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        token))
}
