package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Heuristic language ID as a single-pass native Catalyst expression:
  * tokenize on spaces, count function-word hits per language via one
  * hashmap lookup per token (a token may belong to several profiles — a
  * bitmask accumulates all of them), then argmax.
  *
  * Replaces the higher-order-function formulation (one interpreted
  * `filter(tokens, array_contains(...))` pass PER LANGUAGE per row):
  * interpreted lambdas re-evaluate loop-invariant subexpressions per
  * element, which made language ID the 3rd-slowest conformance query.
  * Same semantics, including the tie-break: equal hit counts resolve to
  * the lexicographically greatest language name (the struct-max order of
  * the HOF version), and "und" when nothing matches.
  */
case class LanguageId(child: Expression, profiles: Map[String, Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"language_id requires string, got $other")
  }

  @transient private lazy val langs: Array[UTF8String] =
    profiles.keys.toArray.sorted.map(UTF8String.fromString)

  @transient private lazy val tokenMask: java.util.HashMap[String, Integer] = {
    val sorted = profiles.keys.toArray.sorted
    val m = new java.util.HashMap[String, Integer]()
    sorted.zipWithIndex.foreach { case (lang, i) =>
      profiles(lang).foreach { w =>
        m.merge(w, Integer.valueOf(1 << i), (a, b) => Integer.valueOf(a | b))
      }
    }
    m
  }

  // HOF-parity on NULL input: the struct-max formulation fell through its
  // when() to "und" for null text — keep that contract
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => LanguageId.und
      case s => score(s.asInstanceOf[UTF8String])
    }

  private def score(text: UTF8String): Any = {
    val toks = text.toString.split(" ")
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      val m = tokenMask.get(toks(i))
      if (m != null) {
        var mask = m.intValue()
        while (mask != 0) {
          counts(Integer.numberOfTrailingZeros(mask)) += 1
          mask &= mask - 1
        }
      }
      i += 1
    }
    var best = -1
    var bestCount = 0
    var j = 0
    while (j < counts.length) {
      if (counts(j) >= bestCount && counts(j) > 0) { best = j; bestCount = counts(j) }
      j += 1
    }
    if (best < 0) LanguageId.und else langs(best)
  }

  override protected def withNewChildInternal(newChild: Expression): LanguageId =
    copy(child = newChild)

  override def prettyName: String = "language_id"
}

object LanguageId {
  private val und = UTF8String.fromString("und")

  def apply(c: Column, profiles: Map[String, Seq[String]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      LanguageId(org.apache.spark.sql.graftbridge.Bridge.expression(c), profiles))
}
