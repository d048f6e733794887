package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a feature array (Charikar 2002, "Similarity estimation
  * techniques from rounding algorithms") as a native Catalyst expression.
  *
  * For each feature, a 64-bit hash votes +1/-1 per bit position weighted by
  * occurrence; the sign vector of the totals is the fingerprint. Hamming
  * distance between fingerprints estimates the angular distance between
  * feature sets — near-duplicate documents land within a few bits.
  *
  * Implemented as an `Expression` (not a Scala UDF) so it plugs into plans
  * without Encoder round-trips; `CodegenFallback` keeps surrounding
  * projections in whole-stage codegen. The per-feature 64-bit hash is two
  * 32-bit Murmur3 halves (scala.util.hashing.MurmurHash3, public), fixed
  * seeds — deterministic across partitions/runs/JVMs.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.get(i, StringType).asInstanceOf[UTF8String].toString
        val h = SimHash64.hash64(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  import scala.util.hashing.MurmurHash3

  /** Deterministic 64-bit string hash: two seeded Murmur3 32-bit halves. */
  def hash64(s: String): Long = {
    val hi = MurmurHash3.stringHash(s, 0x9747b28c)
    val lo = MurmurHash3.stringHash(s, 0x85ebca6b)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  /** Column form (classic-mode bridge between Column and Expression). */
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SimHash64(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
