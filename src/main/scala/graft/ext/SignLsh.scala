package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-LSH (random hyperplane) signatures for all hash tables in one pass
  * (Charikar 2002): output[t] = bits of sign(dot(plane[t][b], v)).
  *
  * Native expression: `tables * bits` dot products over the vector in one
  * tight loop per row — the HOF formulation pays interpreted-lambda cost
  * per plane. Planes are deterministic Gaussians from the seed.
  */
case class SignLshSignatures(child: Expression, tables: Int, bits: Int,
    dim: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables * bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh requires array<float|double>, got $other")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val plane = planes(t * bits + b)
        var dot = 0.0
        var j = 0
        while (j < n) { dot += plane(j) * v(j); j += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshSignatures =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh_signatures"
}

object SignLshSignatures {
  def apply(c: Column, tables: Int, bits: Int, dim: Int, seed: Long = 42L): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SignLshSignatures(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        tables, bits, dim, seed))
}
