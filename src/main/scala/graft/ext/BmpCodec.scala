package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Pure-JVM uncompressed-BMP decode — the fourth image content leg
  * (after PNG's inflate, JPEG's Huffman+IDCT and GIF's LZW): the
  * Windows DIB container needs no codec at all (BI_RGB is raw BGR
  * rows, bottom-up, 4-byte padded), so the only work is the header
  * walk — and crawl columns DO carry BMPs. Shares [[PngKernel.Gray]]
  * and the BT.601 integer luma contract ((77·R + 150·G + 29·B) >> 8,
  * weights summing to 256), so BMP arrivals land in the SAME
  * fingerprint space as the other three containers. */
private[ext] object BmpKernel {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le2(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le4(b: Array[Byte], i: Int): Long =
    (le2(b, i).toLong | (le2(b, i + 2).toLong << 16)) & 0xFFFFFFFFL
  private def le4s(b: Array[Byte], i: Int): Int = le4(b, i).toInt

  /** Decode a BMP to 8-bit luma. Null on ANYTHING unsupported or
    * malformed — bad magic, DIB header under 40 bytes, planes ≠ 1,
    * bit count other than 24, any compression, truncated pixel data —
    * never throws (crawl-dirty bytes are the expected input).
    * Positive height = bottom-up rows (the BMP default), negative =
    * top-down; rows padded to 4 bytes. */
  def decodeGray(bmp: Array[Byte]): PngKernel.Gray = {
    if (bmp == null || bmp.length < 54) return null
    if (bmp(0) != 'B' || bmp(1) != 'M') return null
    val offBits = le4(bmp, 10)
    val dibSize = le4(bmp, 14)
    if (dibSize < 40) return null
    val width = le4s(bmp, 18)
    val rawH = le4s(bmp, 22)
    val topDown = rawH < 0
    val height = math.abs(rawH)
    if (width < 1 || height < 1 || width > (1 << 14) || height > (1 << 14))
      return null
    if (le2(bmp, 26) != 1) return null // planes
    if (le2(bmp, 28) != 24) return null // bit count: BI_RGB 24 only
    if (le4(bmp, 30) != 0L) return null // compression
    val rowBytes = (width * 3 + 3) & ~3
    if (offBits < 54 || offBits + rowBytes.toLong * height > bmp.length)
      return null
    val luma = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val rs = offBits.toInt + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val o = rs + x * 3 // stored B, G, R
        luma(y * width + x) =
          (77 * u8(bmp, o + 2) + 150 * u8(bmp, o + 1) + 29 * u8(bmp, o)) >> 8
        x += 1
      }
      y += 1
    }
    PngKernel.Gray(width, height, luma)
  }

  /** Encode a 24-bit BI_RGB bottom-up BMP with R = G = B = pixel(x, y)
    * — gray as truecolor, so the BT.601 luma is EXACTLY the pixel
    * value ((77 + 150 + 29)·v >> 8 = v) and the PNG/GIF pixel contract
    * carries over verbatim (one oracle chain replays all three
    * lossless containers). */
  def encodeGray24(width: Int, height: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad ${width}x$height")
    val rowBytes = (width * 3 + 3) & ~3
    val dataLen = rowBytes * height
    val out = new Array[Byte](54 + dataLen)
    def w2(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def w4(o: Int, v: Long): Unit = {
      w2(o, (v & 0xFFFF).toInt); w2(o + 2, ((v >> 16) & 0xFFFF).toInt)
    }
    out(0) = 'B'; out(1) = 'M'
    w4(2, 54L + dataLen); w4(10, 54L)
    w4(14, 40L); w4(18, width.toLong); w4(22, height.toLong)
    w2(26, 1); w2(28, 24); w4(30, 0L); w4(34, dataLen.toLong)
    var y = 0
    while (y < height) {
      val rs = 54 + (height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < width) {
        val v = (pixel(x, y) & 0xFF).toByte
        val o = rs + x * 3
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }
}

/** Per-image gray stats + perceptual hashes from a BMP binary column —
  * the same struct as [[PngGrayStats]]/[[JpegGrayStats]]/[[GifGrayStats]]
  * (shared [[GifGrayStats.statsRow]]). Undecodable → ok=false, nulls. */
case class BmpGrayStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_px", LongType),
    StructField("sum_luma", LongType),
    StructField("mean_milli", LongType),
    StructField("var_milli", LongType),
    StructField("ahash_hi", LongType),
    StructField("ahash_lo", LongType),
    StructField("dhash_hi", LongType),
    StructField("dhash_lo", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bmp_gray_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    GifGrayStats.statsRow(BmpKernel.decodeGray(bytes))
  }

  override protected def withNewChildInternal(newChild: Expression): BmpGrayStats =
    copy(child = newChild)

  override def prettyName: String = "bmp_gray_stats"
}

object BmpGrayStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      BmpGrayStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** 24-bit gray BMP fixture with the SAME pixel contract as
  * [[GrayPngEncode]]/[[GrayGifEncode]] — one oracle pixel chain
  * replays all three lossless containers. */
case class GrayBmpEncode(seed: Expression, w: Expression, h: Expression,
    rowStep: Expression, colStep: Expression, bump: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(seed, w, h, rowStep, colStep, bump)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "gray_bmp_encode requires integer children")

  private def longOf(e: Expression, input: InternalRow): java.lang.Long =
    e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(c => longOf(c, input))
    if (vs.exists(_ == null)) return null
    val Seq(s, ww, hh, rs, cs, b) = vs.map(_.longValue())
    if (ww < 1 || hh < 1 || ww > 4096 || hh > 4096) return null
    BmpKernel.encodeGray24(ww.toInt, hh.toInt,
      (x, y) => {
        // the shared fixture pixel contract (GrayPngEncode's formula)
        val t = x * cs + y * rs + s * 131
        val tq = ((t % 251) * (t % 251)) % 251 // == t² mod 251, overflow-safe
        val bumped = if ((x * 7 + y * 11) % 97 < b) 1 else 0
        ((((tq + t + bumped) % 256) + 256) % 256).toInt
      })
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GrayBmpEncode =
    GrayBmpEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4), newChildren(5))

  override def prettyName: String = "gray_bmp_encode"
}

object GrayBmpEncode {
  def apply(seed: Column, w: Column, h: Column, rowStep: Column,
      colStep: Column, bump: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(GrayBmpEncode(b.expression(seed), b.expression(w),
      b.expression(h), b.expression(rowStep), b.expression(colStep),
      b.expression(bump)))
  }
}
