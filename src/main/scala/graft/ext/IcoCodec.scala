package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Pure-JVM ICO decode — favicons are all over crawl media columns
  * (the triage census already counts `ico`), and the container is a
  * thin directory over formats this engine already decodes: each
  * ICONDIR entry is either a whole PNG (modern favicons) or a raw DIB
  * — a BITMAPINFOHEADER with DOUBLED height covering the XOR color
  * image plus a trailing 1-bit AND mask, no BMP file header. The
  * LARGEST entry is decoded (the standard best-image pick); PNG
  * entries ride [[PngKernel]] verbatim, DIB entries reuse the BMP
  * row walk (24/32-bit BI_RGB; the AND mask is ignored — the gray
  * contract ignores alpha in every other container too). Sub-byte
  * palette DIB entries (the Win3.x legacy slice) null honestly.
  * Dirty bytes → null, never a throw. */
private[ext] object IcoKernel {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le2(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le4(b: Array[Byte], i: Int): Long =
    (le2(b, i).toLong | (le2(b, i + 2).toLong << 16)) & 0xFFFFFFFFL

  def decodeGray(ico: Array[Byte]): PngKernel.Gray = {
    if (ico == null || ico.length < 22) return null
    if (le2(ico, 0) != 0 || le2(ico, 2) != 1) return null // icon type only
    val count = le2(ico, 4)
    if (count < 1 || count > 64) return null
    if (6 + count * 16 > ico.length) return null
    // pick the largest entry by declared area (0 means 256, the spec's
    // byte-field convention)
    var best = -1
    var bestArea = -1L
    var i = 0
    while (i < count) {
      val e = 6 + i * 16
      val w = u8(ico, e) match { case 0 => 256; case v => v }
      val h = u8(ico, e + 1) match { case 0 => 256; case v => v }
      val size = le4(ico, e + 8)
      val off = le4(ico, e + 12)
      if (size >= 16 && off >= 6 + count * 16 &&
        off + size <= ico.length && w.toLong * h > bestArea) {
        bestArea = w.toLong * h
        best = i
      }
      i += 1
    }
    if (best < 0) return null
    val e = 6 + best * 16
    val off = le4(ico, e + 12).toInt
    val size = le4(ico, e + 8).toInt
    val payload = java.util.Arrays.copyOfRange(ico, off, off + size)
    // PNG entry?
    if (payload.length >= 8 && (payload(0) & 0xFF) == 0x89 &&
      payload(1) == 'P') return PngKernel.decodeGray(payload)
    decodeDib(payload)
  }

  /** Raw ICO DIB: BITMAPINFOHEADER with height = 2 × image height
    * (XOR rows then the AND mask), bottom-up, 24/32-bit BI_RGB. */
  private def decodeDib(b: Array[Byte]): PngKernel.Gray = {
    if (b.length < 40) return null
    if (le4(b, 0) != 40L) return null // BITMAPINFOHEADER only
    val width = le4(b, 4).toInt
    val h2 = le4(b, 8).toInt
    if (width < 1 || width > (1 << 14) || h2 < 2 || h2 > (1 << 15) ||
      (h2 & 1) != 0) return null
    val height = h2 / 2
    if (le2(b, 12) != 1) return null // planes
    val bpp = le2(b, 14)
    if (bpp != 24 && bpp != 32) return null // modern truecolor slice
    if (le4(b, 16) != 0L) return null // BI_RGB
    val bytesPp = bpp / 8
    val rowBytes = (width * bytesPp + 3) & ~3
    if (40L + rowBytes.toLong * height > b.length) return null
    val luma = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val rs = 40 + (height - 1 - y) * rowBytes // bottom-up XOR image
      var x = 0
      while (x < width) {
        val o = rs + x * bytesPp // stored B, G, R (, A ignored)
        luma(y * width + x) =
          (77 * u8(b, o + 2) + 150 * u8(b, o + 1) + 29 * u8(b, o)) >> 8
        x += 1
      }
      y += 1
    }
    PngKernel.Gray(width, height, luma)
  }

  /** Encode a single-entry ICO. `pngEntry` wraps a real PNG payload;
    * otherwise a 24-bit raw DIB entry (doubled height, zeroed AND
    * mask) with R = G = B = pixel — the shared gray pixel contract. */
  def encode(width: Int, height: Int, pixel: (Int, Int) => Int,
      pngEntry: Boolean): Array[Byte] = {
    require(width >= 1 && width <= 256 && height >= 1 && height <= 256,
      s"bad ico dims ${width}x$height")
    val payload: Array[Byte] =
      if (pngEntry) PngKernel.encodeGray(width, height, pixel, _ => 0)
      else {
        val rowBytes = (width * 3 + 3) & ~3
        val maskBytes = ((width + 31) / 32) * 4
        val out = new Array[Byte](40 + rowBytes * height +
          maskBytes * height)
        def w2(o: Int, v: Int): Unit = {
          out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
        }
        def w4(o: Int, v: Long): Unit = {
          w2(o, (v & 0xFFFF).toInt); w2(o + 2, ((v >> 16) & 0xFFFF).toInt)
        }
        w4(0, 40L); w4(4, width.toLong); w4(8, height.toLong * 2)
        w2(12, 1); w2(14, 24); w4(16, 0L)
        var y = 0
        while (y < height) {
          val rs = 40 + (height - 1 - y) * rowBytes
          var x = 0
          while (x < width) {
            val v = (pixel(x, y) & 0xFF).toByte
            val o = rs + x * 3
            out(o) = v; out(o + 1) = v; out(o + 2) = v
            x += 1
          }
          y += 1
        }
        out // AND mask stays zero (fully opaque)
      }
    val out = new java.io.ByteArrayOutputStream()
    def w2(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w4(v: Long): Unit = { w2((v & 0xFFFF).toInt); w2(((v >> 16) & 0xFFFF).toInt) }
    w2(0); w2(1); w2(1) // ICONDIR: icon, one entry
    out.write(if (width == 256) 0 else width)
    out.write(if (height == 256) 0 else height)
    out.write(0); out.write(0) // palette, reserved
    w2(1); w2(if (pngEntry) 32 else 24) // planes, bpp hint
    w4(payload.length.toLong)
    w4(22L) // offset: 6 + 16
    out.write(payload, 0, payload.length)
    out.toByteArray
  }
}

/** [[GifGrayStats]]-shaped pixel statistics for ICO content (largest
  * entry decoded; PNG and raw-DIB entries both land in the shared
  * stat/hash space). Dirty bytes degrade to ok=false. */
case class IcoGrayStats(child: Expression)
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
      s"ico_gray_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    GifGrayStats.statsRow(IcoKernel.decodeGray(bytes))
  }

  override protected def withNewChildInternal(
      newChild: Expression): IcoGrayStats = copy(child = newChild)

  override def prettyName: String = "ico_gray_stats"
}

object IcoGrayStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      IcoGrayStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Deterministic single-entry ICO fixture with the SAME pixel contract
  * as [[GrayPngEncode]]; `pngEntry` selects the modern PNG-payload
  * form vs the classic raw-DIB form (doubled height + AND mask). */
case class GrayIcoEncode(seed: Expression, w: Expression, h: Expression,
    rowStep: Expression, colStep: Expression, bump: Expression,
    pngEntry: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(seed, w, h, rowStep, colStep, bump, pngEntry)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == BooleanType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "gray_ico_encode requires integer/boolean children")

  private def longOf(e: Expression, input: InternalRow): java.lang.Long =
    e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
      case b: java.lang.Boolean => if (b) 1L else 0L
    }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(c => longOf(c, input))
    if (vs.exists(_ == null)) return null
    val Seq(s, ww, hh, rs, cs, b, png) = vs.map(_.longValue())
    if (ww < 1 || hh < 1 || ww > 256 || hh > 256) return null
    IcoKernel.encode(ww.toInt, hh.toInt,
      (x, y) => {
        val t = x * cs + y * rs + s * 131
        val tq = ((t % 251) * (t % 251)) % 251 // == t² mod 251
        val bumped = if ((x * 7 + y * 11) % 97 < b) 1 else 0
        ((((tq + t + bumped) % 256) + 256) % 256).toInt
      }, pngEntry = png != 0)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GrayIcoEncode =
    GrayIcoEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4), newChildren(5), newChildren(6))

  override def prettyName: String = "gray_ico_encode"
}

object GrayIcoEncode {
  def apply(seed: Column, w: Column, h: Column, rowStep: Column,
      colStep: Column, bump: Column, pngEntry: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(GrayIcoEncode(b.expression(seed), b.expression(w),
      b.expression(h), b.expression(rowStep), b.expression(colStep),
      b.expression(bump), b.expression(pngEntry)))
  }
}
