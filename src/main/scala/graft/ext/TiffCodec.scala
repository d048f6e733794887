package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Pure-JVM baseline-TIFF decode — the FIFTH image content leg (after
  * PNG's inflate, JPEG's Huffman+IDCT, GIF's LZW and BMP's raw DIB):
  * scanner/scientific corpora carry TIFFs, and the uncompressed
  * baseline (compression 1) needs no codec — only the IFD tag walk,
  * which is the format's actual complexity (both byte orders, inline
  * vs offset values, SHORT vs LONG tag types, multi-strip layout).
  * Supports 8-bit grayscale (photometric 0 WhiteIsZero / 1
  * BlackIsZero) and 8-bit chunky RGB via the shared BT.601 integer
  * luma — TIFF arrivals land in the SAME fingerprint space as the
  * other four containers. Anything else (any compression, planar,
  * palette, tiles, 16-bit) → null, never a throw. */
private[ext] object TiffKernel {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  /** Decode a baseline TIFF's FIRST IFD to 8-bit luma; null on anything
    * unsupported or malformed. */
  def decodeGray(t: Array[Byte]): PngKernel.Gray = {
    if (t == null || t.length < 8) return null
    val le =
      if (t(0) == 'I' && t(1) == 'I') true
      else if (t(0) == 'M' && t(1) == 'M') false
      else return null
    def u2(i: Long): Int = {
      val p = i.toInt
      if (le) u8(t, p) | (u8(t, p + 1) << 8)
      else (u8(t, p) << 8) | u8(t, p + 1)
    }
    def u4(i: Long): Long = {
      val p = i.toInt
      if (le) (u2(p).toLong | (u2(p + 2).toLong << 16)) & 0xFFFFFFFFL
      else ((u2(p).toLong << 16) | u2(p + 2)) & 0xFFFFFFFFL
    }
    if (u2(2) != 42) return null
    val ifd = u4(4)
    if (ifd < 8 || ifd + 2 > t.length) return null
    val nEntries = u2(ifd)
    if (nEntries < 1 || nEntries > 256 ||
      ifd + 2 + 12L * nEntries > t.length) return null

    // tag -> values (SHORT type 3 / LONG type 4 only; inline when the
    // packed values fit the 4-byte field, at the offset otherwise)
    def tagValues(entry: Long): (Int, Array[Long]) = {
      val tag = u2(entry)
      val typ = u2(entry + 2)
      val count = u4(entry + 4)
      if (count < 0 || count > 65536) return (tag, null)
      val elemSize = typ match {
        case 3 => 2; case 4 => 4; case _ => return (tag, null)
      }
      val total = elemSize.toLong * count
      val base = if (total <= 4) entry + 8 else u4(entry + 8)
      if (base < 0 || base + total > t.length) return (tag, null)
      val out = new Array[Long](count.toInt)
      var k = 0
      while (k < count) {
        out(k) = if (elemSize == 2) u2(base + 2L * k).toLong
          else u4(base + 4L * k)
        k += 1
      }
      (tag, out)
    }

    var width = -1L; var height = -1L
    var bits: Array[Long] = Array(1L) // TIFF default BitsPerSample = 1
    var compression = 1L; var photometric = -1L
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    var samplesPerPx = 1L; var rowsPerStrip = Long.MaxValue
    var planar = 1L
    var e = 0
    while (e < nEntries) {
      val (tag, vs) = tagValues(ifd + 2 + 12L * e)
      if (vs != null) tag match {
        case 256 => width = vs(0)
        case 257 => height = vs(0)
        case 258 => bits = vs
        case 259 => compression = vs(0)
        case 262 => photometric = vs(0)
        case 273 => stripOffsets = vs
        case 277 => samplesPerPx = vs(0)
        case 278 => rowsPerStrip = vs(0)
        case 279 => stripCounts = vs
        case 284 => planar = vs(0)
        case _ => ()
      }
      e += 1
    }
    if (width < 1 || height < 1 || width > (1 << 14) || height > (1 << 14))
      return null
    if (compression != 1L || planar != 1L) return null
    if (stripOffsets == null || stripCounts == null ||
      stripOffsets.length != stripCounts.length) return null
    val gray = photometric == 0L || photometric == 1L
    if (!gray && photometric != 2L) return null
    if (gray && samplesPerPx != 1L) return null
    if (!gray && samplesPerPx != 3L) return null
    if (bits.length != samplesPerPx || bits.exists(_ != 8L)) return null

    // concatenate strip payloads logically: row r lives at byte
    // r*width*spp of the joined stream
    val rowBytes = width * samplesPerPx
    val need = rowBytes * height
    var have = 0L
    var si = 0
    while (si < stripOffsets.length) {
      if (stripOffsets(si) < 0 || stripCounts(si) < 0 ||
        stripOffsets(si) + stripCounts(si) > t.length) return null
      have += stripCounts(si)
      si += 1
    }
    if (have < need) return null
    val w = width.toInt; val h = height.toInt
    val luma = new Array[Int](w * h)
    var strip = 0; var inStrip = 0L
    var px = 0
    val spp = samplesPerPx.toInt
    def nextByte(): Int = {
      while (inStrip >= stripCounts(strip)) { strip += 1; inStrip = 0 }
      val v = u8(t, (stripOffsets(strip) + inStrip).toInt)
      inStrip += 1
      v
    }
    while (px < w * h) {
      val v =
        if (spp == 1) {
          val g0 = nextByte()
          if (photometric == 0L) 255 - g0 else g0
        } else {
          val r = nextByte(); val g = nextByte(); val b = nextByte()
          (77 * r + 150 * g + 29 * b) >> 8
        }
      luma(px) = v
      px += 1
    }
    PngKernel.Gray(w, h, luma)
  }

  /** Encode a minimal REAL baseline TIFF: little-endian, 8-bit
    * grayscale (photometric 1 BlackIsZero — luma IS the pixel value,
    * so the shared fixture pixel contract carries over verbatim), one
    * strip, IFD after the pixel data. */
  def encodeGray8(width: Int, height: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad ${width}x$height")
    val dataLen = width * height
    val nTags = 9
    val ifdOff = 8 + dataLen
    val out = new Array[Byte](ifdOff + 2 + 12 * nTags + 4)
    def w2(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def w4(o: Int, v: Long): Unit = {
      w2(o, (v & 0xFFFF).toInt); w2(o + 2, ((v >> 16) & 0xFFFF).toInt)
    }
    out(0) = 'I'; out(1) = 'I'; w2(2, 42); w4(4, ifdOff.toLong)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        out(8 + y * width + x) = (pixel(x, y) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    w2(ifdOff, nTags)
    var o = ifdOff + 2
    def tag(id: Int, typ: Int, count: Long, value: Long): Unit = {
      w2(o, id); w2(o + 2, typ); w4(o + 4, count)
      if (typ == 3) { w2(o + 8, value.toInt); w2(o + 10, 0) }
      else w4(o + 8, value)
      o += 12
    }
    tag(256, 4, 1, width.toLong) // ImageWidth
    tag(257, 4, 1, height.toLong) // ImageLength
    tag(258, 3, 1, 8) // BitsPerSample
    tag(259, 3, 1, 1) // Compression: none
    tag(262, 3, 1, 1) // Photometric: BlackIsZero
    tag(273, 4, 1, 8) // StripOffsets: data right after the header
    tag(277, 3, 1, 1) // SamplesPerPixel
    tag(278, 4, 1, height.toLong) // RowsPerStrip: single strip
    tag(279, 4, 1, dataLen.toLong) // StripByteCounts
    w4(o, 0L) // no next IFD
    out
  }
}

/** Per-image gray stats + perceptual hashes from a TIFF binary column —
  * the same struct as the other four container legs (shared
  * [[GifGrayStats.statsRow]]). Undecodable → ok=false, nulls. */
case class TiffGrayStats(child: Expression)
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
      s"tiff_gray_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    GifGrayStats.statsRow(TiffKernel.decodeGray(bytes))
  }

  override protected def withNewChildInternal(newChild: Expression): TiffGrayStats =
    copy(child = newChild)

  override def prettyName: String = "tiff_gray_stats"
}

object TiffGrayStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TiffGrayStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** 8-bit gray TIFF fixture with the SAME pixel contract as
  * [[GrayPngEncode]]/[[GrayGifEncode]]/[[GrayBmpEncode]] — one oracle
  * pixel chain replays all four lossless containers. */
case class GrayTiffEncode(seed: Expression, w: Expression, h: Expression,
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
      "gray_tiff_encode requires integer children")

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
    TiffKernel.encodeGray8(ww.toInt, hh.toInt,
      (x, y) => {
        // the shared fixture pixel contract (GrayPngEncode's formula)
        val t = x * cs + y * rs + s * 131
        val tq = ((t % 251) * (t % 251)) % 251 // == t² mod 251, overflow-safe
        val bumped = if ((x * 7 + y * 11) % 97 < b) 1 else 0
        ((((tq + t + bumped) % 256) + 256) % 256).toInt
      })
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GrayTiffEncode =
    GrayTiffEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4), newChildren(5))

  override def prettyName: String = "gray_tiff_encode"
}

object GrayTiffEncode {
  def apply(seed: Column, w: Column, h: Column, rowStep: Column,
      colStep: Column, bump: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(GrayTiffEncode(b.expression(seed), b.expression(w),
      b.expression(h), b.expression(rowStep), b.expression(colStep),
      b.expression(bump)))
  }
}
