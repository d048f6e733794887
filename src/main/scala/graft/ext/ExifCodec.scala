package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** EXIF metadata extraction from JPEG bytes — the metadata twin of the
  * pixel legs, and what an image-corpus pipeline keys on before any
  * decode: orientation (rotation normalization BEFORE hashing — a
  * rotated phone photo otherwise lands outside its own Hamming ball),
  * camera make/model (device-sliced dedup and quality priors), and
  * capture time (temporal splits on media the crawl timestamp lies
  * about). EXIF is a TIFF IFD embedded in the JPEG APP1 segment, so
  * this composes the marker walk with the IFD machinery the TIFF leg
  * built: segments FF xx with big-endian lengths up to APP1
  * "Exif\0\0", then a self-contained TIFF stream (its OWN byte-order
  * header, offsets relative to ITS start) whose IFD0 carries tags
  * 0x010F Make, 0x0110 Model, 0x0112 Orientation, 0x0132 DateTime.
  * Dirty bytes or absent EXIF → ok=false, never a throw. */
private[ext] object ExifKernel {

  final case class Exif(make: String, model: String, orientation: Int,
      dateTime: String)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  /** Find the APP1/Exif TIFF stream: (offset, length) into `jpeg`, or
    * null. Walks SOI then FF-marker segments (skipping entropy data is
    * unnecessary — EXIF precedes SOS by spec, and the walk stops
    * there). */
  private def findExifTiff(jpeg: Array[Byte]): (Int, Int) = {
    if (jpeg == null || jpeg.length < 4) return null
    if (u8(jpeg, 0) != 0xFF || u8(jpeg, 1) != 0xD8) return null
    var pos = 2
    var guard = 0
    while (pos + 4 <= jpeg.length && guard < 64) {
      if (u8(jpeg, pos) != 0xFF) return null
      val marker = u8(jpeg, pos + 1)
      if (marker == 0xDA || marker == 0xD9) return null // SOS/EOI: no EXIF
      val len = (u8(jpeg, pos + 2) << 8) | u8(jpeg, pos + 3)
      if (len < 2 || pos + 2 + len > jpeg.length) return null
      if (marker == 0xE1 && len >= 8 + 6 &&
        jpeg(pos + 4) == 'E' && jpeg(pos + 5) == 'x' &&
        jpeg(pos + 6) == 'i' && jpeg(pos + 7) == 'f' &&
        jpeg(pos + 8) == 0 && jpeg(pos + 9) == 0)
        return (pos + 10, len - 8)
      pos += 2 + len
      guard += 1
    }
    null
  }

  /** Extract the supported IFD0 tags; null when the JPEG carries no
    * parseable EXIF block. */
  def extract(jpeg: Array[Byte]): Exif = {
    val span = findExifTiff(jpeg)
    if (span == null) return null
    val (off, len) = span
    val t = jpeg
    if (len < 8) return null
    val le =
      if (t(off) == 'I' && t(off + 1) == 'I') true
      else if (t(off) == 'M' && t(off + 1) == 'M') false
      else return null
    // all reads bounds-checked against the APP1 span, offsets relative
    // to the TIFF header at `off`
    def ok(rel: Long, n: Long): Boolean = rel >= 0 && rel + n <= len
    def u2(rel: Long): Int = {
      val p = off + rel.toInt
      if (le) u8(t, p) | (u8(t, p + 1) << 8)
      else (u8(t, p) << 8) | u8(t, p + 1)
    }
    def u4(rel: Long): Long =
      if (le) (u2(rel).toLong | (u2(rel + 2).toLong << 16)) & 0xFFFFFFFFL
      else ((u2(rel).toLong << 16) | u2(rel + 2)) & 0xFFFFFFFFL
    if (!ok(0, 8) || u2(2) != 42) return null
    val ifd = u4(4)
    if (!ok(ifd, 2)) return null
    val n = u2(ifd)
    if (n < 1 || n > 128 || !ok(ifd + 2, 12L * n)) return null
    var make: String = null; var model: String = null
    var orientation = -1; var dateTime: String = null
    def asciiAt(rel: Long, count: Long): String = {
      if (!ok(rel, count) || count < 1 || count > 256) return null
      var end = rel + count
      // EXIF ASCII is NUL-terminated; trim the terminator and slack
      while (end > rel && t(off + (end - 1).toInt) == 0) end -= 1
      new String(t, off + rel.toInt, (end - rel).toInt,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    var e = 0
    while (e < n) {
      val base = ifd + 2 + 12L * e
      val tag = u2(base)
      val typ = u2(base + 2)
      val count = u4(base + 4)
      (tag, typ) match {
        case (0x010F, 2) =>
          make = asciiAt(if (count <= 4) base + 8 else u4(base + 8), count)
        case (0x0110, 2) =>
          model = asciiAt(if (count <= 4) base + 8 else u4(base + 8), count)
        case (0x0112, 3) if count == 1 =>
          orientation = u2(base + 8)
        case (0x0132, 2) =>
          dateTime = asciiAt(if (count <= 4) base + 8 else u4(base + 8), count)
        case _ => ()
      }
      e += 1
    }
    if (make == null && model == null && orientation < 0 && dateTime == null)
      return null
    Exif(make, model, orientation, dateTime)
  }

  /** Build the APP1/Exif segment bytes (marker + length + "Exif\0\0" +
    * a little-endian TIFF stream whose IFD0 carries the four tags). */
  def app1Segment(make: String, model: String, orientation: Int,
      dateTime: String): Array[Byte] = {
    require(make.length < 200 && model.length < 200 && dateTime.length == 19,
      "bad exif fixture fields")
    val mk = make + "\u0000"
    val md = model + "\u0000"
    val dt = dateTime + "\u0000" // 20 bytes
    val nTags = 4
    val ifdOff = 8L
    val dataOff = ifdOff + 2 + 12 * nTags + 4
    val bos = new java.io.ByteArrayOutputStream()
    def w1(v: Int): Unit = bos.write(v & 0xFF)
    def w2(v: Int): Unit = { w1(v); w1(v >> 8) }
    def w4(v: Long): Unit = { w2((v & 0xFFFF).toInt); w2(((v >> 16) & 0xFFFF).toInt) }
    w1('I'); w1('I'); w2(42); w4(ifdOff)
    w2(nTags)
    var cursor = dataOff
    def tag(id: Int, typ: Int, count: Long, inlineOrOff: Long): Unit = {
      w2(id); w2(typ); w4(count); w4(inlineOrOff)
    }
    tag(0x010F, 2, mk.length.toLong, cursor); cursor += mk.length
    tag(0x0110, 2, md.length.toLong, cursor); cursor += md.length
    tag(0x0112, 3, 1, orientation.toLong) // SHORT inline (LE: low bytes)
    tag(0x0132, 2, dt.length.toLong, cursor); cursor += dt.length
    w4(0L) // no next IFD
    (mk + md + dt).foreach(c => w1(c.toInt))
    val tiff = bos.toByteArray
    val payload = "Exif\u0000\u0000".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++ tiff
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xFF); seg.write(0xE1)
    val len = payload.length + 2
    seg.write((len >> 8) & 0xFF); seg.write(len & 0xFF)
    seg.write(payload, 0, payload.length)
    seg.toByteArray
  }

  /** Normalize a decoded gray image by its EXIF orientation — the
    * stored→upright transform (CIPA DC-008 Table 5): 1 identity,
    * 2 flip-H, 3 rot180, 4 flip-V, 5 transpose, 6 rot90CW,
    * 7 transverse, 8 rot90CCW. Rotation BEFORE hashing is the point:
    * a phone photo stored rotated with an orientation tag otherwise
    * hashes outside its own upright original's Hamming ball. */
  def orient(g: PngKernel.Gray, o: Int): PngKernel.Gray = {
    if (g == null || o == 1 || o < 1 || o > 8) return g
    val w = g.width; val h = g.height
    val swap = o >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val (sx, sy) = o match {
          case 2 => (ow - 1 - x, y) // flip horizontal
          case 3 => (ow - 1 - x, oh - 1 - y) // rotate 180
          case 4 => (x, oh - 1 - y) // flip vertical
          case 5 => (y, x) // transpose
          case 6 => (y, h - 1 - x) // rotate 90 CW
          case 7 => (w - 1 - y, h - 1 - x) // transverse
          case _ => (w - 1 - y, x) // 8: rotate 90 CCW
        }
        out(y * ow + x) = g.luma(sy * w + sx)
        x += 1
      }
      y += 1
    }
    PngKernel.Gray(ow, oh, out)
  }

  /** The orientation whose [[orient]] undoes `o` (rotations invert to
    * each other; flips/transposes are involutions). */
  def inverseOrientation(o: Int): Int = o match {
    case 6 => 8
    case 8 => 6
    case other => other
  }

  /** Insert an APP1/Exif segment right after SOI of an existing JPEG. */
  def withExif(jpeg: Array[Byte], make: String, model: String,
      orientation: Int, dateTime: String): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF &&
      (jpeg(1) & 0xFF) == 0xD8, "not a JPEG")
    val seg = app1Segment(make, model, orientation, dateTime)
    val out = new Array[Byte](jpeg.length + seg.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    System.arraycopy(seg, 0, out, 2, seg.length)
    System.arraycopy(jpeg, 2, out, 2 + seg.length, jpeg.length - 2)
    out
  }
}

/** EXIF struct from a JPEG binary column: (ok, make, model,
  * orientation, datetime). ok=false (all null) for dirty bytes or
  * EXIF-less JPEGs — never a throw. */
case class JpegExifMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("orientation", LongType),
    StructField("datetime", StringType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_exif_meta requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val x = ExifKernel.extract(bytes)
    if (x == null) return InternalRow(false, null, null, null, null)
    InternalRow(true,
      if (x.make == null) null else UTF8String.fromString(x.make),
      if (x.model == null) null else UTF8String.fromString(x.model),
      if (x.orientation < 0) null else x.orientation.toLong,
      if (x.dateTime == null) null else UTF8String.fromString(x.dateTime))
  }

  override protected def withNewChildInternal(newChild: Expression): JpegExifMeta =
    copy(child = newChild)

  override def prettyName: String = "jpeg_exif_meta"
}

object JpegExifMeta {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      JpegExifMeta(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** EXIF'd block-JPEG fixture: [[BlockJpegEncode]]'s wire bytes with a
  * REAL APP1/Exif segment (little-endian TIFF IFD0) planted from the
  * documented field contract:
  *   make        = 'CAM-'   + (seed mod 5)
  *   model       = 'MODEL-' + (seed mod 7)
  *   orientation = 1 + seed mod 8
  *   datetime    = (2000 + seed mod 26):(1 + seed mod 12):(1 + seed
  *                 mod 28) 12:34:56   (EXIF "YYYY:MM:DD HH:MM:SS")
  * so a SQL oracle replays every field, and the pixel path still
  * decodes (APPn segments are skipped by every JPEG reader). */
case class ExifJpegEncode(seed: Expression, wBlocks: Expression,
    hBlocks: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, wBlocks, hBlocks)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exif_jpeg_encode requires 3 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, wb, hb) = vs.map(_.asInstanceOf[Long])
    if (wb < 1 || hb < 1 || wb > 512 || hb > 512) return null
    val base = BlockJpegEncode(
      org.apache.spark.sql.catalyst.expressions.Literal(s),
      org.apache.spark.sql.catalyst.expressions.Literal(wb),
      org.apache.spark.sql.catalyst.expressions.Literal(hb))
      .eval(null).asInstanceOf[Array[Byte]]
    val dt = f"${2000 + s % 26}%04d:${1 + s % 12}%02d:${1 + s % 28}%02d 12:34:56"
    ExifKernel.withExif(base, s"CAM-${s % 5}", s"MODEL-${s % 7}",
      (1 + s % 8).toInt, dt)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExifJpegEncode =
    ExifJpegEncode(newChildren(0), newChildren(1), newChildren(2))

  override def prettyName: String = "exif_jpeg_encode"
}

object ExifJpegEncode {
  def apply(seed: Column, wBlocks: Column, hBlocks: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(ExifJpegEncode(b.expression(seed), b.expression(wBlocks),
      b.expression(hBlocks)))
  }
}

/** Orientation-aware gray stats from a JPEG column: decode, read the
  * EXIF orientation (1 when absent), NORMALIZE the pixels, THEN hash —
  * so a camera-rotated copy and its upright original share a
  * fingerprint. Same 11-field struct as the other stat legs. */
case class JpegOrientedStats(child: Expression)
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
      s"jpeg_oriented_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val g = JpegKernel.decodeGrayY(bytes)
    val o = {
      val x = ExifKernel.extract(bytes)
      if (x == null || x.orientation < 1 || x.orientation > 8) 1
      else x.orientation
    }
    GifGrayStats.statsRow(ExifKernel.orient(g, o))
  }

  override protected def withNewChildInternal(newChild: Expression): JpegOrientedStats =
    copy(child = newChild)

  override def prettyName: String = "jpeg_oriented_stats"
}

object JpegOrientedStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      JpegOrientedStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Container-SNIFFING orientation-normalized gray stats — the oriented
  * twin of [[ImageGrayStats]]: route each row to its kernel by magic
  * bytes, then normalize by the EXIF orientation BEFORE hashing. Only
  * JPEG carries EXIF; every other container is implicitly upright
  * (orientation 1), so on EXIF-less corpora this is bit-identical to
  * [[ImageGrayStats]] — which is what lets the streaming ingest door
  * ([[graft.streaming.ImageIngest]]) ride it without changing any
  * orientation-free verdict, while a camera-rotated JPEG re-upload of
  * an ingested image now lands in the same Hamming ball and drops. */
case class OrientedImageGrayStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = JpegOrientedStats(child).dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"oriented_image_gray_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val g = GraySniff.decode(bytes)
    val isJpeg = bytes != null && bytes.length >= 2 &&
      (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8
    val o =
      if (!isJpeg) 1
      else {
        val x = ExifKernel.extract(bytes)
        if (x == null || x.orientation < 1 || x.orientation > 8) 1
        else x.orientation
      }
    GifGrayStats.statsRow(ExifKernel.orient(g, o))
  }

  override protected def withNewChildInternal(
      newChild: Expression): OrientedImageGrayStats =
    copy(child = newChild)

  override def prettyName: String = "oriented_image_gray_stats"
}

object OrientedImageGrayStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      OrientedImageGrayStats(
        org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Camera-rotated block-JPEG fixture: the stored pixel grid is the
  * upright block contract transformed by the INVERSE of `orientation`
  * (rotations of a block-flat grid stay block-flat), plus a real APP1
  * block carrying that orientation — so [[JpegOrientedStats]] must
  * read the tag and un-rotate to land back on the upright formula the
  * oracle replays. Orientations 1,3,6,8 (the camera rotations). */
case class OrientedJpegEncode(seed: Expression, wBlocks: Expression,
    hBlocks: Expression, orientation: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(seed, wBlocks, hBlocks, orientation)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"oriented_jpeg_encode requires 4 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, wb, hb, o) = vs.map(_.asInstanceOf[Long])
    if (wb < 1 || hb < 1 || wb > 512 || hb > 512) return null
    if (o != 1L && o != 3L && o != 6L && o != 8L) return null
    // upright block grid under the shared JPEG block contract
    val upright = PngKernel.Gray(wb.toInt, hb.toInt,
      Array.tabulate(wb.toInt * hb.toInt) { i =>
        val bx = i % wb.toInt; val by = i / wb.toInt
        val t = bx * 7L + by * 11L + s * 131L
        val tq = ((t % 251) * (t % 251)) % 251
        ((((tq + bx + by * 3L + s) % 256) + 256) % 256).toInt
      })
    // stored = inverse-orient(upright) at BLOCK granularity
    val stored = ExifKernel.orient(upright,
      ExifKernel.inverseOrientation(o.toInt))
    val jpeg = JpegKernel.encodeGrayBlocks(stored.width, stored.height,
      (bx, by) => stored.luma(by * stored.width + bx))
    ExifKernel.withExif(jpeg, s"CAM-${s % 5}", s"MODEL-${s % 7}",
      o.toInt, f"${2000 + s % 26}%04d:${1 + s % 12}%02d:${1 + s % 28}%02d 12:34:56")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OrientedJpegEncode =
    OrientedJpegEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3))

  override def prettyName: String = "oriented_jpeg_encode"
}

object OrientedJpegEncode {
  def apply(seed: Column, wBlocks: Column, hBlocks: Column,
      orientation: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(OrientedJpegEncode(b.expression(seed), b.expression(wBlocks),
      b.expression(hBlocks), b.expression(orientation)))
  }
}
