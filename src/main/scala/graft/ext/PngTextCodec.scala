package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PNG textual metadata (tEXt / zTXt / iTXt, PNG spec §11.3.4) — the
  * PNG twin of the EXIF leg: author/source/caption strings a curation
  * pipeline filters and dedups on. Each chunk's CRC32 is VERIFIED
  * (verified-or-nothing, like every other leg: a corrupt metadata
  * chunk nulls the extraction rather than shipping half-read fields);
  * zTXt/compressed-iTXt values inflate through `java.util.zip` — the
  * same zlib the pixel leg rides. */
private[ext] object PngTextKernel {

  final case class Entry(key: String, value: String)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be4(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) |
      u8(b, i + 3)) & 0xFFFFFFFFL

  private def inflateZlib(b: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater() // zlib wrapper
    inf.setInput(b, off, len)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // needsDictionary: FDICT streams (valid zlib headers) make inflate
        // return 0 forever with needsInput()=false — bail or hang.
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        out.write(buf, 0, n)
        if (out.size() > (1 << 24)) return null
      }
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    out.toByteArray
  }

  /** All textual entries of a PNG, or null when the container or any
    * text chunk is malformed (CRC included). */
  def entries(png: Array[Byte]): Array[Entry] = {
    if (png == null || png.length < 16) return null
    if (!((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
      png(3) == 'G')) return null
    val out = scala.collection.mutable.ArrayBuffer[Entry]()
    var pos = 8L
    var guard = 0
    while (pos + 12 <= png.length && guard < 512) {
      val len = be4(png, pos.toInt)
      val dataLo = pos + 8
      if (len > Int.MaxValue || dataLo + len + 4 > png.length) return null
      val typ = new String(png, (pos + 4).toInt, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (typ == "tEXt" || typ == "zTXt" || typ == "iTXt") {
        val crc = new java.util.zip.CRC32()
        crc.update(png, (pos + 4).toInt, 4 + len.toInt)
        if (crc.getValue != be4(png, (dataLo + len).toInt)) return null
        val d = java.util.Arrays.copyOfRange(png, dataLo.toInt,
          (dataLo + len).toInt)
        val nul = d.indexOf(0: Byte)
        if (nul < 1 || nul > 79) return null // PNG keyword rules
        val key = new String(d, 0, nul,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val value: String = typ match {
          case "tEXt" =>
            new String(d, nul + 1, d.length - nul - 1,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          case "zTXt" =>
            if (nul + 2 > d.length || d(nul + 1) != 0) return null
            val v = inflateZlib(d, nul + 2, d.length - nul - 2)
            if (v == null) return null
            new String(v, java.nio.charset.StandardCharsets.ISO_8859_1)
          case _ => // iTXt: compFlag, compMethod, lang\0, trans\0, value
            if (nul + 3 > d.length) return null
            val compFlag = u8(d, nul + 1)
            var p = nul + 3
            while (p < d.length && d(p) != 0) p += 1 // language tag
            p += 1
            while (p < d.length && d(p) != 0) p += 1 // translated keyword
            p += 1
            if (p > d.length) return null
            if (compFlag == 0)
              new String(d, p, d.length - p,
                java.nio.charset.StandardCharsets.UTF_8)
            else {
              val v = inflateZlib(d, p, d.length - p)
              if (v == null) return null
              new String(v, java.nio.charset.StandardCharsets.UTF_8)
            }
        }
        out += Entry(key, value)
      }
      if (typ == "IEND") return out.toArray
      pos = dataLo + len + 4
      guard += 1
    }
    // Reaching here means either the 512-chunk guard tripped or the walk ran
    // off the end without IEND — a partial read, not a verified one. Null out
    // (verified-or-nothing), mirroring the tar/zip/WARC cap handling.
    null
  }

  /** One serialized text chunk (tEXt, or zTXt when `deflate`). */
  def chunk(typ: String, key: String, value: String,
      deflate: Boolean): Array[Byte] = {
    val body: Array[Byte] =
      if (!deflate)
        key.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
          Array(0.toByte) ++
          value.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      else {
        val def0 = new java.util.zip.Deflater()
        val raw = value.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        def0.setInput(raw); def0.finish()
        val buf = new Array[Byte](raw.length * 2 + 64)
        val n = def0.deflate(buf)
        def0.end()
        key.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
          Array(0.toByte, 0.toByte) ++ buf.take(n)
      }
    val bos = new java.io.ByteArrayOutputStream()
    def w4(v: Long): Unit = {
      bos.write(((v >> 24) & 0xFF).toInt); bos.write(((v >> 16) & 0xFF).toInt)
      bos.write(((v >> 8) & 0xFF).toInt); bos.write((v & 0xFF).toInt)
    }
    w4(body.length.toLong)
    val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    bos.write(tb, 0, 4)
    bos.write(body, 0, body.length)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(body)
    w4(crc.getValue)
    bos.toByteArray
  }

  /** Splice text chunks right after IHDR of an existing PNG. */
  def withText(png: Array[Byte], chunks: Seq[Array[Byte]]): Array[Byte] = {
    require(png.length > 33, "not a PNG")
    val ihdrEnd = 8 + 8 + 13 + 4 // signature + IHDR chunk
    val extra = chunks.foldLeft(Array.empty[Byte])(_ ++ _)
    png.take(ihdrEnd) ++ extra ++ png.drop(ihdrEnd)
  }
}

/** Text entries from a PNG binary column: (ok, entries[]) with CRC
  * verification per chunk; ok=false + empty on dirty bytes. */
case class PngTextMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val entryType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("entries", ArrayType(entryType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_text_meta requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val es = PngTextKernel.entries(bytes)
    if (es == null)
      return InternalRow(false, new GenericArrayData(Array.empty[Any]))
    val rows: Array[Any] = es.map(e => InternalRow(
      UTF8String.fromString(e.key), UTF8String.fromString(e.value)))
    InternalRow(true, new GenericArrayData(rows): ArrayData)
  }

  override protected def withNewChildInternal(newChild: Expression): PngTextMeta =
    copy(child = newChild)

  override def prettyName: String = "png_text_meta"
}

object PngTextMeta {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PngTextMeta(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Text-chunked PNG fixture: a real [[GrayPngEncode]] image with a
  * planted tEXt + zTXt pair spliced after IHDR —
  *   Author (tEXt)      = author-(seed mod 9)
  *   Description (zTXt) = desc-(seed mod 6)
  * so the oracle replays both entries while the engine must walk real
  * chunks, verify real CRCs and inflate real zlib. */
case class PngWithTextEncode(seed: Expression, w: Expression, h: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, w, h)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"png_with_text_encode requires 3 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, ww, hh) = vs.map(_.asInstanceOf[Long])
    if (ww < 1 || hh < 1 || ww > 4096 || hh > 4096) return null
    val base = GrayPngEncode(
      org.apache.spark.sql.catalyst.expressions.Literal(s),
      org.apache.spark.sql.catalyst.expressions.Literal(ww),
      org.apache.spark.sql.catalyst.expressions.Literal(hh),
      org.apache.spark.sql.catalyst.expressions.Literal(11L),
      org.apache.spark.sql.catalyst.expressions.Literal(5L),
      org.apache.spark.sql.catalyst.expressions.Literal(0L))
      .eval(null).asInstanceOf[Array[Byte]]
    PngTextKernel.withText(base, Seq(
      PngTextKernel.chunk("tEXt", "Author", s"author-${s % 9}",
        deflate = false),
      PngTextKernel.chunk("zTXt", "Description", s"desc-${s % 6}",
        deflate = true)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PngWithTextEncode =
    PngWithTextEncode(newChildren(0), newChildren(1), newChildren(2))

  override def prettyName: String = "png_with_text_encode"
}

object PngWithTextEncode {
  def apply(seed: Column, w: Column, h: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(PngWithTextEncode(b.expression(seed), b.expression(w),
      b.expression(h)))
  }
}
