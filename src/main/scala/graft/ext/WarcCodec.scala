package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500) record walk — the container web crawls actually
  * arrive in: `WARC/1.x` + CRLF header lines + empty line +
  * Content-Length payload bytes + CRLF CRLF, records concatenated,
  * usually gzip-membered (RFC 1952 allows concatenated members, and
  * `java.util.zip.GZIPInputStream` reads them through — the same
  * pure-JVM inflate the PNG leg rides). This is the INGESTION step of
  * a crawl pipeline: slice records, surface type/URI/date/length, and
  * hand each payload to the triage + decode legs. Per-record payload
  * signals are exact integers (length, first byte, full byte sum — the
  * MP4-leg contract) so a SQL oracle replays every field; dirty bytes
  * → null, never a throw. */
private[ext] object WarcKernel {

  final case class Rec(idx: Int, warcType: String, targetUri: String,
      date: String, contentLength: Long, firstByte: Int, byteSum: Long,
      payload: Array[Byte])

  /** Transparently gunzip when the magic says so — an EXPLICIT
    * member-by-member walk (RFC 1952 header fields, raw `Inflater`,
    * CRC32 + ISIZE verified per member), NOT `GZIPInputStream`: the
    * JDK stream silently stops at the first valid member when the
    * next bytes are garbage, which would present a half-read archive
    * as a complete one. Any corruption → null, never a partial. */
  private def plainBytes(b: Array[Byte]): Array[Byte] = {
    if (b.length < 2 || (b(0) & 0xFF) != 0x1F || (b(1) & 0xFF) != 0x8B)
      return b
    def u8i(i: Int): Int = b(i) & 0xFF
    def le4(i: Int): Long = (u8i(i).toLong | (u8i(i + 1).toLong << 8) |
      (u8i(i + 2).toLong << 16) | (u8i(i + 3).toLong << 24)) & 0xFFFFFFFFL
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < b.length) {
      if (pos + 10 > b.length || u8i(pos) != 0x1F || u8i(pos + 1) != 0x8B ||
        u8i(pos + 2) != 8) return null
      val flg = u8i(pos + 3)
      pos += 10
      if ((flg & 4) != 0) { // FEXTRA
        if (pos + 2 > b.length) return null
        val xlen = u8i(pos) | (u8i(pos + 1) << 8)
        pos += 2 + xlen
      }
      if ((flg & 8) != 0) { // FNAME: NUL-terminated
        while (pos < b.length && b(pos) != 0) pos += 1
        pos += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (pos < b.length && b(pos) != 0) pos += 1
        pos += 1
      }
      if ((flg & 2) != 0) pos += 2 // FHCRC
      if (pos >= b.length) return null
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(b, pos, b.length - pos)
      val crc = new java.util.zip.CRC32()
      val buf = new Array[Byte](8192)
      var msize = 0L
      var remaining = 0
      try {
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && inf.needsInput()) return null // truncated deflate
          out.write(buf, 0, n)
          crc.update(buf, 0, n)
          msize += n
          if (out.size() > (1 << 28)) return null // decompression bomb guard
        }
        remaining = inf.getRemaining
      } catch {
        case _: java.util.zip.DataFormatException => return null
      } finally inf.end()
      pos = b.length - remaining
      if (pos + 8 > b.length) return null
      if (le4(pos) != crc.getValue || le4(pos + 4) != (msize & 0xFFFFFFFFL))
        return null
      pos += 8
    }
    out.toByteArray
  }

  /** The member-walk gunzip, shared with the tar leg (.tar.gz). */
  private[ext] def gunzip(b: Array[Byte]): Array[Byte] = plainBytes(b)

  def records(raw: Array[Byte], maxRecords: Int): Array[Rec] = {
    if (raw == null || raw.length < 8) return null
    val b = plainBytes(raw)
    if (b == null || b.length < 8) return null
    val out = scala.collection.mutable.ArrayBuffer[Rec]()
    var pos = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      if (i + 1 >= b.length) -1 else i
    }
    while (pos < b.length && out.length < maxRecords) {
      // skip inter-record blank lines
      while (pos + 1 < b.length && b(pos) == '\r' && b(pos + 1) == '\n')
        pos += 2
      if (pos >= b.length) return out.toArray
      val ve = lineEnd(pos)
      if (ve < 0) return null
      val version = new String(b, pos, ve - pos,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (!version.startsWith("WARC/")) return null
      pos = ve + 2
      var warcType: String = null; var uri: String = null
      var date: String = null; var clen = -1L
      var guard = 0
      var done = false
      while (!done && guard < 64) {
        val he = lineEnd(pos)
        if (he < 0) return null
        if (he == pos) { done = true; pos += 2 } // empty line: headers end
        else {
          val line = new String(b, pos, he - pos,
            java.nio.charset.StandardCharsets.US_ASCII)
          val ci = line.indexOf(':')
          if (ci < 1) return null
          val k = line.substring(0, ci).trim.toLowerCase
          val v = line.substring(ci + 1).trim
          k match {
            case "warc-type" => warcType = v
            case "warc-target-uri" => uri = v
            case "warc-date" => date = v
            case "content-length" =>
              clen = try v.toLong catch { case _: NumberFormatException => -1L }
            case _ => ()
          }
          pos = he + 2
        }
        guard += 1
      }
      if (!done || clen < 0 || pos + clen > b.length) return null
      var sum = 0L
      var j = 0
      while (j < clen) { sum += b(pos + j) & 0xFF; j += 1 }
      val first = if (clen > 0) b(pos) & 0xFF else -1
      out += Rec(out.length, warcType, uri, date, clen, first, sum,
        java.util.Arrays.copyOfRange(b, pos, pos + clen.toInt))
      pos += clen.toInt
      // the record block terminator CRLF CRLF (tolerate EOF)
      var t = 0
      while (t < 2 && pos + 1 < b.length && b(pos) == '\r' && b(pos + 1) == '\n') {
        pos += 2; t += 1
      }
    }
    if (out.length >= maxRecords && pos < b.length) null else out.toArray
  }

  /** Encode a REAL WARC file (optionally gzip-membered, one member per
    * record — the CommonCrawl layout) under a documented contract:
    *   uri(i)     = http://host-(seed mod 7).example/p(i)
    *   len(i)     = 10 + (seed + i·3) mod 50
    *   byte(i,j)  = (seed·31 + i·17 + j·11) mod 256
    * with WARC-Type response and a fixed date. */
  def encode(seed: Long, nRecords: Int, gzipped: Boolean): Array[Byte] = {
    require(nRecords >= 1 && nRecords <= 4096, s"bad nRecords=$nRecords")
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < nRecords) {
      val len = 10 + (seed + i * 3) % 50
      val payload = Array.tabulate(len.toInt)(j =>
        (((seed * 31 + i * 17 + j * 11) % 256 + 256) % 256).toByte)
      val rec = new java.io.ByteArrayOutputStream()
      val hdr = "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: http://host-${seed % 7}.example/p$i\r\n" +
        "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        s"Content-Length: ${payload.length}\r\n" +
        "\r\n"
      rec.write(hdr.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      rec.write(payload)
      rec.write("\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val recBytes = rec.toByteArray
      if (gzipped) {
        val gz = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(gz)
        g.write(recBytes); g.close()
        out.write(gz.toByteArray)
      } else out.write(recBytes)
      i += 1
    }
    out.toByteArray
  }
}

/** WARC record extraction from a binary column: one array of
  * per-record structs per row (explode downstream). ok=false + empty
  * list on anything undecodable — never a throw. */
case class WarcRecords(child: Expression, maxRecords: Int)
    extends UnaryExpression with CodegenFallback {

  private val recType = StructType(Seq(
    StructField("rec_idx", LongType, nullable = false),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("first_byte", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("records", ArrayType(recType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"warc_records requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val recs = WarcKernel.records(bytes, maxRecords)
    if (recs == null)
      return InternalRow(false, new GenericArrayData(Array.empty[Any]))
    def s(v: String): Any = if (v == null) null else UTF8String.fromString(v)
    val rows: Array[Any] = recs.map(r => InternalRow(r.idx.toLong,
      s(r.warcType), s(r.targetUri), s(r.date), r.contentLength,
      r.firstByte.toLong, r.byteSum, r.payload))
    InternalRow(true, new GenericArrayData(rows): ArrayData)
  }

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)

  override def prettyName: String = "warc_records"
}

object WarcRecords {
  def apply(c: Column, maxRecords: Int = 4096): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      WarcRecords(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        maxRecords))
}

/** Gzip a binary column (one RFC 1952 member, FLG=0) — the fixture
  * half of the archive legs' transparent-gunzip contract (and a
  * general compression verb for binary payloads). Null in → null. */
case class GzipBytes(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gzip_bytes requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): GzipBytes =
    copy(child = newChild)

  override def prettyName: String = "gzip_bytes"
}

object GzipBytes {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      GzipBytes(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Deterministic WARC fixture generator (distributed), plain or
  * gzip-membered, under [[WarcKernel.encode]]'s documented contract. */
case class WarcEncode(seed: Expression, nRecords: Expression,
    gzipped: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nRecords, gzipped)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if ((children.take(2).forall(c =>
      c.dataType == LongType || c.dataType == IntegerType)) &&
      children(2).dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "warc_encode requires (int, int, boolean)")

  override def eval(input: InternalRow): Any = {
    def longOf(e: Expression): java.lang.Long = e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }
    val s = longOf(seed); val n = longOf(nRecords)
    val g = gzipped.eval(input)
    if (s == null || n == null || g == null || n < 1 || n > 4096) return null
    WarcKernel.encode(s.longValue(), n.intValue(),
      g.asInstanceOf[Boolean])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WarcEncode =
    WarcEncode(newChildren(0), newChildren(1), newChildren(2))

  override def prettyName: String = "warc_encode"
}

object WarcEncode {
  def apply(seed: Column, nRecords: Column, gzipped: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(WarcEncode(b.expression(seed), b.expression(nRecords),
      b.expression(gzipped)))
  }
}
