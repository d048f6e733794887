package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PDF text-layer extraction — crawl corpora are full of PDFs (the
  * triage census already counts them) and their text layer is the
  * document the LM pipeline wants. A PDF's content streams are zlib
  * territory (`/FlateDecode` = the same `java.util.zip` walk the PNG
  * IDAT rides) and the text operators are a bounded token walk: show
  * operators `Tj`, `'`, `"` take one string operand, `TJ` an array of
  * strings interleaved with kern numbers; strings are `(…)` literals
  * (escapes `\\ \( \) \n \r \t \b \f`, octal `\ddd`, line
  * continuations) or `<…>` hex. This kernel walks objects LINEARLY
  * (`N G obj … endobj`), needing no xref — crawl PDFs frequently have
  * broken tables, and the linear walk reads exactly the same bytes.
  *
  * Byte→char mapping is WinAnsiEncoding (windows-1252), the default
  * single-byte encoding of the simple-font slice; ASCII is identical
  * under StandardEncoding. SCOPE NOTE (the MP3-PCM stance): composite
  * Type0/CID fonts remap bytes through embedded CMaps — recovering
  * their text needs the full font-program parse (CMap ranges,
  * ToUnicode streams), a format-scale project; streams whose dicts
  * declare filters we cannot verify (DCT, LZW, ASCII85, Crypt) are
  * SKIPPED (counted, contributing no text), never guessed at.
  * Dirty bytes → null/ok=false, never a throw.
  *
  * No JVM second implementation exists (the JDK has no PDF reader), so
  * conformance is fixture-contract + our own writer round-trip — the
  * Mp3Codec bar — plus a HAND-TYPED literal PDF in the spec pinning
  * the absolute byte layout independent of [[PdfKernel.encode]]. */
private[ext] object PdfKernel {

  final case class Pdf(nPages: Int, nStreams: Int, nTextStreams: Int,
      nSkippedStreams: Int, text: String)

  private val MaxDecoded = 1 << 26

  private def inflate(b: Array[Byte], off: Int, len: Int): Array[Byte] = {
    if (len <= 0) return null
    val inf = new java.util.zip.Inflater()
    inf.setInput(b, off, len)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return null // truncated or FDICT — never spin
        out.write(buf, 0, n)
        if (out.size() > MaxDecoded) return null
      }
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    out.toByteArray
  }

  /** WinAnsi (cp1252) byte→char; the five undefined bytes and the
    * control range map to 0 (dropped by the text collector). */
  private def winAnsi(b: Int): Char = {
    if (b >= 0x20 && b < 0x7F) return b.toChar
    if (b == 0x09 || b == 0x0A || b == 0x0D) return b.toChar
    if (b >= 0xA0) return b.toChar // cp1252 == latin-1 on 0xA0-0xFF
    b match { // the 0x80-0x9F punctuation block
      case 0x80 => 0x20AC.toChar; case 0x82 => 0x201A.toChar
      case 0x83 => 0x0192.toChar; case 0x84 => 0x201E.toChar
      case 0x85 => 0x2026.toChar; case 0x86 => 0x2020.toChar
      case 0x87 => 0x2021.toChar; case 0x88 => 0x02C6.toChar
      case 0x89 => 0x2030.toChar; case 0x8A => 0x0160.toChar
      case 0x8B => 0x2039.toChar; case 0x8C => 0x0152.toChar
      case 0x8E => 0x017D.toChar; case 0x91 => 0x2018.toChar
      case 0x92 => 0x2019.toChar; case 0x93 => 0x201C.toChar
      case 0x94 => 0x201D.toChar; case 0x95 => 0x2022.toChar
      case 0x96 => 0x2013.toChar; case 0x97 => 0x2014.toChar
      case 0x98 => 0x02DC.toChar; case 0x99 => 0x2122.toChar
      case 0x9A => 0x0161.toChar; case 0x9B => 0x203A.toChar
      case 0x9C => 0x0153.toChar; case 0x9E => 0x017E.toChar
      case 0x9F => 0x0178.toChar; case _ => 0.toChar
    }
  }

  /** Extract show-operator text from ONE decoded content stream: a
    * single pass collecting string operands, emitting on Tj / ' / " /
    * TJ. Returns text (possibly empty); never throws. */
  private def streamText(c: Array[Byte]): String = {
    val out = new java.lang.StringBuilder()
    // operand stack of the most recent string(s); arrays collect
    var pending: java.util.ArrayList[String] = null // non-null inside [ ]
    var last: String = null
    var i = 0
    val n = c.length
    def emit(s: String): Unit = if (s != null) {
      var k = 0
      while (k < s.length) {
        if (s.charAt(k) != 0) out.append(s.charAt(k))
        k += 1
      }
    }
    while (i < n) {
      val ch = c(i) & 0xFF
      if (ch == '%') { // comment to EOL
        while (i < n && c(i) != '\n' && c(i) != '\r') i += 1
      } else if (ch == '(') { // literal string
        val sb = new java.lang.StringBuilder()
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val b = c(i) & 0xFF
          if (b == '\\' && i + 1 < n) {
            val e = c(i + 1) & 0xFF
            e match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case '(' => sb.append('('); i += 2
              case ')' => sb.append(')'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case '\r' => // line continuation (\r or \r\n)
                i += 2; if (i < n && c(i) == '\n') i += 1
              case '\n' => i += 2
              case d if d >= '0' && d <= '7' => // octal, up to 3 digits
                var v = 0; var k = 0; i += 1
                while (k < 3 && i < n && c(i) >= '0' && c(i) <= '7') {
                  v = v * 8 + (c(i) - '0'); i += 1; k += 1
                }
                sb.append(winAnsi(v & 0xFF))
              case _ => sb.append(winAnsi(e)); i += 2
            }
          } else if (b == '(') { depth += 1; sb.append('('); i += 1 }
          else if (b == ')') {
            depth -= 1; if (depth > 0) sb.append(')'); i += 1
          } else { sb.append(winAnsi(b)); i += 1 }
        }
        if (depth != 0) return out.toString // truncated string: stop
        last = sb.toString
        if (pending != null) pending.add(last)
      } else if (ch == '<' && i + 1 < n && (c(i + 1) & 0xFF) != '<') {
        // hex string
        val sb = new java.lang.StringBuilder()
        i += 1
        var hi = -1
        var closed = false
        while (i < n && !closed) {
          val b = c(i) & 0xFF
          if (b == '>') { closed = true; i += 1 }
          else {
            val d = Character.digit(b, 16)
            if (d >= 0) {
              if (hi < 0) hi = d
              else { sb.append(winAnsi(hi * 16 + d)); hi = -1 }
            } else if (!Character.isWhitespace(b)) return out.toString
            i += 1
          }
        }
        if (!closed) return out.toString
        if (hi >= 0) sb.append(winAnsi(hi * 16)) // odd count: pad 0
        last = sb.toString
        if (pending != null) pending.add(last)
      } else if (ch == '<') { // dict inside content (inline images…)
        i += 2
      } else if (ch == '[') { pending = new java.util.ArrayList(); i += 1 }
      else if (ch == ']') { i += 1 } // keep pending for the operator
      else if ((ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
        ch == '\'' || ch == '"') {
        var e = i
        while (e < n && !Character.isWhitespace(c(e) & 0xFF) &&
          (c(e) & 0xFF) != '(' && (c(e) & 0xFF) != '[' &&
          (c(e) & 0xFF) != '<' && (c(e) & 0xFF) != '/' &&
          (c(e) & 0xFF) != ']' && (c(e) & 0xFF) != ')') e += 1
        val op = new String(c, i, e - i,
          java.nio.charset.StandardCharsets.US_ASCII)
        op match {
          case "Tj" | "'" | "\"" => emit(last); last = null; pending = null
          case "TJ" =>
            if (pending != null) {
              val it = pending.iterator()
              while (it.hasNext) emit(it.next())
            }
            pending = null; last = null
          case "BI" => // inline image: skip to EI
            var p = e
            var done = false
            while (p + 1 < n && !done) {
              if ((c(p) & 0xFF) == 'E' && (c(p + 1) & 0xFF) == 'I' &&
                (p + 2 >= n || Character.isWhitespace(c(p + 2) & 0xFF)))
                done = true
              else p += 1
            }
            i = if (done) p + 2 else n
          case _ => () // positioning/state operators: no text effect
        }
        i = math.max(e, i + 1)
      } else if (ch == '/') { // name token
        i += 1
        while (i < n && !Character.isWhitespace(c(i) & 0xFF) &&
          (c(i) & 0xFF) != '(' && (c(i) & 0xFF) != '[' &&
          (c(i) & 0xFF) != '<' && (c(i) & 0xFF) != '/' &&
          (c(i) & 0xFF) != ']') i += 1
      } else i += 1
      if (out.length() > MaxDecoded) return out.toString
    }
    out.toString
  }

  private def indexOfAscii(b: Array[Byte], pat: String, from: Int): Int = {
    val p = pat.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = math.max(from, 0)
    val last = b.length - p.length
    while (i <= last) {
      var k = 0
      while (k < p.length && b(i + k) == p(k)) k += 1
      if (k == p.length) return i
      i += 1
    }
    -1
  }

  /** Parse one PDF: page count (`/Type /Page` occurrences, whitespace
    * tolerant, `/Pages` excluded), stream walk, text extraction. Null
    * on a missing header or a walk that never finds a single object. */
  def parse(payload: Array[Byte], maxStreams: Int = 256): Pdf = {
    if (payload == null || payload.length < 16) return null
    val b = payload
    if (indexOfAscii(b, "%PDF-", 0) != 0) return null
    // page census: /Type whitespace* /Page (not followed by 's')
    var nPages = 0
    var p = 0
    while ({ p = indexOfAscii(b, "/Type", p); p >= 0 }) {
      var q = p + 5
      while (q < b.length && (b(q) == ' ' || b(q) == '\r' ||
        b(q) == '\n' || b(q) == '\t')) q += 1
      if (indexOfAscii(b, "/Page", q) == q &&
        (q + 5 >= b.length || (b(q + 5) & 0xFF) != 's')) nPages += 1
      p += 5
    }
    // stream walk: dict between the enclosing << >> before 'stream'
    var nStreams = 0; var nText = 0; var nSkipped = 0
    val text = new java.lang.StringBuilder()
    var pos = 0
    var guard = 0
    while (guard < maxStreams) {
      val si = indexOfAscii(b, "stream", pos)
      if (si < 0) {
        return Pdf(nPages, nStreams, nText, nSkipped, text.toString)
      }
      // must be the keyword, not 'endstream'
      val isEnd = si >= 3 && indexOfAscii(b, "endstream", si - 3) == si - 3
      if (isEnd) { pos = si + 6 }
      else {
        nStreams += 1
        // dict: nearest '<<' before si, matched to its '>>'
        var ds = -1
        var k = si - 1
        var depth = 0
        var scan = si - 1
        // walk backwards to the '<<' that opens the dict ending before si
        var de = -1
        k = si - 1
        while (k > 0 && de < 0) {
          if (b(k) == '>' && b(k - 1) == '>') de = k - 1
          k -= 1
        }
        if (de >= 0) {
          depth = 1
          k = de - 1
          while (k > 0 && ds < 0) {
            if (b(k) == '<' && b(k - 1) == '<') { depth -= 1
              if (depth == 0) ds = k - 1 else k -= 1 }
            else if (b(k) == '>' && b(k - 1) == '>') { depth += 1; k -= 1 }
            k -= 1
          }
        }
        val dict = if (ds >= 0 && de > ds)
          new String(b, ds, de - ds + 2,
            java.nio.charset.StandardCharsets.ISO_8859_1) else ""
        // data: after 'stream' EOL to 'endstream'
        var dstart = si + 6
        if (dstart < b.length && b(dstart) == '\r') dstart += 1
        if (dstart < b.length && b(dstart) == '\n') dstart += 1
        val ei = indexOfAscii(b, "endstream", dstart)
        if (ei < 0) return Pdf(nPages, nStreams, nText, nSkipped + 1,
          text.toString)
        var dend = ei
        if (dend > dstart && b(dend - 1) == '\n') dend -= 1
        if (dend > dstart && b(dend - 1) == '\r') dend -= 1
        val flate = dict.contains("/FlateDecode")
        val otherFilter = !flate && dict.contains("/Filter")
        if (otherFilter) nSkipped += 1
        else {
          val data =
            if (flate) inflate(b, dstart, dend - dstart)
            else java.util.Arrays.copyOfRange(b, dstart, dend)
          if (data == null) nSkipped += 1
          else {
            val t = streamText(data)
            if (t.nonEmpty) {
              nText += 1
              text.append(t)
              if (text.length() > MaxDecoded)
                return Pdf(nPages, nStreams, nText, nSkipped,
                  text.toString)
            }
          }
        }
        pos = ei + 9
      }
      guard += 1
    }
    Pdf(nPages, nStreams, nText, nSkipped, text.toString)
  }

  /** Encode a REAL multi-page PDF (valid xref + trailer — openable by
    * any reader): one Flate-or-raw content stream per page
    * (alternating, both decode paths exercised), Helvetica simple
    * font. Per page p the content shows, in order: `nw` words
    * `t<digit>` Tj'd with space separators, the constant ` x(y)z`
    * (escaped parens) via `'`, a TJ array [(ab) kern (cd)], and a hex
    * string of the two ASCII digits of (seed+p) mod 100 — the
    * documented oracle contract. */
  def encode(seed: Long, nPages: Int): Array[Byte] = {
    require(nPages >= 1 && nPages <= 64, s"bad nPages $nPages")
    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def w(s: String): Unit = out.write(
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    def beginObj(id: Int): Unit = { offsets += out.size(); w(s"$id 0 obj\n") }
    // 1: catalog, 2: pages, 3..2+n: page objs, 3+n..2+2n: contents,
    // 3+2n: font
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    w("<< /Type /Pages /Kids [" +
      (0 until nPages).map(p => s"${3 + p} 0 R").mkString(" ") +
      s"] /Count $nPages >>\nendobj\n")
    for (p <- 0 until nPages) {
      beginObj(3 + p)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents ${3 + nPages + p} 0 R " +
        s"/Resources << /Font << /F1 ${3 + 2 * nPages} 0 R >> >> >>\n" +
        "endobj\n")
    }
    for (p <- 0 until nPages) {
      val nw = 3 + ((seed + p) % 4).toInt
      val sb = new java.lang.StringBuilder()
      sb.append("BT /F1 12 Tf 72 720 Td\n")
      for (j <- 0 until nw) {
        val d = ((seed * 7 + p * 5 + j * 3) % 10).toInt
        val sep = if (j < nw - 1) " " else ""
        sb.append(s"(t$d$sep) Tj\n")
      }
      sb.append("0 -14 Td ( x\\(y\\)z) '\n")
      sb.append("[(ab) -120 (cd)] TJ\n")
      val dd = ((seed + p) % 100).toInt
      sb.append(f"<3${dd / 10}%d3${dd % 10}%d> Tj\nET")
      val raw = sb.toString.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val (data, filter) =
        if (p % 2 == 0) {
          val d = new java.util.zip.Deflater()
          d.setInput(raw); d.finish()
          val buf = new Array[Byte](raw.length * 2 + 64)
          val m = d.deflate(buf); d.end()
          (java.util.Arrays.copyOf(buf, m), " /Filter /FlateDecode")
        } else (raw, "")
      beginObj(3 + nPages + p)
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }
    beginObj(3 + 2 * nPages)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>\nendobj\n")
    val xref = out.size()
    val total = 3 + 2 * nPages + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }
}

/** PDF text layer of a binary column: (ok, n_pages, n_streams,
  * n_text_streams, n_skipped_streams, n_chars, ascii_sum, text) —
  * FlateDecode undone, Tj / ' / " / TJ show strings concatenated in
  * stream order under WinAnsi. ok=false (null fields) on non-PDF
  * bytes. */
case class PdfTextExtract(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("n_pages", LongType),
    StructField("n_streams", LongType),
    StructField("n_text_streams", LongType),
    StructField("n_skipped_streams", LongType),
    StructField("n_chars", LongType),
    StructField("cp_sum", LongType),
    StructField("text", StringType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pdf_text_extract requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case v => v.asInstanceOf[Array[Byte]]
    }
    val r = PdfKernel.parse(bytes)
    if (r == null)
      return InternalRow(false, null, null, null, null, null, null, null)
    var cpSum = 0L
    var nc = 0L
    var i = 0
    while (i < r.text.length) {
      val cp = r.text.codePointAt(i)
      cpSum += cp; nc += 1
      i += Character.charCount(cp)
    }
    InternalRow(true, r.nPages.toLong, r.nStreams.toLong,
      r.nTextStreams.toLong, r.nSkippedStreams.toLong, nc, cpSum,
      UTF8String.fromString(r.text))
  }

  override protected def withNewChildInternal(
      newChild: Expression): PdfTextExtract = copy(child = newChild)

  override def prettyName: String = "pdf_text_extract"
}

object PdfTextExtract {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PdfTextExtract(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Deterministic real-PDF fixture column ([[PdfKernel.encode]]'s
  * documented per-page contract). */
case class PdfEncode(seed: Expression, nPages: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nPages)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pdf_encode requires 2 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, n) = vs.map(_.asInstanceOf[Long])
    if (n < 1 || n > 64) return null
    PdfKernel.encode(s, n.toInt)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PdfEncode =
    PdfEncode(newChildren(0), newChildren(1))

  override def prettyName: String = "pdf_encode"
}

object PdfEncode {
  def apply(seed: Column, nPages: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(PdfEncode(b.expression(seed), b.expression(nPages)))
  }
}
