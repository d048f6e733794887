package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Charset-aware bytes→text bridge for the WARC→HTTP→text pipeline:
  * a crawl response's `body` is BYTES, and a real slice of the web is
  * not UTF-8 (ISO-8859-1/windows-1252 legacy pages, Shift-JIS,
  * EUC-JP, UTF-16 exports). Feeding those bytes to the text verbs as
  * if they were UTF-8 mojibakes silently — this bridge resolves the
  * page's encoding the way browsers do and decodes through the JVM's
  * `java.nio.charset` tables.
  *
  * Resolution precedence (the WHATWG encoding-sniff order, which is
  * also what the crawl ecosystem implements):
  *   1. a byte-order mark (UTF-8 / UTF-16LE / UTF-16BE) — wins over
  *      every declaration and is STRIPPED from the decoded text (it is
  *      a declaration, not content);
  *   2. the transport layer: a `charset=` parameter on the
  *      Content-Type header;
  *   3. an in-document `<meta charset=…>` / `<meta http-equiv
  *      content="…; charset=…">` prescan over the first 1024 bytes
  *      (case-insensitive, quote-tolerant);
  *   4. fallback: windows-1252, the browser default for undeclared
  *      legacy content.
  * Labels are normalized WHATWG-style: `iso-8859-1`, `latin1`,
  * `us-ascii` and friends all decode as windows-1252 (the standard's
  * deliberate superset aliasing — the 0x80–0x9F block is where legacy
  * pages actually differ), `sjis`/`x-sjis`/`ms_kanji` as Shift_JIS.
  *
  * Verified-or-nothing (the container-leg contract): an UNKNOWN
  * declared label, or bytes MALFORMED under the resolved charset,
  * null the decode — a page that lies about its encoding drops out
  * honestly instead of shipping mojibake into dedup and LM scoring. */
private[ext] object CharsetKernel {

  /** WHATWG label → JVM charset name (the slice of the standard's
    * label table this engine supports; all are java.nio built-ins). */
  private val Labels: Map[String, String] = {
    def all(names: Seq[String], target: String): Seq[(String, String)] =
      names.map(_ -> target)
    (all(Seq("utf-8", "utf8", "unicode-1-1-utf-8"), "UTF-8") ++
      all(Seq("iso-8859-1", "iso8859-1", "iso_8859-1", "latin1", "l1",
        "ascii", "us-ascii", "windows-1252", "cp1252", "x-cp1252",
        "ansi_x3.4-1968", "iso-ir-100", "ibm819", "cp819"),
        "windows-1252") ++
      all(Seq("shift_jis", "shift-jis", "sjis", "x-sjis", "ms_kanji",
        "ms932", "windows-31j", "csshiftjis"), "windows-31j") ++
      all(Seq("euc-jp", "x-euc-jp", "cseucpkdfmtjapanese"), "EUC-JP") ++
      all(Seq("iso-8859-2", "latin2"), "ISO-8859-2") ++
      all(Seq("iso-8859-15", "latin9", "iso_8859-15"), "ISO-8859-15") ++
      all(Seq("windows-1250", "cp1250"), "windows-1250") ++
      all(Seq("windows-1251", "cp1251"), "windows-1251") ++
      all(Seq("koi8-r", "koi8_r", "koi8"), "KOI8-R") ++
      all(Seq("gbk", "gb2312", "gb_2312", "csgb2312", "x-gbk"), "GBK") ++
      all(Seq("big5", "big5-hkscs", "csbig5"), "Big5") ++
      all(Seq("euc-kr", "windows-949", "ks_c_5601-1987", "csksc56011987"),
        "EUC-KR") ++
      all(Seq("utf-16", "utf-16le", "unicodefeff"), "UTF-16LE") ++
      all(Seq("utf-16be"), "UTF-16BE")).toMap
  }

  /** Normalize a declared label to a JVM charset name, or null when the
    * label is unknown (verified-or-nothing: we do not guess). */
  def normalizeLabel(label: String): String = {
    if (label == null) return null
    val l = label.trim.toLowerCase
    Labels.getOrElse(l, null)
  }

  /** The `charset=` parameter of a Content-Type value, or null. */
  def headerCharset(contentType: String): String = {
    if (contentType == null) return null
    val lower = contentType.toLowerCase
    val i = lower.indexOf("charset")
    if (i < 0) return null
    var p = i + 7
    while (p < lower.length && (lower(p) == ' ' || lower(p) == '\t')) p += 1
    if (p >= lower.length || lower(p) != '=') return null
    p += 1
    while (p < lower.length && (lower(p) == ' ' || lower(p) == '\t')) p += 1
    if (p < lower.length && (lower(p) == '"' || lower(p) == '\'')) {
      val q = lower(p); p += 1
      val e = lower.indexOf(q, p)
      if (e < 0) return null
      lower.substring(p, e).trim match { case "" => null case s => s }
    } else {
      var e = p
      while (e < lower.length && lower(e) != ';' && lower(e) != ' ' &&
        lower(e) != '\t') e += 1
      lower.substring(p, e).trim match { case "" => null case s => s }
    }
  }

  /** The WHATWG-style `<meta>` prescan: case-insensitively find a
    * `charset=` inside the first 1024 bytes (tag-shape tolerant — real
    * pages carry every quoting variant), return the label or null.
    * ASCII-compatible encodings only, which is exactly the set whose
    * meta tags are byte-readable before the charset is known. */
  def metaCharset(body: Array[Byte]): String = {
    if (body == null) return null
    val n = math.min(body.length, 1024)
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = body(i) & 0xFF
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else if (c < 128) c.toChar else '\u0001') // non-ASCII: opaque
      i += 1
    }
    val s = sb.toString
    var from = 0
    while (true) {
      val mi = s.indexOf("charset", from)
      if (mi < 0) return null
      // must sit inside a meta tag: the nearest '<' before it opens
      // "<meta" (prescan-grade check, not a full HTML parse)
      val lt = s.lastIndexOf('<', mi)
      if (lt >= 0 && s.startsWith("<meta", lt)) {
        var p = mi + 7
        while (p < s.length && (s(p) == ' ' || s(p) == '\t')) p += 1
        if (p < s.length && s(p) == '=') {
          p += 1
          while (p < s.length && (s(p) == ' ' || s(p) == '\t')) p += 1
          if (p < s.length) {
            if (s(p) == '"' || s(p) == '\'') {
              val q = s(p); p += 1
              val e = s.indexOf(q, p)
              if (e > p) return s.substring(p, e).trim
            } else {
              var e = p
              while (e < s.length && s(e) != ';' && s(e) != '"' &&
                s(e) != '\'' && s(e) != ' ' && s(e) != '>' &&
                s(e) != '/') e += 1
              if (e > p) return s.substring(p, e).trim
            }
          }
        }
      }
      from = mi + 7
    }
    null
  }

  /** (jvmCharsetName, bomBytesToStrip) per the precedence ladder, or
    * null when a DECLARED label is unknown (fallback only fires when
    * nothing was declared at all). */
  def resolve(contentType: String, body: Array[Byte]): (String, Int) = {
    if (body == null) return null
    // 1. BOM
    if (body.length >= 3 && (body(0) & 0xFF) == 0xEF &&
      (body(1) & 0xFF) == 0xBB && (body(2) & 0xFF) == 0xBF)
      return ("UTF-8", 3)
    if (body.length >= 2 && (body(0) & 0xFF) == 0xFF &&
      (body(1) & 0xFF) == 0xFE) return ("UTF-16LE", 2)
    if (body.length >= 2 && (body(0) & 0xFF) == 0xFE &&
      (body(1) & 0xFF) == 0xFF) return ("UTF-16BE", 2)
    // 2. transport; 3. meta — a declared-but-unknown label NULLS
    val declared = headerCharset(contentType) match {
      case null => metaCharset(body)
      case h => h
    }
    if (declared != null) {
      val jvm = normalizeLabel(declared)
      if (jvm == null) return null
      return (jvm, 0)
    }
    // 4. browser default
    ("windows-1252", 0)
  }

  /** Strict decode: null on malformed/unmappable input (never
    * replacement chars — a page that lies about its charset drops). */
  def decode(body: Array[Byte], offset: Int, jvmName: String): String = {
    if (body == null) return null
    val cs = try java.nio.charset.Charset.forName(jvmName)
      catch { case _: RuntimeException => return null }
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(body, offset,
      body.length - offset)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** The full bridge: resolve + strip BOM + strict decode.
    * (resolvedLabel, text), or null. */
  def decodeAuto(contentType: String, body: Array[Byte]): (String, String) = {
    val r = resolve(contentType, body)
    if (r == null) return null
    val (jvm, bom) = r
    val text = decode(body, bom, jvm)
    if (text == null) return null
    (jvm, text)
  }
}

/** Charset-resolved text decode of an HTTP body: input (content_type
  * string, body binary) → struct(ok, charset, text, n_chars, cp_sum)
  * where cp_sum is the sum of Unicode code points (the oracle-friendly
  * exact statistic) and charset is the RESOLVED JVM name. ok=false on
  * unknown declared labels or bytes malformed under the resolved
  * charset (verified-or-nothing — no replacement characters, ever). */
case class CharsetTextDecode(contentType: Expression, body: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(contentType, body)
  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("charset", StringType),
    StructField("text", StringType),
    StructField("n_chars", LongType),
    StructField("cp_sum", LongType)))

  override def checkInputDataTypes(): TypeCheckResult =
    (contentType.dataType, body.dataType) match {
      case (StringType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"charset_text_decode requires (string, binary), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val ct = contentType.eval(input) match {
      case null => null
      case s => s.toString
    }
    val b = body.eval(input) match {
      case null => null
      case v => v.asInstanceOf[Array[Byte]]
    }
    val r = CharsetKernel.decodeAuto(ct, b)
    if (r == null) return InternalRow(false, null, null, null, null)
    val (cs, text) = r
    var cpSum = 0L
    var n = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      cpSum += cp
      n += 1
      i += Character.charCount(cp)
    }
    InternalRow(true, UTF8String.fromString(cs),
      UTF8String.fromString(text), n, cpSum)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CharsetTextDecode =
    CharsetTextDecode(newChildren(0), newChildren(1))

  override def prettyName: String = "charset_text_decode"
}

object CharsetTextDecode {
  def apply(contentType: Column, body: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(CharsetTextDecode(b.expression(contentType),
      b.expression(body)))
  }
}

/** WARC-with-charset-pages fixture: a REAL WARC of `response` records
  * whose payloads are REAL HTTP messages carrying NON-UTF-8 pages
  * under a documented per-record contract (i = record index, s = seed,
  * body length nCh = 12 + (s + 3·i) mod 9 alphabet chars, alphabet
  * index of char j: a(i,j) = (s·11 + i·7 + j·5) mod 8):
  *
  *   mode i%4 = 0 — ISO-8859-1 DECLARED ON THE HEADER
  *       (`text/html; charset=iso-8859-1`), body bytes 0xC0+a —
  *       Latin-1 uppercase accents, code points 192+a (the byte IS the
  *       code point; windows-1252 agrees on 0xA0–0xFF, so the WHATWG
  *       aliasing is value-neutral here by design);
  *   mode 1 — Shift_JIS declared by an in-body META tag
  *       (`<meta charset="shift_jis">`), body chars the katakana run
  *       0x83,0x40+a ↦ U+30A1+a (code points 12449+a);
  *   mode 2 — UTF-8 with a BOM and NO declaration anywhere; body chars
  *       CJK U+4E00+a (3-byte UTF-8), BOM stripped by the bridge;
  *   mode 3 — NO declaration at all → the windows-1252 fallback; body
  *       bytes from the 0x80–0x95 punctuation block via the fixed
  *       8-entry table (0x80,0x85,0x89,0x91,0x92,0x93,0x94,0x95) ↦
  *       (U+20AC,U+2026,U+2030,U+2018,U+2019,U+201C,U+201D,U+2022).
  *
  * Wire form alternates like [[WarcHttpEncode]] (i%3: identity /
  * chunked / gzip), so the gate proves the full WARC → HTTP → charset
  * chain; every mode's (n_chars, cp_sum) replays arithmetically in
  * DuckDB from the contract above (mode 1 adds the constant meta-tag
  * prefix: 26 ASCII chars summing to 2415). */
case class WarcCharsetEncode(seed: Expression, nRecords: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nRecords)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"warc_charset_encode requires 2 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, n) = vs.map(_.asInstanceOf[Long])
    if (n < 1 || n > 256) return null
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(
      str.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val w1252 = Array(0x80, 0x85, 0x89, 0x91, 0x92, 0x93, 0x94, 0x95)
    var i = 0
    while (i < n) {
      val nCh = (12 + (s + 3 * i) % 9).toInt
      def a(j: Int): Int = ((s * 11 + i * 7 + j * 5) % 8).toInt
      val bb = new java.io.ByteArrayOutputStream()
      val mode = i % 4
      var ct = "text/html"
      mode match {
        case 0 =>
          ct = "text/html; charset=iso-8859-1"
          var j = 0
          while (j < nCh) { bb.write(0xC0 + a(j)); j += 1 }
        case 1 =>
          bb.write("<meta charset=\"shift_jis\">".getBytes(
            java.nio.charset.StandardCharsets.US_ASCII))
          var j = 0
          while (j < nCh) { bb.write(0x83); bb.write(0x40 + a(j)); j += 1 }
        case 2 =>
          bb.write(0xEF); bb.write(0xBB); bb.write(0xBF)
          var j = 0
          while (j < nCh) {
            val cp = 0x4E00 + a(j)
            bb.write(new String(Character.toChars(cp)).getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            j += 1
          }
        case _ =>
          var j = 0
          while (j < nCh) { bb.write(w1252(a(j))); j += 1 }
      }
      val http = HttpKernel.encode(200, ct, bb.toByteArray,
        chunked = i % 3 == 1, gzipBody = i % 3 == 2)
      w("WARC/1.0\r\n")
      w("WARC-Type: response\r\n")
      w(s"WARC-Target-URI: http://cs-${s % 5}.example/p$i\r\n")
      w("WARC-Date: 2024-02-01T00:00:00Z\r\n")
      w(s"Content-Length: ${http.length}\r\n")
      w("\r\n")
      out.write(http, 0, http.length)
      w("\r\n\r\n")
      i += 1
    }
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WarcCharsetEncode =
    WarcCharsetEncode(newChildren(0), newChildren(1))

  override def prettyName: String = "warc_charset_encode"
}

object WarcCharsetEncode {
  def apply(seed: Column, nRecords: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(WarcCharsetEncode(b.expression(seed), b.expression(nRecords)))
  }
}

/** WARC-of-HTML-pages fixture: the END-TO-END web-extraction chain's
  * input — real WARC records of real HTTP messages whose bodies are
  * HTML pages in NON-UTF-8 charsets, so one gate exercises WARC walk →
  * de-chunk/gunzip → charset resolve → strict decode → HTML strip.
  * Per record i (seed s):
  *   mode i%2 = 0 — ISO-8859-1 declared on the Content-Type header;
  *              1 — Shift_JIS declared by an in-body meta tag;
  *   k     = 3 + (s + i) mod 4 body words, word j = "w" + d(j),
  *           d(j) = (s·5 + i·3 + j·7) mod 10
  *   nat   = 4 native chars, a(j) = (s·3 + i·11 + j) mod 8:
  *           mode 0 bytes 0xC0+a ↦ U+00C0+a; mode 1 SJIS 0x83,0x40+a
  *           ↦ U+30A1+a
  *   ent   = the r15 entity segment, ASCII in every charset:
  *           `&#{200+a5};&#x{hex(12449+a6)}; &copy;&hellip;
  *           &amp;#65; &#1114112;&#150;` with a5/a6 = a(5)/a(6) —
  *           decoding to chr(200+a5), chr(12449+a6), " ©… ", the
  *           LITERAL "&#65;" (double-encoding order), " ", U+FFFD
  *           (out-of-range ref, WHATWG) and U+2013 (C1 remap)
  *   page  = <html><head>[meta]<title>T</title></head><body>
  *           <p>words</p><!-- zap --><b>nat</b><i>ent</i></body></html>
  * so htmlStrip's clean text is EXACTLY
  * "T w.. w.. NNNN XY ©… &#65; �–" (single spaces, tags→space,
  * comment dropped) and n_chars = 3k + 21 replays arithmetically.
  * Wire forms cycle i mod 3 (identity / chunked / gzip) like every
  * WARC fixture. */
case class WarcHtmlEncode(seed: Expression, nRecords: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nRecords)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"warc_html_encode requires 2 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, n) = vs.map(_.asInstanceOf[Long])
    if (n < 1 || n > 256) return null
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(
      str.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    var i = 0
    while (i < n) {
      val mode = i % 2
      val k = (3 + (s + i) % 4).toInt
      val words = (0 until k).map(j =>
        "w" + ((s * 5 + i * 3 + j * 7) % 10)).mkString(" ")
      val bb = new java.io.ByteArrayOutputStream()
      bb.write(("<html><head>" +
        (if (mode == 1) "<meta charset=\"shift_jis\">" else "") +
        "<title>T</title></head><body><p>" + words +
        "</p><!-- zap --><b>").getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      var j = 0
      while (j < 4) {
        val a = ((s * 3 + i * 11 + j) % 8).toInt
        if (mode == 0) bb.write(0xC0 + a)
        else { bb.write(0x83); bb.write(0x40 + a) }
        j += 1
      }
      val a5 = ((s * 3 + i * 11 + 5) % 8).toInt
      val a6 = ((s * 3 + i * 11 + 6) % 8).toInt
      bb.write(("</b><i>&#" + (200 + a5) + ";&#x" +
        "%X".format(12449 + a6) + "; &copy;&hellip; &amp;#65; " +
        "&#1114112;&#150;</i></body></html>").getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      val ct = if (mode == 0) "text/html; charset=iso-8859-1"
        else "text/html"
      val http = HttpKernel.encode(200, ct, bb.toByteArray,
        chunked = i % 3 == 1, gzipBody = i % 3 == 2)
      w("WARC/1.0\r\n")
      w("WARC-Type: response\r\n")
      w(s"WARC-Target-URI: http://web-${s % 5}.example/p$i\r\n")
      w("WARC-Date: 2024-03-01T00:00:00Z\r\n")
      w(s"Content-Length: ${http.length}\r\n")
      w("\r\n")
      out.write(http, 0, http.length)
      w("\r\n\r\n")
      i += 1
    }
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WarcHtmlEncode =
    WarcHtmlEncode(newChildren(0), newChildren(1))

  override def prettyName: String = "warc_html_encode"
}

object WarcHtmlEncode {
  def apply(seed: Column, nRecords: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(WarcHtmlEncode(b.expression(seed), b.expression(nRecords)))
  }
}
