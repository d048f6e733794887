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
  * Filters (r15): `/FlateDecode`, `/LZWDecode` (MSB-first packing,
  * `/EarlyChange` honored, default 1), `/ASCII85Decode`,
  * `/ASCIIHexDecode` and `/RunLengthDecode` are decoded, singly or in
  * `/Filter [... ]` chains applied in array order. Streams whose
  * dicts declare filters we cannot verify (DCT, JPX, CCITT, JBIG2,
  * Crypt) or a `/Predictor` > 1 are SKIPPED (counted, contributing no
  * text), never guessed at.
  *
  * Fonts (r15): simple fonts map bytes through WinAnsiEncoding
  * (windows-1252; ASCII is identical under StandardEncoding).
  * Composite Type0/CID fonts are decoded through their embedded
  * `/ToUnicode` CMap when one exists: the linear walk indexes
  * objects, binds resource font names (`/Font << /F1 N 0 R >>`) to
  * font objects, decodes each font's CMap stream and parses the
  * `begincodespacerange` / `beginbfchar` / `beginbfrange` grammar —
  * dst hex is UTF-16BE (surrogate pairs supported), scalar bfrange
  * dsts increment the LAST byte (ranges that would carry past 0xFF
  * are skipped, as the spec forbids them). Inside a content stream
  * `/Fx … Tf` switches the active font; show strings under a CMap
  * font are consumed in src-width chunks and unmapped CIDs DROP
  * honestly (never a guessed glyph). Resource-name binding is GLOBAL
  * across the document (first binding wins) — per-page resource
  * scoping with inheritance is a documented simplification; Type0
  * fonts WITHOUT a ToUnicode CMap still contribute nothing.
  * Dirty bytes → null/ok=false, never a throw.
  *
  * No JVM second implementation exists (the JDK has no PDF reader), so
  * conformance is fixture-contract + our own writer round-trip — the
  * Mp3Codec bar — plus a HAND-TYPED literal PDF in the spec pinning
  * the absolute byte layout independent of [[PdfKernel.encode]], and a
  * hand-typed Type0+CMap PDF pinning the CID path independent of
  * [[PdfKernel.encodeCid]]. */
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

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val m = d.deflate(buf); d.end()
    java.util.Arrays.copyOf(buf, m)
  }

  // ----------------------------------------------------------------
  // stream filters beyond Flate (r15)
  // ----------------------------------------------------------------

  /** PDF LZW (ISO 32000 §7.4.4): MSB-first code packing, 9→12 bit
    * widths, CLEAR=256 / EOD=257, width bumps one code EARLY when
    * `early` = 1 (the default). Verified-or-nothing: a stream that
    * runs out before EOD, or references an impossible code, nulls. */
  private[ext] def lzwDecode(data: Array[Byte], early: Int): Array[Byte] = {
    if (data == null) return null
    val out = new java.io.ByteArrayOutputStream()
    val table = new java.util.ArrayList[Array[Byte]](4096)
    def resetTable(): Unit = {
      table.clear()
      var i = 0
      while (i < 256) { table.add(Array(i.toByte)); i += 1 }
      table.add(null); table.add(null) // 256 clear, 257 EOD
    }
    def widthFor(size: Int): Int =
      if (size + early <= 511) 9
      else if (size + early <= 1023) 10
      else if (size + early <= 2047) 11 else 12
    resetTable()
    var width = 9
    var acc = 0L
    var nb = 0
    var pos = 0
    var prev: Array[Byte] = null
    while (true) {
      while (nb < width && pos < data.length) {
        acc = (acc << 8) | (data(pos) & 0xFF); nb += 8; pos += 1
      }
      if (nb < width) return null // truncated before EOD
      val code = ((acc >> (nb - width)) & ((1 << width) - 1)).toInt
      nb -= width
      if (code == 257) return out.toByteArray
      else if (code == 256) { resetTable(); prev = null; width = 9 }
      else if (prev == null) {
        if (code >= 256) return null
        val e = table.get(code)
        out.write(e, 0, e.length)
        prev = e
      } else {
        var entry: Array[Byte] = null
        if (code < table.size) {
          val t = table.get(code)
          if (t == null) return null // 256/257 slots handled above
          entry = t
        } else if (code == table.size) { // KwKwK
          entry = java.util.Arrays.copyOf(prev, prev.length + 1)
          entry(prev.length) = prev(0)
        } else return null
        val add = java.util.Arrays.copyOf(prev, prev.length + 1)
        add(prev.length) = entry(0)
        if (table.size >= 4096) return null
        table.add(add)
        out.write(entry, 0, entry.length)
        if (out.size() > MaxDecoded) return null
        prev = entry
        width = widthFor(table.size)
      }
    }
    null
  }

  /** Greedy LZW encoder (fixture side), bit-exact against
    * [[lzwDecode]]'s width schedule: the decoder's table size before
    * reading the k-th data code after a CLEAR is 258 + max(0, k−2). */
  private[ext] def lzwEncode(data: Array[Byte], early: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nb = 0
    def put(code: Int, width: Int): Unit = {
      acc = (acc << width) | code; nb += width
      while (nb >= 8) { out.write(((acc >> (nb - 8)) & 0xFF).toInt); nb -= 8 }
    }
    def widthFor(size: Int): Int =
      if (size + early <= 511) 9
      else if (size + early <= 1023) 10
      else if (size + early <= 2047) 11 else 12
    val dict = new java.util.HashMap[String, Integer]()
    var next = 258
    var emitted = 0
    def decWidth(): Int = widthFor(258 + math.max(0, emitted - 1))
    def emitCode(c: Int): Unit = { put(c, decWidth()); emitted += 1 }
    def emitClear(): Unit = {
      put(256, decWidth()); dict.clear(); next = 258; emitted = 0
    }
    def codeOf(w: String): Int =
      if (w.length == 1) w.charAt(0).toInt else dict.get(w).intValue()
    emitClear()
    var w = ""
    var i = 0
    while (i < data.length) {
      val ch = (data(i) & 0xFF).toChar
      val wc = w + ch
      if (w.isEmpty) w = wc
      else if (dict.containsKey(wc)) w = wc
      else {
        emitCode(codeOf(w))
        dict.put(wc, next); next += 1
        if (next >= 4095) emitClear()
        w = ch.toString
      }
      i += 1
    }
    if (w.nonEmpty) emitCode(codeOf(w))
    put(257, decWidth())
    if (nb > 0) out.write(((acc << (8 - nb)) & 0xFF).toInt)
    out.toByteArray
  }

  /** ASCII85: whitespace skipped, `z` = four zero bytes (only between
    * groups), `~` (with or without the trailing `>`) or end-of-data
    * ends; a 5-char group > 2^32−1, a 1-char tail, or any other byte
    * nulls. */
  private[ext] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    if (data == null) return null
    val out = new java.io.ByteArrayOutputStream()
    val grp = new Array[Int](5)
    var g = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xFF
      if (c == '~') done = true
      else if (Character.isWhitespace(c)) i += 1
      else if (c == 'z' && g == 0) {
        out.write(0); out.write(0); out.write(0); out.write(0); i += 1
      } else if (c >= '!' && c <= 'u') {
        grp(g) = c - '!'; g += 1; i += 1
        if (g == 5) {
          var v = 0L
          var k = 0
          while (k < 5) { v = v * 85 + grp(k); k += 1 }
          if (v > 0xFFFFFFFFL) return null
          out.write(((v >> 24) & 0xFF).toInt)
          out.write(((v >> 16) & 0xFF).toInt)
          out.write(((v >> 8) & 0xFF).toInt)
          out.write((v & 0xFF).toInt)
          g = 0
          if (out.size() > MaxDecoded) return null
        }
      } else return null
    }
    if (g == 1) return null
    if (g >= 2) {
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < g) grp(k) else 84); k += 1 }
      if (v > 0xFFFFFFFFL) return null
      out.write(((v >> 24) & 0xFF).toInt)
      if (g >= 3) out.write(((v >> 16) & 0xFF).toInt)
      if (g >= 4) out.write(((v >> 8) & 0xFF).toInt)
    }
    out.toByteArray
  }

  /** Fixture-side ASCII85 encoder (no `z` shorthand, `~>` EOD). */
  private[ext] def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def group(v0: Long, keep: Int): Unit = {
      val cs = new Array[Byte](5)
      var x = v0
      var k = 4
      while (k >= 0) { cs(k) = ('!' + (x % 85)).toByte; x /= 85; k -= 1 }
      out.write(cs, 0, keep)
    }
    var i = 0
    while (i + 4 <= data.length) {
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (data(i + k) & 0xFF); k += 1 }
      group(v, 5)
      i += 4
    }
    val rem = data.length - i
    if (rem > 0) {
      var v = 0L
      var k = 0
      while (k < 4) {
        v = (v << 8) | (if (i + k < data.length) data(i + k) & 0xFF else 0)
        k += 1
      }
      group(v, rem + 1)
    }
    out.write('~'); out.write('>')
    out.toByteArray
  }

  private[ext] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    if (data == null) return null
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xFF
      if (c == '>') {
        if (hi >= 0) out.write(hi * 16)
        return out.toByteArray
      }
      val d = Character.digit(c, 16)
      if (d >= 0) {
        if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 }
        if (out.size() > MaxDecoded) return null
      } else if (!Character.isWhitespace(c)) return null
      i += 1
    }
    if (hi >= 0) out.write(hi * 16)
    out.toByteArray // missing '>' accepted: end-of-data closes
  }

  private[ext] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    if (data == null) return null
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xFF
      if (l == 128) return out.toByteArray
      if (l < 128) {
        if (i + 1 + l + 1 > data.length) return null
        out.write(data, i + 1, l + 1)
        i += l + 2
      } else {
        if (i + 1 >= data.length) return null
        var k = 257 - l
        val b = data(i + 1)
        while (k > 0) { out.write(b); k -= 1 }
        i += 2
      }
      if (out.size() > MaxDecoded) return null
    }
    null // spec requires the 128 EOD byte
  }

  // ----------------------------------------------------------------
  // dict parsing: filter chain, parms
  // ----------------------------------------------------------------

  private def isPdfWs(c: Char): Boolean =
    c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == '\f' || c == 0

  /** The `/Filter` entry as an array of names, in decode order.
    * Empty = no filter; null = malformed entry. */
  private[ext] def parseFilters(dict: String): Array[String] = {
    val fi = dict.indexOf("/Filter")
    if (fi < 0) return Array.empty
    var i = fi + 7
    while (i < dict.length && isPdfWs(dict.charAt(i))) i += 1
    def name(from: Int): (String, Int) = {
      var j = from + 1
      while (j < dict.length && (dict.charAt(j).isLetterOrDigit)) j += 1
      (dict.substring(from + 1, j), j)
    }
    if (i < dict.length && dict.charAt(i) == '/') {
      val (n, _) = name(i)
      Array(n)
    } else if (i < dict.length && dict.charAt(i) == '[') {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      i += 1
      var bad = false
      var open = true
      while (open && !bad && i < dict.length) {
        val c = dict.charAt(i)
        if (isPdfWs(c)) i += 1
        else if (c == ']') { open = false; i += 1 }
        else if (c == '/') { val (n, j) = name(i); out += n; i = j }
        else bad = true
      }
      if (bad || open) null else out.toArray
    } else null
  }

  private def intAfter(dict: String, key: String, dflt: Int): Int = {
    val ki = dict.indexOf(key)
    if (ki < 0) return dflt
    var i = ki + key.length
    while (i < dict.length && isPdfWs(dict.charAt(i))) i += 1
    var v = 0
    var digits = 0
    while (i < dict.length && dict.charAt(i).isDigit && digits < 9) {
      v = v * 10 + (dict.charAt(i) - '0'); i += 1; digits += 1
    }
    if (digits == 0) dflt else v
  }

  /** Decode one stream through its declared filter chain. Null when a
    * filter is unsupported/unverifiable or the data is corrupt —
    * caller counts it skipped. */
  private def decodeStream(b: Array[Byte], dstart: Int, dend: Int,
      dict: String): Array[Byte] = {
    if (dend < dstart) return null
    val filters = parseFilters(dict)
    if (filters == null) return null
    if (intAfter(dict, "/Predictor", 1) > 1) return null // not verified
    var data = java.util.Arrays.copyOfRange(b, dstart, dend)
    var fi = 0
    while (fi < filters.length && data != null) {
      filters(fi) match {
        case "FlateDecode" | "Fl" => data = inflate(data, 0, data.length)
        case "LZWDecode" | "LZW" =>
          data = lzwDecode(data, intAfter(dict, "/EarlyChange", 1))
        case "ASCII85Decode" | "A85" => data = ascii85Decode(data)
        case "ASCIIHexDecode" | "AHx" => data = asciiHexDecode(data)
        case "RunLengthDecode" | "RL" => data = runLengthDecode(data)
        case _ => return null // DCT/JPX/CCITT/JBIG2/Crypt: unverifiable
      }
      fi += 1
    }
    data
  }

  // ----------------------------------------------------------------
  // ToUnicode CMaps (r15)
  // ----------------------------------------------------------------

  private[ext] final case class Cmap(width: Int,
      map: java.util.HashMap[Integer, String])

  /** Next `<hex…>` inside [from, end) as raw bytes; null when absent
    * or malformed (odd digit count, > 32 bytes, non-hex junk). */
  private def nextHexBytes(d: Array[Byte], from: Int, end: Int)
      : (Array[Byte], Int) = {
    var i = from
    while (i < end && d(i) != '<') i += 1
    if (i >= end) return null
    i += 1
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    while (i < end) {
      val c = d(i) & 0xFF
      if (c == '>') {
        if (hi >= 0) return null // odd digit count in a CMap: reject
        return (out.toByteArray, i + 1)
      }
      val v = Character.digit(c, 16)
      if (v >= 0) {
        if (hi < 0) hi = v else { out.write(hi * 16 + v); hi = -1 }
        if (out.size() > 32) return null
      } else if (!Character.isWhitespace(c)) return null
      i += 1
    }
    null
  }

  private def hexInt(bytes: Array[Byte]): Int = {
    var v = 0
    var i = 0
    while (i < bytes.length) { v = (v << 8) | (bytes(i) & 0xFF); i += 1 }
    v
  }

  private def utf16(bytes: Array[Byte]): String =
    new String(bytes, java.nio.charset.StandardCharsets.UTF_16BE)

  /** Parse a decoded ToUnicode CMap: codespace width (1 or 2 bytes),
    * bfchar singles, bfrange runs (scalar dst = last-byte increment,
    * no carry past 0xFF; array dst = per-code). Null when no usable
    * entries survive. */
  private[ext] def parseCmap(d: Array[Byte]): Cmap = {
    if (d == null || d.length < 16) return null
    var width = -1
    val map = new java.util.HashMap[Integer, String]()
    val cs = indexOfAscii(d, "begincodespacerange", 0)
    if (cs >= 0) {
      val lo = nextHexBytes(d, cs + 19, d.length)
      if (lo != null && lo._1.length >= 1 && lo._1.length <= 2)
        width = lo._1.length
    }
    var p = 0
    while ({ p = indexOfAscii(d, "beginbfchar", p); p >= 0 }) {
      val blockEnd = indexOfAscii(d, "endbfchar", p)
      if (blockEnd < 0) return if (map.isEmpty) null else Cmap(width, map)
      var q = p + 11
      var fine = true
      while (fine && q < blockEnd) {
        val src = nextHexBytes(d, q, blockEnd)
        if (src == null) fine = false
        else {
          val dst = nextHexBytes(d, src._2, blockEnd)
          if (dst == null) fine = false
          else {
            if (width < 0 && src._1.length >= 1 && src._1.length <= 2)
              width = src._1.length
            if (src._1.length == width && map.size < 65536)
              map.put(hexInt(src._1), utf16(dst._1))
            q = dst._2
          }
        }
      }
      p = blockEnd + 9
    }
    p = 0
    while ({ p = indexOfAscii(d, "beginbfrange", p); p >= 0 }) {
      val blockEnd = indexOfAscii(d, "endbfrange", p)
      if (blockEnd < 0) return if (map.isEmpty) null else Cmap(width, map)
      var q = p + 12
      var fine = true
      while (fine && q < blockEnd) {
        val lo = nextHexBytes(d, q, blockEnd)
        if (lo == null) fine = false
        else {
          val hi = nextHexBytes(d, lo._2, blockEnd)
          if (hi == null) fine = false
          else {
            if (width < 0 && lo._1.length >= 1 && lo._1.length <= 2)
              width = lo._1.length
            val loV = hexInt(lo._1)
            val hiV = hexInt(hi._1)
            // dst: scalar <hex> or [ <hex> <hex> ... ]
            var i = hi._2
            while (i < blockEnd && Character.isWhitespace(d(i) & 0xFF)) i += 1
            if (i >= blockEnd) fine = false
            else if (d(i) == '[') {
              var k = 0
              var j = i + 1
              var closed = false
              while (!closed && j < blockEnd) {
                while (j < blockEnd &&
                  Character.isWhitespace(d(j) & 0xFF)) j += 1
                if (j < blockEnd && d(j) == ']') { closed = true; j += 1 }
                else if (j >= blockEnd || d(j) != '<') {
                  closed = true; fine = false // junk in array: stop
                } else {
                  val dst = nextHexBytes(d, j, blockEnd)
                  if (dst == null) { closed = true; fine = false }
                  else {
                    if (lo._1.length == width && loV + k <= hiV &&
                      map.size < 65536)
                      map.put(loV + k, utf16(dst._1))
                    k += 1
                    j = dst._2
                  }
                }
              }
              q = j
            } else if (d(i) != '<') fine = false // junk dst: stop block
            else {
              val dst = nextHexBytes(d, i, blockEnd)
              if (dst == null) fine = false
              else {
                if (lo._1.length == width && hi._1.length == width &&
                  hiV >= loV && hiV - loV <= 65535 && dst._1.nonEmpty) {
                  val lastIdx = dst._1.length - 1
                  val base = dst._1(lastIdx) & 0xFF
                  var k = 0
                  while (k <= hiV - loV && map.size < 65536) {
                    if (base + k <= 0xFF) { // spec: no carry across bytes
                      val bs = dst._1.clone()
                      bs(lastIdx) = (base + k).toByte
                      map.put(loV + k, utf16(bs))
                    }
                    k += 1
                  }
                }
                q = dst._2
              }
            }
          }
        }
      }
      p = blockEnd + 10
    }
    if (width < 1 || width > 2 || map.isEmpty) null else Cmap(width, map)
  }

  // ----------------------------------------------------------------
  // object index + font resolution (r15)
  // ----------------------------------------------------------------

  private final case class PObj(num: Int, dict: String,
      dataStart: Int, dataEnd: Int)

  /** Forward-balanced `<< … >>`; returns the index AFTER the closing
    * `>>`, or -1. Bounded to 1 MiB of dict. */
  private def matchDict(b: Array[Byte], start: Int): Int = {
    var depth = 0
    var i = start
    val limit = math.min(b.length, start + (1 << 20))
    while (i + 1 < limit) {
      if (b(i) == '<' && b(i + 1) == '<') { depth += 1; i += 2 }
      else if (b(i) == '>' && b(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return i
      } else i += 1
    }
    -1
  }

  /** Linear `N G obj` index (no xref): object number, dict text, and
    * the stream data range when one follows. Stream bodies are
    * jumped, not scanned. Bounded at 1024 objects. */
  private def indexObjects(b: Array[Byte]): java.util.ArrayList[PObj] = {
    val out = new java.util.ArrayList[PObj]()
    var pos = 0
    while (out.size < 1024) {
      val oi = indexOfAscii(b, "obj", pos)
      if (oi < 0) return out
      var nextPos = oi + 3
      // token boundary after
      val okAfter = oi + 3 >= b.length || {
        val c = b(oi + 3) & 0xFF
        c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == '<' ||
          c == '[' || c == '/' || c == '(' || c == '%'
      }
      // walk back: ws, gen digits, ws, num digits
      var k = oi - 1
      while (k >= 0 && (b(k) == ' ' || b(k) == '\r' || b(k) == '\n' ||
        b(k) == '\t')) k -= 1
      val genEnd = k
      while (k >= 0 && b(k) >= '0' && b(k) <= '9') k -= 1
      val genOk = k < genEnd
      while (genOk && k >= 0 && (b(k) == ' ' || b(k) == '\r' ||
        b(k) == '\n' || b(k) == '\t')) k -= 1
      val numEnd = k
      while (k >= 0 && b(k) >= '0' && b(k) <= '9') k -= 1
      val numOk = genOk && k < numEnd && numEnd - k <= 9
      if (okAfter && numOk) {
        var num = 0
        var t = k + 1
        while (t <= numEnd) { num = num * 10 + (b(t) - '0'); t += 1 }
        var p = oi + 3
        while (p < b.length && (b(p) == ' ' || b(p) == '\r' ||
          b(p) == '\n' || b(p) == '\t')) p += 1
        var dict = ""
        var dataStart = -1
        var dataEnd = -1
        if (p + 1 < b.length && b(p) == '<' && b(p + 1) == '<') {
          val de = matchDict(b, p)
          if (de > 0) {
            dict = new String(b, p, de - p,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            var q = de
            while (q < b.length && (b(q) == ' ' || b(q) == '\r' ||
              b(q) == '\n' || b(q) == '\t')) q += 1
            if (startsWithAscii(b, "stream", q) &&
              !startsWithAscii(b, "endstream", q)) {
              var ds = q + 6
              if (ds < b.length && b(ds) == '\r') ds += 1
              if (ds < b.length && b(ds) == '\n') ds += 1
              val ei = indexOfAscii(b, "endstream", ds)
              if (ei >= 0) {
                var dend = ei
                if (dend > ds && b(dend - 1) == '\n') dend -= 1
                if (dend > ds && b(dend - 1) == '\r') dend -= 1
                dataStart = ds
                dataEnd = dend
                nextPos = ei + 9 // jump the binary body
              }
            }
          }
        }
        out.add(PObj(num, dict, dataStart, dataEnd))
      }
      pos = nextPos
    }
    out
  }

  /** Parse `/Key N G R` → N, or -1. */
  private def refAfter(dict: String, key: String): Int = {
    val ki = dict.indexOf(key)
    if (ki < 0) return -1
    var i = ki + key.length
    while (i < dict.length && isPdfWs(dict.charAt(i))) i += 1
    var v = 0
    var digits = 0
    while (i < dict.length && dict.charAt(i).isDigit && digits < 9) {
      v = v * 10 + (dict.charAt(i) - '0'); i += 1; digits += 1
    }
    if (digits == 0) -1 else v
  }

  /** Bind resource font names to ToUnicode CMaps: every
    * `/Font << /Name N 0 R … >>` block in any dict contributes
    * (first binding per name wins); a bound font object whose dict
    * carries `/ToUnicode M 0 R` gets M's stream decoded and parsed. */
  private def resolveFonts(b: Array[Byte],
      objs: java.util.ArrayList[PObj])
      : java.util.HashMap[String, Cmap] = {
    val fonts = new java.util.HashMap[String, Cmap]()
    val byNum = new java.util.HashMap[Integer, PObj]()
    var i = 0
    while (i < objs.size) {
      val o = objs.get(i)
      if (!byNum.containsKey(o.num)) byNum.put(o.num, o)
      i += 1
    }
    // name -> font obj num, from /Font << ... >> blocks
    val nameToFont = new java.util.HashMap[String, Integer]()
    i = 0
    while (i < objs.size) {
      val dict = objs.get(i).dict
      var fi = dict.indexOf("/Font")
      while (fi >= 0) {
        var p = fi + 5
        while (p < dict.length && isPdfWs(dict.charAt(p))) p += 1
        if (p + 1 < dict.length && dict.charAt(p) == '<' &&
          dict.charAt(p + 1) == '<') {
          // balanced inner block
          var depth = 0
          var q = p
          var endQ = -1
          while (endQ < 0 && q + 1 < dict.length) {
            if (dict.charAt(q) == '<' && dict.charAt(q + 1) == '<') {
              depth += 1; q += 2
            } else if (dict.charAt(q) == '>' && dict.charAt(q + 1) == '>') {
              depth -= 1; q += 2
              if (depth == 0) endQ = q
            } else q += 1
          }
          if (endQ > 0) {
            val inner = dict.substring(p + 2, endQ - 2)
            // pair walk: /Name num gen R  (inline dict values skipped)
            var j = 0
            while (j < inner.length) {
              if (inner.charAt(j) == '/') {
                var e = j + 1
                while (e < inner.length && !isPdfWs(inner.charAt(e)) &&
                  inner.charAt(e) != '/' && inner.charAt(e) != '<' &&
                  inner.charAt(e) != '[' && inner.charAt(e) != '(' &&
                  inner.charAt(e) != '>') e += 1
                val nm = inner.substring(j + 1, e)
                var v = e
                while (v < inner.length && isPdfWs(inner.charAt(v))) v += 1
                var num = 0
                var digits = 0
                while (v < inner.length && inner.charAt(v).isDigit &&
                  digits < 9) {
                  num = num * 10 + (inner.charAt(v) - '0'); v += 1
                  digits += 1
                }
                if (digits > 0 && nm.nonEmpty &&
                  !nameToFont.containsKey(nm)) {
                  // require "... gen R" shape to call it a ref
                  var v2 = v
                  while (v2 < inner.length && isPdfWs(inner.charAt(v2)))
                    v2 += 1
                  var d2 = 0
                  while (v2 < inner.length && inner.charAt(v2).isDigit) {
                    v2 += 1; d2 += 1
                  }
                  while (v2 < inner.length && isPdfWs(inner.charAt(v2)))
                    v2 += 1
                  if (d2 > 0 && v2 < inner.length &&
                    inner.charAt(v2) == 'R') nameToFont.put(nm, num)
                }
                j = e
              } else j += 1
            }
          }
        }
        fi = dict.indexOf("/Font", fi + 5)
      }
      i += 1
    }
    // name -> cmap
    val it = nameToFont.entrySet().iterator()
    var resolved = 0
    while (it.hasNext && resolved < 64) {
      val e = it.next()
      val fo = byNum.get(e.getValue)
      if (fo != null) {
        val cm = refAfter(fo.dict, "/ToUnicode")
        if (cm >= 0) {
          val co = byNum.get(cm)
          if (co != null && co.dataStart >= 0) {
            val data = decodeStream(b, co.dataStart, co.dataEnd, co.dict)
            val cmap = parseCmap(data)
            if (cmap != null) { fonts.put(e.getKey, cmap); resolved += 1 }
          }
        }
      }
    }
    fonts
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
    * single pass collecting RAW string operands, emitting on Tj / ' /
    * " / TJ through the active font's decoding — WinAnsi bytes for
    * simple fonts, src-width CID chunks through the ToUnicode CMap
    * after `/Fx … Tf` selects a composite font (unmapped CIDs drop).
    * Returns text (possibly empty); never throws. */
  private def streamText(c: Array[Byte],
      fonts: java.util.HashMap[String, Cmap]): String = {
    val out = new java.lang.StringBuilder()
    var pending: java.util.ArrayList[Array[Byte]] = null // inside [ ]
    var last: Array[Byte] = null
    var cur: Cmap = null
    var lastName: String = null
    var i = 0
    val n = c.length
    def emit(bs: Array[Byte]): Unit = if (bs != null) {
      if (cur == null) {
        var k = 0
        while (k < bs.length) {
          val ch = winAnsi(bs(k) & 0xFF)
          if (ch != 0) out.append(ch)
          k += 1
        }
      } else {
        val w = cur.width
        var k = 0
        while (k + w <= bs.length) {
          var code = 0
          var t = 0
          while (t < w) { code = (code << 8) | (bs(k + t) & 0xFF); t += 1 }
          val s = cur.map.get(code)
          if (s != null) out.append(s) // unmapped CIDs drop honestly
          k += w
        }
      }
    }
    while (i < n) {
      val ch = c(i) & 0xFF
      if (ch == '%') { // comment to EOL
        while (i < n && c(i) != '\n' && c(i) != '\r') i += 1
      } else if (ch == '(') { // literal string → raw bytes
        val sb = new java.io.ByteArrayOutputStream()
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val b = c(i) & 0xFF
          if (b == '\\' && i + 1 < n) {
            val e = c(i + 1) & 0xFF
            e match {
              case 'n' => sb.write('\n'); i += 2
              case 'r' => sb.write('\r'); i += 2
              case 't' => sb.write('\t'); i += 2
              case 'b' => sb.write('\b'); i += 2
              case 'f' => sb.write('\f'); i += 2
              case '(' => sb.write('('); i += 2
              case ')' => sb.write(')'); i += 2
              case '\\' => sb.write('\\'); i += 2
              case '\r' => // line continuation (\r or \r\n)
                i += 2; if (i < n && c(i) == '\n') i += 1
              case '\n' => i += 2
              case d if d >= '0' && d <= '7' => // octal, up to 3 digits
                var v = 0
                var k = 0
                i += 1
                while (k < 3 && i < n && c(i) >= '0' && c(i) <= '7') {
                  v = v * 8 + (c(i) - '0'); i += 1; k += 1
                }
                sb.write(v & 0xFF)
              case _ => sb.write(e); i += 2
            }
          } else if (b == '(') { depth += 1; sb.write('('); i += 1 }
          else if (b == ')') {
            depth -= 1; if (depth > 0) sb.write(')'); i += 1
          } else { sb.write(b); i += 1 }
        }
        if (depth != 0) return out.toString // truncated string: stop
        last = sb.toByteArray
        if (pending != null) pending.add(last)
      } else if (ch == '<' && i + 1 < n && (c(i + 1) & 0xFF) != '<') {
        // hex string → raw bytes
        val sb = new java.io.ByteArrayOutputStream()
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
              else { sb.write(hi * 16 + d); hi = -1 }
            } else if (!Character.isWhitespace(b)) return out.toString
            i += 1
          }
        }
        if (!closed) return out.toString
        if (hi >= 0) sb.write(hi * 16) // odd count: pad 0
        last = sb.toByteArray
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
          case "Tf" => // font switch: /Name size Tf
            cur = if (lastName != null) fonts.get(lastName) else null
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
      } else if (ch == '/') { // name token — captured for Tf
        val st = i + 1
        i += 1
        while (i < n && !Character.isWhitespace(c(i) & 0xFF) &&
          (c(i) & 0xFF) != '(' && (c(i) & 0xFF) != '[' &&
          (c(i) & 0xFF) != '<' && (c(i) & 0xFF) != '/' &&
          (c(i) & 0xFF) != ']') i += 1
        lastName = new String(c, st, i - st,
          java.nio.charset.StandardCharsets.US_ASCII)
      } else i += 1
      if (out.length() > MaxDecoded) return out.toString
    }
    out.toString
  }

  /** Bounded match of `pat` at exactly `at` — O(|pat|). The census
    * must use this, not `indexOfAscii(..) == at`: the latter scans to
    * the NEXT occurrence anywhere (whole remaining buffer when
    * absent), turning a PDF stuffed with `/Type` tokens into O(n²)
    * CPU per row. */
  private def startsWithAscii(b: Array[Byte], pat: String, at: Int): Boolean = {
    if (at < 0 || at + pat.length > b.length) return false
    var k = 0
    while (k < pat.length) {
      if (b(at + k) != pat.charAt(k).toByte) return false
      k += 1
    }
    true
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
      if (startsWithAscii(b, "/Page", q) &&
        (q + 5 >= b.length || (b(q + 5) & 0xFF) != 's')) nPages += 1
      p += 5
    }
    // fonts: linear object index → resource-name → ToUnicode CMaps
    val fonts = resolveFonts(b, indexObjects(b))
    // stream walk: dict between the enclosing << >> before 'stream'
    var nStreams = 0
    var nText = 0
    var nSkipped = 0
    val text = new java.lang.StringBuilder()
    var pos = 0
    var guard = 0
    while (guard < maxStreams) {
      val si = indexOfAscii(b, "stream", pos)
      if (si < 0) {
        return Pdf(nPages, nStreams, nText, nSkipped, text.toString)
      }
      // must be the keyword, not 'endstream'
      val isEnd = si >= 3 && startsWithAscii(b, "endstream", si - 3)
      if (isEnd) { pos = si + 6 }
      else {
        nStreams += 1
        // dict: nearest '<<' before si, matched to its '>>'
        var ds = -1
        var k = si - 1
        var depth = 0
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
        val data = decodeStream(b, dstart, dend, dict)
        if (data == null) nSkipped += 1
        else {
          val t = streamText(data, fonts)
          if (t.nonEmpty) {
            nText += 1
            text.append(t)
            if (text.length() > MaxDecoded)
              return Pdf(nPages, nStreams, nText, nSkipped,
                text.toString)
          }
        }
        pos = ei + 9
      }
      guard += 1
    }
    Pdf(nPages, nStreams, nText, nSkipped, text.toString)
  }

  /** Encode a REAL multi-page PDF (valid xref + trailer — openable by
    * any reader): one content stream per page with the filter cycling
    * p mod 4 = Flate / raw / LZW / [ASCII85 of Flate] (all four decode
    * paths exercised), Helvetica simple font. Per page p the content
    * shows, in order: `nw` words `t<digit>` Tj'd with space
    * separators, the constant ` x(y)z` (escaped parens) via `'`, a TJ
    * array [(ab) kern (cd)], and a hex string of the two ASCII digits
    * of (seed+p) mod 100 — the documented oracle contract. */
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
      val (data, filter) = (p % 4) match {
        case 0 => (deflate(raw), " /Filter /FlateDecode")
        case 1 => (raw, "")
        case 2 => (lzwEncode(raw), " /Filter /LZWDecode")
        case _ => (ascii85Encode(deflate(raw)),
          " /Filter [/ASCII85Decode /FlateDecode]")
      }
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

  /** Encode a Type0/Identity-H PDF whose text rides 2-byte CIDs
    * through a Flate'd ToUnicode CMap — the modern Word/LaTeX/browser
    * shape. Per page p (seed s):
    *   k      = 3 + (s + p) mod 4 letters, d(j) = (s·7+p·5+j·3) mod 10
    *   word   = CIDs 0x0100+d(j) → 'a'+d(j) via bfrange
    *   kana   = CIDs 0x0200+a → U+30A2+a via bfrange,
    *            a = (s+3p) mod 8, b = (s+3p+5) mod 8
    *   emoji  = CID 0x0300 → U+1F600 (bfchar, surrogate pair) and CID
    *            0x0310+(p mod 4) → U+1F600+(p mod 4) (bfrange whose
    *            scalar dst increments the LOW surrogate's last byte)
    *   space  = CID 0x0020 → U+0020 (bfchar)
    *   CID 0x0FFF is shown but UNMAPPED — it must drop, not guess
    * so page text is EXACTLY word ⊔ kana(a) ⊔ kana(b) ⊕ emoji ⊕
    * emoji(p) (⊔ = space, ⊕ = abut), n_chars = k + 6 per page. */
  def encodeCid(seed: Long, nPages: Int): Array[Byte] = {
    require(nPages >= 1 && nPages <= 64, s"bad nPages $nPages")
    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def w(s: String): Unit = out.write(
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    def beginObj(id: Int): Unit = { offsets += out.size(); w(s"$id 0 obj\n") }
    val fontObj = 3 + 2 * nPages
    val cmapObj = 4 + 2 * nPages
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    w("<< /Type /Pages /Kids [" +
      (0 until nPages).map(p => s"${3 + p} 0 R").mkString(" ") +
      s"] /Count $nPages >>\nendobj\n")
    for (p <- 0 until nPages) {
      beginObj(3 + p)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents ${3 + nPages + p} 0 R " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> >>\n" +
        "endobj\n")
    }
    def hex4(v: Int): String = f"$v%04X"
    for (p <- 0 until nPages) {
      val k = 3 + ((seed + p) % 4).toInt
      val a = ((seed + 3 * p) % 8).toInt
      val bb = ((seed + 3 * p + 5) % 8).toInt
      val sb = new java.lang.StringBuilder()
      sb.append("BT /F1 12 Tf 72 720 Td\n")
      sb.append("<")
      for (j <- 0 until k)
        sb.append(hex4(0x0100 + ((seed * 7 + p * 5 + j * 3) % 10).toInt))
      sb.append("> Tj\n")
      sb.append("<0020> Tj\n")
      sb.append(s"[<${hex4(0x0200 + a)}> -120 <0020> <${hex4(0x0200 + bb)}>]" +
        " TJ\n")
      sb.append("<0300> Tj\n")
      sb.append(s"<${hex4(0x0310 + p % 4)}> Tj\n")
      sb.append("<0FFF> Tj\nET") // unmapped: must drop
      val raw = sb.toString.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val (data, filter) =
        if (p % 2 == 0) (deflate(raw), " /Filter /FlateDecode")
        else (raw, "")
      beginObj(3 + nPages + p)
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }
    beginObj(fontObj)
    w("<< /Type /Font /Subtype /Type0 /BaseFont /GraftSynth " +
      "/Encoding /Identity-H /DescendantFonts [<< /Type /Font " +
      "/Subtype /CIDFontType2 /BaseFont /GraftSynth /CIDSystemInfo " +
      "<< /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> " +
      s"/CIDToGIDMap /Identity >>] /ToUnicode $cmapObj 0 R >>\nendobj\n")
    val cmap = ("/CIDInit /ProcSet findresource begin\n" +
      "12 dict begin\nbegincmap\n" +
      "/CMapName /GraftSynth-UCS def\n/CMapType 2 def\n" +
      "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
      "2 beginbfchar\n<0020> <0020>\n<0300> <D83DDE00>\nendbfchar\n" +
      "3 beginbfrange\n<0100> <0109> <0061>\n<0200> <0207> <30A2>\n" +
      "<0310> <0313> <D83DDE00>\nendbfrange\n" +
      "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val cdata = deflate(cmap)
    beginObj(cmapObj)
    w(s"<< /Length ${cdata.length} /Filter /FlateDecode >>\nstream\n")
    out.write(cdata, 0, cdata.length)
    w("\nendstream\nendobj\n")
    val xref = out.size()
    val total = cmapObj + 1
    w(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $total /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }
}

/** PDF text layer of a binary column: (ok, n_pages, n_streams,
  * n_text_streams, n_skipped_streams, n_chars, ascii_sum, text) —
  * filter chains undone (Flate/LZW/A85/AHx/RL), Tj / ' / " / TJ show
  * strings concatenated in stream order under WinAnsi or, for Type0
  * fonts with an embedded ToUnicode CMap, 2-byte CID decode. ok=false
  * (null fields) on non-PDF bytes. */
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

/** Deterministic Type0/CID PDF fixture column
  * ([[PdfKernel.encodeCid]]'s documented per-page contract). */
case class PdfCidEncode(seed: Expression, nPages: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nPages)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pdf_cid_encode requires 2 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, n) = vs.map(_.asInstanceOf[Long])
    if (n < 1 || n > 64) return null
    PdfKernel.encodeCid(s, n.toInt)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PdfCidEncode =
    PdfCidEncode(newChildren(0), newChildren(1))

  override def prettyName: String = "pdf_cid_encode"
}

object PdfCidEncode {
  def apply(seed: Column, nPages: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(PdfCidEncode(b.expression(seed), b.expression(nPages)))
  }
}
