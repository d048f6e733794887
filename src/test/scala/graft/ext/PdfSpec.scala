package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PDF text-layer extraction: absolute layout pinned by a HAND-TYPED
  * minimal PDF (independent of our writer — the cancel-transform
  * trap), the [[PdfKernel.encode]] round trip against its documented
  * per-page contract, operator/escape coverage, and the hostile-bytes
  * contract. */
class PdfSpec extends SparkTestBase {

  private def bytes(s: String) = s.getBytes("ISO-8859-1")

  test("hand-typed literal PDF: pages counted, raw stream walked, " +
      "escapes/octal/hex/TJ/quote operators extracted in order") {
    val pdf = bytes(
      "%PDF-1.4\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n" +
        "endobj\n" +
        "4 0 obj\n<< /Length 62 >>\nstream\n" +
        "BT (Hello\\040World) Tj [(A) -2 (B)] TJ <4869> Tj (q\\(x\\)) ' ET\n" +
        "endstream\nendobj\n%%EOF\n")
    val r = PdfKernel.parse(pdf)
    assert(r != null)
    assert(r.nPages == 1, s"nPages=${r.nPages}") // /Pages did NOT count
    assert(r.nStreams == 1 && r.nTextStreams == 1 && r.nSkippedStreams == 0)
    assert(r.text == "Hello WorldABHiq(x)", s"text=${r.text}")
  }

  test("escape and string-form coverage: nesting, continuations, " +
      "newline escapes, odd hex, comments") {
    def textOf(content: String): String = {
      val c = bytes(content)
      val pdf = bytes("%PDF-1.4\n1 0 obj\n<< /Length " + c.length +
        " >>\nstream\n") ++ c ++ bytes("\nendstream\nendobj\n%%EOF\n")
      val r = PdfKernel.parse(pdf)
      assert(r != null); r.text
    }
    // balanced nested parens inside a literal need no escapes (spec)
    assert(textOf("(a(b)c) Tj") == "a(b)c")
    // line continuation: backslash-EOL vanishes
    assert(textOf("(ab\\\ncd) Tj") == "abcd")
    // \n \t \r escapes land as the control chars
    assert(textOf("(x\\ny) Tj") == "x\ny")
    // odd-length hex pads a trailing zero nibble: <4> = 0x40 = @
    assert(textOf("<4> Tj") == "@")
    // % comment hides a (string) Tj to end-of-line
    assert(textOf("% (zap) Tj\n(kept) Tj") == "kept")
    // the double-quote operator shows its string operand
    assert(textOf("1 2 (dq) \" (tj) Tj") == "dqtj")
    // strings bound to NO show operator emit nothing
    assert(textOf("(orphan) 1 0 Td (shown) Tj") == "shown")
    // TJ kern numbers are invisible; strings concatenate
    assert(textOf("[(a) 120 (b) -3.5 (c)] TJ") == "abc")
  }

  test("filter codecs: LZW round trips (width growth, both " +
      "EarlyChange values), ASCII85/Hex/RunLength hand vectors") {
    // LZW: enough distinct material to push the table past 511 and
    // 1023 entries so the 9->10->11 bit transitions are exercised
    val big = Array.tabulate[Byte](9000)(i =>
      ((i * 31 + (i * i) % 251) % 256).toByte)
    for (early <- Seq(0, 1)) {
      val enc = PdfKernel.lzwEncode(big, early)
      val dec = PdfKernel.lzwDecode(enc, early)
      assert(dec != null && dec.toSeq == big.toSeq, s"early=$early")
    }
    // the two EarlyChange schedules genuinely differ on that stream
    assert(PdfKernel.lzwDecode(PdfKernel.lzwEncode(big, 1), 0) == null ||
      PdfKernel.lzwDecode(PdfKernel.lzwEncode(big, 1), 0)
        .toSeq != big.toSeq)
    // truncation (no EOD) and impossible codes null
    val enc1 = PdfKernel.lzwEncode(big, 1)
    assert(PdfKernel.lzwDecode(
      java.util.Arrays.copyOf(enc1, enc1.length / 2), 1) == null)
    // ASCII85: hand vector — 'h' = base85 [33,36,14,2,19] -> "BE"
    assert(PdfKernel.ascii85Decode(bytes("BE~>")).toSeq ==
      Seq('h'.toByte))
    assert(PdfKernel.ascii85Decode(bytes("z~>")).toSeq ==
      Seq[Byte](0, 0, 0, 0))
    assert(PdfKernel.ascii85Encode(bytes("h")).toSeq ==
      bytes("BE~>").toSeq)
    val data = Array.tabulate[Byte](117)(i => ((i * 7) % 256).toByte)
    assert(PdfKernel.ascii85Decode(
      PdfKernel.ascii85Encode(data)).toSeq == data.toSeq)
    assert(PdfKernel.ascii85Decode(bytes("B~>")) == null) // 1-char tail
    assert(PdfKernel.ascii85Decode(bytes("uuuuu~>")) == null) // > 2^32
    // ASCIIHex
    assert(new String(PdfKernel.asciiHexDecode(
      bytes("48 65 6C\n6c 6F>")), "ISO-8859-1") == "Hello")
    assert(new String(PdfKernel.asciiHexDecode(bytes("414>")),
      "ISO-8859-1") == "A@") // odd digit pads low nibble 0
    assert(PdfKernel.asciiHexDecode(bytes("4G>")) == null)
    // RunLength: literal run of 3, repeat 'x' 5 times, EOD
    val rl = Array[Byte](2, 'a', 'b', 'c', (256 - 4).toByte, 'x',
      128.toByte)
    assert(new String(PdfKernel.runLengthDecode(rl), "ISO-8859-1") ==
      "abcxxxxx")
    assert(PdfKernel.runLengthDecode(Array[Byte](5, 'a')) == null)
  }

  test("hand-typed Type0/CID PDF (no xref): bfchar, bfrange scalar " +
      "increment, surrogate carry, Tf font switching, unmapped drop") {
    val cmap =
      "begincodespacerange <0000> <FFFF> endcodespacerange\n" +
        "2 beginbfchar\n<0041> <0058>\n<0050> <D83DDE01>\nendbfchar\n" +
        "1 beginbfrange\n<0042> <0044> <0059>\nendbfrange\n" +
        "1 beginbfrange\n<0060> <0063> <D83DDE00>\nendbfrange\n"
    val content =
      "BT /F1 12 Tf\n<00410042> Tj\n<0050> Tj\n<0100> Tj\n" +
        "[<0041> -100 <0042>] TJ\n/F2 10 Tf\n(hi) Tj\n/F1 12 Tf\n" +
        "<0062> Tj\nET"
    val pdf = bytes(
      "%PDF-1.4\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/Resources << /Font << /F1 5 0 R /F2 8 0 R >> >> >>\nendobj\n" +
        s"4 0 obj\n<< /Length ${content.length} >>\nstream\n" +
        content + "\nendstream\nendobj\n" +
        "5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /X " +
        "/Encoding /Identity-H /ToUnicode 6 0 R >>\nendobj\n" +
        s"6 0 obj\n<< /Length ${cmap.length} >>\nstream\n" +
        cmap + "\nendstream\nendobj\n" +
        "8 0 obj\n<< /Type /Font /Subtype /Type1 " +
        "/BaseFont /Helvetica >>\nendobj\n%%EOF\n")
    val r = PdfKernel.parse(pdf)
    assert(r != null && r.nPages == 1)
    assert(r.nStreams == 2 && r.nTextStreams == 1 &&
      r.nSkippedStreams == 0)
    // <00410042>=XY, <0050>=U+1F601, <0100> drops, TJ=XY, (hi) under
    // the SIMPLE font, <0062> back under CID = U+1F602 (carry +2 on
    // the low surrogate's last byte)
    val exp = "XY" + new String(Character.toChars(0x1F601)) + "XY" +
      "hi" + new String(Character.toChars(0x1F602))
    assert(r.text == exp, s"text=${r.text}")
  }

  test("parseCmap edges: carry past 0xFF skipped, array-form " +
      "bfrange, junk rejection") {
    def cm(s: String) = PdfKernel.parseCmap(bytes(s))
    val carry = cm("1 beginbfrange\n<0070> <0072> <00FE>\nendbfrange\n")
    assert(carry != null && carry.width == 2)
    assert(carry.map.get(0x70) == "þ" && carry.map.get(0x71) ==
      "ÿ")
    assert(carry.map.get(0x72) == null) // FE+2 would carry: skipped
    val arr = cm("1 beginbfrange\n<0080> <0081> [<0041> <00420043>]\n" +
      "endbfrange\n")
    assert(arr != null && arr.map.get(0x80) == "A" &&
      arr.map.get(0x81) == "BC")
    assert(cm("garbage with no blocks") == null)
    assert(cm("1 beginbfchar\n<0041>\nendbfchar\n") == null) // no dst
  }

  test("encodeCid -> parse round trip matches the documented " +
      "per-page contract (Type0 text incl. kana + emoji)") {
    for (seed <- Seq(0L, 5L, 16L); nPages <- Seq(1, 3, 4)) {
      val r = PdfKernel.parse(PdfKernel.encodeCid(seed, nPages))
      assert(r != null, s"seed=$seed n=$nPages")
      assert(r.nPages == nPages)
      assert(r.nStreams == nPages + 1, s"streams=${r.nStreams}")
      assert(r.nTextStreams == nPages && r.nSkippedStreams == 0)
      val expect = (0 until nPages).map { p =>
        val k = 3 + ((seed + p) % 4).toInt
        val word = (0 until k).map(j =>
          ('a' + ((seed * 7 + p * 5 + j * 3) % 10).toInt).toChar)
          .mkString
        val a = ((seed + 3 * p) % 8).toInt
        val b = ((seed + 3 * p + 5) % 8).toInt
        word + " " + (0x30A2 + a).toChar + " " + (0x30A2 + b).toChar +
          new String(Character.toChars(0x1F600)) +
          new String(Character.toChars(0x1F600 + p % 4))
      }.mkString
      assert(r.text == expect, s"seed=$seed n=$nPages\n${r.text}\n$expect")
    }
  }

  test("DecodeParms honored and unsupported shapes skipped: " +
      "EarlyChange 0 LZW decodes, Predictor > 1 skips") {
    val body = "(ok) Tj"
    def mini(dict: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(bytes(s"%PDF-1.4\n1 0 obj\n$dict\nstream\n"))
      out.write(data)
      out.write(bytes("\nendstream\nendobj\n%%EOF\n"))
      out.toByteArray
    }
    val e0 = mini("<< /Filter /LZWDecode /DecodeParms " +
      "<< /EarlyChange 0 >> >>", PdfKernel.lzwEncode(bytes(body), 0))
    val r0 = PdfKernel.parse(e0)
    assert(r0 != null && r0.text == "ok" && r0.nSkippedStreams == 0)
    // default EarlyChange is 1: an early-0 stream without parms may
    // decode differently or fail — it must never produce "ok" AND
    // never throw (tiny streams may not cross a width boundary; the
    // 9000-byte case in the codec test proves the divergence)
    PdfKernel.parse(mini("<< /Filter /LZWDecode >>",
      PdfKernel.lzwEncode(bytes(body), 0)))
    val pred = mini("<< /Filter /FlateDecode /DecodeParms " +
      "<< /Predictor 12 /Columns 4 >> >>", bytes("junk"))
    val rp = PdfKernel.parse(pred)
    assert(rp != null && rp.nSkippedStreams == 1 && rp.text == "")
    // filter chain in array order: RunLength of ASCIIHex... i.e.
    // /Filter [/ASCIIHexDecode /RunLengthDecode]: AHx undone first
    val rl = Array[Byte](6, '(', 'h', 'e', 'y', ')', ' ', 'T'.toByte,
      0.toByte) // literal "(, h, e, y, ), space, T" then repeat...
    val payload = Array[Byte](7, '(', 'h', 'e', 'y', ')', ' ', 'T',
      'j', 128.toByte)
    val hexed = payload.map(b => f"${b & 0xFF}%02X").mkString + ">"
    val chain = mini("<< /Filter [/ASCIIHexDecode /RunLengthDecode] >>",
      bytes(hexed))
    val rc = PdfKernel.parse(chain)
    assert(rc != null && rc.text == "hey", s"text=${rc.text}")
  }

  test("encode -> parse round trip matches the documented contract " +
      "(both Flate and raw streams)") {
    for (seed <- Seq(0L, 3L, 11L); nPages <- Seq(1, 2, 5)) {
      val r = PdfKernel.parse(PdfKernel.encode(seed, nPages))
      assert(r != null)
      assert(r.nPages == nPages)
      assert(r.nStreams == nPages && r.nTextStreams == nPages &&
        r.nSkippedStreams == 0)
      val expect = (0 until nPages).map { p =>
        val nw = 3 + ((seed + p) % 4).toInt
        val words = (0 until nw).map(j =>
          "t" + ((seed * 7 + p * 5 + j * 3) % 10)).mkString(" ")
        val dd = ((seed + p) % 100).toInt
        words + " x(y)z" + "abcd" + s"${dd / 10}${dd % 10}"
      }.mkString
      assert(r.text == expect, s"seed=$seed n=$nPages\n${r.text}\n$expect")
    }
  }

  test("hostile bytes: null/garbage/truncations null or degrade, " +
      "never throw; unverifiable filters are SKIPPED, not guessed") {
    assert(PdfKernel.parse(null) == null)
    assert(PdfKernel.parse(bytes("not a pdf at all, truly")) == null)
    assert(PdfKernel.parse(bytes("%PDF")) == null) // under min length
    val good = PdfKernel.encode(5L, 2)
    // truncations never throw
    for (cut <- Seq(10, 50, 200, good.length - 3))
      PdfKernel.parse(java.util.Arrays.copyOf(good, cut))
    // corrupt flate body: that stream is skipped, the rest still lands
    val c = good.clone()
    val si = {
      var i = 0; var at = -1
      while (at < 0) { // first flate stream data start
        if (c(i) == 's' && new String(c, i, 7, "ISO-8859-1") == "stream\n")
          at = i + 7
        i += 1
      }
      at
    }
    c(si) = (c(si) ^ 0x7F).toByte; c(si + 1) = (c(si + 1) ^ 0x55).toByte
    val rc = PdfKernel.parse(c)
    assert(rc != null && rc.nSkippedStreams >= 1)
    // an unknown declared filter is skipped and counted
    val dct = bytes("%PDF-1.4\n1 0 obj\n" +
      "<< /Length 3 /Filter /DCTDecode >>\nstream\nabc\nendstream\n" +
      "endobj\n2 0 obj\n<< /Length 10 >>\nstream\n(ok) Tj\nendstream\n" +
      "endobj\n%%EOF\n")
    val rd = PdfKernel.parse(dct)
    assert(rd != null && rd.nSkippedStreams == 1 && rd.text == "ok")
  }

  test("page census is linear on /Type-stuffed input (r14 ADVICE: " +
      "the search-and-compare form was O(n^2) per row)") {
    // 300k /Type tokens with no /Page anywhere: the quadratic census
    // scanned the whole remaining buffer per token (~5e11 byte ops,
    // minutes); the bounded match does it in one pass.
    val sb = new java.lang.StringBuilder("%PDF-1.4\n")
    for (_ <- 0 until 300000) sb.append("/Type /X ")
    sb.append("1 0 obj\n<< /Type /Page >>\nendobj\n%%EOF\n")
    val b = bytes(sb.toString)
    val t0 = System.nanoTime()
    val r = PdfKernel.parse(b)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(r != null && r.nPages == 1)
    assert(ms < 5000, s"census took $ms ms — quadratic regression")
  }

  test("the DF verb: PdfEncode fixture -> PdfTextExtract, dirty door") {
    import spark.implicits._
    val df = spark.range(0, 6).toDF("doc_id")
      .select(col("doc_id"),
        PdfEncode(col("doc_id") % 5, lit(1L) + col("doc_id") % 3)
          .as("content"))
      .withColumn("content",
        when(col("doc_id") === 0,
          expr("concat(X'00000000', substring(content, 5))"))
          .otherwise(col("content")))
    val rows = df.select(col("doc_id"),
      PdfTextExtract(col("content")).as("p"))
      .select(col("doc_id"), col("p.ok"), col("p.n_pages"), col("p.cp_sum"))
      .as[(Long, Boolean, Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(!rows(0)._2 && rows(0)._3.isEmpty) // broken magic: ok=false
    for (r <- rows.drop(1)) {
      assert(r._2, s"doc ${r._1} not ok")
      assert(r._3.contains(1L + (r._1 % 3)), s"pages of doc ${r._1}")
      // cp_sum replays the pure-Scala contract
      val seed = r._1 % 5; val nP = (1L + r._1 % 3).toInt
      val expect = (0 until nP).map { p =>
        val nw = 3 + ((seed + p) % 4).toInt
        val words = (0 until nw).map(j =>
          "t" + ((seed * 7 + p * 5 + j * 3) % 10)).mkString(" ")
        val dd = ((seed + p) % 100).toInt
        words + " x(y)z" + "abcd" + s"${dd / 10}${dd % 10}"
      }.mkString.map(_.toLong).sum
      assert(r._4.contains(expect), s"cp_sum of doc ${r._1}")
    }
  }
}
