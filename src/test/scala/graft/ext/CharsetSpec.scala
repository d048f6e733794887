package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The charset bytes→text bridge: WHATWG-order resolution (BOM >
  * header param > meta prescan > windows-1252), strict
  * verified-or-nothing decode, and the WARC→HTTP→text composition.
  * Absolute mappings are pinned with HAND constants from the public
  * charset tables (not round-trips through our own encoder — the
  * cancel-transform trap), then cross-checked against the JVM's
  * decoders as the second implementation. */
class CharsetSpec extends SparkTestBase {

  private def ascii(s: String) = s.getBytes("US-ASCII")

  test("hand-pinned absolute mappings: Shift_JIS katakana, " +
      "windows-1252 punctuation block, Latin-1 accents") {
    // public table: SJIS 0x83 0x41 is KATAKANA LETTER A (U+30A2);
    // 0x83 0x40 is the small ァ (U+30A1) — sequential from there
    val sj = CharsetKernel.decode(Array(0x83.toByte, 0x41.toByte), 0,
      "windows-31j")
    assert(sj == "ア", s"SJIS 0x8341 decoded to ${sj.toSeq}")
    for (k <- 0 until 8)
      assert(CharsetKernel.decode(
        Array(0x83.toByte, (0x40 + k).toByte), 0, "windows-31j")
        == new String(Character.toChars(0x30A1 + k)))
    // public table: cp1252 0x80 is the euro sign, 0x85 the ellipsis
    val cpTable = Seq(0x80 -> 0x20AC, 0x85 -> 0x2026, 0x89 -> 0x2030,
      0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C, 0x94 -> 0x201D,
      0x95 -> 0x2022)
    for ((b, cp) <- cpTable)
      assert(CharsetKernel.decode(Array(b.toByte), 0, "windows-1252")
        == new String(Character.toChars(cp)), f"cp1252 0x$b%02X")
    // Latin-1 0xC0+: byte IS the code point (and windows-1252 agrees
    // there — the WHATWG aliasing is value-neutral on 0xA0-0xFF)
    for (b <- 0xC0 to 0xC7) {
      assert(CharsetKernel.decode(Array(b.toByte), 0, "ISO-8859-1")
        == b.toChar.toString)
      assert(CharsetKernel.decode(Array(b.toByte), 0, "windows-1252")
        == b.toChar.toString)
    }
  }

  test("resolution precedence: BOM > header charset > meta tag > " +
      "windows-1252 fallback") {
    val metaSjis = ascii("<meta charset=\"shift_jis\">abc")
    // meta alone
    assert(CharsetKernel.resolve("text/html", metaSjis)
      == ("windows-31j", 0))
    // header beats meta
    assert(CharsetKernel.resolve("text/html; charset=koi8-r", metaSjis)
      == ("KOI8-R", 0))
    // BOM beats header
    val bommed = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      ascii("x")
    assert(CharsetKernel.resolve("text/html; charset=koi8-r", bommed)
      == ("UTF-8", 3))
    assert(CharsetKernel.resolve(null,
      Array(0xFF.toByte, 0xFE.toByte, 'a', 0)) == ("UTF-16LE", 2))
    assert(CharsetKernel.resolve(null,
      Array(0xFE.toByte, 0xFF.toByte, 0, 'a')) == ("UTF-16BE", 2))
    // nothing declared -> browser default
    assert(CharsetKernel.resolve("text/html", ascii("plain page"))
      == ("windows-1252", 0))
    assert(CharsetKernel.resolve(null, ascii("x")) == ("windows-1252", 0))
    // BOM is STRIPPED from the decoded text
    assert(CharsetKernel.decodeAuto(null, bommed) == (("UTF-8", "x")))
    assert(CharsetKernel.decodeAuto(null,
      Array(0xFF.toByte, 0xFE.toByte, 'a', 0)) == (("UTF-16LE", "a")))
  }

  test("bare utf-16 label without a BOM resolves to UTF-16LE per " +
      "WHATWG (r14 verdict #9) — deterministic, not a guess") {
    // the WHATWG encoding table maps the bare label to UTF-16LE
    assert(CharsetKernel.normalizeLabel("utf-16") == "UTF-16LE")
    assert(CharsetKernel.normalizeLabel("UTF-16") == "UTF-16LE")
    // BOM-less UTF-16BE bytes DECLARED as bare utf-16: WHATWG says
    // decode as LE — the byte-swapped code points are the mandated
    // outcome (garbling is the page author's bug, not a decode guess)
    val be = Array[Byte](0, 'a', 0, 'b') // "ab" in UTF-16BE, no BOM
    assert(CharsetKernel.resolve("text/html; charset=utf-16", be)
      == ("UTF-16LE", 0))
    assert(CharsetKernel.decodeAuto("text/html; charset=utf-16", be)
      == (("UTF-16LE", "愀戀")))
    // the same bytes WITH a BE BOM: the BOM wins over the LE label
    val beBom = Array(0xFE.toByte, 0xFF.toByte) ++ be
    assert(CharsetKernel.decodeAuto("text/html; charset=utf-16", beBom)
      == (("UTF-16BE", "ab")))
    // an ODD byte count under a 16-bit charset is malformed: null out
    assert(CharsetKernel.decode(Array[Byte](0, 'a', 0), 0,
      "UTF-16LE") == null)
  }

  test("label normalization is WHATWG-style; unknown labels null") {
    assert(CharsetKernel.normalizeLabel("ISO-8859-1") == "windows-1252")
    assert(CharsetKernel.normalizeLabel("Latin1") == "windows-1252")
    assert(CharsetKernel.normalizeLabel("us-ascii") == "windows-1252")
    assert(CharsetKernel.normalizeLabel("UTF8") == "UTF-8")
    assert(CharsetKernel.normalizeLabel("x-sjis") == "windows-31j")
    assert(CharsetKernel.normalizeLabel("Shift-JIS") == "windows-31j")
    assert(CharsetKernel.normalizeLabel("gb2312") == "GBK")
    assert(CharsetKernel.normalizeLabel("made-up-charset") == null)
    // a DECLARED unknown label nulls the resolve (no guessing)
    assert(CharsetKernel.resolve("text/html; charset=klingon",
      ascii("body")) == null)
    assert(CharsetKernel.resolve("text/html",
      ascii("<meta charset=klingon>x")) == null)
  }

  test("header and meta parsing variants") {
    assert(CharsetKernel.headerCharset(
      "text/html; charset=ISO-8859-1") == "iso-8859-1")
    assert(CharsetKernel.headerCharset(
      "text/html; charset = \"utf-8\" ; boundary=x") == "utf-8")
    assert(CharsetKernel.headerCharset("text/html; charset='sjis'")
      == "sjis")
    assert(CharsetKernel.headerCharset("text/html") == null)
    assert(CharsetKernel.headerCharset(null) == null)
    // meta variants: unquoted, single-quoted, http-equiv, uppercase
    assert(CharsetKernel.metaCharset(
      ascii("<META CHARSET=UTF-8>")) == "utf-8")
    assert(CharsetKernel.metaCharset(
      ascii("<meta charset='euc-jp'/>")) == "euc-jp")
    assert(CharsetKernel.metaCharset(ascii("<meta http-equiv=" +
      "\"Content-Type\" content=\"text/html; charset=windows-1251\">"))
      == "windows-1251")
    // 'charset' OUTSIDE a meta tag is not a declaration
    assert(CharsetKernel.metaCharset(
      ascii("<p>the charset=utf-8 story</p>")) == null)
    // beyond the 1024-byte prescan window: invisible
    val far = ascii("x" * 1100 + "<meta charset=utf-8>")
    assert(CharsetKernel.metaCharset(far) == null)
    assert(CharsetKernel.metaCharset(null) == null)
    assert(CharsetKernel.metaCharset(Array.empty[Byte]) == null)
  }

  test("strict decode: malformed bytes under the resolved charset " +
      "null out — never replacement characters") {
    // declared UTF-8 but invalid continuation byte
    assert(CharsetKernel.decodeAuto("text/html; charset=utf-8",
      ascii("ok ") ++ Array(0xFF.toByte, 0x20.toByte)) == null)
    // truncated SJIS lead byte at end of body
    assert(CharsetKernel.decodeAuto("text/html; charset=sjis",
      ascii("ab") ++ Array(0x83.toByte)) == null)
    // windows-1252's five UNDEFINED bytes (0x81 0x8D 0x8F 0x90 0x9D)
    // are unmappable -> the undeclared-fallback path nulls on them
    assert(CharsetKernel.decodeAuto("text/html",
      Array(0x81.toByte)) == null)
    // valid pages decode
    assert(CharsetKernel.decodeAuto("text/html; charset=utf-8",
      "héllo".getBytes("UTF-8")) == (("UTF-8", "héllo")))
  }

  test("WARC -> HTTP -> text composition matches the fixture contract " +
      "(all four modes, all three wire forms)") {
    import spark.implicits._
    val media = Multimodal.syntheticWarcCharsetCorpus(
      spark.range(1, 4).toDF("doc_id"), "doc_id", col("doc_id") % 7,
      lit(12L))
    val rows = Multimodal.warcHttpTexts(media)
      .orderBy("media_id", "rec_idx").collect()
    assert(rows.length == 36) // 3 docs x 12 records, none dropped
    val w1252cp = Array(0x20AC, 0x2026, 0x2030, 0x2018, 0x2019,
      0x201C, 0x201D, 0x2022)
    for (r <- rows) {
      val s = r.getAs[Long]("media_id") % 7
      val i = r.getAs[Long]("rec_idx")
      val nch = 12 + (s + 3 * i) % 9
      val aj = (0L until nch).map(j => (s * 11 + i * 7 + j * 5) % 8)
      val (cs, nc, cps) = (i % 4) match {
        case 0 => ("windows-1252", nch, aj.map(_ + 192).sum)
        case 1 => ("windows-31j", 26 + nch, 2415 + aj.map(_ + 12449).sum)
        case 2 => ("UTF-8", nch, aj.map(_ + 19968).sum)
        case _ => ("windows-1252", nch, aj.map(a => w1252cp(a.toInt).toLong).sum)
      }
      assert(r.getAs[String]("charset") == cs, s"charset at i=$i")
      assert(r.getAs[Long]("n_chars") == nc, s"n_chars at i=$i")
      assert(r.getAs[Long]("cp_sum") == cps, s"cp_sum at i=$i")
      assert(r.getAs[Long]("status") == 200L)
    }
    // the TEXT column itself is the decoded page: spot-check mode 2's
    // CJK content via a second implementation (java String decode)
    val t = Multimodal.warcHttpTexts(media)
      .filter(col("media_id") === 1 && col("rec_idx") === 2)
      .select("text").as[String].head()
    assert(t.codePoints().toArray.forall(cp => cp >= 0x4E00 && cp < 0x4E08))
  }

  test("CharsetTextDecode expression: nulls are total, not throws") {
    import spark.implicits._
    val df = Seq(
      ("text/html; charset=utf-8", "ok".getBytes("UTF-8")),
      ("text/html; charset=nonsense", "x".getBytes("UTF-8")),
      (null.asInstanceOf[String], "plain".getBytes("UTF-8")))
      .toDF("ct", "body")
    val out = df.select(CharsetTextDecode(col("ct"), col("body"))
      .as("r")).select("r.ok", "r.charset", "r.n_chars")
      .as[(Boolean, String, Option[Long])].collect().toSeq
    assert(out == Seq((true, "UTF-8", Some(2L)),
      (false, null, None), (true, "windows-1252", Some(5L))))
  }
}
