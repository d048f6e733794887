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
