package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The WARC ingestion leg: record walk against the planted contract,
  * gzip-member transparency, the WARC→triage→decode composition (a
  * crawled PNG decoded out of a WARC payload), and hostile bytes. */
class WarcSpec extends SparkTestBase {
  import spark.implicits._

  test("plain and gzip-membered encodes parse to IDENTICAL records; " +
      "fields follow the planted contract") {
    val plain = WarcKernel.records(WarcKernel.encode(4L, 5, gzipped = false), 4096)
    val gz = WarcKernel.records(WarcKernel.encode(4L, 5, gzipped = true), 4096)
    assert(plain != null && gz != null && plain.length == 5)
    for ((p, g) <- plain.zip(gz)) {
      assert(p.copy(payload = null).toString ==
        g.copy(payload = null).toString)
      assert(p.payload.toSeq == g.payload.toSeq)
    }
    for (r <- plain) {
      assert(r.warcType == "response")
      assert(r.targetUri == s"http://host-4.example/p${r.idx}")
      assert(r.contentLength == 10 + (4 + r.idx * 3) % 50)
      val want = Array.tabulate(r.contentLength.toInt)(j =>
        ((4 * 31 + r.idx * 17 + j * 11) % 256).toLong)
      assert(r.byteSum == want.sum && r.firstByte == want(0))
    }
  }

  test("a crawled image decodes OUT of the WARC payload: warc -> " +
      "triage -> pixel stats composition") {
    // a WARC whose single record payload IS a real PNG fixture
    val png = PngKernel.encodeGray(9, 8, (x, y) => (x * 7 + y * 3) % 256,
      _ => 0)
    val hdr = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "WARC-Target-URI: http://x.example/a.png\r\n" +
      s"Content-Length: ${png.length}\r\n\r\n").getBytes("US-ASCII")
    val warc = hdr ++ png ++ "\r\n\r\n".getBytes("US-ASCII")
    val rows = Multimodal.warcRecords(
      Seq((1L, warc)).toDF("media_id", "content"))
    val payloads = rows.select(col("media_id"), col("payload").as("content"))
    val kinds = Multimodal.mediaTriage(payloads).collect()
    assert(kinds.length == 1 && kinds(0).getString(1) == "png")
    val stats = Multimodal.mixedImageContentStats(payloads
        .withColumnRenamed("media_id", "__x")
        .select(col("__x").as("media_id"), col("content")))
      .collect()(0)
    assert(stats.getBoolean(1) && stats.getLong(2) == 9L &&
      stats.getLong(3) == 8L)
  }

  test("hostile bytes never throw: junk, truncated payload, bad " +
      "Content-Length, missing blank line, record cap") {
    assert(WarcKernel.records(null, 10) == null)
    assert(WarcKernel.records("HTTP/1.1 200 OK\r\n\r\n".getBytes, 10) == null)
    val good = WarcKernel.encode(1L, 3, gzipped = false)
    assert(WarcKernel.records(good.take(good.length - 20), 4096) == null)
    assert(WarcKernel.records(good, 2) == null) // more records than cap
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\npayload"
      ).getBytes("US-ASCII")
    assert(WarcKernel.records(noLen, 10) == null)
    // corrupt gzip stream
    val gz = WarcKernel.encode(1L, 2, gzipped = true)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x55).toByte
    assert(WarcKernel.records(gz, 10) == null)
    // triage sniffs both layouts
    assert(MediaKind.sniff(good) == "warc")
    assert(MediaKind.sniff(WarcKernel.encode(1L, 2, gzipped = true)) == "gzip")
  }

  test("HTTP payload decode: identity/chunked/gzip round-trip; a " +
      "hand-typed real-world message; hostile frames null, never throw") {
    val body = Array.tabulate(100)(i => ((i * 37 + 11) % 256).toByte)
    for ((ch, gz) <- Seq((false, false), (true, false), (false, true),
        (true, true))) {
      val wire = HttpKernel.encode(200, "text/html; charset=utf-8", body,
        chunked = ch, gzipBody = gz)
      val r = HttpKernel.parse(wire)
      assert(r != null, s"chunked=$ch gzip=$gz")
      assert(r.status == 200 &&
        r.contentType == "text/html; charset=utf-8")
      assert(r.body.toSeq == body.toSeq, s"chunked=$ch gzip=$gz")
    }
    // hand-typed message: folded case, chunk EXTENSION, trailers, and
    // a Connection header the parser must skip
    val hand = ("HTTP/1.1 301 Moved Permanently\r\n" +
      "content-TYPE: text/plain\r\n" +
      "Connection: close\r\n" +
      "Transfer-Encoding: chunked\r\n" +
      "\r\n" +
      "5;ext=1\r\nhello\r\n" +
      "6\r\n world\r\n" +
      "0\r\n" +
      "X-Trailer: t\r\n\r\n").getBytes("ISO-8859-1")
    val hr = HttpKernel.parse(hand)
    assert(hr != null && hr.status == 301 && hr.contentType == "text/plain")
    assert(new String(hr.body, "US-ASCII") == "hello world")
    // no content-length, no chunking: body = rest of message
    val plain = ("HTTP/1.0 200 OK\r\nContent-Type: a/b\r\n\r\nrest bytes"
      ).getBytes("US-ASCII")
    assert(new String(HttpKernel.parse(plain).body, "US-ASCII") == "rest bytes")
    // hostile: bad status, bad chunk size, truncated chunk, short
    // content-length claim, unverifiable encoding
    assert(HttpKernel.parse(null) == null)
    assert(HttpKernel.parse("not http at all, but long".getBytes) == null)
    assert(HttpKernel.parse(("HTTP/1.1 2x0 OK\r\n\r\nbody body"
      ).getBytes) == null)
    assert(HttpKernel.parse(("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked\r\n\r\nzz\r\nbody\r\n0\r\n\r\n"
      ).getBytes) == null) // non-hex size
    assert(HttpKernel.parse(("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked\r\n\r\nff\r\nshort\r\n"
      ).getBytes) == null) // truncated chunk
    assert(HttpKernel.parse(("HTTP/1.1 200 OK\r\n" +
      "Content-Length: 999\r\n\r\nshort").getBytes) == null)
    assert(HttpKernel.parse(("HTTP/1.1 200 OK\r\n" +
      "Content-Encoding: br\r\n\r\ncompressed-ish"
      ).getBytes) == null) // encoding this JVM cannot verify
    // r14: unknown TRANSFER-encoding tokens reject too — 'gzip' or
    // 'gzip, chunked' would otherwise ship TE-compressed bytes as the
    // verified body (the same verified-or-nothing stance as above)
    assert(HttpKernel.parse(("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: gzip\r\n\r\ncompressed-ish-bytes"
      ).getBytes) == null)
    assert(HttpKernel.parse(("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: gzip, chunked\r\n\r\n5\r\nhello\r\n0\r\n\r\n"
      ).getBytes) == null)
    // 'identity' alongside 'chunked' stays fine
    assert(HttpKernel.parse(("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: identity, chunked\r\n\r\n5\r\nhello\r\n0\r\n\r\n"
      ).getBytes).body.toSeq == "hello".getBytes.toSeq)
    // r14: a NEGATIVE Content-Length is malformed, not "absent" — it
    // must null, not fall through to the read-to-EOF path
    assert(HttpKernel.parse(("HTTP/1.1 200 OK\r\n" +
      "Content-Length: -5\r\n\r\nbody bytes here").getBytes) == null)
    // deflate content-encoding: both the RFC zlib form and the
    // raw-deflate interop form decode; garbage under the token nulls
    for (nowrap <- Seq(false, true)) {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(body); d.finish()
      val buf = new Array[Byte](body.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      val wire = ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n" +
        s"Content-Length: $n\r\n\r\n").getBytes("US-ASCII") ++ buf.take(n)
      val r = HttpKernel.parse(wire)
      assert(r != null && r.body.toSeq == body.toSeq, s"nowrap=$nowrap")
    }
    assert(HttpKernel.parse(("HTTP/1.1 200 OK\r\n" +
      "Content-Encoding: deflate\r\n\r\nnot deflate data at all"
      ).getBytes) == null)
    // corrupt gzip body nulls (CRC-verified member walk)
    val gzWire = HttpKernel.encode(200, "t/t", body, chunked = false,
      gzipBody = true)
    gzWire(gzWire.length - 5) = (gzWire(gzWire.length - 5) ^ 0x55).toByte
    assert(HttpKernel.parse(gzWire) == null)
    // the DF verb: WARC -> HTTP responses, bodies decoded
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Multimodal.syntheticWarcHttpCorpus(
      spark.range(1, 4).toDF("doc_id"), "doc_id", col("doc_id") % 11,
      lit(3L))
    val rows = Multimodal.warcHttpResponses(media)
      .orderBy("media_id", "rec_idx").collect()
    assert(rows.length == 9)
    for (r <- rows) {
      val s = r.getLong(0) % 11; val i = r.getLong(1)
      val len = 20 + (s + i * 5) % 60
      assert(r.getLong(5) == len)
      val expected = Array.tabulate(len.toInt)(j =>
        ((s * 13 + i * 19 + j * 7) % 256).toByte)
      assert(r.getAs[Array[Byte]]("body").toSeq == expected.toSeq)
    }
  }
}
