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
}
