package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Ogg page walk: the CRC polynomial pinned by an independent
  * bit-serial derivation (two implementations agreeing — the
  * WebP-distance-map pattern), hand-built pages incl. a packet
  * continued across a page seam, the encoder round trip, and the
  * hostile contract. */
class OggSpec extends SparkTestBase {

  /** Independent bit-serial Ogg CRC (poly 0x04C11DB7, init 0, no
    * reflection, no xor-out) — no table, no shared code with
    * [[OggKernel]]. */
  private def crcBitSerial(b: Array[Byte]): Int = {
    var r = 0
    for (x <- b) {
      r ^= (x & 0xFF) << 24
      for (_ <- 0 until 8)
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
    }
    r
  }

  /** Spec-local page builder riding the bit-serial CRC. */
  private def page(flags: Int, granule: Long, serial: Long, seq: Long,
      lacing: Array[Int], payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](27 + lacing.length + payload.length)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(5) = flags.toByte
    for (i <- 0 until 8) out(6 + i) = (granule >>> (8 * i)).toByte
    for (i <- 0 until 4) out(14 + i) = (serial >>> (8 * i)).toByte
    for (i <- 0 until 4) out(18 + i) = (seq >>> (8 * i)).toByte
    out(26) = lacing.length.toByte
    for (i <- lacing.indices) out(27 + i) = lacing(i).toByte
    System.arraycopy(payload, 0, out, 27 + lacing.length, payload.length)
    val c = crcBitSerial(out) // CRC field is still zero here
    for (i <- 0 until 4) out(22 + i) = (c >>> (8 * i)).toByte
    out
  }

  test("kernel CRC table == independent bit-serial derivation") {
    for (seed <- Seq(0, 1, 7, 100)) {
      val v = Array.tabulate[Byte](53 + seed)(i =>
        ((i * 31 + seed * 17) % 256).toByte)
      assert(OggKernel.crc(v, 0, v.length, -1, 0) == crcBitSerial(v),
        s"seed=$seed")
    }
  }

  test("hand-built pages: packet continued across the seam counts " +
      "once; granule/serial/flags land") {
    val ident = new Array[Byte](30)
    ident(0) = 1
    "vorbis".getBytes.copyToArray(ident, 1)
    ident(11) = 2 // channels
    ident(12) = 0x44; ident(13) = 0xAC.toByte // 44100 le32
    val p0 = page(2, 0L, 77L, 0L, Array(30), ident)
    // a 300-byte packet: lacing 255 + (continues) then 45 on page 2
    val big = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    val p1 = page(0, 576L, 77L, 1L, Array(255), big.take(255))
    val p2 = page(1 | 4, 1152L, 77L, 2L, Array(45), big.drop(255))
    val m = OggKernel.parse(p0 ++ p1 ++ p2)
    assert(m != null)
    assert(m.nPages == 3)
    assert(m.nPackets == 2, s"packets=${m.nPackets}") // ident + big
    assert(m.codec == "vorbis" && m.channels == 2L &&
      m.sampleRate == 44100L)
    assert(m.lastGranule == 1152L && m.serial == 77L)
  }

  test("a continued-flag mismatch at the seam nulls (truncated or " +
      "spliced streams must not miscount)") {
    val ident = new Array[Byte](30)
    ident(0) = 1; "vorbis".getBytes.copyToArray(ident, 1)
    val p0 = page(2, 0L, 9L, 0L, Array(30), ident)
    // page claims continuation but no packet is open
    val p1 = page(1, 576L, 9L, 1L, Array(10),
      Array.tabulate[Byte](10)(_.toByte))
    assert(OggKernel.parse(p0 ++ p1) == null)
  }

  test("encode -> parse round trip matches the documented contract " +
      "(incl. multiplexed second streams every 3rd seed)") {
    val rates = Array(8000L, 11025L, 16000L, 22050L, 44100L)
    for (s <- 0L to 14L; n <- Seq(0, 1, 4)) {
      val m = OggKernel.parse(OggEncode.encode(s, n))
      assert(m != null, s"s=$s n=$n")
      val mx = if (s % 3 == 0) 1 else 0
      assert(m.nStreams == 1 + mx)
      assert(m.nPages == (2 + n) * (1 + mx), s"s=$s n=$n")
      val expPackets = 2 + (0 until n).map(p => 1 + (s + p) % 3).sum +
        mx * (2 + n)
      assert(m.nPackets == expPackets, s"s=$s n=$n")
      // reported fields stay the FIRST stream's
      assert(m.codec == (if (s % 2 == 0) "vorbis" else "opus"))
      assert(m.channels == 1 + s % 2)
      assert(m.sampleRate == rates((s % 5).toInt))
      assert(m.lastGranule == (if (n == 0) 0L else n * 576L))
      assert(m.serial == 1 + s % 100000)
      // comment header (audio EXIF): exact strings
      assert(m.vendor == "graft-fixture")
      assert(m.artist == s"artist-${s % 13}")
      assert(m.title == s"title-${s % 9}")
      assert(m.nComments == 2 + s % 2)
    }
  }

  test("a new serial whose first page lacks the BOS flag nulls " +
      "(spliced stream fragments must not count as streams)") {
    val ident = new Array[Byte](30)
    ident(0) = 1; "vorbis".getBytes.copyToArray(ident, 1)
    val p0 = page(2, 0L, 5L, 0L, Array(30), ident)
    val rogue = page(0, 99L, 6L, 0L, Array(4),
      Array[Byte](1, 2, 3, 4)) // serial 6 never saw a BOS
    assert(OggKernel.parse(p0 ++ rogue) == null)
  }

  test("hostile bytes: junk, CRC corruption, truncations null — " +
      "never a throw") {
    assert(OggKernel.parse(null) == null)
    assert(OggKernel.parse(Array.empty[Byte]) == null)
    assert(OggKernel.parse("OggS but then nothing real".getBytes) ==
      null)
    val good = OggEncode.encode(3L, 2)
    // flip one payload byte: the page CRC must catch it
    val bad = good.clone()
    bad(good.length - 1) = (bad(good.length - 1) ^ 0x41).toByte
    assert(OggKernel.parse(bad) == null)
    for (cut <- 0 until good.length)
      OggKernel.parse(java.util.Arrays.copyOf(good, cut))
  }

  test("the DF verb: OggEncode fixture -> OggMeta, dirty door") {
    import spark.implicits._
    val df = spark.range(0, 8).toDF("doc_id")
      .select(col("doc_id"),
        OggEncode(col("doc_id") % 5, lit(1L) + col("doc_id") % 3)
          .as("content"))
      .withColumn("content",
        when(col("doc_id") === 0,
          expr("concat(X'00000000', substring(content, 5))"))
          .otherwise(col("content")))
    val rows = df.select(col("doc_id"), OggMeta(col("content")).as("m"))
      .select(col("doc_id"), col("m.ok"), col("m.codec"),
        col("m.n_pages"), col("m.last_granule"))
      .as[(Long, Boolean, Option[String], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(!rows(0)._2 && rows(0)._3.isEmpty)
    for (r <- rows.drop(1)) {
      val s = r._1 % 5
      val n = 1 + r._1 % 3
      val mx = if (s % 3 == 0) 1 else 0
      assert(r._2, s"doc ${r._1}")
      assert(r._3.contains(if (s % 2 == 0) "vorbis" else "opus"))
      assert(r._4.contains((2 + n) * (1 + mx)))
      assert(r._5.contains(n * 576L))
    }
  }
}
