package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The ZIP-bundle leg: central-directory walk against the planted
  * contract (stored AND deflated, data descriptors included), CRC
  * enforcement on flipped payload bits, the bundle→triage→decode
  * composition, and hostile-byte rejection. */
class ZipSpec extends SparkTestBase {
  import spark.implicits._

  test("stored and deflated encodes walk to IDENTICAL members; fields " +
      "follow the planted contract; deflated entries use data " +
      "descriptors (local sizes zeroed) and still parse via the CD") {
    val stored = ZipKernel.members(ZipKernel.encode(3L, 4, deflated = false), 4096)
    val defl = ZipKernel.members(ZipKernel.encode(3L, 4, deflated = true), 4096)
    assert(stored != null && defl != null && stored.length == 4)
    for ((s, d) <- stored.zip(defl)) {
      assert(s.copy(payload = null, method = -1).toString ==
        d.copy(payload = null, method = -1).toString)
      assert(s.payload.toSeq == d.payload.toSeq)
      assert(s.method == 0 && d.method == 8)
    }
    for (m <- stored) {
      assert(m.name == s"bundle/doc-${m.idx}.bin")
      assert(m.size == 10 + (3 + m.idx * 5) % 80)
      val want = Array.tabulate(m.size.toInt)(j =>
        ((3 * 17 + m.idx * 23 + j * 9) % 256).toLong)
      assert(m.byteSum == want.sum && m.firstByte == want(0))
    }
    // the JDK's deflated output really zeroes local sizes (descriptor
    // flag): local header csize field == 0 while the CD knows better
    val raw = ZipKernel.encode(3L, 1, deflated = true)
    val localCsize = (raw(18) & 0xFF) | ((raw(19) & 0xFF) << 8) |
      ((raw(20) & 0xFF) << 16) | ((raw(21) & 0xFF) << 24)
    assert(localCsize == 0, "expected a data-descriptor layout")
  }

  test("a bundled image decodes: zip -> triage -> pixel stats; the " +
      "JDK reads nothing we can't") {
    val png = PngKernel.encodeGray(9, 8, (x, y) => (x * 7 + y * 3) % 256,
      _ => 0)
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("0001.png"))
    z.write(png); z.closeEntry(); z.close()
    val bundle = Seq((1L, bos.toByteArray)).toDF("media_id", "content")
    val payloads = Multimodal.zipMembers(bundle)
      .select(col("media_id"), col("payload").as("content"))
    assert(Multimodal.mediaTriage(payloads).collect()(0).getString(1) == "png")
    val stats = Multimodal.mixedImageContentStats(payloads).collect()(0)
    assert(stats.getBoolean(1) && stats.getLong(2) == 9L &&
      stats.getLong(3) == 8L)
  }

  test("hostile bytes: flipped payload bit fails CRC -> null; junk / " +
      "truncation / member cap reject; sniff tags zip") {
    val good = ZipKernel.encode(1L, 3, deflated = false)
    // flip a STORED payload byte (offset: local header 30 + name 17)
    val bad = good.clone()
    bad(30 + 17 + 2) = (bad(30 + 17 + 2) ^ 0x40).toByte
    assert(ZipKernel.members(bad, 4096) == null)
    assert(ZipKernel.members("not a zip at all".getBytes, 4096) == null)
    assert(ZipKernel.members(null, 4096) == null)
    assert(ZipKernel.members(good.take(good.length - 10), 4096) == null)
    assert(ZipKernel.members(good, 2) == null)
    assert(MediaKind.sniff(good) == "zip")
  }
}
